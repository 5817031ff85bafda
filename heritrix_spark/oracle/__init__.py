"""Pure-Python executable oracle of the normative superstep scheduling law.

No Spark, no wall clock, no randomness — runs the same crawl as the engine
and must agree event-for-event (tests/test_frontier_order.py).
"""
