"""Deterministic crawl fixtures: a closed-form synthetic web.

``websim.py`` defines the URL space, Zipf-like host skew, link graph,
robots rules and seed list as pure integer functions of xxhash64 — exactly
mirrorable between Python (the ordering oracle) and Spark SQL expressions
(the engine's JVM-side extractor).  ``gen.py`` materializes the ``images``
table + robots/host-config parquet for a given fixture scale.
"""
