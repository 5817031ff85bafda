"""Structured Streaming edges of the crawl engine (external seed ingest).

The crawl loop itself is BSP supersteps, not a streaming query — the
outlink feedback edge cannot be expressed inside one Structured Streaming
query (SURVEY §2.K) — but *external* inputs (operator-added seeds) are a
natural stream."""
