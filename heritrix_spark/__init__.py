"""heritrix_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A brand-new implementation (NOT a port) of the crawl-ordering semantics of
Heritrix 1.x (reference: a252937166/Heritrix, a mirror of Internet Archive
Heritrix; the crawl frontier lives in org/archive/crawler/frontier/ in that
tree).  Everything here is expressed Spark-first: DataFrame/SQL plans,
window-function scheduling, anti-join dedup, broadcast dimension joins,
vectorized pandas/Arrow UDFs only where built-ins cannot express the
semantics.

Layout
------
functions/   scalar layers: canonicalization (UURIFactory/Canonicalizer),
             SURT, fingerprints, cost policies, hop-path ops
operators/   set-at-a-time operators: scope decide-rules, uniq (URL-seen),
             the superstep scheduler, preconditions/robots, fetch, extract,
             disposition
plans/       Frontier facade + CrawlJob driver loop (BSP supersteps,
             checkpoint/resume)
sources/     SnapshotCatalog: versioned parquet tables with atomic
             multi-table commits (Iceberg-compatible semantics; swap in a
             real Iceberg catalog on a cluster via config)
pipeline/    large-scale training-data ops: dedup (exact/minhash/simhash),
             similarity search, text analysis, multimodal payload plumbing
streaming/   Structured Streaming seed ingest (optional path)
"""

__version__ = "0.1.0"
