"""Streaming seed ingest — Heritrix's "add seeds to a running crawl".

Reference anchor: Heritrix 1.x lets the operator append seeds to a live
crawl (CrawlJobHandler importUris / seeds.txt edits picked up on refresh).
Here: a Structured Streaming file source watches a directory of seed lists
(one URL per line); each micro-batch is canonicalized, de-duplicated
within the batch, and appended to a parquet landing table.  The CrawlJob
drains the landing table between supersteps (``drain_new_seeds``) — the
feedback-free edge runs as a stream, the frontier keeps its BSP law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.functions.canonicalize import canonicalize_expr

LANDING_SCHEMA = "url string, canon_url string, batch_id long"


def seed_stream(spark: SparkSession, seed_dir: str) -> DataFrame:
    """Streaming DataFrame of raw seed lines (blank/comment lines dropped)."""
    raw = spark.readStream.format("text").load(seed_dir)
    return (raw.select(F.trim(F.col("value")).alias("url"))
            .where((F.col("url") != "") & ~F.col("url").startswith("#")))


def start_ingest(spark: SparkSession, seed_dir: str, landing_dir: str,
                 checkpoint_dir: str, trigger_once: bool = False):
    """Run the ingest query: seeds dir → canonicalized landing parquet.

    foreachBatch dedupes within the micro-batch and stamps the batch id,
    so the landing table is an append-only journal of seed additions
    (replayable, exactly-once via the streaming checkpoint).
    """
    stream = seed_stream(spark, seed_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        (batch.withColumn("canon_url", canonicalize_expr(F.col("url")))
         .dropDuplicates(["canon_url"])
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(landing_dir))

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_new_seeds(spark: SparkSession, landing_dir: str,
                    already_batches: set[int]) -> tuple[list[str], set[int]]:
    """Driver-side drain: seed URLs from landing batches not yet injected.
    Returns (urls in deterministic order, updated batch set) — the caller
    feeds them to ``CrawlJob.schedule_seeds``-style injection."""
    try:
        df = spark.read.parquet(landing_dir)
    except Exception:
        return [], already_batches
    rows = (df.where(~F.col("batch_id").isin(*already_batches)
                     if already_batches else F.lit(True))
            .select("url", "batch_id")
            .orderBy("batch_id", "url").collect())
    urls = [r["url"] for r in rows]
    seen = already_batches | {r["batch_id"] for r in rows}
    return urls, seen
