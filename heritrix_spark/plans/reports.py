"""Crawl reports — the StatisticsTracker query surface (SURVEY §2.J O4).

Reference anchor: ``org/archive/crawler/admin/StatisticsTracker.java``
produces the frontier / hosts / seeds / responsecode reports and
progress-statistics.log.  Here each report is one aggregate query over the
engine's ``lineage`` / ``metrics`` / ``fetched`` / ``queue_state`` tables —
columnar scans with partition pruning on ``step``, no engine state needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hosts_report(lineage: DataFrame) -> DataFrame:
    """Per-host tallies (hosts-report.txt analog)."""
    return (lineage.groupBy("class_key").agg(
        F.count("*").alias("processed"),
        F.sum((F.col("event") == "Fs").cast("long")).alias("succeeded"),
        F.sum((F.col("event") == "Ff").cast("long")).alias("failed"),
        F.sum((F.col("event") == "Fd").cast("long")).alias("disregarded"),
        F.sum((F.col("event") == "Fr").cast("long")).alias("retried"),
        F.min("fetch_start").alias("first_fetch_ts"),
        F.max("fetch_end").alias("last_fetch_ts"))
        .orderBy(F.desc("processed")))


def response_code_report(lineage: DataFrame) -> DataFrame:
    """Status-code distribution (responsecode-report.txt analog)."""
    return (lineage.groupBy("status").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n")))


def progress_statistics(lineage: DataFrame) -> DataFrame:
    """Per-superstep progress: docs/step, virtual docs/sec
    (progress-statistics.log analog; virtual time, deterministic)."""
    per = (lineage.groupBy("crawl_step").agg(
        F.count("*").alias("processed"),
        F.sum((F.col("event") == "Fs").cast("long")).alias("succeeded"),
        F.min("fetch_start").alias("t0"),
        F.max("fetch_end").alias("t1")))
    return (per.withColumn(
        "virtual_docs_per_sec",
        F.round(F.col("processed")
                / F.greatest((F.col("t1") - F.col("t0")) / 1000.0,
                             F.lit(1e-9)), 3))
        .orderBy("crawl_step"))


def seeds_report(lineage: DataFrame, frontier: DataFrame) -> DataFrame:
    """Disposition of every seed (seeds-report.txt analog)."""
    seed_events = lineage.where(F.col("is_seed"))
    crawled = seed_events.groupBy("canon_url").agg(
        F.max("status").alias("status"),
        F.max("event").alias("last_event"))
    pending = frontier.where(F.col("is_seed")).select(
        "canon_url", F.lit(None).cast("int").alias("status"),
        F.lit("pending").alias("last_event"))
    return crawled.unionByName(pending)


def frontier_report(frontier: DataFrame, queue_state: DataFrame) -> DataFrame:
    """Queue depth / state snapshot (frontier-report.txt analog)."""
    depth = frontier.groupBy("class_key").agg(
        F.count("*").alias("queued"),
        F.min("earliest_ts").alias("min_earliest"),
        F.sum((F.col("kind") != "real").cast("long")).alias("prereqs"))
    return (queue_state.join(depth, "class_key", "left")
            .withColumn("queued", F.coalesce("queued", F.lit(0)))
            .orderBy(F.desc("queued")))


def bandwidth_report(fetched: DataFrame) -> DataFrame:
    """Bytes per host per step (crawl bandwidth; KB/s analog over
    virtual time)."""
    return (fetched.groupBy("crawl_step", "class_key").agg(
        F.count("*").alias("docs"),
        F.sum(F.coalesce(F.length("bytes"), F.lit(0))).alias("payload_bytes"))
        .orderBy("crawl_step", F.desc("payload_bytes")))
