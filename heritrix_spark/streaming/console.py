"""Streaming crawl console — live StatisticsTracker over the lineage sink.

Reference anchor: Heritrix's StatisticsTracker drives the live web console
and progress-statistics.log — rolling URIs/sec, per-host tallies — while
the crawl runs [H: org/archive/crawler/admin/StatisticsTracker.java].  The
batch reports in :mod:`heritrix_spark.plans.reports` are the end-of-crawl
analog; this module is the *live* analog: a Structured Streaming query
over the crawl's append-only ``lineage`` parquet sink (each superstep
appends new files, so the sink directory IS a file-source stream).

Two operators:

* :func:`live_progress` — event-time windowed URIs/sec + outcome tallies
  with a watermark for late/out-of-order lineage (supersteps land whole
  files late relative to virtual fetch time; the watermark bounds state).
* :func:`politeness_monitor` — a custom stateful operator
  (``applyInPandasWithState``) keyed by crawl queue: state carries the
  last fetch_end per queue ACROSS micro-batches and emits one row per
  fetch whose start violates the queue's minimum gap — the streaming
  check of the politeness law the frontier enforces
  [H: org/archive/crawler/frontier/WorkQueueFrontier.java snoozeQueue].

The crawl's fetch clock is virtual milliseconds (a long); both operators
map it onto an epoch timestamp column, which only anchors window/watermark
bookkeeping — the arithmetic is the same at any epoch offset.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Checkpointed lineage-sink columns (plans/crawl_job.py lineage sink, as
# landed by the checkpointer with URL strings re-attached); streaming file
# sources need an explicit schema.
LINEAGE_SCHEMA = (
    "crawl_step int, class_key string, url string, canon_url string, "
    "url_fp long, kind string, is_seed boolean, directive int, cost int, "
    "ordinal long, retries int, status int, fetch_start long, "
    "fetch_end long, event string")

PROGRESS_SCHEMA = ("window struct<start:timestamp,end:timestamp>, "
                   "processed long, succeeded long, uris_per_sec double")

VIOLATION_SCHEMA = ("class_key string, url_fp long, fetch_start long, "
                    "prev_fetch_end long, gap_ms long")

_STATE_SCHEMA = "last_end long"


def lineage_stream(spark: SparkSession, lineage_dir: str,
                   max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view of the crawl's lineage sink directory.

    The checkpointer lands each snapshot under a ``step=N`` subdirectory;
    recursiveFileLookup picks those up (and disables partition-dir
    inference, so the explicit file schema is authoritative)."""
    reader = (spark.readStream.schema(LINEAGE_SCHEMA)
              .option("recursiveFileLookup", "true"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(lineage_dir)


def live_progress(lineage: DataFrame, window_ms: int = 10_000,
                  late_ms: int = 60_000) -> DataFrame:
    """Rolling crawl rate: tumbling event-time windows over fetch_end with
    a ``late_ms`` watermark (supersteps append whole files out of order
    relative to virtual fetch time; the watermark lets late rows join
    their window while bounding streaming state)."""
    win = f"{window_ms // 1000} seconds"
    ev = (lineage.where(F.col("fetch_end").isNotNull())
          .withColumn("fetch_ts",
                      F.timestamp_millis(F.col("fetch_end")))
          .withWatermark("fetch_ts", f"{late_ms // 1000} seconds"))
    return (ev.groupBy(F.window("fetch_ts", win))
            .agg(F.count("*").alias("processed"),
                 F.sum(((F.col("status") >= 200)
                        & (F.col("status") < 300)).cast("long"))
                 .alias("succeeded"))
            .withColumn("uris_per_sec",
                        F.col("processed") / F.lit(window_ms / 1000.0)))


def politeness_monitor(lineage: DataFrame, min_gap_ms: int) -> DataFrame:
    """Per-queue politeness violations via applyInPandasWithState.

    State per class_key = the last observed fetch_end, carried across
    micro-batches; a fetch violates when it starts before the previous
    fetch's end + ``min_gap_ms`` on the same queue.  Within a batch the
    queue's fetches are checked in fetch_start order (the frontier emits
    at most a politeness-spaced burst per queue per superstep, so batch
    groups stay small)."""

    def check(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (last_end,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["fetch_start", "fetch_end", "url_fp"])
            for fp, fs, fe in zip(pdf["url_fp"], pdf["fetch_start"],
                                  pdf["fetch_end"]):
                if last_end is not None and fs < last_end + min_gap_ms:
                    out.append((key[0], int(fp), int(fs), int(last_end),
                                int(fs - last_end)))
                if last_end is None or fe > last_end:
                    last_end = int(fe)
        state.update((last_end,))
        if out:
            yield pd.DataFrame(out, columns=[
                "class_key", "url_fp", "fetch_start", "prev_fetch_end",
                "gap_ms"])

    ev = lineage.where(F.col("fetch_start").isNotNull()
                       & F.col("fetch_end").isNotNull())
    return (ev.groupBy("class_key")
            .applyInPandasWithState(check, VIOLATION_SCHEMA, _STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


def run_to_completion(query_df: DataFrame, out_dir: str,
                      checkpoint_dir: str, output_mode: str):
    """Drain all currently-available input through ``query_df`` into a
    parquet sink (availableNow trigger) and block until done — the batch
    driver's way to materialize a console snapshot; a live deployment
    starts the same writer without the trigger."""
    q = (query_df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
