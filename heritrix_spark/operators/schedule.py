"""Priority-window scheduling — the composite-key top-k-per-queue operator.

This is the set-at-a-time image of Heritrix's frontier dequeue order
(reference anchors, class-level — /root/reference was empty at build time:
``org/archive/crawler/frontier/BdbMultipleWorkQueues.java#calculateInsertKey``
packs ``(queueKey | directive/precedence, cost, ordinal)`` into one B-tree
key so a cursor scan per queue yields priority order;
``WorkQueueFrontier.java#next`` takes bounded bursts per queue).

Physical shape (the 10^10-frontier contract):

* the rank filter sits directly on the ``row_number`` column, which Spark's
  ``InferWindowGroupLimit`` rewrites into a map-side (partial) + final
  ``WindowGroupLimit`` — every task keeps a bounded k-heap instead of
  sorting its partition;
* with ``salt_count > 1`` the ranking runs in two phases —
  ``(key, pmod(salt_col, S))`` then ``key`` — so a Zipf-head queue's rows
  arrive at the final window pre-pruned to ``<= S * k`` from S different
  shuffle partitions (explicit hot-key salting per the north star), while
  the output stays exactly the global per-key top-k (any row of the true
  top-k is in its salt's top-k).

Used by the crawl engine's burst selection (plans/crawl_job.py) and
exposed directly for driver-verified scheduling queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_queue(df: DataFrame, key_cols: list[str],
                    order_cols: list[Column], k: int,
                    rank_col: str = "rn", salt_col: str | None = None,
                    salt_count: int = 1) -> DataFrame:
    """Per-key priority top-k with WindowGroupLimit pushdown and optional
    two-phase salting.  ``rank_col`` is the 1-based priority rank."""
    if salt_count > 1 and salt_col is not None:
        w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
        df = (df.withColumn("_salt", F.pmod(F.col(salt_col),
                                            F.lit(salt_count)))
              .withColumn("_srn", F.row_number().over(w1))
              .where(F.col("_srn") <= k)
              .drop("_srn", "_salt"))
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .where(F.col(rank_col) <= k))
