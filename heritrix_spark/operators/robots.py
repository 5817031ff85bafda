"""Robots exclusion — per-host longest-prefix-match admission predicate.

Heritrix parity (class anchors): ``org/archive/crawler/datamodel/
Robotstxt.java`` (parsed rules), ``RobotsExclusionPolicy.java``
(``disallows(path)`` = longest matching Allow/Disallow prefix wins),
``prefetch/PreconditionEnforcer.java`` (enforcement before fetch,
S_ROBOTS_PRECLUDED).  robots.txt itself is always fetchable.

Engine shape: the rules table (host, path_prefix, allow, rule_order) is
aggregated to one ``array<struct<prefix, allow>>`` row per host and
broadcast-joined to the batch; the longest-prefix match is a JVM-side
higher-order-function expression (filter → transform → array_max), no UDF.
Enforcement is time-independent (rules come from the static fixture table;
the timed robots.txt prerequisite fetch models ordering/politeness cost) —
a documented, strictly-safer simplification shared with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rules_per_host(robots_df: DataFrame) -> DataFrame:
    """(host, path_prefix, allow, rule_order) → (host, robots_rules array)."""
    return robots_df.groupBy("host").agg(
        F.collect_list(
            F.struct(F.col("path_prefix").alias("prefix"),
                     F.col("allow").alias("allow"))
        ).alias("robots_rules")
    )


def join_rules(batch: DataFrame, rules: DataFrame) -> DataFrame:
    """Broadcast-join the per-host rule arrays onto a batch with ``host``."""
    return batch.join(F.broadcast(rules), on="host", how="left")


def disallowed_expr(path: Column, rules: Column) -> Column:
    """Longest-prefix-match verdict; false when no rule matches / no rules."""
    matched = F.filter(rules, lambda r: path.startswith(r["prefix"]))
    best = F.array_max(F.transform(
        matched, lambda r: F.struct(F.length(r["prefix"]).alias("l"),
                                    r["allow"].alias("allow"))))
    return (
        (path != F.lit("/robots.txt"))
        & rules.isNotNull()
        & (F.size(matched) > 0)
        & ~best["allow"]
    )
