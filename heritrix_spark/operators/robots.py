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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_RULE_SCHEMA = ("host string, path_prefix string, allow boolean, "
                      "rule_order int, crawl_delay_ms long")


def parse_robots_txt(text: str, agent: str = "heritrix") -> tuple[
        list[tuple[str, bool]], int | None]:
    """Parse robots.txt text into ordered (path_prefix, allow) rules for
    ``agent`` plus its Crawl-delay in ms (None if absent).

    Classic-honoring semantics (``Robotstxt.java`` + RobotsExclusionPolicy
    "classic" mode, class-level anchors — reference dir empty at build
    time): line-oriented; ``#`` comments stripped; consecutive
    ``User-agent`` lines open a group; the best group is the one whose
    agent token is a substring of ``agent`` with the longest token
    (``*`` matches anything, lowest specificity); empty ``Disallow:``
    means allow-all; rules keep file order (the engine's longest-prefix
    matcher resolves conflicts, R2)."""
    groups: list[tuple[list[str], list[tuple[str, bool]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: int | None = None
    in_agents = False

    def close():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents:
                close()
            in_agents = True
            cur_agents.append(val.lower())
        else:
            in_agents = False
            if key == "disallow":
                if val:
                    cur_rules.append((val, False))
                else:  # empty Disallow = allow all
                    cur_rules.append(("/", True))
            elif key == "allow" and val:
                cur_rules.append((val, True))
            elif key == "crawl-delay":
                try:
                    cur_delay = int(float(val) * 1000)
                except ValueError:
                    pass
    close()

    agent_l = agent.lower()
    best: tuple[int, list[tuple[str, bool]], int | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a in agent_l:
                spec = 1 + len(a)
            else:
                continue
            if best is None or spec > best[0]:
                best = (spec, rules, delay)
    if best is None:
        return [], None
    return best[1], best[2]


def rules_from_robots_texts(texts: DataFrame, agent: str = "heritrix",
                            host_col: str = "host",
                            text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) rows → the ``robots_rules`` table (R1 feeding
    R2): Arrow-batched ``mapInPandas``; parsing is per-document by nature
    (like payload decode), everything around it stays columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, text in zip(pdf[host_col].to_numpy(),
                                  pdf[text_col].to_numpy()):
                rules, delay = parse_robots_txt(text or "", agent)
                for i, (prefix, allow) in enumerate(rules):
                    out.append((host, prefix, allow, i, delay))
                if not rules and delay is not None:
                    out.append((host, None, None, None, delay))
            yield pd.DataFrame(out, columns=[
                "host", "path_prefix", "allow", "rule_order",
                "crawl_delay_ms"])

    return texts.mapInPandas(run, ROBOTS_RULE_SCHEMA)


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
