"""Scope / admission predicates — the DecideRule fold (SURVEY §2.D).

Heritrix parity (class anchors): ``org/archive/crawler/deciderules/
DecideRule.java`` + ``DecidingScope.java`` (ordered ACCEPT/REJECT/PASS fold,
last non-PASS wins), ``PrerequisiteAcceptDecideRule``, ``TooManyHopsDecideRule``
(counts L hops), ``TransclusionDecideRule`` (trailing E/X/R/P tail bound),
``SurtPrefixedDecideRule``, ``PathologicalPathDecideRule`` (consecutive
repeated segments), ``TooManyPathSegmentsDecideRule``.

The fold here is normative and *shared*: ``scope_accepts_py`` (oracle) and
``scope_accepts_expr`` (engine) evaluate the same ordered rules with the
same regex patterns (Java and Python dialects agree for every pattern
used — backreference + lookahead only), so parity is by construction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from heritrix_spark.config import CrawlConfig
from heritrix_spark.functions.canonicalize import path_expr, path_of_py
from heritrix_spark.functions.hops import (
    link_hops_expr,
    link_hops_py,
    trans_tail_expr,
    trans_tail_py,
)
from heritrix_spark.functions.surt import (
    surt_expr,
    surt_prefix_member_expr,
    surt_prefix_member_py,
    surt_py,
)

_SCHEME_RE = r"(?i)^(https?://|dns:)"


def pathological_pattern(repeats: int) -> str:
    """Path contains the same segment > ``repeats`` times consecutively.

    Boundary-anchored so a repeated *prefix* of a longer segment never
    matches (``/ab/abx`` is clean).  Same pattern string drives Python
    ``re.search`` and Spark ``rlike`` (Java regex) — both support the
    backreference + lookahead used here.
    """
    return r"/([^/]+)(/\1){%d}(?=/|$)" % repeats


def scope_accepts_py(cfg: CrawlConfig, url: str, hops_path: str,
                     sorted_prefixes: list[str]) -> bool:
    if hops_path.endswith("P"):
        return True  # PrerequisiteAcceptDecideRule
    if not re.match(_SCHEME_RE, url):
        return False
    if sorted_prefixes and not url.lower().startswith("dns:"):
        if not surt_prefix_member_py(surt_py(url), sorted_prefixes):
            return False
    if link_hops_py(hops_path) > cfg.max_link_hops:
        return False
    if trans_tail_py(hops_path) > cfg.max_trans_hops:
        return False
    path = path_of_py(url)
    if len([s for s in path.split("/") if s]) > cfg.max_path_segments:
        return False
    if re.search(pathological_pattern(cfg.pathological_repeats), path):
        return False
    return True


def scope_accepts_expr(cfg: CrawlConfig, url: Column,
                       hops_path: Column) -> Column:
    """Column form of the fold — all built-in, whole-stage-codegen'd."""
    path = path_expr(url)
    nsegs = F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))
    ok = (
        url.rlike(_SCHEME_RE)
        & (link_hops_expr(hops_path) <= F.lit(cfg.max_link_hops))
        & (trans_tail_expr(hops_path) <= F.lit(cfg.max_trans_hops))
        & (nsegs <= F.lit(cfg.max_path_segments))
        & ~path.rlike(pathological_pattern(cfg.pathological_repeats))
    )
    if cfg.surt_prefixes:
        member = surt_prefix_member_expr(surt_expr(url),
                                         sorted(cfg.surt_prefixes))
        ok = ok & (F.lower(url).startswith("dns:") | member)
    return hops_path.endswith("P") | ok
