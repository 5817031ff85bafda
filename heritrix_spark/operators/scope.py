"""Scope / admission predicates — the DecideRule fold (SURVEY §2.D).

Heritrix parity (class anchors): ``org/archive/crawler/deciderules/
DecideRule.java`` + ``DecidingScope.java`` (ordered ACCEPT/REJECT/PASS fold,
last non-PASS wins), ``PrerequisiteAcceptDecideRule``, ``TooManyHopsDecideRule``
(counts L hops), ``TransclusionDecideRule`` (trailing E/X/R/P tail bound),
``SurtPrefixedDecideRule``, ``OnHostsDecideRule`` / ``OnDomainsDecideRule``
(host / domain-suffix set membership), ``MatchesRegExpDecideRule`` +
``URIRegExpFilter`` (regex accept/reject), ``PathologicalPathDecideRule``
(consecutive repeated segments), ``TooManyPathSegmentsDecideRule``.

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
from heritrix_spark.functions.canonicalize import (
    host_of_py,
    path_expr,
    path_of_py,
)
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


def _host_in_sets_py(cfg: CrawlConfig, host: str) -> bool:
    """OnHosts / OnDomains membership (S5)."""
    if host in cfg.on_hosts:
        return True
    return any(host == d or host.endswith("." + d) for d in cfg.on_domains)


def scope_accepts_py(cfg: CrawlConfig, url: str, hops_path: str,
                     sorted_prefixes: list[str]) -> bool:
    if hops_path.endswith("P"):
        return True  # PrerequisiteAcceptDecideRule
    if not re.match(_SCHEME_RE, url):
        return False
    if ((sorted_prefixes or cfg.on_hosts or cfg.on_domains)
            and not url.lower().startswith("dns:")):
        member = bool(sorted_prefixes) and surt_prefix_member_py(
            surt_py(url), sorted_prefixes)
        if not member and not _host_in_sets_py(cfg, host_of_py(url)):
            return False
    if cfg.reject_regex and re.search(cfg.reject_regex, url):
        return False  # MatchesRegExpDecideRule (reject mode)
    if cfg.accept_regex and not re.search(cfg.accept_regex, url):
        return False  # URIRegExpFilter (include mode)
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
    from heritrix_spark.functions.canonicalize import host_expr

    path = path_expr(url)
    nsegs = F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))
    ok = (
        url.rlike(_SCHEME_RE)
        & (link_hops_expr(hops_path) <= F.lit(cfg.max_link_hops))
        & (trans_tail_expr(hops_path) <= F.lit(cfg.max_trans_hops))
        & (nsegs <= F.lit(cfg.max_path_segments))
        & ~path.rlike(pathological_pattern(cfg.pathological_repeats))
    )
    if cfg.reject_regex:
        # Java regex `rlike` is find()-semantics, same as re.search.
        ok = ok & ~url.rlike(cfg.reject_regex)
    if cfg.accept_regex:
        ok = ok & url.rlike(cfg.accept_regex)
    if cfg.surt_prefixes or cfg.on_hosts or cfg.on_domains:
        member = F.lit(False)
        if cfg.surt_prefixes:
            member = surt_prefix_member_expr(surt_expr(url),
                                             sorted(cfg.surt_prefixes))
        host = host_expr(url)
        for h in cfg.on_hosts:
            member = member | (host == F.lit(h))
        for d in cfg.on_domains:
            member = member | (host == F.lit(d)) | host.endswith("." + d)
        ok = ok & (F.lower(url).startswith("dns:") | member)
    return hops_path.endswith("P") | ok
