"""Scope DecideRule fold goldens (SURVEY §2.D / §5.2) — S1-S9 incl. the
OnHosts/OnDomains set rules (S5) and MatchesRegExp accept/reject (S6),
with Python-oracle ↔ Spark-expression parity on every case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.config import CrawlConfig
from heritrix_spark.operators.scope import scope_accepts_expr, scope_accepts_py

BASE = CrawlConfig(max_link_hops=3, max_trans_hops=2, max_path_segments=4,
                   pathological_repeats=2)

# (case_id, cfg, url, hops_path, expected)
GOLDEN = [
    # scheme gate
    ("scheme_http", BASE, "http://a.example.test/x", "L", True),
    ("scheme_dns", BASE, "dns:a.example.test", "L", True),
    ("scheme_ftp", BASE, "ftp://a.example.test/x", "L", False),
    ("scheme_junk", BASE, "not a url", "L", False),
    # S9 prerequisite accept beats everything
    ("prereq_bad_scheme", BASE, "mailto:x@y", "LLP", True),
    ("prereq_deep", BASE, "http://a.example.test/1/2/3/4/5/6", "P", True),
    # S2 link hops
    ("hops_at_max", BASE, "http://a.example.test/x", "LLL", True),
    ("hops_over", BASE, "http://a.example.test/x", "LLLL", False),
    ("hops_embeds_not_counted", BASE, "http://a.example.test/x",
     "LLLEE", True),
    # S3 transclusion tail
    ("tail_at_max", BASE, "http://a.example.test/x", "LEX", True),
    ("tail_over", BASE, "http://a.example.test/x", "LEXR", False),
    # S7 pathological path
    ("patho_three_repeats", BASE, "http://a.example.test/x/x/x/y", "L",
     False),
    ("patho_two_ok", BASE, "http://a.example.test/x/x/y", "L", True),
    ("patho_prefix_clean", BASE, "http://a.example.test/ab/abx", "L", True),
    # S8 path depth
    ("depth_at_max", BASE, "http://a.example.test/1/2/3/4", "L", True),
    ("depth_over", BASE, "http://a.example.test/1/2/3/4/5", "L", False),
    # S4 SURT prefix scope
    ("surt_member", CrawlConfig(surt_prefixes=("http://(test,example,",)),
     "http://a.example.test/x", "L", True),
    ("surt_nonmember", CrawlConfig(surt_prefixes=("http://(test,example,",)),
     "http://a.other.org/x", "L", False),
    ("surt_dns_bypass", CrawlConfig(surt_prefixes=("http://(test,example,",)),
     "dns:a.other.org", "L", True),
    # S5 OnHostsDecideRule
    ("onhost_member", CrawlConfig(on_hosts=("a.example.test",)),
     "http://a.example.test/x", "L", True),
    ("onhost_nonmember", CrawlConfig(on_hosts=("a.example.test",)),
     "http://b.example.test/x", "L", False),
    # S5 OnDomainsDecideRule (domain itself + subdomains, not lookalikes)
    ("ondomain_sub", CrawlConfig(on_domains=("example.test",)),
     "http://deep.a.example.test/x", "L", True),
    ("ondomain_exact", CrawlConfig(on_domains=("example.test",)),
     "http://example.test/x", "L", True),
    ("ondomain_lookalike", CrawlConfig(on_domains=("example.test",)),
     "http://notexample.test/x", "L", False),
    # S4+S5 union semantics: either membership admits
    ("union_surt_or_host",
     CrawlConfig(surt_prefixes=("http://(org,other,",),
                 on_hosts=("a.example.test",)),
     "http://a.example.test/x", "L", True),
    # S6 MatchesRegExpDecideRule reject
    ("regex_reject", CrawlConfig(reject_regex=r"\.(?:jpe?g|gif)$"),
     "http://a.example.test/pic.jpeg", "L", False),
    ("regex_reject_nonmatch", CrawlConfig(reject_regex=r"\.(?:jpe?g|gif)$"),
     "http://a.example.test/page", "L", True),
    # S6 URIRegExpFilter include mode
    ("regex_accept", CrawlConfig(accept_regex=r"/img\d+"),
     "http://a.example.test/img42", "L", True),
    ("regex_accept_nonmatch", CrawlConfig(accept_regex=r"/img\d+"),
     "http://a.example.test/page", "L", False),
]


@pytest.mark.parametrize("case_id,cfg,url,hops,expected",
                         GOLDEN, ids=[g[0] for g in GOLDEN])
def test_scope_py_golden(case_id, cfg, url, hops, expected):
    got = scope_accepts_py(cfg, url, hops, sorted(cfg.surt_prefixes))
    assert got == expected, f"{case_id}: py fold gave {got}"


def test_scope_expr_matches_py(spark):
    """One DataFrame pass per distinct cfg: expr fold ≡ py fold ≡ golden."""
    by_cfg: dict[int, tuple[CrawlConfig, list]] = {}
    for case_id, cfg, url, hops, expected in GOLDEN:
        by_cfg.setdefault(id(cfg), (cfg, []))[1].append(
            (case_id, url, hops, expected))
    for cfg, rows in by_cfg.values():
        df = spark.createDataFrame(
            rows, "case_id string, url string, hops string, expected boolean")
        out = df.select(
            "case_id", "expected",
            scope_accepts_expr(cfg, F.col("url"),
                               F.col("hops")).alias("got")).collect()
        for r in out:
            assert r["got"] == r["expected"], (
                f"{r['case_id']}: expr fold gave {r['got']}")
