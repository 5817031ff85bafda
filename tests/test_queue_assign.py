"""Queue-assignment policy functions (F8) — py/expr parity goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.functions.queue_assign import (
    QUEUE_POLICIES,
    ip_of_host_py,
    queue_key_expr,
    queue_key_py,
    surt_authority_py,
)

URLS = [
    "http://h0000.example.test/p/0/img00000000",
    "http://h0001.example.test/cal/2026/01/02/img00000101",
    "https://secure.example.test:8443/x",
    "http://www.example.test/a",          # www NOT stripped for classKey
    "dns:h0002.example.test",
    "http://h0002.example.test/robots.txt",
    "http://single-label/x",
]


def test_queue_key_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    for policy in QUEUE_POLICIES:
        got = [r[0] for r in df.select(
            queue_key_expr(F.col("url"), policy, 8)).collect()]
        exp = [queue_key_py(u, policy, 8) for u in URLS]
        assert got == exp, f"policy={policy}: {got} != {exp}"


def test_policy_shapes():
    assert queue_key_py(URLS[0], "hostname") == "h0000.example.test"
    assert (queue_key_py(URLS[2], "hostname")
            == "secure.example.test:8443")
    assert (queue_key_py(URLS[0], "surt")
            == "test,example,h0000,")
    assert (queue_key_py(URLS[2], "surt")
            == "test,example,secure,:8443")
    assert surt_authority_py("single-label") == "single-label,"
    ip = queue_key_py(URLS[0], "ip")
    assert ip.startswith("10.") and ip.count(".") == 3
    bk = queue_key_py(URLS[0], "bucket", 8)
    assert bk.startswith("bucket-") and 0 <= int(bk[7:]) < 8


def test_host_colocation():
    """A host's dns:/robots prerequisites land in the same queue as its
    real URLs under every policy (they key on the URL's host)."""
    for policy in QUEUE_POLICIES:
        real = queue_key_py("http://h0002.example.test/p/1/img00000002",
                            policy, 8)
        assert queue_key_py("dns:h0002.example.test", policy, 8) == real
        assert queue_key_py("http://h0002.example.test/robots.txt",
                            policy, 8) == real


def test_ip_matches_host_state_answer():
    """The IP policy key IS the simulated FetchDNS answer that
    CrawlStateUpdater lands in host_state.ip."""
    from heritrix_spark.plans.crawl_job import ip_of_host

    assert ip_of_host("h0000.example.test") == ip_of_host_py(
        "h0000.example.test")
