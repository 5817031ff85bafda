"""JVM/Python parity of the synthetic-web graph (extract.py vs websim.py).

The ordering-equivalence gate rests on the engine's pure-Spark extractor
producing byte-identical URLs/hops to the Python oracle's websim calls.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.fixtures import websim
from heritrix_spark.operators import extract

SPEC = websim.SPECS["small"]
N_CHECK = 400


def test_url_of_parity(spark):
    df = spark.range(N_CHECK).select(
        F.col("id").alias("k"),
        extract.url_of_expr(F.col("id"), SPEC.n_hosts).alias("url"),
    )
    got = {r["k"]: r["url"] for r in df.collect()}
    for k in range(N_CHECK):
        assert got[k] == websim.url_of(k, SPEC.n_hosts), k


def test_image_id_roundtrip(spark):
    df = spark.range(N_CHECK).select(
        F.col("id").alias("k"),
        extract.image_id_expr(
            extract.url_of_expr(F.col("id"), SPEC.n_hosts)).alias("kk"),
    )
    for r in df.collect():
        assert r["kk"] == r["k"]


def test_outlinks_parity(spark):
    parents = spark.range(N_CHECK).select(
        extract.url_of_expr(F.col("id"), SPEC.n_hosts).alias("url"),
        F.lit("LL").alias("hops_path"),
    )
    rows = extract.outlinks_of(parents, SPEC).select(
        "via", "link_idx", "url", "hop", "hops_path").collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["via"], []).append(r)
    n_pages_with_links = 0
    for k in range(N_CHECK):
        purl = websim.url_of(k, SPEC.n_hosts)
        expected = websim.outlinks(k, SPEC)
        have = sorted(got.get(purl, []), key=lambda r: r["link_idx"])
        assert len(have) == len(expected), (k, purl)
        for r, (eurl, ehop) in zip(have, expected):
            assert r["url"] == eurl, (k, r["link_idx"])
            assert r["hop"] == ehop
            assert r["hops_path"] == "LL" + ehop
        if expected:
            n_pages_with_links += 1
    assert n_pages_with_links > N_CHECK // 2  # traps are a small minority


def test_variant_and_trap_rates(spark):
    spec = websim.SPECS["bench"]
    parents = spark.range(20_000).select(
        extract.url_of_expr(F.col("id"), spec.n_hosts).alias("url"),
        F.lit("").alias("hops_path"),
    )
    links = extract.outlinks_of(parents, spec).cache()
    n = links.count()
    n_var = links.where(
        F.col("url").rlike(r"www\.|jsessionid|\?$|user@")).count()
    assert 0.03 < n_var / n < 0.08  # ~5% duplicate variants
    traps = spark.range(20_000).where(
        extract.is_trap_expr(F.col("id"))).count()
    assert 0.01 < traps / 20_000 < 0.04  # ~2% calendar traps
    links.unpersist()


def test_host_skew(spark):
    """Hot-host skew: host 0 must dominate (north_rule requirement)."""
    spec = websim.SPECS["bench"]
    counts = (
        spark.range(50_000)
        .select(extract.host_index_expr(F.col("id"), spec.n_hosts).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).limit(3).collect()
    )
    assert counts[0]["h"] == 0
    # >2% of all traffic on one host of 1000 = >20x the uniform share
    assert counts[0]["count"] > 50_000 * 0.02
