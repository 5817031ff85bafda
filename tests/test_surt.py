"""SURT tests — mirrors SURTTest / SurtPrefixSetTest shapes; asserts
python↔Spark parity and both membership implementations agree."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.functions.surt import (
    make_surt_prefix_member_udf,
    surt_expr,
    surt_prefix_member_expr,
    surt_prefix_member_py,
    surt_prefix_py,
    surt_py,
)

CASES = [
    ("http://www.example.com/path", "http://(com,example,www,)/path"),
    ("http://example.com/", "http://(com,example,)/"),
    ("http://A.B.example.COM:8080/x?q=1", "http://(com,example,b,a,):8080/x?q=1"),
    ("https://h0001.example.test/p/0/img1", "https://(test,example,h0001,)/p/0/img1"),
    ("dns:example.com", "dns:example.com"),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_surt_py(url, expected):
    assert surt_py(url) == expected


def test_surt_spark_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    rows = df.select(surt_expr(F.col("url")).alias("s")).collect()
    for (url, expected), row in zip(CASES, rows):
        assert row.s == expected, url


def test_surt_prefix():
    assert surt_prefix_py("http://h1.example.test/p/9/x") == "http://(test,example,h1,)/"
    assert surt_prefix_py("http://e.com:8080/a") == "http://(com,e,):8080/"


def test_membership_all_impls_agree(spark):
    prefixes = [
        "http://(test,example,h0001,)/",
        "http://(test,example,h0002,)/",
        "http://(com,foo,)/bar/",
    ]
    surts = [
        "http://(test,example,h0001,)/p/0/img1",   # member
        "http://(test,example,h0003,)/p/0/img1",   # not
        "http://(com,foo,)/bar/baz",               # member (path prefix)
        "http://(com,foo,)/qux",                   # not
        "http://(test,example,h0002,)/",           # exact
    ]
    expected = [True, False, True, False, True]
    sp = sorted(prefixes)
    assert [surt_prefix_member_py(s, sp) for s in surts] == expected

    df = spark.createDataFrame([(s,) for s in surts], ["surt"])
    rows = df.select(surt_prefix_member_expr(F.col("surt"), prefixes).alias("m")).collect()
    assert [r.m for r in rows] == expected

    udf = make_surt_prefix_member_udf(spark, prefixes)
    rows = df.select(udf(F.col("surt")).alias("m")).collect()
    assert [r.m for r in rows] == expected
