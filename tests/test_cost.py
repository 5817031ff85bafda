"""Cost-policy tests — mirrors the reference's CostAssignmentPolicy tests
(named by the north star); python↔Spark parity on a golden table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.functions.cost import (
    POLICIES_EXPR,
    POLICIES_PY,
    anticalendar_cost_py,
    unit_cost_py,
    wag_cost_py,
)

# (url, unit, wag, anticalendar) — committed golden values
GOLDEN = [
    ("http://e.com/", 1, 1, 1),
    ("http://e.com/a", 1, 2, 2),
    ("http://e.com/a/b/c", 1, 4, 4),
    ("http://e.com/a?x=1", 1, 4, 4),
    ("http://e.com/a?" + "x" * 64, 1, 6, 6),
    ("http://e.com/2026/08/16/post", 1, 5, 12),
    ("http://e.com/2026/08/", 1, 3, 10),
    ("http://e.com/a/2026/3/x", 1, 5, 12),
    ("http://e.com/v2026/08/", 1, 3, 3),  # not a pure date segment
]


@pytest.mark.parametrize("url,u,w,a", GOLDEN)
def test_cost_py_golden(url, u, w, a):
    assert unit_cost_py(url) == u
    assert wag_cost_py(url) == w, url
    assert anticalendar_cost_py(url) == a, url


def test_cost_spark_parity(spark):
    df = spark.createDataFrame([(u,) for u, *_ in GOLDEN], ["url"])
    sel = [POLICIES_EXPR[k](F.col("url")).alias(k) for k in ("unit", "wag", "anticalendar")]
    rows = df.select(*sel).collect()
    for (url, *_), row in zip(GOLDEN, rows):
        for k in ("unit", "wag", "anticalendar"):
            assert getattr(row, k) == POLICIES_PY[k](url), (url, k)
