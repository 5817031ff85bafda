"""Pluggable fetcher seam (T2): the HttpFetcher's Spark plumbing is real
(schema, Arrow batching, per-partition execution, error mapping) with an
injected deterministic transport; the network boundary itself is the only
stub in the container."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark import config as C
from heritrix_spark.operators.fetch import (
    FETCH_RESULT_SCHEMA,
    HttpFetcher,
    SimulatedCorpusFetcher,
    status_of_code,
)


def test_http_fetcher_plumbing(spark):
    def _fake_transport(url: str) -> tuple:
        # Deterministic: /ok/ → 200+body, /gone/ → 404, /flaky/ → 503,
        # /boom/ → transport exception (mapped to -1 by the fetcher).
        # (A closure, so cloudpickle ships it by VALUE — the tests
        # module isn't importable on executors.)
        if "/boom/" in url:
            raise ConnectionError("synthetic transport failure")
        if "/gone/" in url:
            return 404, "text/html", None, 12
        if "/flaky/" in url:
            return 503, None, None, 40
        return 200, "image/png", url.encode()[::-1], 7

    kinds = ["ok", "gone", "flaky", "boom"]
    burst = spark.range(400).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_fp"),
        F.format_string("http://h%d.example.test/%s/%d",
                        F.pmod(F.col("id"), F.lit(7)).cast("int"),
                        F.element_at(
                            F.array(*[F.lit(k) for k in kinds]),
                            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int")),
                        F.col("id")).alias("url")).repartition(8)
    out = HttpFetcher(transport=_fake_transport).fetch(burst)
    assert out.schema == FETCH_RESULT_SCHEMA
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 400
    ok = next(r for u, r in rows.items() if "/ok/" in u)
    assert ok["status_code"] == 200
    assert ok["payload"] == ok["url"].encode()[::-1]
    assert ok["content_type"] == "image/png"
    assert all(r["status_code"] == 404
               for u, r in rows.items() if "/gone/" in u)
    assert all(r["status_code"] == -1 and r["payload"] is None
               for u, r in rows.items() if "/boom/" in u)
    # Engine status law mapping.
    mapped = {r["url"]: r["st"] for r in out.select(
        "url", status_of_code(F.col("status_code")).alias("st")).collect()}
    for u, st in mapped.items():
        want = (C.S_OK if "/ok/" in u else C.S_NOT_FOUND if "/gone/" in u
                else C.S_RETRY)
        assert st == want, u


def test_http_fetcher_default_transport_raises(spark):
    burst = spark.createDataFrame(
        [(1, "http://x.test/")], "url_fp long, url string")
    with pytest.raises(Exception) as ei:
        HttpFetcher().fetch(burst).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_simulated_corpus_fetcher_payload_join(spark):
    images = spark.createDataFrame(
        [("img00000001", b"\x01\x02"), ("img00000002", b"\x03")],
        "image_id string, bytes binary")
    fetched = spark.createDataFrame(
        [("img00000001",), ("img00000009",)], "image_id string")
    out = {r["image_id"]: r["bytes"] for r in
           SimulatedCorpusFetcher(images).attach_payload(fetched).collect()}
    assert out["img00000001"] == b"\x01\x02"
    assert out["img00000009"] is None
