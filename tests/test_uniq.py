"""UriUniqFilter-family semantics (SURVEY §2.B; mirrors BdbUriUniqFilterTest
/ BloomUriUniqFilterTest / MemUriUniqFilterTest shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.uniq import (
    SeenFilter,
    dedup_first_arrival,
    with_fp,
)


def _batch(spark, urls, order_start=0):
    rows = [(u, i + order_start) for i, u in enumerate(urls)]
    return with_fp(spark.createDataFrame(rows, "canon_url string, ord int"))


def test_add_emits_only_unseen(spark):
    f = SeenFilter(spark)
    first = f.add_batch(_batch(spark, ["http://a/1", "http://a/2"]))
    assert first.count() == 2
    second = f.add_batch(_batch(spark, ["http://a/2", "http://a/3"]))
    assert {r["canon_url"] for r in second.collect()} == {"http://a/3"}
    assert f.count() == 3


def test_note_marks_without_emitting(spark):
    f = SeenFilter(spark)
    f.note_batch(_batch(spark, ["http://a/1"]))
    assert f.count() == 1
    out = f.add_batch(_batch(spark, ["http://a/1", "http://a/2"]))
    assert {r["canon_url"] for r in out.collect()} == {"http://a/2"}


def test_forget(spark):
    f = SeenFilter(spark)
    f.add_batch(_batch(spark, ["http://a/1", "http://a/2"]))
    f.forget(["http://a/1"])
    assert f.count() == 1
    out = f.add_batch(_batch(spark, ["http://a/1"]))
    assert out.count() == 1


def test_intra_batch_dedup_first_arrival(spark):
    df = _batch(spark, ["http://a/1", "http://a/2", "http://a/1"])
    out = dedup_first_arrival(df, ["ord"])
    rows = {r["canon_url"]: r["ord"] for r in out.collect()}
    assert rows == {"http://a/1": 0, "http://a/2": 1}


def test_bloom_prefilter_never_drops(spark):
    """The north_rule property: bloom is a prefilter, never a decider —
    output must equal the exact filter's output exactly."""
    exact = SeenFilter(spark)
    bloom = SeenFilter(spark, use_bloom=True, bloom_expected=4096,
                       bloom_fpp=0.5)  # deliberately high-FP bloom
    seed = [f"http://h/{i}" for i in range(200)]
    exact.add_batch(_batch(spark, seed))
    bloom.add_batch(_batch(spark, seed))
    probe = [f"http://h/{i}" for i in range(150, 350)]
    got_e = {r["canon_url"]
             for r in exact.add_batch(_batch(spark, probe)).collect()}
    got_b = {r["canon_url"]
             for r in bloom.add_batch(_batch(spark, probe)).collect()}
    assert got_e == got_b == {f"http://h/{i}" for i in range(200, 350)}


def test_fp_matches_python_mirror(spark):
    from heritrix_spark.functions.fingerprint import url_fp_py
    df = _batch(spark, ["http://example.test/x", "dns:example.test"])
    for r in df.collect():
        assert r["url_fp"] == url_fp_py(r["canon_url"])
