"""Fingerprint tests — pure-Python XXH64 must be bit-exact with Spark's
``xxhash64`` (seed 42) on UTF-8 string input, across length regimes
(<4, <8, <32, ≥32 bytes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.functions.fingerprint import hash_str_py, url_fp_py

CASES = [
    "",
    "a",
    "abc",
    "abcd",
    "abcdefg",
    "abcdefgh",
    "http://example.com/",
    "http://h0001.example.test/p/0/img00000001",
    "x" * 31,
    "y" * 32,
    "z" * 100,
    "héllo wörld — unicode ✓",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    rows = df.select(F.xxhash64("s").alias("h")).collect()
    for s, row in zip(CASES, rows):
        assert url_fp_py(s) == row.h, f"xxh64 mismatch for {s!r}"


def test_hash_str_matches_spark_concat(spark):
    df = spark.createDataFrame([("out", "12", "3")], ["a", "b", "c"])
    row = df.select(F.xxhash64(F.concat_ws(":", "a", "b", "c")).alias("h")).collect()[0]
    assert hash_str_py("out", "12", "3") == row.h
