"""URL-seen filter — the exact ``distinct`` operator (UriUniqFilter family).

Heritrix parity (class anchors): ``org/archive/crawler/datamodel/
UriUniqFilter.java`` (add/note/forget/count contract),
``crawler/util/BdbUriUniqFilter.java`` (exact fingerprint set; createKey
packs an authority hash in the top bits for B-tree locality — here the
locality trick becomes hash partitioning on ``url_fp``),
``BloomUriUniqFilter.java`` (probabilistic prefilter; its false positives
silently drop URLs, which the north_rule forbids — so the bloom here is a
*prefilter only*, always backed by the exact anti-join),
``MemUriUniqFilter`` / ``FPMergeUriUniqFilter`` (intra-batch dedup ≙
``dropDuplicates`` / first-arrival window).

API is set-at-a-time: a ``SeenFilter`` holds the seen DataFrame and exposes
``add_batch`` (returns the previously-unseen survivors, updates the set),
``note_batch`` (mark seen without emitting — journal replay semantics),
``forget`` and ``count``.  The engine's candidate pipeline inlines the same
anti-join; this module is the standalone, reference-test-mirroring surface
(tests/test_uniq.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from heritrix_spark.functions.fingerprint import hash_str_py, url_fp_expr


def with_fp(df: DataFrame, canon_col: str = "canon_url") -> DataFrame:
    return df.withColumn("url_fp", url_fp_expr(F.col(canon_col)))


def dedup_first_arrival(df: DataFrame, order_cols: list[str],
                        canon_col: str = "canon_url") -> DataFrame:
    """Intra-batch dedup keeping the first arrival (MemUriUniqFilter)."""
    w = Window.partitionBy(canon_col).orderBy(*order_cols)
    return (df.withColumn("_dup", F.row_number().over(w))
            .where(F.col("_dup") == 1).drop("_dup"))


class SeenFilter:
    """Exact URL-seen set with optional bloom prefilter.

    The bloom path (``use_bloom=True``) builds a driver-side bloom filter
    over the seen fingerprints and applies it as a cheap prefilter *before*
    the exact anti-join — candidates failing the bloom are definitely
    unseen and skip the join; candidates passing it are verified exactly.
    Net effect: identical output to the exact set (never inherits bloom
    false-positive drops), less anti-join input.  Spark's AQE runtime
    bloom-filter join (enabled in session.py) does the same thing
    adaptively; this explicit variant exists for parity with
    BloomUriUniqFilter and for clusters without AQE.
    """

    def __init__(self, spark, seen: DataFrame | None = None,
                 use_bloom: bool = False,
                 bloom_expected: int = 1_000_000, bloom_fpp: float = 0.03):
        self.spark = spark
        self.seen = seen if seen is not None else spark.createDataFrame(
            [], "url_fp long, canon_url string")
        self.use_bloom = use_bloom
        self.bloom_expected = bloom_expected
        self.bloom_fpp = bloom_fpp

    def count(self) -> int:
        return self.seen.count()

    _BLOOM_K = 4

    def _bloom_positions(self, fp, m: int):
        """k bit positions per fingerprint — same xxhash64 derivation in
        the JVM build path and the Python probe path."""
        return [F.pmod(F.xxhash64(F.concat_ws(
            ":", F.lit(str(i)), fp.cast("string"))), F.lit(m))
            for i in range(self._BLOOM_K)]

    def _split_by_bloom(self, batch: DataFrame):
        """(maybe_seen, definitely_new) according to the bloom prefilter.

        The bit array is built with one JVM-side distinct-positions pass
        over the seen fingerprints (PySpark 4 no longer exposes
        df.stat.bloomFilter) and broadcast as a numpy bool array; the
        probe is an Arrow-batched pandas UDF using the bit-exact Python
        xxhash64 mirror.
        """
        n = max(self.bloom_expected, 1024)
        m = max(1 << math.ceil(math.log2(
            -n * math.log(self.bloom_fpp) / (math.log(2) ** 2))), 1024)
        pos_rows = (self.seen.select(F.explode(F.array(
            *self._bloom_positions(F.col("url_fp"), m))).alias("p"))
            .distinct().collect())
        bits = np.zeros(m, dtype=bool)
        bits[[r["p"] for r in pos_rows]] = True
        b = self.spark.sparkContext.broadcast(bits)
        k = self._BLOOM_K

        @F.pandas_udf(T.BooleanType())
        def might_contain(fps: pd.Series) -> pd.Series:
            blm = b.value
            mm = len(blm)
            return fps.map(lambda v: all(
                blm[hash_str_py(str(i), str(int(v))) % mm]
                for i in range(k)))

        flagged = batch.withColumn("_maybe", might_contain(F.col("url_fp")))
        return (flagged.where(F.col("_maybe")).drop("_maybe"),
                flagged.where(~F.col("_maybe")).drop("_maybe"))

    def filter_unseen(self, batch: DataFrame,
                      canon_col: str = "canon_url") -> DataFrame:
        """Rows of ``batch`` whose canonical URL is not in the seen set."""
        if self.use_bloom and self.count() > 0:
            maybe, new = self._split_by_bloom(batch)
            verified = maybe.join(self.seen.select(canon_col),
                                  canon_col, "left_anti")
            return new.unionByName(verified)
        return batch.join(self.seen.select(canon_col), canon_col, "left_anti")

    def add_batch(self, batch: DataFrame,
                  canon_col: str = "canon_url") -> DataFrame:
        """UriUniqFilter.add — emit unseen survivors and mark them seen."""
        fresh = self.filter_unseen(batch, canon_col).localCheckpoint()
        self.seen = self.seen.unionByName(
            fresh.select("url_fp", canon_col)).localCheckpoint()
        return fresh

    def note_batch(self, batch: DataFrame,
                   canon_col: str = "canon_url") -> None:
        """UriUniqFilter.note — mark seen without emitting (replay)."""
        fresh = self.filter_unseen(batch, canon_col)
        self.seen = self.seen.unionByName(
            fresh.select("url_fp", canon_col)).localCheckpoint()

    def forget(self, canon_urls: list[str]) -> None:
        gone = self.spark.createDataFrame(
            [(u,) for u in canon_urls], "canon_url string")
        self.seen = self.seen.join(gone, "canon_url",
                                   "left_anti").localCheckpoint()
