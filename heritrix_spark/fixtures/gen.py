"""Fixture materialization — the ``images`` table + robots/host config.

Writes parquet (the sandbox stand-in for the Iceberg ``images`` input table
fixed by BASELINE.json input_hint):

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash long)

Payload bytes use the deterministic engine codec
(:mod:`heritrix_spark.functions.imagecodec`) — lossless for png, quantized
lossy (PSNR≈46dB) for jpeg.  ``with_payload=False`` scales (small/bench):
bytes=NULL and phash is a hash-derived surrogate; the payload-invariant
tests run on the tiny fixture where bytes are real.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from heritrix_spark.fixtures import websim
from heritrix_spark.fixtures.websim import FixtureSpec, _u
from heritrix_spark.functions import imagecodec

_ADJ = [
    "amber", "ancient", "arc", "bold", "brisk", "calm", "cedar", "clear",
    "cobalt", "crisp", "dappled", "deep", "dusky", "eager", "early", "faded",
    "fleet", "frosty", "gentle", "gilded", "glassy", "golden", "grand",
    "hazy", "hidden", "humble", "icy", "ivory", "jade", "keen", "late",
    "lively", "lone", "lucid", "mellow", "misty", "mossy", "noble", "north",
    "oaken", "pale", "plain", "proud", "quiet", "rapid", "rustic", "sage",
    "sandy", "sharp", "silent", "silver", "sleek", "slow", "smooth", "soft",
    "solar", "stark", "still", "stone", "swift", "tidal", "umber", "vivid",
    "wild",
]
_NOUN = [
    "anchor", "arch", "basin", "beacon", "bell", "bluff", "bridge", "brook",
    "canyon", "cape", "cliff", "cloud", "comet", "cove", "crane", "creek",
    "crest", "delta", "dune", "falls", "fern", "field", "fjord", "forest",
    "garden", "gate", "glacier", "glen", "grove", "harbor", "heath", "hill",
    "hollow", "island", "jetty", "knoll", "lagoon", "lake", "ledge", "marsh",
    "meadow", "mesa", "mill", "oasis", "orchard", "pass", "peak", "pier",
    "plain", "pond", "prairie", "quarry", "reef", "ridge", "river", "shore",
    "spring", "summit", "terrace", "trail", "valley", "vista", "wharf",
    "wood",
]


def caption_of(k: int) -> str:
    adj = _ADJ[_u("adj", k) % 64]
    noun = _NOUN[_u("noun", k) % 64]
    return f"caption for img{k:08d}: {adj} {noun} #{k % 977}"


def dims_of(k: int) -> tuple[int, int]:
    return 16 + _u("w", k) % 49, 16 + _u("h", k) % 49


def fmt_of(k: int) -> str:
    return "png" if k % 2 == 0 else "jpeg"


def surrogate_phash(k: int) -> int:
    v = _u("phash", k)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_row(k: int, with_payload: bool) -> dict:
    w, h = dims_of(k)
    fmt = fmt_of(k)
    if with_payload:
        px = imagecodec.gen_pixels(k, w, h)
        data = imagecodec.encode(px, fmt)
        ph = imagecodec.phash(imagecodec.decode(data))
    else:
        data, ph = None, surrogate_phash(k)
    return {
        "image_id": f"img{k:08d}", "bytes": data, "w": w, "h": h,
        "fmt": fmt, "caption": caption_of(k), "phash": ph,
    }


def images_df(spec: FixtureSpec) -> pd.DataFrame:
    rows = [image_row(k, spec.with_payload) for k in range(spec.n_images)]
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype(np.int32)
    df["h"] = df["h"].astype(np.int32)
    df["phash"] = df["phash"].astype(np.int64)
    return df


def robots_df(spec: FixtureSpec) -> pd.DataFrame:
    rows = websim.robots_rules(spec)
    return pd.DataFrame(rows, columns=["host", "path_prefix", "allow",
                                       "rule_order"])


def host_config_df(spec: FixtureSpec) -> pd.DataFrame:
    delays = websim.crawl_delays(spec)
    return pd.DataFrame(
        {"host": list(delays), "crawl_delay_ms": list(delays.values())}
    ).astype({"crawl_delay_ms": np.int64})


def spark_images_df(spark, spec: FixtureSpec):
    """Metadata-only ``images`` generated JVM-side (bench corpus: 10^6+
    rows in seconds).  Mirrors :func:`image_row` with ``with_payload=False``
    exactly (same xxhash64 derivations) — parity-tested in
    tests/test_fixtures.py."""
    from pyspark.sql import functions as F

    def x(tag):
        return F.xxhash64(F.concat_ws(":", F.lit(tag),
                                      F.col("k").cast("string")))

    adj = F.array(*[F.lit(a) for a in _ADJ])
    noun = F.array(*[F.lit(n) for n in _NOUN])
    return (
        spark.range(spec.n_images).select(F.col("id").alias("k"))
        .select(
            F.format_string("img%08d", F.col("k")).alias("image_id"),
            F.lit(None).cast("binary").alias("bytes"),
            (F.lit(16) + F.pmod(x("w"), F.lit(49))).cast("int").alias("w"),
            (F.lit(16) + F.pmod(x("h"), F.lit(49))).cast("int").alias("h"),
            F.when(F.pmod(F.col("k"), F.lit(2)) == 0, "png")
            .otherwise("jpeg").alias("fmt"),
            F.format_string(
                "caption for img%08d: %s %s #%d", F.col("k"),
                F.element_at(adj, (F.pmod(x("adj"), F.lit(64)) + 1)
                             .cast("int")),
                F.element_at(noun, (F.pmod(x("noun"), F.lit(64)) + 1)
                             .cast("int")),
                F.pmod(F.col("k"), F.lit(977))).alias("caption"),
            x("phash").alias("phash"),
        )
    )


def write_fixture(spec: FixtureSpec, out_dir: str) -> dict[str, str]:
    """Write images/robots/host_config parquet; returns table→path map."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in [
        ("images", images_df(spec)),
        ("robots", robots_df(spec)),
        ("host_config", host_config_df(spec)),
    ]:
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
