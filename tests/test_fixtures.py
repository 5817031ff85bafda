"""Fixture determinism + Spark/pandas generator parity."""

from __future__ import annotations

import numpy as np

from heritrix_spark.fixtures import gen, websim
from heritrix_spark.functions import imagecodec


def test_spark_images_matches_pandas(spark):
    spec = websim.FixtureSpec("par", 60, 10, False)
    pdf = gen.images_df(spec)
    sdf = gen.spark_images_df(spark, spec).orderBy("image_id").toPandas()
    for col in ["image_id", "w", "h", "fmt", "caption", "phash"]:
        assert list(pdf[col]) == list(sdf[col]), col


def test_codec_roundtrip_and_psnr():
    px = imagecodec.gen_pixels(7, 33, 21)
    loss = imagecodec.decode(imagecodec.encode(px, "png"))
    assert np.array_equal(px, loss)
    lossy = imagecodec.decode(imagecodec.encode(px, "jpeg"))
    assert 40.0 <= imagecodec.psnr(px, lossy) < np.inf
    assert imagecodec.psnr(px, px) == np.inf


def test_seeds_deterministic_and_on_first_hosts():
    spec = websim.SPECS["tiny"]
    s1, s2 = websim.seeds(spec), websim.seeds(spec)
    assert s1 == s2
    assert len(s1) == min(websim.N_SEED_HOSTS, spec.n_hosts)


def test_variant_canonicalizes_to_base():
    from heritrix_spark.functions.canonicalize import canonicalize_py
    spec = websim.SPECS["small"]
    n_var = 0
    for k in range(300):
        base = websim.url_of(k, spec.n_hosts)
        for j in range(6):
            v = websim.variant_of(base, k, j)
            if v != base:
                n_var += 1
                assert canonicalize_py(v) == canonicalize_py(base), (k, j, v)
    assert n_var > 10
