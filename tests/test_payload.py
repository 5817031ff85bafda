"""Payload invariants (BASELINE.json input_hint): decoded-pixel equality
for lossless, PSNR >= 40 dB for lossy, caption equality — verified over the
engine's ``fetched`` table with a vectorized mapInPandas decode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.functions import imagecodec
from heritrix_spark.plans.crawl_job import CrawlJob


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("payload")
    spec = websim.SPECS["tiny"]
    paths = gen.write_fixture(spec, str(tmp / "fix"))
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())
    job = CrawlJob(
        spark, spec, cfg,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=str(tmp / "work"))
    job.schedule_seeds(websim.seeds(spec))
    job.run(15)
    return job


def test_fetched_payload_invariants(spark, crawled):
    fetched = crawled.fetched_df().select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    assert fetched.count() > 20

    def verify(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                k = int(r["image_id"][3:])
                px = imagecodec.decode(bytes(r["bytes"]))
                ref = imagecodec.gen_pixels(k, int(r["w"]), int(r["h"]))
                p = imagecodec.psnr(ref, px)
                ok_pixels = (np.array_equal(ref, px) if r["fmt"] == "png"
                             else p >= 40.0)
                ok_caption = r["caption"] == gen.caption_of(k)
                ok_phash = int(r["phash"]) == imagecodec.phash(px)
                out.append((r["image_id"], bool(ok_pixels),
                            bool(ok_caption), bool(ok_phash),
                            float(min(p, 1e9))))
            yield pd.DataFrame(out, columns=["image_id", "ok_pixels",
                                             "ok_caption", "ok_phash",
                                             "psnr"])

    res = fetched.mapInPandas(
        verify, "image_id string, ok_pixels boolean, ok_caption boolean,"
                " ok_phash boolean, psnr double").toPandas()
    assert res["ok_pixels"].all()
    assert res["ok_caption"].all()
    assert res["ok_phash"].all()
    # lossy rows clear the 40dB gate with margin; lossless are exact
    assert res["psnr"].min() >= 40.0


def test_fetched_rows_match_images_rows(spark, crawled):
    """Every fetched row's payload columns equal the images-table row."""
    imgs = crawled.images.select(
        "image_id", "w", "h", "fmt", "caption", "phash")
    f = crawled.fetched_df().select(
        "image_id",
        *(f"{c}" for c in ("w", "h", "fmt", "caption", "phash")))
    diff = f.exceptAll(f.join(imgs, ["image_id", "w", "h", "fmt",
                                     "caption", "phash"], "left_semi"))
    assert diff.count() == 0
