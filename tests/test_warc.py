"""WARC export round-trip (W4 remainder): the fetched table exports to
per-partition WARC/1.0 files, and parsing them back recovers every URL +
payload byte-exactly."""

from __future__ import annotations

import pytest

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.plans.crawl_job import CrawlJob
from heritrix_spark.plans.warc import export_warc, read_warc_records


@pytest.fixture(scope="module")
def fetched(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("warc")
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
    job.run(10)
    return job.fetched_df()


def test_warc_roundtrip(spark, fetched, tmp_path):
    out = str(tmp_path / "warcs")
    manifest = export_warc(fetched.repartition(3), out).collect()
    n_fetched = fetched.count()
    assert n_fetched > 10
    assert sum(r["n_records"] for r in manifest) == n_fetched
    assert 1 <= len(manifest) <= 3  # one file per non-empty partition
    assert all(r["n_bytes"] > 0 for r in manifest)

    back = read_warc_records(spark, [r["path"] for r in manifest])
    got = {(r["url"], bytes(r["payload"])) for r in back.collect()}
    want = {(r["url"], bytes(r["bytes"]) if r["bytes"] is not None else b"")
            for r in fetched.select("url", "bytes").collect()}
    assert got == want
    # deterministic virtual timestamps + image content type
    one = back.first()
    assert one["warc_date"].startswith("2026-")
    assert one["content_type"].startswith("image/")
