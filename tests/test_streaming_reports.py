"""Streaming seed ingest + StatisticsTracker report queries."""

from __future__ import annotations

import os

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.plans import reports
from heritrix_spark.plans.crawl_job import CrawlJob
from heritrix_spark.streaming import seed_ingest


def test_streaming_seed_ingest(spark, tmp_path):
    seeds_dir = tmp_path / "seeds"
    os.makedirs(seeds_dir)
    (seeds_dir / "batch1.txt").write_text(
        "http://h0001.example.test/p/0/img00000007\n"
        "# comment\n"
        "http://WWW.h0001.example.test/p/0/img00000007\n"  # canon dup
        "http://h0002.example.test/p/0/img00000002\n")
    q = seed_ingest.start_ingest(
        spark, str(seeds_dir), str(tmp_path / "landing"),
        str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    urls, batches = seed_ingest.drain_new_seeds(
        spark, str(tmp_path / "landing"), set())
    assert len(urls) == 2  # canonical dup collapsed in-batch
    urls2, batches2 = seed_ingest.drain_new_seeds(
        spark, str(tmp_path / "landing"), batches)
    assert urls2 == []  # drained batches are not re-injected


def test_reports_over_crawl(spark, tmp_path):
    spec = websim.SPECS["tiny"]
    paths = gen.write_fixture(spec, str(tmp_path / "fix"))
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())
    job = CrawlJob(
        spark, spec, cfg,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=str(tmp_path / "work"))
    job.schedule_seeds(websim.seeds(spec))
    job.run(8)

    lineage = job.events_df()
    hosts = reports.hosts_report(lineage).collect()
    assert hosts and hosts[0]["processed"] >= hosts[-1]["processed"]
    codes = {r["status"]: r["n"]
             for r in reports.response_code_report(lineage).collect()}
    assert codes.get(200, 0) > 0
    prog = reports.progress_statistics(lineage).collect()
    assert len(prog) == 8
    assert all(r["virtual_docs_per_sec"] > 0 for r in prog)
    fr = reports.frontier_report(
        job.frontier,
        spark.createDataFrame(job.queues)).collect()
    assert fr and sum(r["queued"] for r in fr) == job.frontier.count()
    bw = reports.bandwidth_report(job.fetched_df()).collect()
    assert bw and all(r["payload_bytes"] > 0 for r in bw)
