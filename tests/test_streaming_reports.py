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


def _lineage_rows(spark, rows):
    """rows: (class_key, url_fp, status, fetch_start, fetch_end)."""
    from pyspark.sql import functions as F
    return spark.createDataFrame(
        [(ck, fp, st, fs, fe) for ck, fp, st, fs, fe in rows],
        "class_key string, url_fp long, status int, "
        "fetch_start long, fetch_end long").select(
        F.lit(1).alias("crawl_step"), "class_key",
        F.lit("http://x/").alias("url"), F.lit("http://x/").alias("canon_url"),
        "url_fp", F.lit("real").alias("kind"), F.lit(False).alias("is_seed"),
        F.lit(3).alias("directive"), F.lit(1).alias("cost"),
        F.lit(0).cast("long").alias("ordinal"), F.lit(0).alias("retries"),
        "status", "fetch_start", "fetch_end",
        F.lit("success").alias("event"))


def test_politeness_monitor_state_crosses_batches(spark, tmp_path):
    from heritrix_spark.streaming import console
    sink = str(tmp_path / "lineage")
    # superstep files land one per micro-batch (maxFilesPerTrigger=1):
    # the h1 violation pairs file2's fetch against file1's last fetch_end,
    # so catching it REQUIRES state carried across batches.
    _lineage_rows(spark, [
        ("h1", 1, 200, 0, 500),
        ("h1", 2, 200, 2000, 2500),
        ("h2", 3, 200, 0, 400),
    ]).coalesce(1).write.mode("append").parquet(sink)
    _lineage_rows(spark, [
        ("h1", 4, 200, 2600, 3000),   # 2600 < 2500+500 -> violation
        ("h2", 5, 200, 5000, 5400),   # polite
    ]).coalesce(1).write.mode("append").parquet(sink)

    stream = console.lineage_stream(spark, sink, max_files_per_trigger=1)
    out = str(tmp_path / "violations")
    console.run_to_completion(
        console.politeness_monitor(stream, min_gap_ms=500),
        out, str(tmp_path / "ckpt"), "append")
    got = spark.read.parquet(out).collect()
    assert [(r["class_key"], r["url_fp"], r["prev_fetch_end"], r["gap_ms"])
            for r in got] == [("h1", 4, 2500, 100)]


def test_live_progress_windows(spark, tmp_path):
    from heritrix_spark.streaming import console
    sink = str(tmp_path / "lineage")
    _lineage_rows(spark, [
        ("h1", 1, 200, 0, 1_000),
        ("h1", 2, 200, 2_000, 9_000),
        ("h2", 3, 404, 3_000, 4_000),
        ("h1", 4, 200, 11_000, 15_000),   # second 10s window
    ]).coalesce(1).write.mode("append").parquet(sink)
    q = (console.live_progress(
            console.lineage_stream(spark, sink), window_ms=10_000)
         .writeStream.format("memory").queryName("live_prog")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {r["window"].start.second + r["window"].start.minute * 60:
            (r["processed"], r["succeeded"], r["uris_per_sec"])
            for r in spark.sql("select * from live_prog").collect()}
    assert rows[0] == (3, 2, 0.3)     # fetch_end 1s/9s/4s; 404 not counted
    assert rows[10] == (1, 1, 0.1)    # fetch_end 15s
