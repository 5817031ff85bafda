"""Durable bucketed URL-seen (SURVEY §4 storage-partitioned join analog):
the seen set lives in a table bucketed by url_fp, the anti-join plan
shuffles only the candidate side, and the crawl is event-identical to the
in-memory mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.plans.crawl_job import CrawlJob

SPEC = websim.SPECS["tiny"]
CFG = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())


def _job(spark, paths, work, durable):
    return CrawlJob(
        spark, SPEC, CFG,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=work, checkpoint_interval=100, durable_seen=durable)


def test_durable_seen_equivalent_and_shuffle_free(spark, tmp_path):
    paths = gen.write_fixture(SPEC, str(tmp_path / "fix"))
    ref = _job(spark, paths, str(tmp_path / "ref"), durable=False)
    ref.schedule_seeds(websim.seeds(SPEC))
    ref.run(8)
    dur = _job(spark, paths, str(tmp_path / "dur"), durable=True)
    dur.schedule_seeds(websim.seeds(SPEC))
    dur.run(8)

    key = ["crawl_step", "class_key", "canon_url", "ordinal", "status",
           "event"]
    ev = lambda j: sorted(  # noqa: E731
        tuple(r) for r in j.events_df().select(*key).collect())
    assert ev(dur) == ev(ref)
    assert ({r["canon_url"] for r in dur.seen.collect()}
            == {r["canon_url"] for r in ref.seen.collect()})

    # The recurring seen anti-join: bucketed seen side reads pre-
    # partitioned — exactly ONE Exchange (the small candidate side).
    # (Disable auto-broadcast so the plan shows the sort-merge shape a
    # 10^10-row seen table would take; at test scale Spark would
    # otherwise just broadcast the tiny table.)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = (spark.range(5000)
                .select(F.xxhash64(F.col("id").cast("string"))
                        .alias("url_fp")))
        plan = (cand.join(dur.seen, "url_fp", "left_anti")
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    n_exchanges = plan.count("Exchange")
    assert "Bucketed: true" in plan
    assert n_exchanges == 1, f"expected 1 Exchange, plan:\n{plan[:4000]}"


def test_durable_seen_multi_checkpoint_resume(spark, tmp_path):
    """Durable seen across a MULTI-checkpoint crawl: 4 commits in 8 steps,
    kill, resume from the latest, finish — events and the final seen set
    match a single uninterrupted durable run."""
    paths = gen.write_fixture(SPEC, str(tmp_path / "fix"))
    ref = _job(spark, paths, str(tmp_path / "ref"), durable=True)
    ref.schedule_seeds(websim.seeds(SPEC))
    ref.run(12)

    work = str(tmp_path / "multi")
    a = CrawlJob(spark, SPEC, CFG,
                 images=spark.read.parquet(paths["images"]),
                 robots_rules=spark.read.parquet(paths["robots"]),
                 host_config=spark.read.parquet(paths["host_config"]),
                 work_dir=work, checkpoint_interval=2, durable_seen=True)
    a.schedule_seeds(websim.seeds(SPEC))
    a.run(8)  # -> checkpoints at steps 2,4,6,8 (+ final)
    del a  # simulate the process dying
    b = CrawlJob.resume(spark, SPEC, CFG,
                        images=spark.read.parquet(paths["images"]),
                        robots_rules=spark.read.parquet(paths["robots"]),
                        host_config=spark.read.parquet(paths["host_config"]),
                        work_dir=work, checkpoint_interval=2,
                        durable_seen=True)
    b.run(12)

    key = ["crawl_step", "class_key", "canon_url", "ordinal", "status",
           "event"]
    ev = lambda j: sorted(  # noqa: E731
        tuple(r) for r in j.events_df().select(*key).collect())
    assert ev(b) == ev(ref)
    assert ({r["canon_url"] for r in b.seen.collect()}
            == {r["canon_url"] for r in ref.seen.collect()})
