"""Checkpoint/resume exactness (SURVEY §2.J O3; north_rule requirement).

Run a crawl with mid-crawl checkpoints; rebuild a job from the mid
checkpoint; the resumed run's final state must be identical to the
uninterrupted run's — events, seen set, frontier, queue state.
"""

from __future__ import annotations

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.plans.crawl_job import CrawlJob, import_recover_log

CFG = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())
SPEC = websim.SPECS["tiny"]


def _mk_job(spark, paths, work_dir, interval=5):
    return CrawlJob(
        spark, SPEC, CFG,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=work_dir, checkpoint_interval=interval)


def _events(job):
    return sorted(tuple(r) for r in job.events_df()
                  .select("crawl_step", "class_key", "canon_url", "ordinal",
                          "status", "fetch_start", "fetch_end", "event")
                  .collect())


def test_resume_exactness(spark, tmp_path):
    paths = gen.write_fixture(SPEC, str(tmp_path / "fix"))

    ref = _mk_job(spark, paths, str(tmp_path / "ref"))
    ref.schedule_seeds(websim.seeds(SPEC))
    ref.run(20)
    ref_events = _events(ref)
    ref_seen = {r["canon_url"] for r in ref.seen.collect()}
    ref_queues = ref.queues.sort_values("class_key").reset_index(drop=True)

    # Same crawl, killed after 10 steps (the step-10 checkpoint exists).
    victim = _mk_job(spark, paths, str(tmp_path / "vic"))
    victim.schedule_seeds(websim.seeds(SPEC))
    victim.run(13)  # dies at 13; durable state only reaches step 10 + final

    resumed = CrawlJob.resume(
        spark, SPEC, CFG,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=str(tmp_path / "vic"), at_step=10, checkpoint_interval=5)
    assert resumed.step == 10
    resumed.run(20)

    assert _events(resumed) == ref_events
    assert {r["canon_url"] for r in resumed.seen.collect()} == ref_seen
    rq = resumed.queues.sort_values("class_key").reset_index(drop=True)
    assert rq.equals(ref_queues)
    fr = sorted(tuple(r) for r in resumed.frontier
                .select("canon_url", "ordinal", "retries", "earliest_ts")
                .collect())
    fref = sorted(tuple(r) for r in ref.frontier
                  .select("canon_url", "ordinal", "retries", "earliest_ts")
                  .collect())
    assert fr == fref


def test_import_recover_log_rebuilds_state(spark, tmp_path):
    """F15 disaster path: with every snapshot lost, the append-only
    journal tables alone reconstruct the exact seen set and the exact
    outstanding frontier (composite-key columns included)."""
    paths = gen.write_fixture(SPEC, str(tmp_path / "fix"))
    job = _mk_job(spark, paths, str(tmp_path / "jr"), interval=3)
    job.schedule_seeds(websim.seeds(SPEC))
    job.run(9)  # checkpoints at 3/6/9 → logs are durable through step 9

    replayed = import_recover_log(job.scheduled_df(), job.events_df())
    seen = {r["canon_url"] for r in replayed["seen"].collect()}
    assert seen == {r["canon_url"] for r in job.seen.collect()}

    key = ["url_fp", "class_key", "directive", "cost", "ordinal",
           "retries"]
    got = sorted(tuple(r) for r in replayed["frontier"]
                 .select(*key).collect())
    want = sorted(tuple(r) for r in job.frontier.select(*key).collect())
    assert got == want and len(got) > 0
