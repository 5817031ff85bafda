"""DataFrame-mode seed injection (round-4): the frame-based queue merge
(`CrawlJob._merge_candidate_queues_sdf`) must reproduce the driver
merge's sequential claim/ordinal law exactly — queue creation, bumps,
prerequisite insertion, prereq-shaped-seed claims — while the driver
sees only a 1-row counts collect (never O(#queues) stats rows).

The oracle (`HeritrixSim`) is the source of truth; the pandas-mode path
is the long-equivalence-tested engine image.  These tests run the SAME
crawl in dataframe queue mode (which now routes seeds through the
frame-based merge) and in auto mode with a threshold the seed batch
itself crosses (the scale trigger), and assert event-for-event equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.oracle.heritrix_sim import HeritrixSim
from heritrix_spark.plans.crawl_job import CrawlJob

EVENT_KEY = ["class_key", "url", "event", "status", "fetch_start",
             "fetch_end", "ordinal", "directive", "cost"]


def _events_sim(sim):
    return sorted(tuple(e[k] for k in ["step"] + EVENT_KEY)
                  for e in sim.fetch_log)


def _events_job(job):
    rows = job.events_df().collect()
    return sorted(tuple(r[k] for k in ["crawl_step"] + EVENT_KEY)
                  for r in rows)


def _run(spark, tmp_path, cfg, seed_urls, tag, steps=6):
    spec = websim.SPECS["tiny"]
    paths = gen.write_fixture(spec, str(tmp_path / f"fix_{tag}"))
    job = CrawlJob(
        spark, spec, cfg,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=str(tmp_path / f"work_{tag}"))
    job.schedule_seeds(seed_urls)
    job.run(steps)
    return job


def _sim(cfg, seed_urls, steps=6):
    sim = HeritrixSim(websim.SPECS["tiny"], cfg)
    sim.schedule_seeds(seed_urls)
    sim.run(steps)
    return sim


def test_sdf_seed_merge_prereq_claims(spark, tmp_path):
    """dataframe-mode seed path with prereq-shaped seeds in both claim
    directions (robots.txt before/after its host's first URL, dns:
    before) — event-identical to the oracle."""
    spec_seeds = websim.seeds(websim.SPECS["tiny"])
    seed_urls = [
        "http://h0000.example.test/robots.txt",  # before host 0's seed
        spec_seeds[0],
        spec_seeds[1],
        "http://h0001.example.test/robots.txt",  # after host 1's seed
        "dns:h0002.example.test",                # before host 2's seed
        spec_seeds[2],
    ]
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes(),
                        queue_state_mode="dataframe")
    sim = _sim(cfg, seed_urls)
    job = _run(spark, tmp_path, cfg, seed_urls, "sdfclaims")
    assert job._prereq_canons is None  # the frame-based path really ran
    assert _events_job(job) == _events_sim(sim)


def test_sdf_seed_merge_plain(spark, tmp_path):
    """dataframe-mode seed path on the plain tiny-web seed list — full
    crawl event equivalence plus queue-table equality vs the oracle."""
    seed_urls = websim.seeds(websim.SPECS["tiny"])
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes(),
                        queue_state_mode="dataframe")
    sim = _sim(cfg, seed_urls, steps=8)
    job = _run(spark, tmp_path, cfg, seed_urls, "sdfplain", steps=8)
    assert _events_job(job) == _events_sim(sim)
    qrows = {r["class_key"]: r for r in job.queues_sdf.collect()}
    assert set(qrows) == set(sim.queues)
    for ck, q in sim.queues.items():
        r = qrows[ck]
        assert (r["wake_ts"], r["balance"], r["next_ordinal"],
                r["retired"]) == (q.wake_ts, q.balance, q.next_ordinal,
                                  q.retired), ck


def test_auto_seed_batch_promotes_before_merge(spark, tmp_path):
    """auto mode with a threshold the seed batch alone crosses: the job
    promotes to dataframe placement BEFORE merging (the 10^7-queue
    replay shape) and stays event-identical to the oracle."""
    seed_urls = websim.seeds(websim.SPECS["tiny"])
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes(),
                        queue_state_mode="auto",
                        queue_state_auto_threshold=1)
    sim = _sim(cfg, seed_urls)
    job = _run(spark, tmp_path, cfg, seed_urls, "autoseed")
    assert job.qmode == "dataframe"
    assert job._prereq_canons is None
    assert _events_job(job) == _events_sim(sim)


def test_sdf_seed_merge_host_settings(spark, tmp_path):
    """Queue creation under per-host settings sheets (O5): the created
    queue's balance/sgroup must come from the FIRST SURVIVING host's
    sheet in the frame-based path too."""
    seed_urls = websim.seeds(websim.SPECS["tiny"])
    cfg = C.CrawlConfig(
        surt_prefixes=websim.scope_surt_prefixes(),
        queue_state_mode="dataframe",
        host_settings=(
            ("h0000.example.test", (("balance_replenish", 1200),)),
            ("example.test", (("balance_replenish", 2500),)),
        ))
    sim = _sim(cfg, seed_urls, steps=8)
    job = _run(spark, tmp_path, cfg, seed_urls, "sdfsheets", steps=8)
    assert _events_job(job) == _events_sim(sim)
    qrows = {r["class_key"]: r for r in job.queues_sdf.collect()}
    for ck, q in sim.queues.items():
        assert qrows[ck]["sgroup"] == q.sgroup, ck
        assert qrows[ck]["balance"] == q.balance, ck
