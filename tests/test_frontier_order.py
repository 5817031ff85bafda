"""Ordering equivalence — the flagship gate (BASELINE.json north_rule).

The Spark engine must reproduce the pure-Python oracle's crawl
event-for-event: same per-queue dequeue order, same virtual fetch schedule,
same statuses/retries, and an identical final URL-seen set.
"""

from __future__ import annotations

import pytest

from heritrix_spark import config as C
from heritrix_spark.fixtures import gen, websim
from heritrix_spark.oracle.heritrix_sim import HeritrixSim
from heritrix_spark.plans.crawl_job import CrawlJob

EVENT_KEY = ["class_key", "url", "canon_url", "kind", "directive", "cost",
             "ordinal", "retries", "status", "fetch_start", "fetch_end",
             "event"]


def _oracle_events(sim: HeritrixSim) -> list[tuple]:
    return sorted(
        tuple(e[k] for k in ["step"] + EVENT_KEY) for e in sim.fetch_log)


def _engine_events(job: CrawlJob) -> list[tuple]:
    rows = job.events_df().collect()
    return sorted(
        tuple(r[k] for k in ["crawl_step"] + EVENT_KEY) for r in rows)


def _run_pair(spark, tmp_path, spec_name: str, cfg: C.CrawlConfig,
              max_steps: int | None):
    spec = websim.SPECS[spec_name]
    fixdir = tmp_path / f"fix_{spec_name}"
    paths = gen.write_fixture(spec, str(fixdir))
    sim = HeritrixSim(spec, cfg)
    sim.schedule_seeds(websim.seeds(spec))
    sim.run(max_steps)

    job = CrawlJob(
        spark, spec, cfg,
        images=spark.read.parquet(paths["images"]),
        robots_rules=spark.read.parquet(paths["robots"]),
        host_config=spark.read.parquet(paths["host_config"]),
        work_dir=str(tmp_path / f"work_{spec_name}"))
    job.schedule_seeds(websim.seeds(spec))
    job.run(max_steps)
    return sim, job


def _assert_equal(sim, job):
    oracle, engine = _oracle_events(sim), _engine_events(job)
    assert len(engine) == len(oracle)
    for o, e in zip(oracle, engine):
        assert o == e, f"\noracle: {o}\nengine: {e}"
    engine_seen = {r["canon_url"] for r in job.seen.collect()}
    assert engine_seen == sim.seen
    assert sim.fetch_log, "crawl fetched nothing"


def test_tiny_full_crawl_equivalence(spark, tmp_path):
    """Full crawl to frontier exhaustion, wag cost policy."""
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes(),
                        cost_policy="wag")
    sim, job = _run_pair(spark, tmp_path, "tiny", cfg, None)
    _assert_equal(sim, job)
    assert job.done


@pytest.mark.slow
def test_small_prefix_equivalence(spark, tmp_path):
    """12-superstep prefix on the 50-host fixture (hot-host skew live)."""
    cfg = C.CrawlConfig(surt_prefixes=websim.scope_surt_prefixes())
    sim, job = _run_pair(spark, tmp_path, "small", cfg, 12)
    _assert_equal(sim, job)
