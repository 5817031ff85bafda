"""AdaptiveRevisit wait-interval law (F16) vs a pure-Python WaitEvaluator
simulator, including histories where the min/max clamps bind."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.plans.revisit import (RevisitConfig, mark_changes,
                                          next_due, wait_schedule)


def _sim(history: list[str], cfg: RevisitConfig) -> list[int]:
    """WaitEvaluator reference loop: wait after each fetch in `history`
    (a digest per fetch)."""
    waits: list[int] = []
    w = float(cfg.initial_wait_ms)
    prev = None
    for i, digest in enumerate(history):
        changed = prev is None or digest != prev
        if i == 0:
            w = float(cfg.initial_wait_ms)
        elif changed:
            w = max(w / cfg.changed_factor, float(cfg.min_wait_ms))
        else:
            w = min(w * cfg.unchanged_factor, float(cfg.max_wait_ms))
        waits.append(int(w))
        prev = digest
    return waits


def test_wait_schedule_matches_simulator_with_clamps(spark):
    # Tight clamps so both bounds bind within short histories.
    cfg = RevisitConfig(initial_wait_ms=8_000, min_wait_ms=3_000,
                        max_wait_ms=20_000, unchanged_factor=1.5,
                        changed_factor=1.5)
    histories = {
        1: ["a"],                                # single fetch
        2: ["a", "a", "a", "a", "a", "a"],       # stable -> max clamp
        3: ["a", "b", "c", "d", "e", "f", "g"],  # churn  -> min clamp
        4: ["a", "a", "b", "b", "b", "c", "c"],  # mixed
        5: ["a", "b", "a", "b", "a", "b"],       # alternating
    }
    rows = [(fp, i, i * 1_000_000, d)
            for fp, hist in histories.items()
            for i, d in enumerate(hist)]
    log = spark.createDataFrame(
        rows, "url_fp long, i int, fetch_ts long, digest string")
    got = (wait_schedule(log.drop("i"), cfg)
           .orderBy("url_fp", "fetch_idx").collect())
    by_fp: dict[int, list] = {}
    for r in got:
        by_fp.setdefault(r["url_fp"], []).append(r)
    assert set(by_fp) == set(histories)
    for fp, hist in histories.items():
        exp = _sim(hist, cfg)
        assert [r["wait_ms"] for r in by_fp[fp]] == exp
        for r in by_fp[fp]:
            assert r["next_fetch_ts"] == r["fetch_ts"] + r["wait_ms"]
        # first fetch always counts as changed
        assert by_fp[fp][0]["changed"] is True


def test_mark_changes_first_fetch_and_equal_digests(spark):
    log = spark.createDataFrame(
        [(7, 0, "x"), (7, 1000, "x"), (7, 2000, "y")],
        "url_fp long, fetch_ts long, digest string")
    got = (mark_changes(log).orderBy("fetch_ts")
           .select("fetch_idx", "changed").collect())
    assert [(r["fetch_idx"], r["changed"]) for r in got] == [
        (0, True), (1, False), (2, True)]


def test_next_due_latest_row_per_uri(spark):
    cfg = RevisitConfig(initial_wait_ms=1_000, min_wait_ms=100,
                        max_wait_ms=100_000)
    log = spark.createDataFrame(
        [(1, 0, "a"), (1, 5000, "a"), (2, 0, "z")],
        "url_fp long, fetch_ts long, digest string")
    due = next_due(wait_schedule(log, cfg)).orderBy("url_fp").collect()
    assert [r["url_fp"] for r in due] == [1, 2]
    assert due[0]["fetch_idx"] == 1
    assert due[0]["wait_ms"] == 1500          # unchanged -> 1000 * 1.5
    assert due[0]["next_fetch_ts"] == 5000 + 1500
    assert due[1]["wait_ms"] == 1000          # first fetch -> initial


def test_requeue_frontier_rewrites_earliest_ts(spark):
    from heritrix_spark.plans.revisit import requeue_frontier

    cfg = RevisitConfig(initial_wait_ms=1_000, min_wait_ms=100,
                        max_wait_ms=100_000)
    log = spark.createDataFrame(
        [(1, 0, "a"), (1, 5000, "a"), (2, 0, "z")],
        "url_fp long, fetch_ts long, digest string")
    frontier = spark.createDataFrame(
        [(1, "q1", 3, 0, 42), (2, "q2", 3, 7, 99), (9, "q9", 3, 1, 5)],
        "url_fp long, class_key string, directive int, "
        "earliest_ts long, ordinal long")
    out = (requeue_frontier(wait_schedule(log, cfg), frontier)
           .orderBy("url_fp").collect())
    # only URIs with a fetch history are re-queued; column order preserved
    assert [r["url_fp"] for r in out] == [1, 2]
    assert out[0]["earliest_ts"] == 5000 + 1500   # latest next_fetch_ts
    assert out[1]["earliest_ts"] == 0 + 1000      # first fetch -> initial
    # every non-ts column survives the rewrite untouched
    assert (out[0]["class_key"], out[0]["directive"], out[0]["ordinal"]) \
        == ("q1", 3, 42)
    assert out[0].__fields__ == frontier.columns
