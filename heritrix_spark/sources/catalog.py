"""SnapshotCatalog — versioned parquet tables + atomic superstep commits.

The engine's durability/resume layer (Heritrix parity: the Checkpointer —
``org/archive/crawler/framework/Checkpointer.java`` — which syncs BDB JE and
copies its logs; and the RecoveryJournal).  Here every superstep commit is a
manifest line referencing immutable parquet directories, so resume is exact
(kill -9 loses at most the in-flight superstep) and old checkpoints are
queryable (Iceberg ``VERSION AS OF`` analog).

Layout under ``root/``::

    <table>/step=<N>/part-*.parquet   -- snapshot tables: each step dir is a
                                         full replacement (frontier,
                                         queue_state)
    <table>/step=<N>/part-*.parquet   -- log tables: each step dir is a
                                         delta; reads union all dirs <= step
                                         (seen, lineage, metrics, fetched)
    checkpoints.jsonl                 -- one JSON line per committed step:
                                         driver state + table step pointers

The ``step=N`` hive layout makes Spark expose ``step`` as a partition
column, so log reads prune by step (partition pruning — no data read for
future/rolled-back steps).  Commits are ordered: data dirs are written
first, the manifest line last (fsync'd append) — a torn write leaves a
dangling data dir that resume ignores.

On a real cluster this module is the one swap point for Iceberg: snapshots
become MERGE INTO + snapshot ids, logs become appends, the manifest becomes
a tag per step.  Nothing else in the engine touches storage directly.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_TABLES = ("frontier", "queue_state", "host_state")
LOG_TABLES = ("seen", "lineage", "scheduled", "metrics", "fetched")


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------

    def _dir(self, table: str, step: int) -> str:
        return os.path.join(self.root, table, f"step={step}")

    def _manifest(self) -> str:
        return os.path.join(self.root, "checkpoints.jsonl")

    # -- writes --------------------------------------------------------------

    def write(self, table: str, df: DataFrame, step: int) -> None:
        """Write a step dir (snapshot replacement or log delta)."""
        path = self._dir(table, step)
        if os.path.exists(path):
            shutil.rmtree(path)  # uncommitted leftover from a dead run
        df.write.mode("overwrite").parquet(path)

    def commit(self, step: int, state: dict[str, Any],
               table_steps: dict[str, int]) -> None:
        """Append the manifest line — the atomic commit point."""
        line = json.dumps({"step": step, "state": state,
                           "tables": table_steps}, sort_keys=True)
        with open(self._manifest(), "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- reads ---------------------------------------------------------------

    def checkpoints(self) -> list[dict[str, Any]]:
        path = self._manifest()
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    out.append(json.loads(ln))
        return out

    def latest(self, at_step: int | None = None) -> dict[str, Any] | None:
        cps = self.checkpoints()
        if at_step is not None:
            cps = [c for c in cps if c["step"] <= at_step]
        return cps[-1] if cps else None

    def read_snapshot(self, table: str, step: int) -> DataFrame:
        return self.spark.read.parquet(self._dir(table, step))

    def read_log(self, table: str, upto_step: int | None = None) -> DataFrame:
        """Union of delta dirs, step as partition column (pruned)."""
        base = os.path.join(self.root, table)
        df = self.spark.read.option("basePath", base).parquet(
            os.path.join(base, "step=*"))
        if upto_step is not None:
            df = df.where(df["step"] <= upto_step)
        return df

    def has_log(self, table: str) -> bool:
        base = os.path.join(self.root, table)
        return os.path.isdir(base) and any(
            e.startswith("step=") for e in os.listdir(base))

    def rollback_logs(self, resume_step: int) -> None:
        """Drop log deltas newer than the resume point (dead branches)."""
        for table in LOG_TABLES:
            base = os.path.join(self.root, table)
            if not os.path.isdir(base):
                continue
            for entry in os.listdir(base):
                if entry.startswith("step="):
                    s = int(entry.split("=", 1)[1])
                    if s > resume_step:
                        shutil.rmtree(os.path.join(base, entry))

    def truncate_manifest(self, resume_step: int) -> None:
        cps = [c for c in self.checkpoints() if c["step"] <= resume_step]
        with open(self._manifest(), "w") as f:
            for c in cps:
                f.write(json.dumps(c, sort_keys=True) + "\n")
