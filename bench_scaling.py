#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver's instruction the
same crawl job is run at two parallelism levels — ``local[8]`` and
``local[32]`` — in fresh JVMs (subprocesses), and throughput at both plus
the scaling efficiency ``(T32/T8)/(32/8)`` is reported and appended to
``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Scaling workload: the 10^7-URL bench2 corpus with large bursts, so each
# superstep carries ~350k+ URLs of real executor work and the fixed
# per-step coordination cost (~2 s: plan compilation + one stats collect)
# is amortized away — the regime the north rule's N-vs-4N gate is about.
# (The small `bench` corpus at default bursts measures ~28k URLs/step,
# which is coordination-bound at ANY core count and says nothing about
# executor scaling.)  Env-overridable.
SCALING_ENV = {
    "SPARK_GRAFT_CRAWL_SPEC": "bench2",
    "SPARK_GRAFT_BURST": "1024",
    "SPARK_GRAFT_WINDOW_MS": "4000000",
    "SPARK_GRAFT_CRAWL_STEPS": "6",
    "SPARK_GRAFT_CRAWL_WARMUP": "2",
}


def run_at(cores: int) -> dict:
    env = {**SCALING_ENV, **os.environ, "SPARK_GRAFT_CPUS": str(cores)}
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--crawl-only"],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo_cores, hi_cores = 8, 32
    lo = run_at(lo_cores)
    hi = run_at(hi_cores)
    t_lo = lo["crawl_urls_per_sec"]
    t_hi = hi["crawl_urls_per_sec"]
    eff = (t_hi / t_lo) / (hi_cores / lo_cores) if t_lo else 0.0
    report = {
        "cores_lo": lo_cores, "cores_hi": hi_cores,
        "urls_per_sec_lo": t_lo, "urls_per_sec_hi": t_hi,
        "speedup": round(t_hi / t_lo, 3) if t_lo else 0,
        "scaling_efficiency": round(eff, 3),
        "spec": lo.get("crawl_spec"),
        "urls_lo": lo.get("crawl_urls_processed"),
        "urls_hi": hi.get("crawl_urls_processed"),
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run (local[{lo_cores}] vs local[{hi_cores}], "
            f"spec={report['spec']})\n\n"
            f"| cores | URLs/sec | URLs processed |\n|---|---|---|\n"
            f"| {lo_cores} | {t_lo} | {report['urls_lo']} |\n"
            f"| {hi_cores} | {t_hi} | {report['urls_hi']} |\n\n"
            f"speedup {report['speedup']}x, efficiency "
            f"{report['scaling_efficiency']} vs the linear "
            f"{hi_cores // lo_cores}x (gate from BASELINE.json: >=0.8 at "
            f"executor scale; single-box core scaling is the sandbox "
            f"proxy and saturates on shared memory bandwidth + driver-side "
            f"superstep coordination).\n")


if __name__ == "__main__":
    main()
