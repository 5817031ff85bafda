#!/usr/bin/env python
"""Single-leg throughput probe for scaling-config experiments.

Runs ONE pinned bench leg (same workload as bench_scaling.py) at a given
core count with an optional ``SPARK_GRAFT_CONF`` override, and prints the
one-line JSON.  Used to iterate on the bandwidth-bound high leg quickly
before paying for a full two-leg pair.

Usage: python tools/leg_probe.py CORES ["spark.k=v;spark.k2=v2"] [label]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALING_ENV = {
    "SPARK_GRAFT_CRAWL_SPEC": "bench2",
    "SPARK_GRAFT_BURST": "8192",
    "SPARK_GRAFT_WINDOW_MS": "40000000",
    "SPARK_GRAFT_CRAWL_STEPS": "4",
    "SPARK_GRAFT_CRAWL_WARMUP": "1",
}


def main() -> None:
    cores = int(sys.argv[1])
    conf = sys.argv[2] if len(sys.argv) > 2 else ""
    label = sys.argv[3] if len(sys.argv) > 3 else conf or "baseline"
    env = {**SCALING_ENV, **os.environ, "SPARK_GRAFT_CPUS": str(cores)}
    if conf:
        env["SPARK_GRAFT_CONF"] = conf
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(HERE, "bench.py"), "--crawl-only"]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=7200)
    lines = [ln for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-3000:] + "\n")
        raise SystemExit(f"leg at {cores} cores produced no JSON")
    d = json.loads(lines[-1])
    print(json.dumps({"label": label, "cores": cores,
                      "urls_per_sec": d["crawl_urls_per_sec"],
                      "urls": d["crawl_urls_processed"],
                      "sec": d["crawl_sec"]}))


if __name__ == "__main__":
    main()
