"""STREAM-triad-style DRAM bandwidth probe (hardware-roofline evidence).

Measures aggregate memory bandwidth at 1/2/4/8/16/32 concurrent pinned
processes, each running a numpy triad ``a = b + s*c`` over arrays far
larger than LLC.  Purpose: back the BENCH/BASELINE.md claim that the
16->32-core flat spot in the crawl-scaling ladder is the single-socket
memory-bandwidth ceiling, not a serial stage in the engine — if the box's
aggregate triad bandwidth also stops growing past ~16 workers, the crawl
plateau at the same point is hardware, and an N->4N *executor* scale-out
(each executor with its own memory system) would not hit it.

Usage: python tools/stream_probe.py [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N = 64 * 1024 * 1024 // 8          # 64 MiB per array, 3 arrays/worker
REPS = 8


def _triad(cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    b = np.ones(N)
    c = np.full(N, 2.0)
    a = np.empty(N)
    np.add(b, c, out=a)            # warm / fault pages
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)        # triad: a = b + 3*c (two passes is fine
                                   # — we report bytes actually moved)
    dt = time.perf_counter() - t0
    # per rep: mul reads c writes a (2N), add reads a,b writes a (3N)
    gb = REPS * 5 * N * 8 / 1e9
    q.put(gb / dt)


def run(workers: int) -> float:
    ncpu = os.cpu_count() or 1
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_triad, args=(i % ncpu, q))
             for i in range(workers)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    out = {}
    for w in (1, 2, 4, 8, 16, 32):
        bw = run(w)
        out[str(w)] = round(bw, 1)
        print(f"workers={w:>2}  aggregate {bw:8.1f} GB/s", flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
