#!/usr/bin/env python
"""Memory-bandwidth ceiling probe (context for BENCH/BASELINE.md).

local[N] shares ONE memory controller across all N threads, so local-mode
scaling under-reports a real cluster for bandwidth-bound jobs: on an actual
N→4N *executor* scale-up every executor brings its own memory channels, so
aggregate bandwidth grows with the cluster, while in this sandbox it is a
constant. This probe measures a STREAM-triad-like numpy kernel
(a = b + 0.5*c over 64 MB arrays) at 1 worker and at 32 workers and reports
the aggregate-bandwidth scaling factor — the hard ceiling any
shuffle/Arrow/decode-heavy job hits at local[32] regardless of code quality.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

N = 8_000_000  # 64 MB per array, 3 arrays → far beyond L3 per worker
REPS = 5


def triad_worker(out_q):
    b = np.ones(N)
    c = np.ones(N)
    a = np.empty(N)
    # warm
    np.add(b, c, out=a)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.add(b, 0.5 * c, out=a)  # triad: 4 arrays touched per rep (incl. temp)
    dt = time.perf_counter() - t0
    gb = REPS * 4 * N * 8 / 1e9
    out_q.put(gb / dt)


def run(workers: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=triad_worker, args=(q,)) for _ in range(workers)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main():
    bw1 = run(1)
    bw32 = run(32)
    result = {
        "triad_gbps_1worker": round(bw1, 1),
        "triad_gbps_32workers_aggregate": round(bw32, 1),
        "bandwidth_scaling_32x_ideal": round(bw32 / bw1, 1),
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
