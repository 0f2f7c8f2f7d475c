#!/usr/bin/env python
"""Quiet-window measurement driver for the DEDUP-family scaling pair
(phash_near_dups 4→16) — the same discipline as quiet_window_bench.py
(probe for a quiet host, CPU-pinned fresh-JVM measurement, archive EVERY
qualifying window) but writing to scaling_dedup.json / dedup_window_NN.json
so the spatial records are never touched. One-shot measurement helper."""
import glob
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: which dedup-family jobs to measure per window (comma-separated names
#: from tools/scaling_bench.py: phash_near_dups, minhash_near_dups)
JOBS = os.environ.get("QW_JOBS", "phash_near_dups")
#: output/archive naming: scaling_<prefix>.json + <prefix>_window_NN.json
PREFIX = os.environ.get("QW_PREFIX", "dedup")
OUT = os.path.join(REPO, "BENCH", f"scaling_{PREFIX}.json")
WINDOWS_DIR = os.path.join(REPO, "BENCH", "windows")
DEADLINE = time.time() + float(os.environ.get("QW_DEADLINE_MIN", "60")) * 60
MAX_WINDOWS = int(os.environ.get("QW_MAX_WINDOWS", "2"))


def probe() -> float:
    import numpy as np

    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[v] = "1"

    def w(q):
        a = np.random.default_rng(0).standard_normal((1200, 1200))
        c = np.empty_like(a)
        np.matmul(a, a, out=c)
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 2.0:
            np.matmul(a, a, out=c)
            n += 1
        q.put(n * 2 * 1200**3 / (time.perf_counter() - t0) / 1e9)

    out = []
    for k in (4, 16):
        q = mp.Queue()
        ps = [mp.Process(target=w, args=(q,)) for _ in range(k)]
        [p.start() for p in ps]
        out.append(sum(q.get() for _ in ps))
        [p.join() for p in ps]
    return out[1] / out[0]


def main():
    windows = 0
    while time.time() < DEADLINE and windows < MAX_WINDOWS:
        s = probe()
        print(f"[dedup-watch] matmul 4->16 scaling {s:.2f}", flush=True)
        if s < 3.3:
            time.sleep(180)
            continue
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SCALE_JOBS=JOBS,
            SPARK_GRAFT_SCALE_OUT=f"scaling_{PREFIX}.json",
            SPARK_GRAFT_SCALE_PAIRS="4:16",
            SPARK_GRAFT_PHASE_ROUNDS="3",
        )
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py")],
            env=env, timeout=3600,
        )
        os.makedirs(WINDOWS_DIR, exist_ok=True)
        n = len(glob.glob(os.path.join(WINDOWS_DIR, f"{PREFIX}_window_*.json")))
        dst = os.path.join(WINDOWS_DIR, f"{PREFIX}_window_{n:02d}.json")
        json.dump(json.load(open(OUT)), open(dst, "w"), indent=2)
        r = json.load(open(dst))
        for job in JOBS.split(","):
            print(f"[dedup-watch] window {n} {job}: eff "
                  f"{r[job]['efficiency']} median "
                  f"{r[job]['efficiency_median']} membw-ceiling "
                  f"{r['calibration']['membw_efficiency_ceiling']}", flush=True)
        windows += 1
    print("[dedup-watch] done", flush=True)


if __name__ == "__main__":
    main()
