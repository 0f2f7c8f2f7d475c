#!/usr/bin/env python
"""Wait for quiet host windows (multi-tenant VM), rerun the 4:16 scaling
pair in each, ARCHIVE every qualifying-window run, and report median + best
across windows (measurement-hygiene directive: best-only selection inflates
the headline). scaling.json keeps the best run; BASELINE.md gets a
window-by-window repeatability table with both statistics. One-shot helper
for measurement sessions — not part of the engine."""
import glob
import json
import multiprocessing as mp
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING = os.path.join(REPO, "BENCH", "scaling.json")
WINDOWS_DIR = os.path.join(REPO, "BENCH", "windows")
BACKUP = "/tmp/scaling_backup.json"
DEADLINE = time.time() + float(os.environ.get("QW_DEADLINE_MIN", "75")) * 60
MAX_WINDOWS = int(os.environ.get("QW_MAX_WINDOWS", "3"))


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


def pair_of(obj: dict) -> dict:
    return obj if "pairs" not in obj else next(
        p for p in obj["pairs"] if p["cores_lo"] == 4)


def run_pair() -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SCALE_PAIRS="4:16",
        SPARK_GRAFT_PHASE_ROUNDS="2",
        SPARK_GRAFT_SCALE_META_IMAGES="16000000",
        SPARK_GRAFT_SCALE_PART_IMAGES="16000000",
    )
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "scaling_bench.py")],
                   env=env, timeout=3600)
    return pair_of(json.load(open(SCALING)))


def archive(new_pair: dict) -> None:
    os.makedirs(WINDOWS_DIR, exist_ok=True)
    n = len(glob.glob(os.path.join(WINDOWS_DIR, "window_*.json")))
    json.dump(new_pair, open(os.path.join(WINDOWS_DIR, f"window_{n:02d}.json"), "w"),
              indent=2)


def repeatability_table() -> str:
    effs = []
    rows = []
    for path in sorted(glob.glob(os.path.join(WINDOWS_DIR, "window_*.json"))):
        p = json.load(open(path))
        e = p["partitioned_join"]["efficiency"]
        ceiling = p["calibration"]["hw_efficiency_ceiling"]
        effs.append(e)
        rows.append(f"| {os.path.basename(path)} | {p['partitioned_join']['t4_s']} | "
                    f"{p['partitioned_join']['t16_s']} | {e} | {ceiling} |")
    lines = [
        "",
        "## Repeatability across qualifying quiet windows (partitioned_join 4→16)",
        "",
        "Every qualifying-window run is archived in BENCH/windows/ — the",
        "headline pair in scaling.json is the best window; the distribution is:",
        "",
        "| window | t4 s | t16 s | efficiency | hw ceiling |",
        "|---|---|---|---|---|",
        *rows,
        "",
        f"**best = {max(effs):.3f}, median = {statistics.median(effs):.3f}** "
        f"over {len(effs)} windows.",
    ]
    return "\n".join(lines)


def main():
    windows = 0
    while time.time() < DEADLINE and windows < MAX_WINDOWS:
        scaling = probe()
        print(f"[watch] matmul 4->16 scaling {scaling:.2f}", flush=True)
        if scaling < 3.3:
            time.sleep(180)
            continue
        shutil.copy(SCALING, BACKUP)
        md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
        md_old = open(md_path).read()
        new_pair = run_pair()
        archive(new_pair)
        windows += 1
        old = json.load(open(BACKUP))
        old_pairs = old["pairs"] if "pairs" in old else [old]
        old_pair = next((p for p in old_pairs if p["cores_lo"] == 4), None)
        improved = (old_pair is None or
                    new_pair["partitioned_join"]["efficiency"]
                    > old_pair["partitioned_join"]["efficiency"])
        if improved:
            merged = {"pairs": [new_pair] + [p for p in old_pairs if p["cores_lo"] != 4]}
            json.dump(merged, open(SCALING, "w"), indent=2)
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "sb", os.path.join(REPO, "tools", "scaling_bench.py"))
            sb = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(sb)
            sb._write_md(merged["pairs"])
            print(f"[watch] improved: pjoin 4->16 "
                  f"{new_pair['partitioned_join']['efficiency']}", flush=True)
        else:
            shutil.copy(BACKUP, SCALING)
            open(md_path, "w").write(md_old)
            print(f"[watch] window kept for stats only "
                  f"({new_pair['partitioned_join']['efficiency']})", flush=True)
    # (re)write the repeatability section with ALL windows, median + best
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    md = open(md_path).read()
    if "## Repeatability" in md:
        md = md.split("## Repeatability", 1)[0].rstrip() + "\n"
    if glob.glob(os.path.join(WINDOWS_DIR, "window_*.json")):
        md += repeatability_table() + "\n"
    open(md_path, "w").write(md)
    print("[watch] done", flush=True)


if __name__ == "__main__":
    main()
