#!/usr/bin/env python
"""Attested kNN MULTI-JVM scaling pair at current HEAD.

Same 8M-corpus x 1M-query workload and gating as knn_adaptive_pair,
but on local-cluster[N,4,9216]: N separate 4-core / 8 GB executor
JVMs — the faithful sandbox proxy for the north rule's "N vs 4N
executors" (per-executor heap, GC and allocator isolated; only the
host memory bus stays shared). Pairs local-cluster[1,4] against
local-cluster[4,4], sp32 both halves, appending to the same log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "quiet_knn_interval_r5.log")


def loadavg():
    parts = open("/proc/loadavg").read().split()
    return float(parts[0]), float(parts[1])


def wait_quiet(l1_max=1.5, l5_max=3.0, timeout_s=5400):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        l1, l5 = loadavg()
        if l1 < l1_max and l5 < l5_max:
            return True
        time.sleep(15)
    return False


def pair_log(obj):
    with open(LOG, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def run_half(execs, mult, reps, mem_gb):
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{mem_gb}g")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
           "--cpus", str(4 * execs), "--executors", str(execs),
           "--ops", "knn",
           "--join-pages", "8000000", "--reps", str(reps),
           "--shuffle-mult", str(mult)]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=7200)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except Exception:
            continue
    pair_log({"err": "no json", "executors": execs,
              "etail": out.stderr[-300:]})
    return None


def clean_reps(res, thresh=0.5):
    return [t for t, e in zip(res["raw_sec"]["knn"],
                              res["external_cores"]["knn"]) if e <= thresh]


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def attested(execs, mult, mem_gb, need, label, max_rounds=3):
    got = []
    for _ in range(max_rounds):
        if not wait_quiet():
            pair_log({"label": label, "err": "no quiet window"})
            break
        l1, l5 = loadavg()
        res = run_half(execs, mult, need, mem_gb)
        if res is None:
            continue
        res.update(label=label, mult=mult, mem_gb=mem_gb,
                   load_start=[l1, l5])
        pair_log(res)
        got += clean_reps(res)
        if len(got) >= need:
            return median(got)
    return median(got) if got else None


def main():
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True,
                          cwd=REPO).stdout.strip()
    pair_log({"note": f"kNN MULTI-JVM pair at HEAD {head}: "
                      "local-cluster[1,4,8g] vs local-cluster[4,4,8g], "
                      "sp32 both halves"})
    t16 = attested(4, 2, 8, need=3, label=f"{head} 4x4c-jvms sp32")
    t4 = attested(1, 8, 8, need=3, label=f"{head} 1x4c-jvm sp32")
    if t4 and t16:
        pair_log({"pair": f"knn local-cluster {head}", "sp": 32,
                  "t4_median": t4, "t16_median": t16,
                  "speedup": round(t4 / t16, 2),
                  "efficiency": round(t4 / t16 / 4.0, 2)})


if __name__ == "__main__":
    main()
