#!/usr/bin/env python
"""Quiet-gated A/B of knn_join's partial_topk reduction, multi-JVM.

Runs the 8M-corpus kNN scaling workload on local-cluster[4,4,9216]
(16 cores, 4 isolated executor JVMs — the half where the r5 pair
measured 0.45 and diagnosed inter-JVM shuffle serde as the residual)
with the per-partition top-k reduction OFF and ON, alternating, until
each variant has ``--clean`` reps whose external-core attestation is
below ``--ext-max``.  Appends every attempt to
BENCH/knn_partial_ab.log; the contrast answers whether trading
~1.7 us/row of Arrow+lexsort per candidate for a ~4x smaller
qid-exchange pays when every shuffled byte crosses JVM boundaries.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "knn_partial_ab.log")


def loadavg():
    parts = open("/proc/loadavg").read().split()
    return float(parts[0]), float(parts[1])


def log(obj):
    with open(LOG, "a") as fh:
        fh.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def wait_quiet(l1_max, timeout_s):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        l1, l5 = loadavg()
        if l1 < l1_max and l5 < max(2.0, l1_max + 1.0):
            return True
        time.sleep(20)
    return False


def run_half(partial: bool, execs: int, reps: int) -> dict | None:
    env = dict(os.environ,
               SPARK_GRAFT_KNN_PARTIAL_TOPK="1" if partial else "0")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
           "--cpus", str(4 * execs), "--executors", str(execs),
           "--shuffle-mult", "2", "--ops", "knn",
           "--join-pages", "8000000", "--reps", str(reps)]
    # a timed-out / crashed half must not abort the alternating A/B
    # loop before the summary line (r5 advice): log and continue
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO, timeout=1800).stdout
        for line in out.splitlines():
            if line.startswith("{") and '"median_sec"' in line:
                return json.loads(line)
    except (subprocess.TimeoutExpired, OSError,
            json.JSONDecodeError) as exc:
        print(json.dumps({"err": type(exc).__name__,
                          "partial": partial, "execs": execs}), flush=True)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--clean", type=int, default=2,
                    help="clean reps required per variant")
    ap.add_argument("--ext-max", type=float, default=0.3)
    ap.add_argument("--l1-max", type=float, default=1.0)
    ap.add_argument("--timeout-h", type=float, default=3.0)
    args = ap.parse_args()

    t_end = time.time() + args.timeout_h * 3600
    clean: dict[str, list[float]] = {"off": [], "on": []}
    attempt = 0
    while time.time() < t_end:
        need = [v for v in ("off", "on") if len(clean[v]) < args.clean]
        if not need:
            break
        variant = need[attempt % len(need)]
        attempt += 1
        if not wait_quiet(args.l1_max, t_end - time.time()):
            break
        res = run_half(variant == "on", args.execs, args.reps)
        if res is None:
            log({"attempt": attempt, "variant": variant, "err": "no output"})
            continue
        exts = res.get("external_cores", {}).get("knn")
        raws = res.get("raw_sec", {}).get("knn")
        if not exts or not raws:
            log({"attempt": attempt, "variant": variant,
                 "err": "missing rep fields"})
            continue
        ok = [t for t, e in zip(raws, exts) if e <= args.ext_max]
        clean[variant].extend(ok)
        log({"attempt": attempt, "variant": variant, "execs": args.execs,
             "raw": raws, "ext": exts, "clean_so_far": clean[variant],
             "canary": res.get("membw_canary_gbps")})
    summary = {"pair": "knn partial_topk A/B multi-JVM",
               "execs": args.execs,
               "off_clean": sorted(clean["off"]),
               "on_clean": sorted(clean["on"])}
    if clean["off"] and clean["on"]:
        summary["off_min"] = min(clean["off"])
        summary["on_min"] = min(clean["on"])
        summary["on_vs_off"] = round(min(clean["on"]) / min(clean["off"]), 3)
    log(summary)


if __name__ == "__main__":
    main()
