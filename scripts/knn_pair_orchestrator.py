#!/usr/bin/env python
"""Round-5 closing measurement orchestrator.

Takes the remaining attested measurements sequentially, each gated on
a genuinely quiet host window (1-min AND 5-min loadavg) and re-queued
if the per-rep external-core attestation shows contamination:

  1. sp sweep at 16 cores (shuffle partitions 16 vs 32, 32 GB heap)
     on the 8M x 1M kNN-join workload — picks the window-sort
     partitioning for the pair;
  2. the kNN scaling pair (4 -> 16 cores, memory 2 GB/core, SAME
     shuffle-partition count both halves so the job is identical);
  3. a final quiet bench.py suite run (the kNN radius-filter commit
     postdates BENCH/bench_r5_final2.json).

Appends JSON lines to BENCH/quiet_knn_interval_r5.log (pair) and
writes /tmp/knn_orchestrator.state as it goes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "quiet_knn_interval_r5.log")
STATE = "/tmp/knn_orchestrator.state"


def note(obj) -> None:
    line = json.dumps(obj)
    with open(STATE, "a") as fh:
        fh.write(line + "\n")
    print(line, flush=True)


def pair_log(obj_or_raw) -> None:
    with open(LOG, "a") as fh:
        if isinstance(obj_or_raw, str):
            fh.write(obj_or_raw.rstrip("\n") + "\n")
        else:
            fh.write(json.dumps(obj_or_raw) + "\n")


def loadavg() -> tuple[float, float]:
    parts = open("/proc/loadavg").read().split()
    return float(parts[0]), float(parts[1])


def wait_quiet(l1_max: float = 1.5, l5_max: float = 3.0,
               timeout_s: int = 5400) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        l1, l5 = loadavg()
        if l1 < l1_max and l5 < l5_max:
            return True
        time.sleep(15)
    return False


def run_half(cpus: int, mult: int, reps: int, mem_gb: int) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{mem_gb}g")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py"),
           "--cpus", str(cpus), "--ops", "knn",
           "--join-pages", "8000000", "--reps", str(reps),
           "--shuffle-mult", str(mult)]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=7200)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except Exception:
            continue
    note({"err": "no json from half", "cpus": cpus, "mult": mult,
          "tail": out.stdout[-400:], "etail": out.stderr[-400:]})
    return None


def clean_reps(res: dict, thresh: float = 0.5) -> list[float]:
    exts = res["external_cores"]["knn"]
    raws = res["raw_sec"]["knn"]
    return [t for t, e in zip(raws, exts) if e <= thresh]


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def attested(cpus: int, mult: int, mem_gb: int, need: int,
             label: str, max_rounds: int = 4) -> float | None:
    """Collect >= need clean reps, re-running contaminated rounds."""
    got: list[float] = []
    for rnd in range(max_rounds):
        if not wait_quiet():
            note({"label": label, "err": "no quiet window"})
            break
        l1, l5 = loadavg()
        res = run_half(cpus, mult, need, mem_gb)
        if res is None:
            continue
        res["label"] = label
        res["mult"] = mult
        res["mem_gb"] = mem_gb
        res["load_start"] = [l1, l5]
        pair_log(res)
        note(res)
        got += clean_reps(res)
        if len(got) >= need:
            return median(got)
    return median(got) if got else None


def main() -> None:
    open(STATE, "w").close()
    pair_log({"note": "orchestrated r5-close runs: radius-filtered window "
                      "(commit e12043b), memory 2g/core, sp sweep then "
                      "pair at the winning sp (same sp both halves)"})

    # 1. sp sweep at 16 cores
    t16 = {}
    for mult in (2, 1):
        m = attested(16, mult, 32, need=2, label=f"sweep sp{16*mult}")
        if m is not None:
            t16[mult] = m
    if not t16:
        note({"err": "sweep failed entirely"})
        return
    best_mult16 = min(t16, key=t16.get)
    sp = 16 * best_mult16
    note({"sweep_result": {f"sp{16*k}": v for k, v in t16.items()},
          "chosen_sp": sp})

    # 2. the pair: same sp both halves, memory 2 GB/core
    t4 = attested(4, sp // 4, 8, need=3, label=f"pair 4c sp{sp}")
    # 16c half: reuse a sweep median if it already has 3 clean reps?
    # Simpler: take a fresh 3-rep half at the chosen sp.
    t16c = attested(16, best_mult16, 32, need=3, label=f"pair 16c sp{sp}")
    if t4 and t16c:
        eff = (t4 / t16c) / 4.0
        pair_log({"pair": "knn r5-close", "sp": sp, "t4_median": t4,
                  "t16_median": t16c, "speedup": round(t4 / t16c, 2),
                  "efficiency": round(eff, 2)})
        note({"PAIR": {"t4": t4, "t16": t16c, "eff": round(eff, 3)}})

    # 3. final bench suite refresh (self-attesting)
    if wait_quiet():
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=7200)
        dest = os.path.join(REPO, "BENCH", "bench_r5_final3.json")
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                json.loads(line)
                with open(dest, "w") as fh:
                    fh.write(line + "\n")
                note({"bench": "written", "dest": dest})
                break
            except Exception:
                continue
    note({"done": True})


if __name__ == "__main__":
    main()
