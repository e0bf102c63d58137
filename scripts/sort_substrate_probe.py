#!/usr/bin/env python
"""Substrate probe: scaling efficiency of Spark's OWN sort primitive
on this host, isolated from any engine code.

The kNN-join top-k window is exchange + per-partition sort of ~1e8
narrow rows.  Its 4->16-core pair can only scale as well as the raw
sort primitive scales on this box: local-mode cores share ONE memory
bus and one spill disk, so a sort-dense stage hits a bandwidth
ceiling that a real 4x-executor cluster (4x DRAM channels, 4x disks)
does not have.  This probe times

    range(N) -> synthetic (key, dist, id) rows
             -> RoundRobin exchange to SP partitions
             -> sortWithinPartitions(key, dist)

(the exact physical shape of the window's child) at two core counts
and prints per-core efficiency.  Run it back-to-back in a quiet
window; compare the kNN pair's efficiency against THIS number, not
against 1.0.

Usage: python scripts/sort_substrate_probe.py [--rows 100000000]
       [--pairs 4,16] [--sp 16] [--mem-per-core 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ext_cores_sample():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    busy = sum(int(x) for x in parts[1:8]) - int(parts[4])
    return busy, time.time()


def run_once(cpus: int, rows: int, sp: int, mem_gb: int) -> float:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.appName(f"sortprobe{cpus}")
             .master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(sp))
             .config("spark.driver.memory", f"{mem_gb}g")
             .config("spark.sql.adaptive.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = (spark.range(rows)
          .select(F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
                  (F.xxhash64("id", F.lit(1)) % 100000 / 7.0).alias("dist"),
                  F.col("id").alias("c_id"))
          .repartition(sp, "k")
          .sortWithinPartitions("k", "dist", "c_id"))
    # noop sink: a count() would let EliminateSorts drop the sort
    # under the order-insensitive aggregate; the noop write keeps it
    def evaluate() -> None:
        df.write.format("noop").mode("overwrite").save()

    evaluate()  # warm rep (JIT/codegen)
    best = None
    for _ in range(2):
        t0 = time.time()
        evaluate()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--pairs", type=str, default="4,16")
    ap.add_argument("--sp", type=int, default=16)
    ap.add_argument("--mem-per-core", type=int, default=2)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pairs.split(","))
    out = {"rows": args.rows, "sp": args.sp}
    for cpus in (lo, hi):
        b0, t0 = ext_cores_sample()
        sec = run_once(cpus, args.rows, args.sp,
                       args.mem_per_core * cpus)
        b1, t1 = ext_cores_sample()
        hz = os.sysconf("SC_CLK_TCK")
        total_busy = (b1 - b0) / hz / (t1 - t0)
        out[f"t{cpus}"] = round(sec, 2)
        out[f"busy_cores_during_t{cpus}"] = round(total_busy, 2)
    out["speedup"] = round(out[f"t{lo}"] / out[f"t{hi}"], 2)
    out["efficiency"] = round(out["speedup"] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
