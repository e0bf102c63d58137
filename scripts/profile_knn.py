#!/usr/bin/env python
"""One-rep kNN-join profile: run the scaling workload's knn op once
(warm corpus cache) and dump per-Spark-job wall time plus the GAPS
between jobs — executor work scales with cores, inter-job gaps are
driver-serial (Catalyst/AQE planning, py4j, driver-side collects) and
are the Amdahl suspect for the 0.47→0.53 kNN pair ceiling.

Usage: python scripts/profile_knn.py --cpus 16 [--join-pages 8000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--join-pages", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--driver-mem", type=str, default="8g")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--partial-topk", action="store_true",
                    help="A/B: enable the per-partition top-k reduction "
                         "(default OFF, matching knn_join's default)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mobilitydb_spark import joins

    b = (SparkSession.builder.appName("knnprof")
         .master(f"local[{args.cpus}]")
         .config("spark.sql.shuffle.partitions",
                 str(args.shuffle_partitions or args.cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", args.driver_mem)
         .config("spark.sql.files.maxPartitionBytes", "33554432")
         .config("spark.ui.enabled", "true"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    path = os.path.join(REPO, ".cache", "bench",
                        f"pages_{args.join_pages}.parquet")
    jpages = spark.read.parquet(path)
    hx = F.pmod(F.xxhash64("url", F.lit(5)), F.lit(1_000_000))
    knn_c = jpages.select(
        F.xxhash64("url", F.lit(6)).alias("c_id"),
        (hx * hx / F.lit(1e12) * 340.0 - 170.0).alias("lon"),
        (F.pmod(F.xxhash64("url", F.lit(7)), F.lit(1_600_000))
         / 10_000.0 - 80.0).alias("lat"))

    def rep(rem: int) -> float:
        q = knn_c.where(F.pmod(F.col("c_id"), F.lit(8)) == rem).select(
            F.col("c_id").alias("q_id"), "lon", "lat")
        t0 = time.time()
        joins.knn_join(q, knn_c, 5,
                       partial_topk=args.partial_topk).count()
        return time.time() - t0

    print(f"warmup: {rep(0):.1f}s", flush=True)
    mark = time.time()
    for i in range(args.reps):
        print(f"timed rep {i}: {rep(1 + i):.1f}s", flush=True)

    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = app[0]["id"]
    jobs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"))
    jobs.sort(key=lambda j: j["submissionTime"])

    def ts(s: str) -> float:
        from datetime import datetime
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for j in jobs:
        sub, done = ts(j["submissionTime"]), ts(j["completionTime"])
        if done < mark - 1:  # skip warmup-era jobs
            continue
        rows.append((j["jobId"], sub, done, j["numTasks"],
                     j.get("description") or j["name"][:60]))
    total_job = 0.0
    prev_done = None
    total_gap = 0.0
    print("\njobId  dur_s  gap_s  tasks  desc")
    for jid, sub, done, ntasks, desc in rows:
        gap = 0.0 if prev_done is None else max(0.0, sub - prev_done)
        total_gap += gap
        total_job += done - sub
        prev_done = max(prev_done or done, done)
        print(f"{jid:5d} {done-sub:7.2f} {gap:6.2f} {ntasks:6d}  {desc[:70]}")
    print(f"\nsum job time {total_job:.1f}s, sum inter-job gaps "
          f"{total_gap:.1f}s over {len(rows)} jobs")

    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    stages = [s for s in stages
              if ts(s["completionTime"]) >= mark - 1]
    stages.sort(key=lambda s: -(ts(s["completionTime"])
                                - ts(s["firstTaskLaunchedTime"])))
    print("\nstage  dur_s  tasks  taskTime_s  spillMem_MB  spillDisk_MB  "
          "shufR_MB  shufW_MB  name")
    for s in stages[:12]:
        dur = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
        print(f"{s['stageId']:5d} {dur:7.1f} {s['numCompleteTasks']:6d} "
              f"{s['executorRunTime']/1000:10.1f} "
              f"{s['memoryBytesSpilled']/1e6:11.0f} "
              f"{s['diskBytesSpilled']/1e6:12.0f} "
              f"{s['shuffleReadBytes']/1e6:9.0f} "
              f"{s['shuffleWriteBytes']/1e6:9.0f}  {s['name'][:48]}")


if __name__ == "__main__":
    main()
