#!/usr/bin/env python
"""Scaling-efficiency measurement (north rule: same job, two
parallelism levels, efficiency ≥ 0.8).

Runs the heavy spatial workload — flagship PIP+tiles over 1M pages,
tile pyramid, shuffle PIP join — ``--reps`` times at one master and
prints per-op MEDIANS as one JSON line.  Medians + a big input kill
the two artifacts that invalidated naive runs on this shared host:
straggler spikes from neighbor noise, and fixed-overhead domination
at small inputs.

Usage:  python scripts/scaling_run.py --cpus 8 [--reps 3] [--pages 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pages", type=int, default=4_000_000)
    ap.add_argument("--join-pages", type=int, default=1_000_000)
    ap.add_argument("--ops", type=str, default="",
                    help="comma list to restrict ops (e.g. minhash)")
    ap.add_argument("--minhash-mod", type=int, default=5,
                    help="keep docs with xxhash64(url) %% mod == 0")
    ap.add_argument("--shuffle-mult", type=int, default=1,
                    help="shuffle partitions = mult * cpus")
    ap.add_argument("--executors", type=int, default=0,
                    help="run on local-cluster[N,4,9216] — N separate "
                         "4-core executor JVMs (8g each) instead of "
                         "N*4 threads in one JVM; the faithful sandbox "
                         "proxy for the north rule's 'N vs 4N "
                         "executors' (per-executor heap, GC, and "
                         "allocator are isolated; only the host's "
                         "memory bus stays shared). --cpus is ignored.")
    args = ap.parse_args()
    if args.executors:
        args.cpus = 4 * args.executors

    from mobilitydb_spark import fixtures, joins, pipeline, tiles
    from mobilitydb_spark.session import get_spark

    # Memory scales WITH the parallelism level (2 GB/core unless the
    # caller pinned SPARK_GRAFT_DRIVER_MEM): the north rule compares
    # the same job on two CLUSTER SIZES, and a cluster of 4x the
    # executors brings 4x the executor memory with it.  Pinning one
    # fixed heap while quadrupling cores models a different hardware
    # change — per-task execution memory shrinks 4x, and any
    # memory-hungry stage (e.g. the kNN top-k window sort: ~6 GB of
    # in-flight rows at the 8M x 1M workload) starts spilling ONLY in
    # the high-core half, which reads as fake non-scaling work (kNN
    # pair measured 0.53 at a fixed 8 GB heap with 13 GB of sort
    # spill at 16 cores vs in-memory at 4; see
    # BENCH/quiet_knn_interval_r5.log).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM",
                          "8g" if args.executors else f"{2 * args.cpus}g")

    # 1x cores shuffle partitions (the get_spark default): the old
    # "4x waves even out stragglers" heuristic COST the 16-core tagg
    # half ~70% (sp=64: 7.1-7.9 s vs sp=16: 4.2 s, in-process clean
    # windows, r5) — four task waves of fixed overhead on a 240-group
    # reduce, while the straggler risk it hedged is now visible
    # directly in the per-rep external_cores attestation.
    if args.executors:
        # 2 GB/core executors, matching the thread-mode memory model;
        # worker JVM gets 1 GiB headroom over spark.executor.memory
        spark = get_spark(
            "scaling", master=f"local-cluster[{args.executors},4,9216]",
            shuffle_partitions=args.shuffle_mult * args.cpus,
            extra_conf={"spark.executor.memory": "8g",
                        "spark.executorEnv.PYTHONPATH": REPO})
    else:
        spark = get_spark("scaling", master=f"local[{args.cpus}]",
                          shuffle_partitions=args.shuffle_mult * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def pages_at(n):
        path = os.path.join(REPO, ".cache", "bench", f"pages_{n}.parquet")
        if not os.path.exists(path):
            fixtures.pages(spark, n, partitions=256) \
                .write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    pages = pages_at(args.pages)
    jpages = pages_at(args.join_pages)
    admin = fixtures.polygons_pd("admin", 64)
    grid_df = spark.createDataFrame(
        fixtures.polygons_pd("grid", 4096),
        "poly_id bigint, layer string, geom_wkb binary, srid int")

    def force(df):
        """Evaluate EVERY output column (a bare .count() lets Catalyst
        prune unused expressions — a pure-Catalyst op would be timed
        hollow)."""
        cols = [F.col(c) for c in df.columns]
        return df.select(F.count(F.lit(1)).alias("n"),
                         F.bit_xor(F.xxhash64(*cols)).alias("chk")).collect()

    # dedup workload: MinHash+LSH over the pages' text column (the
    # 100 TB pipeline's near-dup pass) — url-hashed doc ids; a
    # deterministic hash filter (NOT limit(), which collapses
    # parallelism) keeps the op inside the rep budget
    from pyspark.sql import functions as F
    from mobilitydb_spark.datagen import dedup
    docs = jpages.select(F.xxhash64("url").alias("doc_id"), "text") \
        .where(F.pmod(F.col("doc_id"), F.lit(args.minhash_mod)) == 0)

    # global temporal-aggregate workload (the r2 verdict's scale-killer,
    # now pure Catalyst): synthetic instants over many members,
    # 3-hourly probes across the month — sized so the window+agg work
    # dominates fixed job overheads (sub-5 s jobs measure ~0.5
    # "efficiency" from overhead alone)
    from mobilitydb_spark import aggs as AG
    from mobilitydb_spark import spark_temporal as ST
    base_us = 1_704_067_200_000_000  # 2024-01-01
    span_us = 30 * 86_400_000_000
    ev = pages.select(
        F.pmod(F.xxhash64("url"), F.lit(100_000)).alias("key"),
        F.timestamp_micros(
            F.lit(base_us)
            + F.pmod(F.xxhash64("url", F.lit(1)), F.lit(span_us))).alias("t"),
        (F.pmod(F.xxhash64("url", F.lit(2)), F.lit(10_000)) / 100.0)
        .alias("v"))
    probes = [base_us + h * 3 * 3_600_000_000 for h in range(240)]

    # kNN-join workload: ONE hash-placed point per join-page row (the
    # in-text geotags are too sparse — ~2% of pages — to make a heavy
    # corpus), clustered toward a hot band by squaring the longitude
    # hash so the density-adaptive ladder actually splits levels; a
    # deterministic 1-in-64 hash slice are the queries (NOT limit(),
    # which collapses parallelism).  Exercises the full ladder:
    # per-cell counts at every resolution, broadcast count join, disk
    # explode, windowed top-k.
    hx = F.pmod(F.xxhash64("url", F.lit(5)), F.lit(1_000_000))
    knn_c = jpages.select(
        F.xxhash64("url", F.lit(6)).alias("c_id"),
        (hx * hx / F.lit(1e12) * 340.0 - 170.0).alias("lon"),
        (F.pmod(F.xxhash64("url", F.lit(7)), F.lit(1_600_000))
         / 10_000.0 - 80.0).alias("lat"))
    # 1-in-8: kNN-join cost is query-count-bound (each query touches
    # ~target_cands candidates regardless of corpus size), so the
    # query side must scale with the corpus for the pair to measure
    # the join rather than the fixed job floor.  The slice REMAINDER
    # rotates per call: knn_join persists its ranked result
    # internally, so an identical lambda re-run is served from
    # Spark's plan cache and times hollow (measured: 6.9 s "rep" vs
    # 64 s true cost).  Rotating gives every rep an equal-sized,
    # disjoint, hash-uniform query set and full re-execution; the
    # corpus-side cell cache (cpts) is plan-identical across calls
    # and stays warm, which is the deployment shape — corpus prep
    # amortizes, per-query work does not.
    knn_i = {"i": 0}

    def knn_op():
        rem = knn_i["i"] % 8
        knn_i["i"] += 1
        q = knn_c.where(F.pmod(F.col("c_id"), F.lit(8)) == rem).select(
            F.col("c_id").alias("q_id"), "lon", "lat")
        # defensive env parse (r5 advice): an exported-but-empty or
        # non-integer value must not crash the scaling half
        partial = os.environ.get(
            "SPARK_GRAFT_KNN_PARTIAL_TOPK", "0").strip().lower() \
            in ("1", "true", "yes")
        return joins.knn_join(q, knn_c, 5, partial_topk=partial).count()

    # interval-join workload: one span per join-page row over a 30-day
    # domain, duration 0-100 s (hash-distributed) so the expected pair
    # count stays ~n*avg_overlap rather than quadratic; even/odd hash
    # split gives the two sides.  Exercises the auto bucket sizing,
    # the long-span split and the claim-by-first-common-bucket dedup.
    sp = jpages.select(
        F.xxhash64("url").alias("sid"),
        (F.lit(base_us)
         + F.pmod(F.xxhash64("url", F.lit(3)), F.lit(span_us)))
        .alias("t0_us"),
        F.pmod(F.xxhash64("url", F.lit(4)), F.lit(100_000_000))
        .alias("dur"))
    sp = sp.select("sid", "t0_us",
                   (F.col("t0_us") + F.col("dur")).alias("t1_us"))
    iv_l = sp.where(F.pmod(F.col("sid"), F.lit(2)) == 0) \
        .select(F.col("sid").alias("l_id"), "t0_us", "t1_us")
    iv_r = sp.where(F.pmod(F.col("sid"), F.lit(2)) == 1) \
        .select(F.col("sid").alias("r_id"), "t0_us", "t1_us")

    ops = {
        "flagship": lambda: pipeline.flagship(pages, admin, zoom=12).count(),
        "pyramid": lambda: tiles.build_pyramid(
            pipeline.extract_points(pages), max_zoom=12, min_zoom=0).count(),
        "pip_shuffle": lambda: joins.pip_join_shuffle(
            pipeline.extract_points(jpages), grid_df, res=10).count(),
        "minhash": lambda: dedup.minhash_lsh_pairs(docs).count(),
        "tagg": lambda: force(ST.temporal_agg_profile(ev, probes)),
        # bucketed-table variant: input pre-partitioned by member (the
        # 100 TB deployment shape — Iceberg bucket(key)), so the
        # window's exchange is absent and the pair isolates the
        # codegen lerp+aggregate path from one-time shuffle IO
        "tagg_prepart": lambda: force(
            ST.temporal_agg_profile(ev_prepart, probes)),
        "tcount_seq": lambda: force(AG.tcount_sequences(
            ev.select(F.col("key").alias("mkey"), "t"))),
        "knn": knn_op,
        "interval": lambda: joins.interval_join(iv_l, iv_r).count(),
    }
    if "tagg_prepart" in (set(args.ops.split(",")) if args.ops else ops):
        ev_prepart = ev.repartition(4 * args.cpus, "key").persist()
        ev_prepart.count()  # materialize the cache before timing
    if args.ops:
        keep = set(args.ops.split(","))
        ops = {k: v for k, v in ops.items() if k in keep}
    for fn in ops.values():  # warm-up EVERY op untimed (JIT + workers)
        fn()

    med: dict[str, float] = {}
    raw: dict[str, list[float]] = {k: [] for k in ops}
    from bench import _bandwidth_canary_gbps, _ext_cores, _proc_sample
    canary_start = _bandwidth_canary_gbps()
    ext: dict[str, list[float]] = {k: [] for k in ops}
    for _ in range(args.reps):
        for name, fn in ops.items():
            s0 = _proc_sample()
            t0 = time.time()
            fn()
            wall = time.time() - t0
            s1 = _proc_sample()
            raw[name].append(round(wall, 3))
            # avg busy cores NOT in our own process subtree during the
            # rep — each rep attests its own window (r4 verdict);
            # churn-robust per-pid deltas (see bench._proc_sample)
            ext[name].append(round(_ext_cores(s0, s1, wall), 2))
    for name in ops:
        med[name] = round(statistics.median(raw[name]), 3)
    print(json.dumps({
        "cpus": args.cpus, "n_pages": args.pages, "reps": args.reps,
        **({"executors": args.executors} if args.executors else {}),
        "median_sec": med, "raw_sec": raw, "external_cores": ext,
        # memory-bus canary (GB/s, fixed 1 GiB copy) at run start/end:
        # co-tenant bandwidth pressure is invisible to the CPU-time
        # attestation — compare canaries between a pair's two halves
        "membw_canary_gbps": [canary_start, _bandwidth_canary_gbps()],
        **({"flagship_pages_per_sec":
            round(args.pages / med["flagship"], 1)}
           if "flagship" in med else {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
