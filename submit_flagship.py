#!/usr/bin/env python
"""spark-submit entrypoint for the flagship pipeline (north rule).

Cluster usage:

    spark-submit --py-files mobilitydb_spark.zip submit_flagship.py \
        --pages /path/to/pages_parquet_or_iceberg \
        --out   /path/to/output \
        --buckets 256 --zoom 12

Local sandbox (synthesises the pages table first):

    python submit_flagship.py --synthesize 100000 --out /tmp/flagship_out

The run is resumable: per-bucket lineage rows are written under
``<out>/_lineage`` and finished buckets are skipped on re-run
(`pipeline.run_partitioned`).  A tile pyramid (zoom 0..--zoom) is
materialized under ``<out>/_pyramid`` partitioned by zoom.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet)")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--polygons", type=int, default=64,
                    help="admin polygon layer size (broadcast path)")
    args = ap.parse_args()

    from mobilitydb_spark import fixtures, pipeline, tiles
    from mobilitydb_spark.session import get_spark

    spark = get_spark("mobilitydb-spark-flagship")
    if args.synthesize:
        pages = fixtures.pages(spark, args.synthesize)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synthesize is required")

    polys = fixtures.polygons_pd("admin", args.polygons)
    stats = pipeline.run_partitioned(spark, pages, polys, args.out,
                                     n_buckets=args.buckets, zoom=args.zoom)
    pyr = tiles.build_pyramid(pipeline.extract_points(pages),
                              max_zoom=args.zoom, min_zoom=0)
    tiles.write_pyramid(pyr, os.path.join(args.out, "_pyramid"))
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
