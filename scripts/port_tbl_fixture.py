#!/usr/bin/env python
"""One-time fixture extractor for the reference's *random test
tables*: parses the pg_dump COPY blocks in
`/root/reference/test/scripts/load.sql.xz` (the dataset its `*_tbl`
regression suites ran against — value-domain tables tbl_period,
tbl_tfloat, ... 100 rows each, *_big ~10-12.5k) into
tests/fixtures/tbl/<name>.parquet with columns (k:int64,
v:string|null).  Values stay as the reference's own literals; the
runners parse them with the engine's parsers.

NOTE the POINT-layer tables (tbl_tgeompoint, ...) were never
committed upstream — `point/test/scripts/dump_test_tables_postgis*`
hold only the pg_dump COMMAND, so the point `*_tbl` suites
(66_tpoint_spatialrels_tbl etc.) are NOT reproducible verbatim; the
base-layer ones here are."""

from __future__ import annotations

import lzma
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/reference/test/scripts/load.sql.xz"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "tbl")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    tables: dict[str, tuple[list[int], list[str | None]]] = {}
    cur = None
    with lzma.open(SRC, "rt") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("COPY public."):
                name = line.split()[1].split(".", 1)[1]
                cur = tables.setdefault(name, ([], []))
                continue
            if line == "\\.":
                cur = None
                continue
            if cur is None:
                continue
            k, v = line.split("\t", 1)
            cur[0].append(int(k))
            cur[1].append(None if v == "\\N" else v)
    for name, (ks, vs) in sorted(tables.items()):
        t = pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(vs, pa.string())})
        pq.write_table(t, os.path.join(OUT_DIR, f"{name}.parquet"),
                       compression="zstd")
        print(name, len(ks))


if __name__ == "__main__":
    main()
