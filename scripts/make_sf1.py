#!/usr/bin/env python
"""Synthesize a deterministic sf1-equivalent test-data dir by 10x
key-shifted replication of the driver's sf0.1 parquet tables
(r3 verdict stretch: one sf1 rehearsal of the full bench suite to
confirm no query's constant term explodes).

Replication policy per table:
- dims (region, nation) copy through unchanged;
- fact tables shift every key column by copy * OFFSET so joins stay
  consistent within a copy and never cross copies;
- events also shifts user_id (the temporal-kernel member key) so the
  member count scales 10x like a real sf1 would;
- documents perturbs the text per copy (a copy-tag token) — a plain
  10x duplication would plant 45 exact-dup pairs per doc and blow the
  near-dup pair queries quadratically, which is NOT what a larger
  crawl looks like;
- embeddings adds small deterministic per-copy noise + renormalizes,
  preserving the cosine structure without exact duplicates.

Pure DuckDB, no Spark (safe to run next to nothing; do NOT run while
a benchmark is running).  Output: .cache/sf1/<table>.parquet
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".cache", "sf1")
COPIES = 10
OFF = 100_000_000  # key shift per copy; far above any sf0.1 key


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')")
    con.execute(f"CREATE VIEW copies AS "
                f"SELECT CAST(range AS BIGINT) AS c FROM range({COPIES})")

    def emit(name: str, sql: str) -> None:
        out = os.path.join(DST, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(name, n)

    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit("customer", f"""
        SELECT c_custkey + c * {OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM customer CROSS JOIN copies""")
    emit("supplier", f"""
        SELECT s_suppkey + c * {OFF} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM supplier CROSS JOIN copies""")
    emit("part", f"""
        SELECT p_partkey + c * {OFF} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part CROSS JOIN copies""")
    emit("orders", f"""
        SELECT o_orderkey + c * {OFF} AS o_orderkey,
               o_custkey + c * {OFF} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN copies""")
    emit("lineitem", f"""
        SELECT l_orderkey + c * {OFF} AS l_orderkey,
               l_partkey + c * {OFF} AS l_partkey,
               l_suppkey + c * {OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN copies""")
    emit("events", f"""
        SELECT event_id + c * {OFF} AS event_id, ts,
               user_id + c * 10000 AS user_id, event_type, value, props
        FROM events CROSS JOIN copies""")
    emit("documents", f"""
        SELECT doc_id + c * {OFF} AS doc_id,
               CASE WHEN c = 0 THEN text
                    ELSE text || ' copytag' || CAST(c AS VARCHAR) ||
                         'x' || CAST(doc_id % 97 AS VARCHAR) END AS text,
               lang, source,
               n_chars + CASE WHEN c = 0 THEN 0 ELSE 12 END AS n_chars
        FROM documents CROSS JOIN copies""")
    # embeddings: deterministic per-(copy, index) noise, renormalized
    emit("embeddings", f"""
        WITH noisy AS (
            SELECT vec_id + c * {OFF} AS vec_id,
                   list_transform(
                       list_zip(embedding,
                                range(1, len(embedding) + 1)),
                       z -> CAST(z[1] AS DOUBLE) + CASE WHEN c = 0
                            THEN 0.0 ELSE
                            (CAST(hash(vec_id * 131 + c * 7919
                                       + CAST(z[2] AS BIGINT))
                                  % 1000 AS DOUBLE) / 1000.0 - 0.4995)
                            * 0.02 END) AS e,
                   label
            FROM embeddings CROSS JOIN copies)
        SELECT vec_id,
               CAST(list_transform(e, x -> CAST(x / sqrt(
                    list_sum(list_transform(e, y -> y * y)))
                    AS FLOAT)) AS FLOAT[]) AS embedding,
               label
        FROM noisy""")


if __name__ == "__main__":
    sys.exit(main())
