"""Mimic the driver's correctness gate locally: every queries() entry
must match its DuckDB oracle on sf0.01 (row count, column names,
order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 6) if math.isfinite(v) else str(v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(map(repr, rows))


# queries whose oracle parity would be vacuous on an empty result —
# assert they return rows (r3 verdict: geog_dwithin_join was green
# with 0 rows on both sides, proving nothing about the math)
NONEMPTY = {"geog_dwithin_join", "cosine_dedup", "cosine_neardup_lsh",
            "dwithin_join", "interval_join", "minhash_dedup",
            "simhash_pairs", "cosine_neardup_banded", "trajectory_wkt",
            "spatial_rels_rect", "nad_line"}


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = duck.sql(entry_mod.oracle_sql()[name]).df()
    if name in NONEMPTY:
        assert len(sdf) > 0, f"{name}: vacuous (0-row) parity"
    assert sorted(sdf.columns) == sorted(odf.columns), \
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    a, b = _canon(sdf), _canon(odf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"url", "poly_id", "cell", "zoom", "tile_x", "tile_y"} <= \
        set(df.columns)
