"""Bucketed-table deployment evidence for the 100 TB story.

PLANS.md and the scaling docs claim the per-key temporal kernels'
exchange disappears when the events table is stored bucketed by the
member key (Iceberg `bucket(key)` / Hive bucketBy) — the shape the
`tagg_prepart` scaling half simulates with a cached repartition.
This test proves the claim against Spark's actual planner: the same
`temporal_agg_profile` plan over a `bucketBy(key)` table contains NO
exchange on `key` (the bucketed scan's HashPartitioning satisfies the
window's ClusteredDistribution), while the plain-parquet plan does —
and both return identical results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobilitydb_spark import spark_temporal as ST

BASE_US = 946_684_800_000_000  # 2000-01-01
PROBES = [BASE_US + h * 3_600_000_000 for h in range(24)]


def _events(spark, n=20_000, keys=500):
    return spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(keys)).alias("key"),
        F.timestamp_micros(
            F.lit(BASE_US)
            + F.pmod(F.xxhash64("id", F.lit(1)),
                     F.lit(86_400_000_000))).alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("v"))


def _n_key_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange hashpartitioning(key" in line)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    import shutil
    ev = _events(spark)
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    # the in-memory catalog forgets tables between sessions but the
    # managed location persists — clear it or saveAsTable refuses
    loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{loc}/ev_bucketed", ignore_errors=True)
    (ev.write.mode("overwrite").bucketBy(8, "key").sortBy("key", "t")
       .format("parquet").saveAsTable("ev_bucketed"))
    yield spark.table("ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    shutil.rmtree(f"{loc}/ev_bucketed", ignore_errors=True)


def test_bucketed_tagg_has_no_key_exchange(spark, bucketed):
    plain = _events(spark)
    prof_plain = ST.temporal_agg_profile(plain, PROBES)
    prof_bucketed = ST.temporal_agg_profile(bucketed, PROBES)
    # plain parquet/range input: the per-key window needs one exchange
    assert _n_key_exchanges(prof_plain) >= 1
    # bucketed table: the scan itself provides hashpartitioning(key) —
    # zero exchanges on key anywhere in the plan
    assert _n_key_exchanges(prof_bucketed) == 0
    # and the answers agree (sum/avg partials combine in a different
    # order across the two physical plans — compare at 1e-6)
    def canon(rows):
        return sorted(tuple(round(x, 6) if isinstance(x, float) else x
                            for x in r) for r in rows)
    a = canon(prof_plain.collect())
    b = canon(prof_bucketed.collect())
    assert a == b
    assert len(a) > 0


def test_bucketed_groupby_has_no_key_exchange(spark, bucketed):
    agg = bucketed.groupBy("key").agg(F.count(F.lit(1)).alias("n"),
                                      F.avg("v").alias("m"))
    assert _n_key_exchanges(agg) == 0
    assert agg.count() == 500
