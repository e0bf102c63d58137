"""Distributed join strategy tests: shuffle PIP (± salting), dwithin,
kNN — each checked against a brute-force reference."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mobilitydb_spark import fixtures, geo, joins, pipeline


@pytest.fixture(scope="module")
def pts(spark):
    # extracted geotag points from the deterministic pages fixture
    pages = fixtures.pages(spark, 400)
    df = (pipeline.extract_points(pages)
          .select("url", "tag_idx", "lon", "lat").cache())
    df.count()
    return df


@pytest.fixture(scope="module")
def grid_polys(spark):
    return fixtures.polygons_pd("grid", 256)


def _brute_pip(pts_pdf, polys_pdf):
    want = set()
    for _, prow in polys_pdf.iterrows():
        g = geo.from_wkb(prow["geom_wkb"])
        if g.is_empty:
            continue
        hit = geo.points_in_polygon(pts_pdf["lon"].to_numpy(),
                                    pts_pdf["lat"].to_numpy(), g)
        for i in np.nonzero(hit)[0]:
            want.add((pts_pdf["url"].iloc[i], int(pts_pdf["tag_idx"].iloc[i]),
                      int(prow["poly_id"])))
    return want


def test_shuffle_join_matches_bruteforce(spark, pts, grid_polys):
    polys_df = spark.createDataFrame(
        grid_polys, "poly_id bigint, layer string, geom_wkb binary, srid int")
    got = joins.pip_join_shuffle(pts, polys_df, res=10)
    got_set = {(r["url"], r["tag_idx"], r["poly_id"])
               for r in got.collect()}
    want = _brute_pip(pts.toPandas(), grid_polys)
    assert got_set == want and len(want) > 0


def test_shuffle_join_salted_same_result(spark, pts, grid_polys):
    polys_df = spark.createDataFrame(
        grid_polys, "poly_id bigint, layer string, geom_wkb binary, srid int")
    # force-salt every populated cell: results must be identical
    hot = [r["cell"] for r in
           pts.select(joins.cells.cell_col(F.col("lon"), F.col("lat"), 10)
                      .alias("cell")).distinct().collect()]
    plain = joins.pip_join_shuffle(pts, polys_df, res=10)
    salted = joins.pip_join_shuffle(pts, polys_df, res=10,
                                    hot=hot, n_salts=4)
    a = {(r["url"], r["tag_idx"], r["poly_id"]) for r in plain.collect()}
    b = {(r["url"], r["tag_idx"], r["poly_id"]) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_hot_cells_detects_skew_cluster(spark, pts):
    # the fixtures put ~30% of tags in a 0.2° cluster at (8E, 50N)
    hot = joins.hot_cells(pts, res=6, threshold=pts.count() // 10)
    assert len(hot) >= 1
    import mobilitydb_spark.cells as C
    hot_cell = C.cell_np(np.array([8.0]), np.array([50.0]), 6)[0]
    assert int(hot_cell) in [int(h) for h in hot]


def test_dwithin_join_matches_bruteforce(spark, pts):
    a = pts.select(F.concat_ws("#", "url", "tag_idx").alias("l_id"),
                   "lon", "lat").limit(150).cache()
    b = pts.select(F.concat_ws("#", "url", "tag_idx").alias("r_id"),
                   "lon", "lat")
    d = 0.5
    got = {(r["l_id"], r["r_id"]) for r in
           joins.dwithin_join(a, b, d, res=8).collect()}
    apdf = a.toPandas()
    bpdf = b.toPandas()
    ax = apdf["lon"].to_numpy()[:, None]
    ay = apdf["lat"].to_numpy()[:, None]
    bx = bpdf["lon"].to_numpy()[None, :]
    by = bpdf["lat"].to_numpy()[None, :]
    dist = np.sqrt((ax - bx) ** 2 + (ay - by) ** 2)
    want = {(apdf["l_id"].iloc[i], bpdf["r_id"].iloc[j])
            for i, j in zip(*np.nonzero(dist <= d))}
    assert got == want and len(want) > 0


def test_knn_join_matches_bruteforce(spark, pts):
    q = pts.select(F.concat_ws("#", "url", "tag_idx").alias("q_id"),
                   "lon", "lat").limit(40).cache()
    c = pts.select(F.concat_ws("#", "url", "tag_idx").alias("c_id"),
                   "lon", "lat")
    k = 5
    got = joins.knn_join(q, c, k, resolutions=(12, 10, 8),
                         rings=1, target_cands=8).toPandas()
    qpdf = q.toPandas()
    cpdf = c.toPandas()
    for _, qrow in qpdf.iterrows():
        d = np.sqrt((cpdf["lon"] - qrow["lon"]) ** 2
                    + (cpdf["lat"] - qrow["lat"]) ** 2)
        mask = cpdf["c_id"] != qrow["q_id"]
        order = sorted(zip(d[mask], cpdf["c_id"][mask]))[:k]
        want_ids = [cid for _, cid in order]
        got_ids = got[got["q_id"] == qrow["q_id"]] \
            .sort_values("rank")["c_id"].tolist()
        assert got_ids == want_ids, qrow["q_id"]


def test_knn_partial_topk_output_identical(spark, pts):
    """The per-partition top-k reduction (joins._partition_topk) must
    be output-invariant: the union of per-partition k-smallest sets is
    a superset of the true top-k, and sum_i min(k, n_i) >= min(k, n)
    keeps the found>=k guarantee count faithful.  Exercises q_ids whose
    candidates span several cell-hash partitions (string ids, multiple
    resolutions)."""
    q = pts.select(F.concat_ws("#", "url", "tag_idx").alias("q_id"),
                   "lon", "lat").limit(60).cache()
    c = pts.select(F.concat_ws("#", "url", "tag_idx").alias("c_id"),
                   "lon", "lat")
    kwargs = dict(resolutions=(12, 10, 8), rings=1, target_cands=8)
    base = joins.knn_join(q, c, 4, partial_topk=False, **kwargs) \
        .toPandas().sort_values(["q_id", "rank"], ignore_index=True)
    red = joins.knn_join(q, c, 4, partial_topk=True, **kwargs) \
        .toPandas().sort_values(["q_id", "rank"], ignore_index=True)
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, red)


def test_knn_widened_ring_retry_and_brute(spark):
    """Outlier queries: one whose kNN lies within the 4x widened retry
    radius (retry pass), one whose kNN is beyond it (brute pass) —
    both must still return the exact brute-force answer."""
    import pandas as pd
    rng = np.random.default_rng(3)
    cl_lon = 10.0 + rng.uniform(0, 0.2, 60)
    cl_lat = 50.0 + rng.uniform(0, 0.2, 60)
    cpdf = pd.DataFrame({"c_id": [f"c{i}" for i in range(60)],
                         "lon": cl_lon, "lat": cl_lat})
    qpdf = pd.DataFrame({
        "q_id": ["near_retry", "far_brute"],
        # ~1.5 deg away: outside 1 ring at res 8 (0.70 deg) but inside
        # the 4-ring retry radius (2.8 deg); ~15 deg away: beyond both
        "lon": [10.1 + 1.5, 10.1 + 15.0],
        "lat": [50.1, 50.1]})
    q = spark.createDataFrame(qpdf)
    c = spark.createDataFrame(cpdf)
    # budget 0 forces the widened-ring retry + brute machinery (the
    # tiny-remainder shortcut would otherwise own every toy-|C| case)
    got = joins.knn_join(q, c, 3, resolutions=(12, 10, 8),
                         rings=1, target_cands=8,
                         brute_pairs_budget=0).toPandas()
    for _, qrow in qpdf.iterrows():
        d = np.sqrt((cpdf["lon"] - qrow["lon"]) ** 2
                    + (cpdf["lat"] - qrow["lat"]) ** 2)
        want = [cid for _, cid in sorted(zip(d, cpdf["c_id"]))[:3]]
        got_ids = got[got["q_id"] == qrow["q_id"]] \
            .sort_values("rank")["c_id"].tolist()
        assert got_ids == want, qrow["q_id"]


def test_knn_tiny_remainder_brute_shortcut(spark):
    """Under-guaranteed queries with n_bad * |C| inside the pair
    budget take ONE broadcast brute map-stage instead of the ~15-stage
    ring retry (measured 14.6 s -> 4 s at sf0.01 bench scale for a
    single failed query) — results must equal brute force exactly."""
    import pandas as pd
    rng = np.random.default_rng(3)
    cpdf = pd.DataFrame({"c_id": [f"c{i}" for i in range(60)],
                         "lon": 10.0 + rng.uniform(0, 0.2, 60),
                         "lat": 50.0 + rng.uniform(0, 0.2, 60)})
    qpdf = pd.DataFrame({"q_id": ["near", "far", "very_far"],
                         "lon": [10.1, 11.6, 25.1],
                         "lat": [50.1, 50.1, 50.1]})
    q = spark.createDataFrame(qpdf)
    c = spark.createDataFrame(cpdf)
    got = joins.knn_join(q, c, 3, resolutions=(12, 10, 8),
                         rings=1, target_cands=8).toPandas()
    for _, qrow in qpdf.iterrows():
        d = np.sqrt((cpdf["lon"] - qrow["lon"]) ** 2
                    + (cpdf["lat"] - qrow["lat"]) ** 2)
        want = [cid for _, cid in sorted(zip(d, cpdf["c_id"]))[:3]]
        got_ids = got[got["q_id"] == qrow["q_id"]] \
            .sort_values("rank")["c_id"].tolist()
        assert got_ids == want, qrow["q_id"]


def test_interval_join_exact_once(spark):
    """Bucketed interval join: every overlapping pair exactly once
    (claimed by the bucket of max(start)), none missed, exact overlap
    microseconds — vs a brute pairwise check."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(13)
    D = 86_400_000_000
    n = 60
    starts = rng.integers(0, 30 * D, n)
    lens = rng.integers(D // 4, 10 * D, n)
    pdf = pd.DataFrame({"id": np.arange(n), "t0_us": starts,
                        "t1_us": starts + lens})
    df = spark.createDataFrame(pdf)
    l = df.selectExpr("id AS l_id", "t0_us", "t1_us")
    r = df.selectExpr("id AS r_id", "t0_us", "t1_us")
    got = joins.interval_join(l, r).toPandas()
    # exactly once per pair
    assert not got.duplicated(["l_id", "r_id"]).any()
    want = {}
    for a in pdf.itertuples():
        for b in pdf.itertuples():
            s = max(a.t0_us, b.t0_us)
            e = min(a.t1_us, b.t1_us)
            if s <= e:
                want[(a.id, b.id)] = e - s
    got_map = {(r_.l_id, r_.r_id): r_.overlap_us for r_ in got.itertuples()}
    assert got_map == want


def test_interval_join_long_span_broadcast_split(spark):
    """r3 verdict: a span covering ~1000 buckets must NOT explode to
    ~1000 bucket rows — it takes the broadcast nested-loop pass.  The
    result must still be exact and exactly-once against brute force,
    and the bucketed (short) relation must stay bounded."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(7)
    D = 86_400_000_000
    n = 50
    starts = rng.integers(0, 900 * D, n)
    lens = rng.integers(D // 4, 5 * D, n)
    ids = np.arange(n)
    pdf = pd.DataFrame({"id": ids, "t0_us": starts,
                        "t1_us": starts + lens})
    # one ~1000-bucket outlier span on each side
    pdf.loc[len(pdf)] = [777, 0, 1000 * D - 1]
    df = spark.createDataFrame(pdf)
    l = df.selectExpr("id AS l_id", "t0_us", "t1_us")
    r = df.selectExpr("id AS r_id", "t0_us", "t1_us")
    got = joins.interval_join(l, r, bucket_us=D).toPandas()
    assert not got.duplicated(["l_id", "r_id"]).any()
    want = {}
    for a in pdf.itertuples():
        for b in pdf.itertuples():
            s, e = max(a.t0_us, b.t0_us), min(a.t1_us, b.t1_us)
            if s <= e:
                want[(a.id, b.id)] = e - s
    got_map = {(x.l_id, x.r_id): x.overlap_us for x in got.itertuples()}
    assert got_map == want
    # auto bucket sizing must give the identical result
    got_auto = joins.interval_join(l, r).toPandas()
    auto_map = {(x.l_id, x.r_id): x.overlap_us
                for x in got_auto.itertuples()}
    assert auto_map == want
    # the outlier pairs with everything -> broadcast path carried them
    assert sum(1 for k in got_map if k[0] == 777) == len(pdf)
    # the short-side explode excludes the outlier: bounded row count
    from pyspark.sql import functions as F
    W = 86_400_000_000
    nb = (F.floor(F.col("t1_us") / W) - F.floor(F.col("t0_us") / W) + 1)
    exploded_short = df.where(nb <= 64).select(
        F.sum(nb).alias("rows")).collect()[0]["rows"]
    assert exploded_short < 1000  # vs ~1000 for the outlier alone


def test_interval_join_bimodal_auto_bucket(spark):
    """ADVICE r5 (low): on bimodal spans (half instants, half
    month-long) the median span is ~0 — auto sizing must floor the
    bucket with p90 so the month-long rows stay on the BUCKETED path
    (a 1us bucket would class them all 'long' and broadcast an
    unbounded relation into a nested-loop join).  Results must still
    be exact vs brute force."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(11)
    D = 86_400_000_000
    n = 60  # 30 instants + 30 month-long spans
    starts = rng.integers(0, 90 * D, n)
    lens = np.where(np.arange(n) % 2 == 0, 0,
                    rng.integers(28 * D, 32 * D, n))
    pdf = pd.DataFrame({"id": np.arange(n), "t0_us": starts,
                        "t1_us": starts + lens})
    df = spark.createDataFrame(pdf)
    l = df.selectExpr("id AS l_id", "t0_us", "t1_us")
    r = df.selectExpr("id AS r_id", "t0_us", "t1_us")
    got = joins.interval_join(l, r).toPandas()
    assert not got.duplicated(["l_id", "r_id"]).any()
    want = {}
    for a in pdf.itertuples():
        for b in pdf.itertuples():
            s, e = max(a.t0_us, b.t0_us), min(a.t1_us, b.t1_us)
            if s <= e:
                want[(a.id, b.id)] = e - s
    got_map = {(x.l_id, x.r_id): x.overlap_us for x in got.itertuples()}
    assert got_map == want
    # the sizing formula itself: W floored at p90 keeps every span's
    # bucket count within max_buckets, so the 'long' class is EMPTY
    spans = sorted(pdf["t1_us"] - pdf["t0_us"])
    med = spans[len(spans) // 2]
    p90 = spans[int(0.9 * (len(spans) - 1))]
    W = max(2 * med, p90, 1)
    nb = (pdf["t1_us"] // W) - (pdf["t0_us"] // W) + 1
    assert (nb <= 64).all()  # nothing takes the broadcast NL pass


def test_knn_adaptive_radius_output_identical(spark):
    """The density-adaptive filter radius (adaptive_factor) must be
    output-identical to the plain guarantee-radius path on a skewed
    corpus: a dense cluster (where r' << g genuinely tightens the
    filter) plus a sparse tail (coarsest-level fallback keeps g).
    Exactness argument in joins.knn_join's docstring: found >= k
    within ANY radius proves the top-k, failures retry."""
    rng = np.random.default_rng(11)
    dense_lon = 10.0 + rng.uniform(0, 0.1, 600)
    dense_lat = 50.0 + rng.uniform(0, 0.1, 600)
    sparse_lon = rng.uniform(-60, 60, 200)
    sparse_lat = rng.uniform(-40, 40, 200)
    cpdf = pd.DataFrame({
        "c_id": [f"c{i}" for i in range(800)],
        "lon": np.concatenate([dense_lon, sparse_lon]),
        "lat": np.concatenate([dense_lat, sparse_lat])})
    qpdf = cpdf.iloc[::17].rename(columns={"c_id": "q_id"}).copy()
    q = spark.createDataFrame(qpdf)
    c = spark.createDataFrame(cpdf)
    kwargs = dict(resolutions=(12, 10, 8), rings=1, target_cands=8)
    got_ad = (joins.knn_join(q, c, 4, adaptive_factor=9.0, **kwargs)
              .toPandas().sort_values(["q_id", "rank"])
              .reset_index(drop=True))
    got_g = (joins.knn_join(q, c, 4, adaptive_factor=None, **kwargs)
             .toPandas().sort_values(["q_id", "rank"])
             .reset_index(drop=True))
    assert len(got_ad) and len(got_ad) == len(got_g)
    pd.testing.assert_frame_equal(got_ad, got_g, check_like=True)
    # non-vacuity: a dense-cluster query's own-cell population at the
    # chosen level must exceed factor*k, otherwise r' never < g and
    # this test pins nothing
    assert (qpdf["lon"] < 11).sum() > 0


def test_knn_long_form_and_broadcast_queries_match_brute(spark):
    """Pin the two non-default knn_join ladder/join forms against
    brute force on the adaptive-radius fixture: the long-form shuffle
    ladder (broadcast_counts=False — the >50k-query scale path, where
    own_n comes from the sat join + the coarsest-level count table)
    and the broadcast_queries cover form. Both exercise the
    one-level-finer variable-ring cover introduced in r5-final."""
    rng = np.random.default_rng(23)
    dense_lon = 10.0 + rng.uniform(0, 0.1, 600)
    dense_lat = 50.0 + rng.uniform(0, 0.1, 600)
    sparse_lon = rng.uniform(-60, 60, 200)
    sparse_lat = rng.uniform(-40, 40, 200)
    cpdf = pd.DataFrame({
        "c_id": [f"c{i}" for i in range(800)],
        "lon": np.concatenate([dense_lon, sparse_lon]),
        "lat": np.concatenate([dense_lat, sparse_lat])})
    qpdf = cpdf.iloc[::13].rename(columns={"c_id": "q_id"}).copy()
    q = spark.createDataFrame(qpdf)
    c = spark.createDataFrame(cpdf)
    k = 3

    def brute(qrow):
        d = np.sqrt((cpdf["lon"] - qrow["lon"]) ** 2
                    + (cpdf["lat"] - qrow["lat"]) ** 2)
        mask = cpdf["c_id"] != qrow["q_id"]
        return [cid for _, cid in sorted(zip(d[mask],
                                             cpdf["c_id"][mask]))[:k]]

    kwargs = dict(resolutions=(12, 10, 8), rings=1, target_cands=8)
    for variant in (dict(broadcast_counts=False),
                    dict(broadcast_queries=True)):
        got = joins.knn_join(q, c, k, **kwargs, **variant).toPandas()
        for _, qrow in qpdf.iterrows():
            got_ids = got[got["q_id"] == qrow["q_id"]] \
                .sort_values("rank")["c_id"].tolist()
            assert got_ids == brute(qrow), (variant, qrow["q_id"])
