"""Unit tests for the cell grid + geometry kernels (pure numpy)."""

import numpy as np
import pytest

from mobilitydb_spark import cells, geo


def test_cell_roundtrip_bounds():
    lon = np.array([-10.0, 0.0, 8.123, 34.999, 179.999, -179.999])
    lat = np.array([32.0, 0.0, 50.456, 71.999, 89.9, -89.9])
    for res in (0, 3, 9, 15, 29):
        c = cells.cell_np(lon, lat, res)
        assert (cells.cell_res(c) == res).all()
        lo, la0, hi, la1 = cells.cell_bounds(c)
        assert (lo <= lon).all() and (lon <= hi).all()
        assert (la0 <= lat).all() and (lat <= la1).all()


def test_cell_parent_consistent():
    lon = np.linspace(-179, 179, 50)
    lat = np.linspace(-89, 89, 50)
    fine = cells.cell_np(lon, lat, 12)
    coarse = cells.cell_np(lon, lat, 7)
    assert (cells.cell_parent_np(fine, 7) == coarse).all()


def test_grid_disk_contains_self_and_neighbors():
    c = cells.cell_np(np.array([8.0]), np.array([50.0]), 10)
    disk = cells.grid_disk_np(c, 1)
    assert disk.shape == (1, 9)
    assert c[0] in disk[0]
    assert len(np.unique(disk[0])) == 9


def test_grid_disk_wraps_antimeridian():
    c = cells.cell_np(np.array([-179.99]), np.array([0.0]), 8)
    disk = cells.grid_disk_np(c, 1)
    xs = (disk[0] >> cells.X_BITS) & (cells.X_SHIFT - 1)
    n = 1 << 8
    assert (n - 1) in xs and 0 in xs  # wrapped across the antimeridian


def test_cover_bbox_covers_points():
    cover = set(cells.cover_bbox_np(7.0, 49.0, 9.0, 51.0, 10).tolist())
    rng = np.random.default_rng(0)
    lon = rng.uniform(7.0, 9.0, 200)
    lat = rng.uniform(49.0, 51.0, 200)
    pts = cells.cell_np(lon, lat, 10)
    assert all(int(p) in cover for p in pts)


def test_cover_bbox_coarsens_under_cap():
    cover = cells.cover_bbox_np(-10, 32, 35, 72, 15, max_cells=256)
    assert len(cover) <= 256
    assert int(cells.cell_res(cover)[0]) < 15


def test_wkb_roundtrip_polygon():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    g = geo.from_wkb(geo.polygon_wkb(ring, [hole]))
    assert g.kind == "Polygon" and len(g.parts) == 2
    np.testing.assert_allclose(g.parts[0], ring)
    assert g.bounds() == (0.0, 0.0, 4.0, 4.0)


def test_pip_square_with_hole():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    g = geo.from_wkb(geo.polygon_wkb(ring, [hole]))
    px = np.array([2.0, 1.5, 5.0, 0.0, 3.9])
    py = np.array([3.0, 1.5, 1.0, 0.0, 0.1])
    got = geo.points_in_polygon(px, py, g)
    #            in    hole  out   edge  in
    assert got.tolist() == [True, False, False, True, True]


def test_pip_empty_geometry():
    g = geo.Geometry("Polygon", [])
    assert not geo.points_in_polygon(np.array([1.0]), np.array([1.0]), g).any()


def test_haversine_known_value():
    # 1 degree of longitude at the equator ≈ 111.19 km (mean-radius sphere)
    d = geo.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d / 1000.0 - 111.195) < 0.01


def test_point_segment_dist():
    d, t = geo.point_segment_dist(
        np.array([0.0, 5.0]), np.array([1.0, 0.0]),
        np.array([0.0, 0.0]), np.array([0.0, 0.0]),
        np.array([4.0, 4.0]), np.array([0.0, 0.0]))
    np.testing.assert_allclose(d, [1.0, 1.0])
    np.testing.assert_allclose(t, [0.0, 1.0])


def test_polygon_index_matches_bruteforce():
    from mobilitydb_spark import fixtures
    pdf = fixtures.polygons_pd("admin", 32)
    idx = geo.PolygonIndex(
        list(zip(pdf["poly_id"], pdf["geom_wkb"])), res=6)
    rng = np.random.default_rng(1)
    lon = rng.uniform(-10, 35, 500)
    lat = rng.uniform(32, 72, 500)
    pt, pid = idx.contains_points(lon, lat)
    got = set(zip(pt.tolist(), pid.tolist()))
    want = set()
    for _, row in pdf.iterrows():
        g = geo.from_wkb(row["geom_wkb"])
        if g.is_empty:
            continue
        hits = geo.points_in_polygon(lon, lat, g)
        for i in np.nonzero(hits)[0]:
            want.add((int(i), int(row["poly_id"])))
    assert got == want


def test_segment_crosses_polygon():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    g = geo.from_wkb(geo.polygon_wkb(ring))
    got = geo.segment_crosses_polygon(
        np.array([-1.0, 1.0, 5.0]), np.array([2.0, 1.0, 5.0]),
        np.array([2.0, 2.0, 6.0]), np.array([2.0, 2.0, 6.0]), g)
    assert got.tolist() == [True, False, False]


def test_raster_vector_roundtrip(spark):
    """rasterize → vectorize → rasterize is a fixed point, and total
    counts are conserved (north rule raster↔vector tiles)."""
    import numpy as np
    import pandas as pd
    from mobilitydb_spark import tiles
    from pyspark.sql import functions as F
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"lon": rng.uniform(-10, 35, 4000),
                        "lat": rng.uniform(32, 72, 4000)})
    pts = spark.createDataFrame(pdf)
    ras = tiles.rasterize_tiles(pts, zoom=6, px=16).cache()
    total = ras.select(
        F.aggregate("raster", F.lit(0).cast("long"),
                    lambda a, v: a + v).alias("s")) \
        .agg(F.sum("s")).collect()[0][0]
    assert total == 4000
    vec = tiles.vectorize_raster(ras, zoom=6, px=16)
    # re-rasterizing the weighted pixel centers reproduces the raster
    ras2 = tiles.rasterize_tiles(
        vec.withColumn("w", F.col("n"))
           .selectExpr("lon", "lat", "explode(sequence(1, n)) AS _i")
           .select("lon", "lat"),
        zoom=6, px=16)
    a = {(r.tile_x, r.tile_y): tuple(r.raster) for r in ras.collect()}
    b = {(r.tile_x, r.tile_y): tuple(r.raster) for r in ras2.collect()}
    assert a == b and len(a) > 0
