"""Hierarchical cell index ("mgrid") — the engine's H3/S2 stand-in.

The reference (MobilityDB) gets its spatial filter step from GiST
R-trees over STBOX keys (`point/src/tpoint_gist.c:51-199`) and an
SP-GiST oct-tree (`point/src/tpoint_spgist.c:1-60`).  Neither index
structure makes sense on Spark; the idiomatic equivalent is a
*cell-cover equi-join*: every geometry is expanded to the set of
hierarchical grid cells it touches, both join sides shuffle on the
cell id, and an exact kernel refines candidate pairs.  This module
defines that grid.

Scheme (deliberately simple, deterministic and **SQL-expressible**
so DuckDB oracles can reproduce cell ids exactly):

- equirectangular grid over lon ∈ [-180, 180), lat ∈ [-90, 90]
- at resolution ``r`` (0..29) each axis splits into ``2**r`` cells:
    x = clamp(floor((lon + 180) / 360 * 2^r), 0, 2^r - 1)
    y = clamp(floor((90 - lat) / 180 * 2^r), 0, 2^r - 1)
- packed id (non-negative int64):
    cell_id = r * 2^58 + x * 2^29 + y

Parent/child moves are bit shifts on x and y; ``grid_disk`` is the
k-ring of (x, y) neighbours with longitude wrap-around — the
equivalent of H3 ``grid_disk`` used by the reference's
``expandSpatial`` (`point/src/tpoint_boxops.c:440-538`) for dwithin
expansion.

Everything here exists in three forms:
  * numpy kernels (used inside Arrow/pandas UDFs),
  * Spark ``Column`` builders (pure built-in functions, stay in
    whole-stage codegen),
  * SQL snippet builders shared verbatim by Spark SQL and DuckDB
    (used by ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

R_BITS = 58
X_BITS = 29
X_SHIFT = 1 << X_BITS  # 2^29
R_SHIFT = 1 << R_BITS  # 2^58

# Earth mean radius in meters — shared by geo.haversine.
EARTH_RADIUS_M = 6371008.8

# meters per degree latitude (used for dwithin ring sizing)
M_PER_DEG_LAT = EARTH_RADIUS_M * np.pi / 180.0


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def xy_np(lon: np.ndarray, lat: np.ndarray, res: int):
    """Vectorized (x, y) cell coordinates at resolution ``res``."""
    n = 1 << res
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n)
    y = np.floor((90.0 - np.asarray(lat, dtype=np.float64)) / 180.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized lat/lng→cell (the h3.latlng_to_cell analog)."""
    x, y = xy_np(lon, lat, res)
    return (np.int64(res) << R_BITS) | (x << X_BITS) | y


def cell_res(cell: np.ndarray) -> np.ndarray:
    return np.asarray(cell, dtype=np.int64) >> R_BITS


def cell_xy(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    x = (cell >> X_BITS) & (X_SHIFT - 1)
    y = cell & (X_SHIFT - 1)
    return x, y


def cell_parent_np(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen a cell id to ``parent_res`` (h3 cell_to_parent analog)."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell_res(cell)
    dr = r - parent_res
    x, y = cell_xy(cell)
    return (np.int64(parent_res) << R_BITS) | ((x >> dr) << X_BITS) | (y >> dr)


def cell_bounds(cell: np.ndarray):
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    r = cell_res(cell)
    n = (np.int64(1) << r).astype(np.float64)
    x, y = cell_xy(cell)
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = 90.0 - y / n * 180.0
    lat_min = 90.0 - (y + 1) / n * 180.0
    return lon_min, lat_min, lon_max, lat_max


def grid_disk_np(cell: np.ndarray, k: int) -> np.ndarray:
    """k-ring neighbourhood, shape (len(cell), (2k+1)^2).

    Longitude wraps modulo 2^r; latitude clamps (duplicate rows at the
    poles are harmless for the filter step — refine dedupes).
    """
    cell = np.asarray(cell, dtype=np.int64)
    r = cell_res(cell)
    n = np.int64(1) << r
    x, y = cell_xy(cell)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    nx = (x[:, None] + dx) % n[:, None]
    ny = np.clip(y[:, None] + dy, 0, (n - 1)[:, None])
    return (r[:, None] << R_BITS) | (nx << X_BITS) | ny


def grid_rect_np(cell: np.ndarray, kx: int, ky: int) -> np.ndarray:
    """Rectangular (2kx+1)×(2ky+1) neighbourhood, shape
    (len(cell), (2kx+1)·(2ky+1)) — the per-axis form of
    ``grid_disk_np`` (r6): grid cells are twice as wide in longitude
    degrees as they are tall, so a square k-ring sized to the
    longitude radius over-covers latitude by ~2× (and the old
    ceil(deg/h)+1 sizing by another ring).  Longitude wraps modulo
    2^r; latitude clamps."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell_res(cell)
    n = np.int64(1) << r
    x, y = cell_xy(cell)
    ox = np.arange(-kx, kx + 1, dtype=np.int64)
    oy = np.arange(-ky, ky + 1, dtype=np.int64)
    dx, dy = np.meshgrid(ox, oy, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    nx = (x[:, None] + dx) % n[:, None]
    ny = np.clip(y[:, None] + dy, 0, (n - 1)[:, None])
    return (r[:, None] << R_BITS) | (nx << X_BITS) | ny


def cover_res_np(lon_min, lat_min, lon_max, lat_max, res: int,
                 max_cells: int = 4096) -> int:
    """The resolution ``cover_bbox_np`` would cover this bbox at.

    Bounds-only (no cell materialization) — lets a caller enumerate
    the distinct cover levels of a polygon layer without evaluating
    the full cover explosion."""
    r = res
    while r > 0:
        x0, y1 = xy_np(np.array([lon_min]), np.array([lat_min]), r)
        x1, y0 = xy_np(np.array([lon_max]), np.array([lat_max]), r)
        nx = int(x1[0] - x0[0] + 1)
        ny = int(y1[0] - y0[0] + 1)
        if nx * ny <= max_cells:
            break
        r -= 1
    return r


def cover_bbox_np(lon_min, lat_min, lon_max, lat_max, res: int,
                  max_cells: int = 4096) -> np.ndarray:
    """All cells at ``res`` whose box intersects the given bbox.

    The Spark stand-in for computing an R-tree key cover of an STBOX
    (`point/src/tpoint_boxops.c:246-538`).  If the bbox would need
    more than ``max_cells``, the resolution is coarsened — covers are
    conservative by construction, the refine step stays exact.
    """
    r = cover_res_np(lon_min, lat_min, lon_max, lat_max, res, max_cells)
    x0, y1 = xy_np(np.array([lon_min]), np.array([lat_min]), r)
    x1, y0 = xy_np(np.array([lon_max]), np.array([lat_max]), r)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return (np.int64(r) << R_BITS) | (gx.ravel() << X_BITS) | gy.ravel()


# ---------------------------------------------------------------------------
# Spark Column builders (pure built-ins → whole-stage codegen)
# ---------------------------------------------------------------------------

def cell_col(lon: Column, lat: Column, res: int) -> Column:
    """lat/lng→cell as a Catalyst expression (no UDF)."""
    n = float(1 << res)
    x = F.least(F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)),
                           F.lit(0)), F.lit(int(n) - 1)).cast("long")
    y = F.least(F.greatest(F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(n)),
                           F.lit(0)), F.lit(int(n) - 1)).cast("long")
    return (F.lit(res * R_SHIFT).cast("long")
            + x * F.lit(X_SHIFT).cast("long") + y)


def cell_parent_col(cell: Column, res: int, parent_res: int) -> Column:
    """Coarsen a cell id column (both resolutions statically known)."""
    dr = res - parent_res
    x = F.shiftright(cell, X_BITS) % F.lit(X_SHIFT)
    y = cell % F.lit(X_SHIFT)
    return (F.lit(parent_res * R_SHIFT).cast("long")
            + F.shiftright(x, dr) * F.lit(X_SHIFT).cast("long")
            + F.shiftright(y, dr))


# ---------------------------------------------------------------------------
# shared SQL snippets (identical text runs in Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

def cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """SQL text computing the cell id — valid in Spark SQL AND DuckDB."""
    n = 1 << res
    x = (f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}) "
         f"AS BIGINT), 0), {n - 1})")
    y = (f"LEAST(GREATEST(CAST(FLOOR((90.0 - ({lat_expr})) / 180.0 * {n}) "
         f"AS BIGINT), 0), {n - 1})")
    return (f"(CAST({res} AS BIGINT) * {R_SHIFT} + ({x}) * {X_SHIFT} + ({y}))")
