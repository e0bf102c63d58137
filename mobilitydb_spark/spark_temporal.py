"""Spark integration of the temporal kernels.

Table-level temporal operators: rows in *exploded long form*
(key, t, x[, y]) are grouped per key and assembled into
``types.Temporal`` values inside ``applyInPandas`` (Arrow-batched,
one Python call per group batch — no per-row Python), then the numpy
kernels from restrict/lifting/spatial run per value.

This is the engine's equivalent of MobilityDB evaluating
``length(trip)`` / ``twAvg(speed(trip))`` per row of a trips table
(`point/test/queries/56_tpoint_spatialfuncs_tbl.test.sql`): our rows
are whole trajectories keyed by ``key``.

Scale notes: the only shuffle is the groupBy(key); within a task the
kernel is vectorized per trajectory.  Keys are assumed to fit a task
comfortably (trajectories are bounded); for mega-keys use time-window
sub-splitting upstream.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import spatial
from .types import Temporal


def temporal_from_pdf(pdf: pd.DataFrame, t_col: str = "t",
                      value_cols: tuple[str, ...] = ("x", "y"),
                      linear: bool = True, normalize: bool = False) -> Temporal:
    """Assemble one Temporal from long-form rows (sorted by t)."""
    pdf = pdf.sort_values(t_col, kind="mergesort")
    t = pdf[t_col].to_numpy()
    if np.issubdtype(t.dtype, np.datetime64):
        t = t.astype("datetime64[us]").astype(np.int64)
    else:
        t = t.astype(np.int64)
    vals = pdf[list(value_cols)].to_numpy(dtype=np.float64)
    return Temporal.sequence(t, vals, normalize=normalize, linear=linear)


def trajectory_metrics(points: DataFrame, key: str = "key",
                       t: str = "t", x: str = "x", y: str = "y") -> DataFrame:
    """Per-key trajectory metrics computed by the spatial kernels:
    length, max/time-weighted-avg speed, time-weighted centroid,
    duration seconds, instant count."""
    schema = (f"{key} bigint, length double, speed_max double, "
              "speed_twavg double, centroid_x double, centroid_y double, "
              "duration_sec double, n_points bigint")

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (x, y))
        sp = spatial.speed(tv)
        return pd.DataFrame([{
            key: kv,
            "length": spatial.length(tv),
            "speed_max": float(sp.max_value()[0]) if sp is not None else 0.0,
            "speed_twavg": (spatial.twavg(sp)
                            if sp is not None and tv.num_instants() > 1 else 0.0),
            "centroid_x": float(spatial.twcentroid(tv)[0]),
            "centroid_y": float(spatial.twcentroid(tv)[1]),
            "duration_sec": tv.duration_us() / 1e6,
            "n_points": tv.num_instants(),
        }])

    return points.groupBy(key).applyInPandas(agg, schema)


def value_at_timestamp(points: DataFrame, at_ts, key: str = "key",
                       t: str = "t", x: str = "x", y: str | None = "y"
                       ) -> DataFrame:
    """Per-key exact linear interpolation at one timestamp
    (valueAtTimestamp, `src/temporal.c:2910`)."""
    cols = (x,) if y is None else (x, y)
    out_vals = ("x_at double" if y is None else "x_at double, y_at double")
    schema = f"{key} bigint, {out_vals}"
    at_us = int(np.datetime64(at_ts, "us").astype(np.int64))

    def interp(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, cols)
        v = tv.value_at(at_us)
        if v is None:
            return pd.DataFrame(columns=[key] +
                                (["x_at"] if y is None else ["x_at", "y_at"]))
        row = {key: kv, "x_at": float(v[0])}
        if y is not None:
            row["y_at"] = float(v[1])
        return pd.DataFrame([row])

    return points.groupBy(key).applyInPandas(interp, schema)


def tnumber_twavg(points: DataFrame, key: str = "key", t: str = "t",
                  v: str = "v") -> DataFrame:
    """Per-key time-weighted average of a tfloat (twAvg,
    `src/temporal.c:3256`)."""
    schema = f"{key} bigint, twavg double"

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (v,))
        return pd.DataFrame([{key: kv, "twavg": spatial.twavg(tv)}])

    return points.groupBy(key).applyInPandas(agg, schema)


def extent(points: DataFrame, key: str = "key", t: str = "t",
           x: str = "x", y: str = "y") -> DataFrame:
    """Per-key STBOX extent — pure built-ins, no UDF (the `extent`
    aggregate, `src/temporal_aggfuncs.c:1214-1348`)."""
    from pyspark.sql import functions as F
    return points.groupBy(key).agg(
        F.min(x).alias("xmin"), F.max(x).alias("xmax"),
        F.min(y).alias("ymin"), F.max(y).alias("ymax"),
        F.min(t).alias("tmin"), F.max(t).alias("tmax"))
