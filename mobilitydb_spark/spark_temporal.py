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


def _per_key_kernel(points: DataFrame, key: str, schema: str,
                    stats) -> DataFrame:
    """Batched per-group kernel: ONE repartition co-locates each key,
    then every Arrow-fed partition iterates its groups in-process.

    Replaces groupBy(key).applyInPandas for the per-key temporal
    kernels: applyInPandas makes one Arrow exchange per GROUP (1500
    groups = 1500 round trips — measured 5.2 s vs 1.1 s for the same
    kernel at sf0.1); here the exchange is per PARTITION and the
    grouping is a pandas groupby inside the task."""
    n_parts = points.sparkSession.sparkContext.defaultParallelism

    def kernel(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        rows = []
        for _, g in pdf.groupby(key, sort=False):
            r = stats(g)
            if r is not None and len(r):
                rows.append(r)
        if rows:
            yield pd.concat(rows, ignore_index=True)

    return points.repartition(n_parts, key).mapInPandas(kernel, schema)


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
        cen = spatial.twcentroid(tv)
        return pd.DataFrame([{
            key: kv,
            "length": spatial.length(tv),
            "speed_max": float(sp.max_value()[0]) if sp is not None else 0.0,
            "speed_twavg": (spatial.twavg(sp)
                            if sp is not None and tv.num_instants() > 1 else 0.0),
            "centroid_x": float(cen[0]),
            "centroid_y": float(cen[1]),
            "duration_sec": tv.duration_us() / 1e6,
            "n_points": tv.num_instants(),
        }])

    return _per_key_kernel(points, key, schema, agg)


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

    return _per_key_kernel(points, key, schema, interp)


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

    return _per_key_kernel(points, key, schema, agg)


def _lerp_at_probes(points: DataFrame, probes_us: list[int],
                    key: str, t: str, value_cols: tuple[str, ...],
                    step: bool = False) -> DataFrame:
    """Pure-Catalyst member sampling: every member's value at every
    probe inside its domain, by linear interpolation from the
    surrounding knots (STEP: previous knot only).

    Shape: ONE window (lead) turns knots into segments, then a
    BROADCAST range join attaches each tiny probe set row to the
    segment containing it — no shuffle beyond the per-key window
    exchange, and the join is codegen CPU work that scales with rows
    (an earlier union+two-window formulation moved 2× the rows
    through 3 exchanges and was shuffle-IO-bound).  Output: one row
    per (key, in-domain probe).
    """
    from pyspark.sql import Window, functions as F
    spark = points.sparkSession
    pts = points.select(
        key, F.unix_micros(F.col(t).cast("timestamp")).alias("t_us"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    # value cols as orderBy tiebreakers: with duplicate (key, t_us)
    # knots an order on t_us alone leaves which duplicate survives the
    # lag-dedup nondeterministic (ADVICE r3) — ties now keep the row
    # with the smallest value tuple, deterministically.  (The kernel
    # path keeps the first duplicate in input order; fixture data is
    # pre-deduped per (key, ts), so the two policies only differ on
    # inputs that are out-of-contract anyway.)
    w = Window.partitionBy(key).orderBy(
        "t_us", *[f"_v_{c}" for c in value_cols])
    # dedup INSIDE the window partitioning (one exchange + one sort
    # serve both the dedup and the lead(): dropDuplicates would add a
    # second 16M-row exchange on (key, t_us))
    pts = pts.withColumn("_dup", F.lag("t_us").over(w) == F.col("t_us")) \
        .where(~F.coalesce(F.col("_dup"), F.lit(False))).drop("_dup")
    seg = pts.withColumn("_nt", F.lead("t_us").over(w))
    for c in value_cols:
        seg = seg.withColumn(f"_nv_{c}", F.lead(f"_v_{c}").over(w))
    # a probe belongs to the half-open segment [t_us, _nt); the last
    # knot is its own terminal row (_nt null) matching p == t_us, so
    # the closed upper domain bound is covered exactly once
    ps = sorted(set(int(p) for p in probes_us))
    steps = {ps[i + 1] - ps[i] for i in range(len(ps) - 1)}
    if len(ps) > 2 and len(steps) == 1:
        # UNIFORM probe grid (the common time-bucketed shape): the
        # covered probe-index range of each segment is pure per-row
        # arithmetic + a bounded explode — O(segments + matches).
        # The general broadcast range join below evaluates every
        # (segment, probe) pair: 16M segments x 240 probes = 3.8e9
        # codegen predicate rounds, the r4/r5 tagg scaling ceiling.
        base, stp, nprobes = ps[0], steps.pop(), len(ps)
        a = F.col("t_us") - F.lit(base)
        # integer ceil/floor via non-negative pmod (timestamps exceed
        # double's exact-integer range at µs scale, so no doubles)
        lo = (a + F.pmod(-a, F.lit(stp))) / F.lit(stp)
        b = F.when(F.col("_nt").isNotNull(),
                   F.col("_nt") - 1 - F.lit(base)).otherwise(a)
        hi = (b - F.pmod(b, F.lit(stp))) / F.lit(stp)
        # terminal knot rows match a probe only exactly
        lo = F.greatest(lo.cast("bigint"), F.lit(0))
        hi = F.least(hi.cast("bigint"), F.lit(nprobes - 1))
        cand = (seg.withColumn(
                    "_pidx", F.explode(F.when(
                        lo <= hi, F.sequence(lo, hi)
                    ).otherwise(F.array().cast("array<bigint>"))))
                .withColumn("p_us",
                            F.lit(base) + F.col("_pidx") * F.lit(stp))
                .drop("_pidx"))
    else:
        probes_df = F.broadcast(spark.createDataFrame(
            [(int(p),) for p in ps], "p_us bigint"))
        on_seg = (F.col("_nt").isNotNull()
                  & (F.col("p_us") >= F.col("t_us"))
                  & (F.col("p_us") < F.col("_nt")))
        on_last = F.col("_nt").isNull() & (F.col("p_us") == F.col("t_us"))
        cand = seg.join(probes_df, on_seg | on_last)
    ratio = (F.col("p_us") - F.col("t_us")).cast("double") \
        / (F.col("_nt") - F.col("t_us"))
    sel = [F.col(key), F.col("p_us").alias("t_us")]
    for c in value_cols:
        if step:
            val = F.col(f"_v_{c}")
        else:
            # exact-knot probes take the knot value (kernel parity)
            val = F.when(F.col("p_us") == F.col("t_us"),
                         F.col(f"_v_{c}")) \
                .otherwise(F.col(f"_v_{c}")
                           + (F.col(f"_nv_{c}") - F.col(f"_v_{c}"))
                           * ratio)
        sel.append(val.alias(c))
    return cand.select(*sel)


def temporal_agg_profile(points: DataFrame, probes_us: list[int],
                         key: str = "key", t: str = "t", v: str = "v"
                         ) -> DataFrame:
    """Global tcount/tmin/tmax/tsum/tavg over per-key tfloats, sampled
    at probe instants (`src/temporal_aggfuncs.c` tagg semantics: value
    at an instant aggregates the members defined there).

    PURE CATALYST: each member is lerped at each in-domain probe
    (window functions per key — parallel across keys), then one
    groupBy(probe) aggregation with map-side partial combine.  This is
    the declarative equivalent of the reference's transfn/combinefn
    split (`36_temporal_aggfuncs.in.sql:23-76`) for sampled output —
    no Python anywhere, no single-task stage, scales with rows.  The
    FULL-profile (piece list) form of the ungrouped aggregate lives in
    `aggs.partial_profile_rows` + merge (the two-level kernel path);
    grouped full profiles in `aggs.temporal_aggregate`."""
    from pyspark.sql import functions as F
    vals = _lerp_at_probes(points, probes_us, key, t, (v,))
    return (vals.groupBy(F.col("t_us"))
            .agg(F.count(F.lit(1)).alias("n_def"),
                 F.min(v).alias("vmin"), F.max(v).alias("vmax"),
                 F.sum(v).alias("vsum"), F.avg(v).alias("vavg"))
            .select("t_us", "n_def", "vmin", "vmax", "vsum", "vavg"))


def temporal_centroid_profile(points: DataFrame, probes_us: list[int],
                              key: str = "key", t: str = "t",
                              x: str = "x", y: str = "y") -> DataFrame:
    """Global tcentroid aggregate of per-key tpoints sampled at probe
    instants (`point/src/tpoint_aggfuncs.c:285-489`: per-instant mean
    of the members defined there) — pure Catalyst, same shape as
    ``temporal_agg_profile`` (the tdouble3 (Σx, Σy, n) state is the
    AVG's partial aggregate, which Spark's hash aggregate maintains
    map-side)."""
    from pyspark.sql import functions as F
    vals = _lerp_at_probes(points, probes_us, key, t, (x, y))
    return (vals.groupBy(F.col("t_us"))
            .agg(F.count(F.lit(1)).alias("n_def"),
                 F.avg(x).alias("cx"), F.avg(y).alias("cy"))
            .select("t_us", "n_def", "cx", "cy"))


def restrict_period_clip(points: DataFrame, t1_us: int, t2_us: int,
                         key: str = "key", t: str = "t",
                         x: str = "x", y: str = "y") -> DataFrame:
    """Per-key atPeriod restriction to the closed period [t1, t2]
    (atPeriod, `src/temporal.c:2936`): instant count, exact duration,
    and interpolated clip-bound values."""
    import numpy as np
    from .restrict import at_period
    from .types import Period
    schema = (f"{key} bigint, n_inst bigint, dur_us bigint, "
              "x0 double, y0 double, x1 double, y1 double")
    p = Period(int(t1_us), int(t2_us), True, True)

    def clip(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (x, y))
        got = at_period(tv, p)
        if got is None:
            return pd.DataFrame(columns=[key, "n_inst", "dur_us",
                                         "x0", "y0", "x1", "y1"])
        first, last = got.seqs[0], got.seqs[-1]
        return pd.DataFrame([{
            key: kv, "n_inst": got.num_instants(),
            "dur_us": got.duration_us(),
            "x0": float(first.values[0, 0]), "y0": float(first.values[0, 1]),
            "x1": float(last.values[-1, 0]), "y1": float(last.values[-1, 1]),
        }])

    return _per_key_kernel(points, key, schema, clip)


def at_box_stats(points: DataFrame, x0: float, y0: float,
                 x1: float, y1: float, key: str = "key", t: str = "t",
                 x: str = "x", y: str = "y") -> DataFrame:
    """Per-key atGeometry restriction to a rectangle
    (``tpointseq_at_geometry1``, `tpoint_spatialfuncs.c:1627`):
    connected-component count, knots inside, exact total microseconds."""
    import numpy as np
    from . import geo, spatial
    schema = f"{key} bigint, n_periods bigint, n_knots_in bigint, total_us bigint"
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)
    box = geo.Geometry("Polygon", [ring])

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (x, y))
        ps = spatial.at_geometry_periods(tv, box)
        xs = np.concatenate([s.values[:, 0] for s in tv.seqs])
        ys = np.concatenate([s.values[:, 1] for s in tv.seqs])
        n_in = int(((xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)).sum())
        return pd.DataFrame([{
            key: kv, "n_periods": len(ps), "n_knots_in": n_in,
            "total_us": int(sum(p.upper - p.lower for p in ps))}])

    return _per_key_kernel(points, key, schema, stats)


def tdwithin_pair_stats(points: DataFrame, dist: float,
                        pair: str = "pair", member: str = "key",
                        t: str = "t", x: str = "x", y: str = "y"
                        ) -> DataFrame:
    """Per pair of tpoints: exact total microseconds and component
    count where tdwithin(a, b, dist) is true
    (`tpoint_tempspatialrels.c:952-1098` quadratic solver)."""
    from . import spatial
    from .restrict import at_value
    schema = f"{pair} bigint, total_us bigint, n_periods bigint"

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pv = pdf[pair].iloc[0]
        groups = [g for _, g in pdf.groupby(member)]
        if len(groups) != 2:
            return pd.DataFrame(columns=[pair, "total_us", "n_periods"])
        tvs = [temporal_from_pdf(
            g.drop_duplicates(subset=[t]).sort_values(t), t, (x, y))
            for g in groups]
        tb = spatial.tdwithin(tvs[0], tvs[1], dist)
        if tb is None:
            return pd.DataFrame(columns=[pair, "total_us", "n_periods"])
        hit = at_value(tb, 1.0)
        ps = hit.get_time() if hit is not None else []
        return pd.DataFrame([{
            pair: pv, "total_us": int(sum(p.upper - p.lower for p in ps)),
            "n_periods": len(ps)}])

    return _per_key_kernel(points, pair, schema, stats)


def nearest_approach_pairs(points: DataFrame, pair: str = "pair",
                           member: str = "key", t: str = "t",
                           x: str = "x", y: str = "y") -> DataFrame:
    """Per pair of tpoints: NAD + NAI (`tpoint_spatialfuncs.c:
    2107-2506` via the temporal distance's turning points)."""
    from . import spatial
    schema = f"{pair} bigint, nad double, nai_us bigint"

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pv = pdf[pair].iloc[0]
        groups = [g for _, g in pdf.groupby(member)]
        if len(groups) != 2:
            return pd.DataFrame(columns=[pair, "nad", "nai_us"])
        tvs = [temporal_from_pdf(
            g.drop_duplicates(subset=[t]).sort_values(t), t, (x, y))
            for g in groups]
        try:
            nai, nad = spatial.nearest_approach_instant(tvs[0], tvs[1])
        except ValueError:  # no temporal overlap
            return pd.DataFrame(columns=[pair, "nad", "nai_us"])
        return pd.DataFrame([{pair: pv, "nad": float(nad),
                              "nai_us": int(nai)}])

    return _per_key_kernel(points, pair, schema, stats)


def _wagg_probe_join(points: DataFrame, window_us: int,
                     probes_us: list[int], key: str, t: str, v: str
                     ) -> DataFrame:
    """Instant rows joined to the broadcast probe set they are active
    for (an instant extends to [t, t+w], so it is active at probe p
    iff p−w ≤ t ≤ p) — the pure-Catalyst base of the window-aggregate
    profiles (`src/temporal_waggfuncs.c:31-60`)."""
    from pyspark.sql import functions as F
    spark = points.sparkSession
    probes_df = F.broadcast(spark.createDataFrame(
        [(int(p),) for p in sorted(set(probes_us))], "p_us bigint"))
    pts = points.select(
        key, F.unix_micros(F.col(t).cast("timestamp")).alias("t_us"),
        F.col(v).alias("_v")).dropDuplicates([key, "t_us"])
    return pts.join(
        probes_df,
        (F.col("t_us") >= F.col("p_us") - F.lit(int(window_us)))
        & (F.col("t_us") <= F.col("p_us")))


def wagg_count_profile(points: DataFrame, window_us: int,
                       probes_us: list[int], key: str = "key",
                       t: str = "t", v: str = "v") -> DataFrame:
    """Global wcount over per-key instant sets, sampled at probes
    (each instant extends to [t, t+w]; the aggregate counts active
    extensions) — pure Catalyst: broadcast probe join + one
    groupBy(probe) with map-side partial combine."""
    from pyspark.sql import functions as F
    j = _wagg_probe_join(points, window_us, probes_us, key, t, v)
    return (j.groupBy(F.col("p_us").alias("t_us"))
            .agg(F.count(F.lit(1)).alias("wcount")))


def wagg_sum_max_profile(points: DataFrame, window_us: int,
                         probes_us: list[int], key: str = "key",
                         t: str = "t", v: str = "v") -> DataFrame:
    """Global wsum + wmax over per-key instant sets, sampled at probes
    (`src/temporal_waggfuncs.c`) — pure Catalyst like
    ``wagg_count_profile``."""
    from pyspark.sql import functions as F
    j = _wagg_probe_join(points, window_us, probes_us, key, t, v)
    return (j.groupBy(F.col("p_us").alias("t_us"))
            .agg(F.sum("_v").alias("wsum"), F.max("_v").alias("wmax")))


def period_business_stats(points: DataFrame, windows: list[tuple[int, int]],
                          key: str = "key", t: str = "t") -> DataFrame:
    """Per-key period algebra vs a fixed window set (timeops.c union/
    intersection/minus): the key's observation span [min_t, max_t]
    intersected with / minus the half-open windows — exact integer
    microsecond totals and piece counts."""
    import numpy as np
    from . import timeops
    from .types import Period
    schema = (f"{key} bigint, inter_us bigint, n_inter bigint, "
              "minus_us bigint, n_minus bigint")
    wins = [Period(int(a), int(b), True, False) for a, b in windows]

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        tt = pdf[t].to_numpy().astype("datetime64[us]").astype(np.int64)
        dom = [Period(int(tt.min()), int(tt.max()), True, True)]
        inter = timeops.intersection(dom, wins)
        mins = timeops.minus(dom, wins)
        return pd.DataFrame([{
            key: kv,
            "inter_us": int(sum(p.upper - p.lower for p in inter)),
            "n_inter": len(inter),
            "minus_us": int(sum(p.upper - p.lower for p in mins)),
            "n_minus": len(mins)}])

    return _per_key_kernel(points, key, schema, stats)


def lifted_pair_stats(points: DataFrame, pair: str = "pair",
                      member: str = "key", t: str = "t", v: str = "v"
                      ) -> DataFrame:
    """Per pair of tfloats: lifted arithmetic + comparison
    (`src/temporal_compops.c`, `tnumber_mathfuncs.c`): a+b and a·b
    sampled at the sync instants (sums), plus the exact microseconds
    where a < b (crossing-split stepwise tbool)."""
    import numpy as np
    from .aggs import _values_at_many
    from .lifting import lift_comparison, synchronize, tadd, tmult
    from .restrict import at_value
    schema = (f"{pair} bigint, n_sync bigint, sum_add double, "
              "sum_mult double, lt_total_us bigint")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pv = pdf[pair].iloc[0]
        groups = [g for _, g in pdf.groupby(member)]
        if len(groups) != 2:
            return pd.DataFrame(columns=[pair, "n_sync", "sum_add",
                                         "sum_mult", "lt_total_us"])
        a, b = [temporal_from_pdf(
            g.drop_duplicates(subset=[t]).sort_values(t), t, (v,))
            for g in groups]
        pieces = synchronize(a, b)
        if not pieces:
            return pd.DataFrame(columns=[pair, "n_sync", "sum_add",
                                         "sum_mult", "lt_total_us"])
        ts = np.unique(np.concatenate([p[0] for p in pieces]))
        add_v, _ = _values_at_many(tadd(a, b), ts)
        mul_v, _ = _values_at_many(tmult(a, b), ts)
        lt = lift_comparison("lt", a, b)
        hit = at_value(lt, 1.0) if lt is not None else None
        ps = hit.get_time() if hit is not None else []
        return pd.DataFrame([{
            pair: pv, "n_sync": len(ts),
            "sum_add": float(add_v[:, 0].sum()),
            "sum_mult": float(mul_v[:, 0].sum()),
            "lt_total_us": int(sum(p.upper - p.lower for p in ps))}])

    return _per_key_kernel(points, pair, schema, stats)


def ttext_state_stats(points: DataFrame, target: str,
                      key: str = "key", t: str = "t", v: str = "etype"
                      ) -> DataFrame:
    """Per-key ttext state machine over a string column: build the
    stepwise temporal text (vocab-coded, `ttext.TText`), then
    normalized instant count, exact microseconds in the ``target``
    state (atValue on the stepwise code), and ever_eq."""
    import numpy as np
    from .restrict import at_value
    from .ttext import TText
    from .types import Temporal
    schema = (f"{key} bigint, n_inst bigint, target_us bigint, "
              "ever_target boolean")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tt = pdf[t].to_numpy().astype("datetime64[us]").astype(np.int64)
        # first-appearance vocab coding, vectorized (same order as the
        # incremental loop it replaces)
        code_arr, vocab_arr = pd.factorize(pdf[v])
        vocab = [str(w) for w in vocab_arr]
        tv = Temporal.sequence(tt, code_arr.astype(np.float64)[:, None],
                               linear=False)
        tv.step_default = True
        txt = TText(tv, vocab)
        if target in vocab:
            hit = at_value(tv, float(vocab.index(target)))
            ps = hit.get_time() if hit is not None else []
            tus = int(sum(p.upper - p.lower for p in ps))
        else:
            tus = 0
        return pd.DataFrame([{
            key: kv, "n_inst": tv.num_instants(), "target_us": tus,
            "ever_target": bool(txt.ever_eq(target))}])

    return _per_key_kernel(points, key, schema, stats)


def traj3d_stats(points: DataFrame, key: str = "key", t: str = "t",
                 x: str = "x", y: str = "y", z: str = "z") -> DataFrame:
    """Per-key 3D trajectory metrics: the dimension-agnostic length /
    speed kernels over (x, y, z) plus the STBOX z extent
    (`tpoint_distance.c:172-243` 3D forms; STBOX z `temporal.h:118`)."""
    from . import spatial
    from .boxops import STBox
    schema = (f"{key} bigint, length3d double, speed_max double, "
              "zmin double, zmax double")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (x, y, z))
        sp = spatial.speed(tv)
        box = STBox.of(tv)
        return pd.DataFrame([{
            key: kv, "length3d": spatial.length(tv),
            "speed_max": float(sp.max_value()[0]) if sp is not None else 0.0,
            "zmin": box.zmin, "zmax": box.zmax}])

    return _per_key_kernel(points, key, schema, stats)


def azimuth_cumlen_stats(points: DataFrame, at_us: int,
                         key: str = "key", t: str = "t",
                         x: str = "x", y: str = "y") -> DataFrame:
    """Per-key azimuth + cumulativeLength kernels
    (`tpoint_spatialfuncs.c:942-1070, :1520-1595`): time-weighted
    average bearing over moving segments and the running length
    interpolated at one probe instant."""
    import numpy as np
    from . import spatial
    schema = f"{key} bigint, tw_azimuth double, cumlen_at double"

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (x, y))
        az = spatial.azimuth(tv)
        cl = spatial.cumulative_length(tv)
        v = cl.value_at(int(at_us))
        if az is None or v is None:
            return pd.DataFrame(columns=[key, "tw_azimuth", "cumlen_at"])
        return pd.DataFrame([{key: kv,
                              "tw_azimuth": spatial.twavg(az),
                              "cumlen_at": float(v[0])}])

    return _per_key_kernel(points, key, schema, stats)


def extent(points: DataFrame, key: str = "key", t: str = "t",
           x: str = "x", y: str = "y") -> DataFrame:
    """Per-key STBOX extent — pure built-ins, no UDF (the `extent`
    aggregate, `src/temporal_aggfuncs.c:1214-1348`)."""
    from pyspark.sql import functions as F
    return points.groupBy(key).agg(
        F.min(x).alias("xmin"), F.max(x).alias("xmax"),
        F.min(y).alias("ymin"), F.max(y).alias("ymax"),
        F.min(t).alias("tmin"), F.max(t).alias("tmax"))


def tbool_agg_profile(points: DataFrame, probes_us: list[int],
                      threshold: float, key: str = "key", t: str = "t",
                      v: str = "v") -> DataFrame:
    """Global tand/tor over per-key STEPWISE tbools (v > threshold),
    sampled at probes (`src/temporal_aggfuncs.c:1351-1428`
    tbool_tand/tbool_tor) — pure Catalyst: the step value at a probe
    is the previous knot's flag; bool_and/bool_or aggregate with
    map-side partial combine."""
    from pyspark.sql import functions as F
    vals = _lerp_at_probes(points, probes_us, key, t, (v,), step=True)
    return (vals.groupBy(F.col("t_us"))
            .agg(F.count(F.lit(1)).alias("n_def"),
                 F.bool_and(F.col(v) > F.lit(threshold)).alias("tand"),
                 F.bool_or(F.col(v) > F.lit(threshold)).alias("tor"))
            .select("t_us", "n_def", "tand", "tor"))


def timeops_matrix_stats(points: DataFrame, windows: list[tuple[int, int]],
                         instants_us: list[int], key: str = "key",
                         t: str = "t") -> DataFrame:
    """Per-key period-algebra operand matrix (timeops.c:2468-4081):
    the key's observation span against a fixed PERIODSET (union piece
    count + exact µs) and a fixed TIMESTAMPSET (intersection instant
    count, minus piece count) — the operand combos period_business
    does not cover."""
    import numpy as np
    from . import timeops
    from .types import Period
    schema = (f"{key} bigint, u_ps_us bigint, n_u_ps bigint, "
              "n_i_ts bigint, n_m_ts bigint")
    wins = [Period(int(a), int(b), True, False) for a, b in windows]
    tset = [Period(int(p), int(p), True, True) for p in sorted(instants_us)]

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        tt = pdf[t].to_numpy().astype("datetime64[us]").astype(np.int64)
        dom = [Period(int(tt.min()), int(tt.max()), True, True)]
        u = timeops.union(dom, wins)
        i_ts = timeops.intersection(dom, tset)
        m_ts = timeops.minus(dom, tset)
        return pd.DataFrame([{
            key: kv,
            "u_ps_us": int(sum(p.upper - p.lower for p in u)),
            "n_u_ps": len(u),
            "n_i_ts": len(i_ts),
            "n_m_ts": len(m_ts)}])

    return _per_key_kernel(points, key, schema, stats)


def tmath_turning_pairs(points: DataFrame, div_shift: float = 1000.0,
                        pair: str = "pair", member: str = "key",
                        t: str = "t", v: str = "v") -> DataFrame:
    """Per pair of tfloats: temporal × and ÷ with TURNING POINTS
    (`tnumber_mathfuncs.c:127-160`
    ``tnumberseq_mult_maxmin_at_timestamp``): count of inserted
    quadratic-vertex instants and the vertex-exact extrema of a·b and
    a/(b+shift) (the divisor is shifted positive so the quotient stays
    bounded — the turning-point kernel is exercised identically)."""
    import numpy as np
    from .lifting import synchronize, tdiv, tmult, turn_product
    schema = (f"{pair} bigint, n_turn_mult bigint, mult_max double, "
              "mult_min double, n_turn_div bigint, div_max double, "
              "div_min double")

    def n_turns(a, b) -> int:
        n = 0
        for ts, va, vb, _, _ in synchronize(a, b):
            for i in range(len(ts) - 1):
                n += len(turn_product(va[i], va[i + 1], vb[i], vb[i + 1],
                                      int(ts[i]), int(ts[i + 1])))
        return n

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [pair, "n_turn_mult", "mult_max", "mult_min",
                "n_turn_div", "div_max", "div_min"]
        pv = pdf[pair].iloc[0]
        groups = [g for _, g in pdf.groupby(member)]
        if len(groups) != 2:
            return pd.DataFrame(columns=cols)
        prepped = [g.drop_duplicates(subset=[t]).sort_values(t)
                   for g in groups]
        a, b = [temporal_from_pdf(g, t, (v,)) for g in prepped]
        bs = temporal_from_pdf(
            prepped[1].assign(**{v: prepped[1][v] + div_shift}), t, (v,))
        m = tmult(a, b)
        d = tdiv(a, bs)
        if m is None or d is None:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame([{
            pair: pv,
            "n_turn_mult": n_turns(a, b),
            "mult_max": float(m.max_value()[0]),
            "mult_min": float(m.min_value()[0]),
            "n_turn_div": n_turns(a, bs),
            "div_max": float(d.max_value()[0]),
            "div_min": float(d.min_value()[0])}])

    return _per_key_kernel(points, pair, schema, stats)


def at_range_stats(points: DataFrame, lo: float, hi: float,
                   lo_inc: bool, hi_inc: bool, key: str = "key",
                   t: str = "t", v: str = "v") -> DataFrame:
    """Per-key atRange restriction of a linear tfloat to a value range
    with explicit bound inclusivity (`tnumberseq_at_range1`,
    src/temporal.c:2583): piece count, exact total microseconds, and
    the number of knots sitting exactly ON the lower bound (the
    exclusive-bound inheritance case the r2 advice fixed)."""
    import numpy as np
    from .restrict import at_range
    schema = (f"{key} bigint, n_pieces bigint, total_us bigint, "
              "n_knots_on_lo bigint")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[key].iloc[0]
        pdf = pdf.drop_duplicates(subset=[t]).sort_values(t)
        tv = temporal_from_pdf(pdf, t, (v,))
        got = at_range(tv, lo, hi, lo_inc=lo_inc, hi_inc=hi_inc)
        ps = got.get_time() if got is not None else []
        on_lo = int(sum((s.values[:, 0] == lo).sum() for s in tv.seqs))
        return pd.DataFrame([{
            key: kv, "n_pieces": len(ps),
            "total_us": int(sum(p.upper - p.lower for p in ps)),
            "n_knots_on_lo": on_lo}])

    return _per_key_kernel(points, key, schema, stats)
