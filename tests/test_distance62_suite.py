"""Reference suite 62_tpoint_distance run verbatim: temporal distance
`round(a <-> b, 6)` over tpoint/geometry/geography operand pairs with
tfloat literal outputs plus the suite's error block
(`point/test/expected/62_tpoint_distance.test.out` via
scripts/port_62_distance_goldens.py).

Geography operands measure WGS84 spheroid meters (geo.vincenty_m ≡
PostGIS geog_distance to sub-µm at these distances) with planar
turning instants — the reference's own convention
(`point/src/tpoint_distance.c:43-51,165-235`).  Non-point geometry
operands are ERRORS in the reference (`ensure_point_type`), asserted
verbatim from distance_62_errors.json."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_temporal22_suite import Skip  # noqa: E402
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark import geo, lifting  # noqa: E402
from mobilitydb_spark.types import Seq, Temporal  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "distance_62.json")
GOLD_ERR = os.path.join(os.path.dirname(__file__), "goldens",
                        "distance_62_errors.json")

GEOM = re.compile(
    r"^(geometry|geography)\s+'(?:srid=(\d+);)?"
    r"(Point|Linestring)\s*(?:\(([-\d. ,]+)\)|( Z)? empty)'$",
    re.IGNORECASE)


def pg_round_vals(v: np.ndarray, d: int) -> np.ndarray:
    scale = 10.0 ** d
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def to_operand(tok: str):
    """Temporal | geo.Geometry (srid default: geometry 0, geography
    4326 — the PostGIS typmod defaults the suite relies on)."""
    tok = tok.strip()
    tv = parse_tpoint(tok)
    if tv is not None:
        return tv
    m = GEOM.match(tok)
    if not m:
        raise Skip(f"operand {tok!r}")
    base, srid_s, kind, coords_s = m.group(1), m.group(2), m.group(3), m.group(4)
    srid = int(srid_s) if srid_s else (4326 if base.lower() == "geography" else 0)
    kind = "LineString" if kind.lower() == "linestring" else "Point"
    if coords_s is None:  # empty
        return geo.Geometry(kind, [], srid)
    pts = np.array([[float(c) for c in p.split()]
                    for p in coords_s.split(",")])
    return geo.Geometry(kind, [pts], srid)


def _fmt(res, digits):
    if res is None:
        return ""
    seqs = [Seq(s.times.copy(), pg_round_vals(s.values, digits),
                s.lower_inc, s.upper_inc) for s in res.seqs]
    return str(Temporal(res.duration, seqs, res.linear, 0,
                        res.step_default))


def test_62_tpoint_distance_suite():
    cases = json.load(open(GOLD))
    assert len(cases) > 120
    fails, skipped, ran = [], 0, 0
    for i, (lhs, rhs, digits, want) in enumerate(cases):
        geodetic = "tgeogpoint" in lhs + rhs or "geography" in lhs + rhs
        try:
            a = to_operand(lhs)
            b = to_operand(rhs)
        except Skip:
            skipped += 1
            continue
        if not isinstance(a, Temporal):
            a, b = b, a  # tdistance is symmetric
        got = _fmt(lifting.tdistance_checked(a, b, geodetic=geodetic),
                   digits)
        ran += 1
        if got != want:
            fails.append((i, lhs[:45], rhs[:45], want, got))
    assert not fails, (len(fails), fails[:6])
    assert ran >= 130, (ran, skipped)
    assert skipped == 0, skipped


def test_62_tpoint_distance_errors():
    """The suite's /* Errors */ block verbatim: non-point geometry,
    mixed-SRID and mixed-dimensionality operands raise the
    reference's exact messages."""
    cases = json.load(open(GOLD_ERR))
    assert len(cases) == 8
    for lhs, rhs, want_msg in cases:
        geodetic = "tgeogpoint" in lhs + rhs or "geography" in lhs + rhs
        a = to_operand(lhs)
        b = to_operand(rhs)
        if not isinstance(a, Temporal):
            a, b = b, a
        try:
            lifting.tdistance_checked(a, b, geodetic=geodetic)
        except ValueError as e:
            assert str(e) == want_msg, (lhs, rhs, want_msg, str(e))
        else:
            raise AssertionError(f"no error for {lhs} <-> {rhs}")
