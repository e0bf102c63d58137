"""FULL reference suite 66_tpoint_spatialrels run verbatim: 1280
cases — contains / containsproperly / covers / coveredby / crosses /
disjoint / equals / intersects / overlaps / touches / within /
dwithin / relate over every geometry/geography x tgeompoint/tgeogpoint
operand-order matrix, including the SRID / dimensionality /
LWGEOMCOLLECTION ERROR blocks
(`point/test/expected/66_tpoint_spatialrels.test.out` via
scripts/port_66_spatialrels_goldens.py)."""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark import geo  # noqa: E402
from mobilitydb_spark.spatialrels import spatial_rel  # noqa: E402
from mobilitydb_spark.types import Temporal  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "spatialrels_66.json")

GEO_RE = re.compile(r"^(geometry|geography)\s+'([^']*)'$", re.IGNORECASE)
PT_RE = re.compile(r"^Point\s*\(([-\d. ]+)\)$", re.IGNORECASE)


def split_args(argtext: str):
    """Split at top-level commas (quote-aware)."""
    out, depth, q, start = [], 0, False, 0
    for k, ch in enumerate(argtext):
        if ch == "'":
            q = not q
        if q:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(argtext[start:k].strip())
            start = k + 1
    out.append(argtext[start:].strip())
    return out


class GeoOperand:
    """Parsed geometry/geography literal: Geometry + declared coord
    dim (kept separately for empty literals) + geodetic flag."""

    def __init__(self, g: geo.Geometry, dim: int, geodetic: bool):
        self.g, self.dim, self.geodetic = g, dim, geodetic


def parse_geo_literal(tok: str) -> GeoOperand | None:
    m = GEO_RE.match(tok)
    if not m:
        return None
    geodetic = m.group(1).lower() == "geography"
    lit = m.group(2).strip()
    srid = 4326 if geodetic else 0
    sm = re.match(r"SRID\s*=\s*(\d+)\s*;\s*(.*)$", lit, re.IGNORECASE)
    if sm:
        srid, lit = int(sm.group(1)), sm.group(2).strip()
    if re.fullmatch(r"Point\s+empty", lit, re.IGNORECASE):
        return GeoOperand(geo.Geometry("Point", [], srid), 2, geodetic)
    if re.fullmatch(r"Point\s+Z\s+empty", lit, re.IGNORECASE):
        return GeoOperand(geo.Geometry("Point", [], srid), 3, geodetic)
    pm = PT_RE.match(lit)
    if pm:
        coords = np.array([[float(c) for c in pm.group(1).split()]])
        return GeoOperand(geo.Geometry("Point", [coords], srid),
                          coords.shape[1], geodetic)
    raise ValueError(f"unparsed geometry literal {lit!r}")


def parse_operand(tok: str):
    tok = tok.strip()
    g = parse_geo_literal(tok)
    if g is not None:
        return g
    tv = parse_tpoint(tok)
    if tv is not None:
        return tv
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1]
    return float(tok)


def run_case(fn: str, argtext: str):
    toks = [parse_operand(t) for t in split_args(argtext)]
    param = None
    if len(toks) == 3:
        param = toks[2]
    a, b = toks[0], toks[1]
    geodetic = False
    kw = {}
    for side, v in (("a", a), ("b", b)):
        if isinstance(v, GeoOperand):
            kw[f"{side}_dim"] = v.dim
            geodetic = geodetic or v.geodetic
    if isinstance(a, Temporal) and a.srid == 4326 and not isinstance(
            b, GeoOperand):
        geodetic = geodetic or (isinstance(b, Temporal) and b.srid != 0)
    # tgeogpoint operands parse with srid>=4326 default; the literal
    # type keyword is what decides geodetic dispatch
    if "tgeogpoint" in argtext:
        geodetic = True
    a_v = a.g if isinstance(a, GeoOperand) else a
    b_v = b.g if isinstance(b, GeoOperand) else b
    return spatial_rel(fn, a_v, b_v, param, geodetic=geodetic, **kw)


def norm_result(res):
    if res is None:
        return None
    if isinstance(res, bool) or isinstance(res, np.bool_):
        return "t" if res else "f"
    return str(res)


def test_66_spatialrels_full_suite():
    cases = json.load(open(GOLD))
    assert len(cases) == 1280
    fails = []
    for i, (fn, argtext, want) in enumerate(cases):
        if isinstance(want, dict):
            try:
                run_case(fn, argtext)
                fails.append((i, fn, argtext, f"no error, wanted "
                              f"{want['error']!r}"))
            except ValueError as e:
                if " ".join(str(e).split()) != " ".join(
                        want["error"].split()):
                    fails.append((i, fn, argtext,
                                  f"error {e} != {want['error']!r}"))
            except Exception as e:  # noqa: BLE001
                fails.append((i, fn, argtext, f"raised {type(e).__name__}"
                              f" {e}, wanted {want['error']!r}"))
            continue
        try:
            got = norm_result(run_case(fn, argtext))
        except Exception as e:  # noqa: BLE001
            fails.append((i, fn, argtext,
                          f"raised {type(e).__name__} {e}, wanted {want!r}"))
            continue
        if got != want:
            fails.append((i, fn, argtext, f"got {got!r} want {want!r}"))
    assert not fails, (f"{len(fails)}/{len(cases)} failed; first 25:\n"
                       + "\n".join(map(str, fails[:25])))
