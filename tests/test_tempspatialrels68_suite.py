"""FULL reference suite 68_tpoint_tempspatialrels run verbatim: 1069
cases — tcontains / tcovers / tcoveredby / tdisjoint / tequals /
tintersects / ttouches / twithin / tdwithin / trelate over the
geometry/geography x tgeompoint/tgeogpoint operand matrices with
tbool/ttext literal outputs, including the SRID / dimensionality
ERROR blocks (`point/test/expected/68_tpoint_tempspatialrels.test.out`
via scripts/port_68_tempspatialrels_goldens.py)."""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_spatialrels66_suite import (  # noqa: E402
    GeoOperand, parse_geo_literal, split_args)
from test_tpoint51_suite import parse_tpoint  # noqa: E402

from mobilitydb_spark import geo  # noqa: E402
from mobilitydb_spark.spatialrels import temp_spatial_rel  # noqa: E402
from mobilitydb_spark.ttext import TText  # noqa: E402
from mobilitydb_spark.types import Temporal  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "goldens",
                    "tempspatialrels_68.json")

LINE_RE = re.compile(
    r"^(geometry|geography)\s+'(?:SRID=\d+;)?Linestring\(([-\d. ,]+)\)'$",
    re.IGNORECASE)


def parse_operand(tok: str):
    tok = tok.strip()
    m = LINE_RE.match(tok)
    if m:
        pts = np.array([[float(c) for c in p.split()]
                        for p in m.group(2).split(",")])
        return GeoOperand(geo.Geometry("LineString", [pts], 0),
                          pts.shape[1], m.group(1).lower() == "geography")
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
    param = toks[2] if len(toks) == 3 else None
    a, b = toks[0], toks[1]
    geodetic = "tgeogpoint" in argtext
    kw = {}
    for side, v in (("a", a), ("b", b)):
        if isinstance(v, GeoOperand):
            kw[f"{side}_dim"] = v.dim
    a_v = a.g if isinstance(a, GeoOperand) else a
    b_v = b.g if isinstance(b, GeoOperand) else b
    return temp_spatial_rel(fn, a_v, b_v, param, geodetic=geodetic, **kw)


def norm_result(res):
    if res is None:
        return None
    if isinstance(res, TText):
        return str(res)
    if isinstance(res, Temporal):
        res.is_bool = True
        return str(res)
    return str(res)


def test_68_tempspatialrels_full_suite():
    cases = json.load(open(GOLD))
    assert len(cases) == 1069
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
    assert not fails, (f"{len(fails)}/{len(cases)} failed; first 20:\n"
                       + "\n".join(map(str, fails[:20])))
