"""Time set-operation + box/position operator tests (semantics from
`src/timeops.c` via `test/queries/11_timeops.test.sql` conventions)."""

from mobilitydb_spark import boxops, timeops
from mobilitydb_spark import types as T


def P(s):
    return T.parse_period(s)


def test_union_merges():
    got = timeops.union([P("[2000-01-01, 2000-01-03)")],
                        [P("[2000-01-03, 2000-01-05]")])
    assert [str(p) for p in got] == \
        ["[2000-01-01 00:00:00+00, 2000-01-05 00:00:00+00]"]


def test_union_keeps_gap():
    got = timeops.union([P("[2000-01-01, 2000-01-02)")],
                        [P("(2000-01-02, 2000-01-03]")])
    assert len(got) == 2


def test_intersection_bounds():
    got = timeops.intersection([P("[2000-01-01, 2000-01-04)")],
                               [P("(2000-01-02, 2000-01-06]")])
    assert [str(p) for p in got] == \
        ["(2000-01-02 00:00:00+00, 2000-01-04 00:00:00+00)"]
    assert timeops.intersection([P("[2000-01-01, 2000-01-02)")],
                                [P("[2000-01-02, 2000-01-03]")]) == []


def test_minus_splits():
    got = timeops.minus([P("[2000-01-01, 2000-01-10]")],
                        [P("[2000-01-03, 2000-01-05)")])
    assert [str(p) for p in got] == [
        "[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00)",
        "[2000-01-05 00:00:00+00, 2000-01-10 00:00:00+00]"]


def test_contains_overlaps():
    a = [P("[2000-01-01, 2000-01-10]")]
    b = [P("[2000-01-03, 2000-01-05)")]
    assert timeops.contains(a, b)
    assert not timeops.contains(b, a)
    assert timeops.contained(b, a)
    assert timeops.overlaps(a, b)


def test_before_after_adjacent():
    a = [P("[2000-01-01, 2000-01-02)")]
    b = [P("[2000-01-02, 2000-01-03]")]
    assert timeops.before(a, b)
    assert timeops.after(b, a)
    assert timeops.adjacent(a, b)
    c = [P("(2000-01-02, 2000-01-03]")]
    assert not timeops.adjacent(a, c)  # gap at the shared instant
    d = [P("[2000-01-02, 2000-01-03]")]
    assert timeops.adjacent(a, d)
    e = [P("[2000-01-01, 2000-01-02]")]
    assert not timeops.adjacent(e, d)  # overlap at the instant


def test_overbefore_overafter():
    a = [P("[2000-01-01, 2000-01-04]")]
    b = [P("[2000-01-02, 2000-01-04]")]
    assert timeops.overbefore(a, b) and timeops.overbefore(b, a)
    assert timeops.overafter(b, a) and not timeops.overafter(a, b)


def test_stbox_ops():
    v1 = T.parse_temporal("[Point(0 0)@2000-01-01, Point(2 2)@2000-01-03]")
    v2 = T.parse_temporal("[Point(1 1)@2000-01-02, Point(3 3)@2000-01-04]")
    v3 = T.parse_temporal("[Point(5 5)@2000-01-05, Point(6 6)@2000-01-06]")
    b1, b2, b3 = (boxops.STBox.of(v) for v in (v1, v2, v3))
    assert boxops.overlaps(b1, b2)
    assert not boxops.overlaps(b1, b3)
    assert boxops.left(b1, b3) and boxops.below(b1, b3)
    assert boxops.before(b1, b3)
    assert boxops.right(b3, b1) and boxops.after(b3, b1)
    big = b1.expand(10.0, 10 * 86400_000_000)
    assert boxops.contains(big, b3)
    assert boxops.contained(b3, big)
    assert boxops.same(b1, boxops.STBox.of(v1))
    assert boxops.overleft(b1, b2) and boxops.overbefore(b1, b2)


def test_stbox_cols(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 100), (1, 2.0, 2.0, 200),
         (2, 5.0, 5.0, 500), (2, 6.0, 6.0, 600)],
        "key int, lon double, lat double, t long")
    boxes = df.groupBy("key").agg(*boxops.stbox_agg_cols()) \
        .select("key", F.struct("xmin", "xmax", "ymin", "ymax",
                                "tmin", "tmax").alias("box"))
    a = boxes.where("key = 1").select(F.col("box").alias("a"))
    b = boxes.where("key = 2").select(F.col("box").alias("b"))
    row = a.crossJoin(b).select(
        boxops.overlaps_col(F.col("a"), F.col("b")).alias("ov"),
        boxops.left_col(F.col("a"), F.col("b")).alias("lf"),
        boxops.before_col(F.col("a"), F.col("b")).alias("bf")).first()
    assert not row["ov"] and row["lf"] and row["bf"]


# --- 11_timeops goldens (expected strings lifted verbatim from
# `test/expected/11_timeops.test.out`, cited by line) ---------------------

def PS(s):
    """Parse '{[a, b],[c, d]}' periodset literal."""
    import re
    return [P(m.group(0))
            for m in re.finditer(r"[\[(][^\[(\])]*[\])]", s)]


def fmt(ps):
    return "{" + ", ".join(str(p) for p in ps) + "}" if ps else ""


def test_union_goldens_11_timeops():
    # :259 same period
    assert fmt(timeops.union(PS("{[2000-01-01, 2000-01-03]}"),
                             PS("{[2000-01-01, 2000-01-03]}"))) == \
        "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00]}"
    # :265 adjacent open bound merges
    assert fmt(timeops.union(PS("{[2000-01-01, 2000-01-03]}"),
                             PS("{(2000-01-03, 2000-01-05]}"))) == \
        "{[2000-01-01 00:00:00+00, 2000-01-05 00:00:00+00]}"
    # :271 periodset with gap stays two pieces
    assert fmt(timeops.union(
        PS("{[2000-01-01, 2000-01-03]}"),
        PS("{[2000-01-01, 2000-01-03],[2000-01-04, 2000-01-05]}"))) == \
        ("{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00], "
         "[2000-01-04 00:00:00+00, 2000-01-05 00:00:00+00]}")
    # :313 disjoint before
    assert fmt(timeops.union(
        PS("{[2000-01-03,2000-01-04],[2000-01-07,2000-01-08]}"),
        PS("{[2000-01-01,2000-01-02]}"))) == \
        ("{[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00], "
         "[2000-01-03 00:00:00+00, 2000-01-04 00:00:00+00], "
         "[2000-01-07 00:00:00+00, 2000-01-08 00:00:00+00]}")
    # :331 half-open touch merges left
    assert fmt(timeops.union(
        PS("{[2000-01-03,2000-01-04],[2000-01-07,2000-01-08]}"),
        PS("{[2000-01-01,2000-01-03)}"))) == \
        ("{[2000-01-01 00:00:00+00, 2000-01-04 00:00:00+00], "
         "[2000-01-07 00:00:00+00, 2000-01-08 00:00:00+00]}")
    # :343 open-start touch merges right
    assert fmt(timeops.union(
        PS("{[2000-01-03,2000-01-04],[2000-01-07,2000-01-08]}"),
        PS("{(2000-01-08,2000-01-10]}"))) == \
        ("{[2000-01-03 00:00:00+00, 2000-01-04 00:00:00+00], "
         "[2000-01-07 00:00:00+00, 2000-01-10 00:00:00+00]}")


def test_minus_goldens_11_timeops():
    # :643 self-minus is empty
    assert fmt(timeops.minus(PS("{[2000-01-01, 2000-01-03]}"),
                             PS("{[2000-01-01, 2000-01-03]}"))) == ""
    # :649 disjoint minus keeps the period
    assert fmt(timeops.minus(PS("{[2000-01-01, 2000-01-03]}"),
                             PS("{(2000-01-03, 2000-01-05]}"))) == \
        "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00]}"
    # :655 left piece removed, bound flips exclusive
    assert fmt(timeops.minus(
        PS("{[2000-01-01, 2000-01-03]}"),
        PS("{[2000-01-01, 2000-01-02],[2000-01-04, 2000-01-05]}"))) == \
        "{(2000-01-02 00:00:00+00, 2000-01-03 00:00:00+00]}"
    # :781 whole first piece removed
    assert fmt(timeops.minus(
        PS("{[2000-01-01, 2000-01-03],[2000-01-04, 2000-01-05]}"),
        PS("{[2000-01-01, 2000-01-03]}"))) == \
        "{[2000-01-04 00:00:00+00, 2000-01-05 00:00:00+00]}"
    # :799 second piece removed
    assert fmt(timeops.minus(
        PS("{[2000-01-01, 2000-01-03],[2000-01-04, 2000-01-05]}"),
        PS("{[2000-01-04, 2000-01-05]}"))) == \
        "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00]}"


def test_adjacent_goldens_11_timeops():
    # :49 closed-closed share an instant → NOT adjacent
    assert timeops.adjacent(PS("{[2000-01-01, 2000-01-03]}"),
                            PS("{[2000-01-01, 2000-01-03]}")) is False
    # :7-ish timestamp -|- open period (t == open lower bound) → adjacent
    assert timeops.adjacent([P("[2000-01-01, 2000-01-01]")],
                            PS("{(2000-01-01, 2000-01-03]}")) is True
    # closed-open touch → adjacent
    assert timeops.adjacent(PS("{[2000-01-01, 2000-01-03]}"),
                            PS("{(2000-01-03, 2000-01-05]}")) is True


# --- 60_tpoint_posops goldens (expected booleans lifted verbatim from
# `point/test/expected/60_tpoint_posops.test.out:1-40`) -------------------

def test_posops_goldens_60_tpoint():
    import numpy as np
    from mobilitydb_spark.boxops import (STBox, left, overleft, right,
                                         overright)
    t1 = int(np.datetime64("2001-01-01", "us").astype(np.int64))
    t2 = int(np.datetime64("2001-01-02", "us").astype(np.int64))
    a = STBox(1.0, 2.0, 1.0, 2.0, t1, t1)       # STBOX((1,1),(2,2)) vs T-box
    b = STBox(1.0, 1.0, 2.0, 2.0, t1, t1)       # STBOX T((1,2,t),(1,2,t))
    assert left(a, b) is False          # :1  <<
    assert overleft(a, b) is False      # :7  &<   (a.xmax 2 > b.xmax 1)
    assert right(a, b) is False         # :13 >>
    assert overright(a, b) is True      # :19 &>   (a.xmin 1 >= b.xmin 1)
    inf = float("inf")
    c = STBox(-inf, inf, -inf, inf, t1, t2)
    assert left(c, c) is False          # :25 <<  (self)
    assert overleft(c, c) is True       # :31 &<
    assert right(c, c) is False         # :37 >>


# --- 50_stbox literal in/out goldens (verbatim from
# `point/test/expected/50_stbox.test.out:1-100`) --------------------------

def test_stbox_literal_roundtrip_goldens():
    from mobilitydb_spark.boxops import parse_stbox, stbox_out
    cases = [
        ("STBOX((1.0, 2.0), (3.0, 4.0))", "STBOX((1,2),(3,4))"),
        ("STBOX Z((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))",
         "STBOX Z((1,2,3),(4,5,6))"),
        ("STBOX T((1.0, 2.0, 2001-01-01), (3.0, 4.0, 2001-01-02))",
         "STBOX T((1,2,2001-01-01 00:00:00+00),"
         "(3,4,2001-01-02 00:00:00+00))"),
        ("STBOX ZT((1.0, 2.0, 3.0, 2001-01-01), "
         "(4.0, 5.0, 6.0, 2001-01-02))",
         "STBOX ZT((1,2,3,2001-01-01 00:00:00+00),"
         "(4,5,6,2001-01-02 00:00:00+00))"),
        ("STBOX T(( , , 2001-01-01), ( , , 2001-01-02))",
         "STBOX T((,,2001-01-01 00:00:00+00),"
         "(,,2001-01-02 00:00:00+00))"),
        ("GEODSTBOX((1.0, 2.0, 3.0), (1.0, 2.0, 3.0))",
         "GEODSTBOX((1,2,3),(1,2,3))"),
        ("GEODSTBOX T((1.0, 2.0, 3.0, 2001-01-04), "
         "(1.0, 2.0, 3.0, 2001-01-03))",
         "GEODSTBOX T((1,2,3,2001-01-03 00:00:00+00),"
         "(1,2,3,2001-01-04 00:00:00+00))"),
        # bounds auto-sorted per dimension
        ("STBOX ZT((5,6,7,2001-01-08), (1,2,3,2001-01-04))",
         "STBOX ZT((1,2,3,2001-01-04 00:00:00+00),"
         "(5,6,7,2001-01-08 00:00:00+00))"),
    ]
    for lit, want in cases:
        assert stbox_out(parse_stbox(lit)) == want, lit
        # printed form re-parses to itself
        assert stbox_out(parse_stbox(stbox_out(parse_stbox(lit)))) == want


def test_stbox_literal_error_goldens():
    import pytest
    from mobilitydb_spark.boxops import parse_stbox
    cases = [
        ("AAA(1, 2, 3)", "Could not parse STBOX"),
        ("stbox(1, 2, 3)",
         "Could not parse STBOX: Missing opening parenthesis"),
        ("stbox((AA, 2, 3))",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("stbox z((1, 2, AA))",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("stbox t((1, 2, AA))",
         'invalid input syntax for type timestamp with time zone: "AA"'),
        ("stbox((1, 2, 3))",
         "Could not parse STBOX: Missing closing parenthesis"),
        ("stbox t((1, 2, 2001-01-03))",
         "Could not parse STBOX: Missing opening parenthesis"),
        ("stbox t((1, 2, 2001-01-03),()",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("stbox t((1, 2, 2001-01-03),(1)",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("stbox z((1, 2, 3),(1,2)",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("stbox t((1, 2, 2001-01-03),(1,2)",
         'invalid input syntax for type timestamp with time zone: ""'),
        ("stbox t((1, 2, 2001-01-03),(1,2,2001-01-03)",
         "Could not parse STBOX: Missing closing parenthesis"),
    ]
    for lit, msg in cases:
        with pytest.raises(ValueError) as e:
            parse_stbox(lit)
        assert str(e.value) == msg, lit


# --- 21_tbox literal goldens (verbatim from
# `test/expected/21_tbox.test.out:1-45`) ----------------------------------

def test_tbox_literal_goldens():
    import pytest
    from mobilitydb_spark.casts import parse_tbox, tbox_out
    cases = [
        ("TBOX((1.0, 2000-01-01), (1.0, 2000-01-02))",
         "TBOX((1,2000-01-01 00:00:00+00),(1,2000-01-02 00:00:00+00))"),
        ("TBOX((1.0,), (1.0,))", "TBOX((1,),(1,))"),
        ("TBOX((, 2000-01-01), (, 2000-01-02))",
         "TBOX((,2000-01-01 00:00:00+00),(,2000-01-02 00:00:00+00))"),
        ("TBOX((2,2000-01-02),(1,2000-01-01))",
         "TBOX((1,2000-01-01 00:00:00+00),(2,2000-01-02 00:00:00+00))"),
    ]
    for lit, want in cases:
        assert tbox_out(parse_tbox(lit)) == want, lit
    errors = [
        ("STBOX(1, 2000-01-02)", "Could not parse TBOX"),
        ("TBOX(1, 2000-01-02)",
         "Could not parse TBOX: Missing opening parenthesis"),
        ("TBOX((AA, 2000-01-02))",
         "Could not parse TBOX: Invalid input syntax for type double"),
        ("TBOX((1, AA))",
         'invalid input syntax for type timestamp with time zone: "AA"'),
        ("TBOX((1, 2000-01-01, 2))",
         "Could not parse TBOX: Missing closing parenthesis"),
        # ADVICE r3: asymmetric tuples must error like the reference
        # (2nd tuple parsed under the 1st tuple's hasx/hast flags),
        # not silently demote the dimension
        ("TBOX((1,2000-01-01),(,2000-01-02))",
         "Could not parse TBOX: Invalid input syntax for type double"),
        ("TBOX((1,2000-01-01),(2,))", "Could not parse TBOX"),
        ("TBOX((,2000-01-01),(2,2000-01-02))", "Could not parse TBOX"),
        ("TBOX((1,),(2,2000-01-02))",
         "Could not parse TBOX: Missing closing parenthesis"),
    ]
    for lit, msg in errors:
        with pytest.raises(ValueError) as e:
            parse_tbox(lit)
        assert str(e.value) == msg, lit


def test_stbox_asymmetric_tuples_error():
    """ADVICE r3: STBOX tuples that disagree on the X dimension must
    raise (reference parses tuple 2 under tuple 1's flags)."""
    import pytest
    from mobilitydb_spark.boxops import parse_stbox
    cases = [
        ("STBOX T((1,2,2000-01-01),(,,2000-01-02))",
         "Could not parse STBOX: Invalid input syntax for type double"),
        ("STBOX T((,,2000-01-01),(1,2,2000-01-02))",
         "Could not parse STBOX"),
    ]
    for lit, msg in cases:
        with pytest.raises(ValueError) as e:
            parse_stbox(lit)
        assert str(e.value) == msg, lit


# --- 01_period in/out + validation goldens (verbatim from
# `test/expected/01_period.test.out:1-50`) --------------------------------

def test_period_literal_goldens():
    import pytest
    cases = [
        ("[2000-01-01,2000-01-01]",
         "[2000-01-01 00:00:00+00, 2000-01-01 00:00:00+00]"),
        ("[2000-01-01,2000-01-02]",
         "[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00]"),
        ("(2000-01-01,2000-01-02]",
         "(2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00]"),
        ("[2000-01-01,2000-01-02)",
         "[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00)"),
    ]
    for lit, want in cases:
        assert str(P(lit)) == want, lit
    errors = [
        ("2000-01-01, 2000-01-02", "Could not parse period"),
        ("[2000-01-01, 2000-01-02", "Could not parse period"),
        ("(2000-01-01,2000-01-01)", "Period cannot be empty"),
        ("[2000-01-02,2000-01-01]",
         "Period lower bound must be less than or equal to period "
         "upper bound"),
    ]
    for lit, msg in errors:
        with pytest.raises(ValueError) as e:
            P(lit)
        assert str(e.value) == msg, lit


# --- 03_timestampset / 05_periodset literal goldens (verbatim) -----------

def test_timestampset_literal_goldens():
    import pytest
    from mobilitydb_spark.types import (format_timestampset,
                                        parse_timestampset)
    got = parse_timestampset("{2000-01-01, 2000-01-02, 2000-01-03}")
    assert format_timestampset(got) == \
        ("{2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00, "
         "2000-01-03 00:00:00+00}")
    for bad, msg in [("2000-01-01, 2000-01-02",
                      "Could not parse timestamp set"),
                     ("{2000-01-01, 2000-01-02",
                      "Could not parse timestamp set"),
                     ("{}", "A timestamp set must have at least one "
                            "timestamp")]:
        with pytest.raises(ValueError) as e:
            parse_timestampset(bad)
        assert str(e.value) == msg, bad
    with pytest.raises(ValueError, match="Invalid value"):
        parse_timestampset("{2000-01-01, 2000-01-01, 2000-01-03}")


def test_periodset_literal_goldens():
    import pytest
    from mobilitydb_spark.types import format_periodset, parse_periodset
    got = parse_periodset("{[2000-01-01, 2000-01-02], "
                          "[2000-01-03,2000-01-04]}")
    assert format_periodset(got) == \
        ("{[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00], "
         "[2000-01-03 00:00:00+00, 2000-01-04 00:00:00+00]}")
    for bad in ["2000-01-01, 2000-01-02", "{[2000-01-01, 2000-01-02]"]:
        with pytest.raises(ValueError, match="Could not parse period set"):
            parse_periodset(bad)


def test_tpoint_to_stbox_goldens_58():
    """tgeompoint::stbox cast goldens verbatim from
    `point/test/expected/58_tpoint_boxops.test.out:133-156` via
    `stbox_out(STBox.of(...))`, plus the && overlap golden at :1055."""
    from mobilitydb_spark import types as T
    from mobilitydb_spark.boxops import (STBox, overlaps, parse_stbox,
                                         stbox_out)
    cases = [
        ("Point(1 1)@2000-01-01",
         "STBOX T((1,1,2000-01-01 00:00:00+00),"
         "(1,1,2000-01-01 00:00:00+00))"),
        ("{Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03}",
         "STBOX T((1,1,2000-01-01 00:00:00+00),"
         "(2,2,2000-01-03 00:00:00+00))"),
        ("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03]",
         "STBOX T((1,1,2000-01-01 00:00:00+00),"
         "(2,2,2000-01-03 00:00:00+00))"),
        ("{[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
         "Point(1 1)@2000-01-03],[Point(3 3)@2000-01-04, "
         "Point(3 3)@2000-01-05]}",
         "STBOX T((1,1,2000-01-01 00:00:00+00),"
         "(3,3,2000-01-05 00:00:00+00))"),
    ]
    for lit, want in cases:
        assert stbox_out(STBox.of(T.parse_temporal(lit))) == want, lit
    # :1055-ish — sequence && spatial-only STBOX((1,2),(1,2)) = t
    tv = T.parse_temporal("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, "
                          "Point(1 1)@2000-01-03]")
    box = parse_stbox("STBOX((1.0, 2.0), (1.0, 2.0))")
    tb = STBox.of(tv)
    # spatial-only comparison: box has no T dimension; widen its time
    # to the value's own span (the reference's overlap ignores the
    # missing dimension)
    box_t = STBox(box.xmin, box.xmax, box.ymin, box.ymax,
                  tb.tmin, tb.tmax)
    assert overlaps(tb, box_t) is True


# --- 50_stbox constructors / accessors / casts / cmp (verbatim from
# `point/test/expected/50_stbox.test.out:108-629`) -------------------------

def test_stbox_constructor_goldens():
    from mobilitydb_spark.boxops import (geodstbox_make, stbox_make,
                                         stbox_out, stboxt_make)
    cases = [
        (stbox_make(1, 2, 3, 4), "STBOX((1,2),(3,4))"),
        (stbox_make(1, 2, 3, 4, 5, 6), "STBOX Z((1,2,3),(4,5,6))"),
        (stbox_make(1, 2, 3, "2001-01-04", 5, 6, 7, "2001-01-08"),
         "STBOX ZT((1,2,3,2001-01-04 00:00:00+00),"
         "(5,6,7,2001-01-08 00:00:00+00))"),
        (stboxt_make(1, 2, "2001-01-03", 4, 5, "2001-01-06"),
         "STBOX T((1,2,2001-01-03 00:00:00+00),"
         "(4,5,2001-01-06 00:00:00+00))"),
        (geodstbox_make(1, 2, 3, 4, 5, 6), "GEODSTBOX((1,2,3),(4,5,6))"),
        (geodstbox_make(1, 2, 3, "2001-01-04", 5, 6, 7, "2001-01-08"),
         "GEODSTBOX T((1,2,3,2001-01-04 00:00:00+00),"
         "(5,6,7,2001-01-08 00:00:00+00))"),
        # bounds auto-sorted per dimension
        (stbox_make(8, 7, 6, "2001-01-05", 4, 3, 2, "2001-01-01"),
         "STBOX ZT((4,3,2,2001-01-01 00:00:00+00),"
         "(8,7,6,2001-01-05 00:00:00+00))"),
        (stboxt_make(6, 5, "2001-01-04", 3, 2, "2001-01-01"),
         "STBOX T((3,2,2001-01-01 00:00:00+00),"
         "(6,5,2001-01-04 00:00:00+00))"),
        (geodstbox_make(8, 7, 6, "2001-01-05", 4, 3, 2, "2001-01-01"),
         "GEODSTBOX T((4,3,2,2001-01-01 00:00:00+00),"
         "(8,7,6,2001-01-05 00:00:00+00))"),
    ]
    for box, want in cases:
        assert stbox_out(box) == want


def test_stbox_accessor_goldens():
    from mobilitydb_spark import boxops as B
    from mobilitydb_spark.types import fmt_ts
    t1 = "2000-01-01 00:00:00+00"
    t2 = "2000-01-02 00:00:00+00"
    # literal → (xmin,ymin,zmin,tmin,xmax,ymax,zmax,tmax), time as text
    cases = [
        ("STBOX((1.0, 2.0), (3.0, 4.0))",
         (1, 2, None, None, 3, 4, None, None)),
        ("STBOX Z((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))",
         (1, 2, 3, None, 4, 5, 6, None)),
        ("STBOX T((1.0, 2.0, 2000-01-01), (3.0, 4.0, 2000-01-02))",
         (1, 2, None, t1, 3, 4, None, t2)),
        ("STBOX ZT((1.0, 2.0, 3.0, 2000-01-01), "
         "(4.0, 5.0, 6.0, 2000-01-02))",
         (1, 2, 3, t1, 4, 5, 6, t2)),
        ("STBOX T((, , 2000-01-01), (, , 2000-01-02))",
         (None, None, None, t1, None, None, None, t2)),
    ]
    acc = [B.stbox_xmin, B.stbox_ymin, B.stbox_zmin, B.stbox_tmin,
           B.stbox_xmax, B.stbox_ymax, B.stbox_zmax, B.stbox_tmax]
    for lit, want in cases:
        box = B.parse_stbox(lit)
        for fn, w in zip(acc, want):
            got = fn(box)
            if w is None:
                assert got is None, (lit, fn.__name__)
            elif isinstance(w, str):
                assert fmt_ts(got) == w, (lit, fn.__name__)
            else:
                assert got == float(w), (lit, fn.__name__)


def test_stbox_cast_goldens():
    from mobilitydb_spark import boxops as B
    lits = ["STBOX((1.0, 2.0), (3.0, 4.0))",
            "STBOX Z((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))",
            "STBOX T((1.0, 2.0, 2000-01-01), (3.0, 4.0, 2000-01-02))",
            "STBOX ZT((1.0, 2.0, 3.0, 2000-01-01), "
            "(4.0, 5.0, 6.0, 2000-01-02))",
            "STBOX T((, , 2000-01-01), (, , 2000-01-02))"]
    boxes = [B.parse_stbox(s) for s in lits]
    per = "[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00]"
    want_period = [None, None, per, per, per]
    for box, w in zip(boxes, want_period):
        got = B.stbox_to_period(box)
        assert (got is None) == (w is None)
        if w is not None:
            assert str(got) == w
    want_box2d = ["BOX(1 2,3 4)", "BOX(1 2,4 5)", "BOX(1 2,3 4)",
                  "BOX(1 2,4 5)", None]
    assert [B.stbox_to_box2d(b) for b in boxes] == want_box2d
    want_box3d = ["BOX3D(1 2 0,3 4 0)", "BOX3D(1 2 3,4 5 6)",
                  "BOX3D(1 2 0,3 4 0)", "BOX3D(1 2 3,4 5 6)", None]
    assert [B.stbox_to_box3d(b) for b in boxes] == want_box3d


def test_stbox_cmp_goldens():
    from mobilitydb_spark.boxops import parse_stbox, stbox_cmp
    base = "STBOX ZT((1,2,3,2001-01-04), (1,2,3,2001-01-04))"
    # each variant bumps one field; cmp(base, v) = -1 and cmp(v, base) = 1
    variants = [
        "STBOX ZT((2,2,3,2001-01-04), (2,2,3,2001-01-04))",   # xmin
        "STBOX ZT((1,3,3,2001-01-04), (1,3,3,2001-01-04))",   # ymin
        "STBOX ZT((1,2,4,2001-01-04), (1,2,4,2001-01-04))",   # zmin
        "STBOX ZT((1,2,3,2001-01-05), (1,2,3,2001-01-05))",   # tmin
        "STBOX ZT((1,2,3,2001-01-04), (2,2,3,2001-01-04))",   # xmax
        "STBOX ZT((1,2,3,2001-01-04), (1,3,3,2001-01-04))",   # ymax
        "STBOX ZT((1,2,3,2001-01-04), (1,2,4,2001-01-04))",   # zmax
        "STBOX ZT((1,2,3,2001-01-04), (1,2,3,2001-01-05))",   # tmax
    ]
    a = parse_stbox(base)
    for lit in variants:
        v = parse_stbox(lit)
        assert stbox_cmp(a, v) == -1, lit
        assert stbox_cmp(v, a) == 1, lit
    assert stbox_cmp(a, parse_stbox(base)) == 0


def test_stbox_total_order_counts():
    """The suite's closing tbl_stbox pairwise counts
    (`50_stbox.test.out:600-629`: = 100, <> 9900, < 4950, <= 5050,
    > 4950, >= 5050 over a 100-row table).  These are
    dataset-independent identities of any STRICT TOTAL ORDER over 100
    distinct values — which is exactly what they verify about
    stbox_cmp.  Run them over a deterministic 100 distinct boxes."""
    import numpy as np

    from mobilitydb_spark.boxops import stbox_cmp, stbox_make
    rng = np.random.default_rng(50)
    boxes, seen = [], set()
    while len(boxes) < 100:
        x1, y1, z1, x2, y2, z2 = (float(v) for v in
                                  np.round(rng.uniform(0, 100, 6), 3))
        key = (x1, y1, z1, x2, y2, z2)
        if key in seen:
            continue
        seen.add(key)
        boxes.append(stbox_make(x1, y1, z1, x2, y2, z2))
    n_eq = n_ne = n_lt = n_le = n_gt = n_ge = 0
    for b1 in boxes:
        for b2 in boxes:
            c = stbox_cmp(b1, b2)
            n_eq += c == 0
            n_ne += c != 0
            n_lt += c < 0
            n_le += c <= 0
            n_gt += c > 0
            n_ge += c >= 0
    assert (n_eq, n_ne, n_lt, n_le, n_gt, n_ge) == \
        (100, 9900, 4950, 5050, 4950, 5050)
