"""07_rangetype_ext goldens — all 40 booleans lifted verbatim from
`test/expected/07_rangetype_ext.test.out`."""

from mobilitydb_spark.rangeops import (NumRange, range_adjacent,
                                       range_left, range_overleft,
                                       range_overright, range_right)


EMPTY_I = NumRange.parse("empty", int_range=True)
R35 = NumRange.parse("[3,5)", int_range=True)
EMPTY_F = NumRange.parse("empty")
F3555 = NumRange.parse("[3.5, 5.5]")


def test_intrange_elem_goldens():
    assert range_left(EMPTY_I, 5) is False          # :1
    assert range_left(R35, 5) is True               # :7
    assert range_left(5, EMPTY_I) is False          # :13
    assert range_left(5, R35) is False              # :19
    assert range_right(EMPTY_I, 5) is False         # :25
    assert range_right(R35, 5) is False             # :31
    assert range_right(5, EMPTY_I) is False         # :37
    assert range_right(5, R35) is True              # :43
    assert range_overleft(EMPTY_I, 5) is False      # :49
    assert range_overleft(R35, 5) is True           # :55
    assert range_overleft(5, EMPTY_I) is False      # :61
    assert range_overleft(5, R35) is True           # :67
    assert range_overright(EMPTY_I, 5) is False     # :73
    assert range_overright(R35, 5) is False         # :79
    assert range_overright(5, EMPTY_I) is False     # :85
    assert range_overright(5, R35) is True          # :91
    assert range_adjacent(EMPTY_I, 5) is False      # :97
    assert range_adjacent(R35, 5) is True           # :103
    assert range_adjacent(5, EMPTY_I) is False      # :109
    assert range_adjacent(5, R35) is True           # :115


def test_floatrange_elem_goldens():
    e = 5.5
    assert range_left(EMPTY_F, e) is False          # :121
    assert range_left(F3555, e) is False            # :127
    assert range_left(e, EMPTY_F) is False          # :133
    assert range_left(e, F3555) is False            # :139
    assert range_right(EMPTY_F, e) is False         # :145
    assert range_right(F3555, e) is False           # :151
    assert range_right(e, EMPTY_F) is False         # :157
    assert range_right(e, F3555) is False           # :163
    assert range_overleft(EMPTY_F, e) is False      # :169
    assert range_overleft(F3555, e) is True         # :175
    assert range_overleft(e, EMPTY_F) is False      # :181
    assert range_overleft(e, F3555) is True         # :187
    assert range_overright(EMPTY_F, e) is False     # :193
    assert range_overright(F3555, e) is False       # :199
    assert range_overright(e, EMPTY_F) is False     # :205
    assert range_overright(e, F3555) is True        # :211
    assert range_adjacent(EMPTY_F, e) is False      # :217
    assert range_adjacent(F3555, e) is False        # :223
    assert range_adjacent(e, EMPTY_F) is False      # :229
    assert range_adjacent(e, F3555) is False        # :235
