"""PostgreSQL-compatible hash functions (public lookup3 / Jenkins
2006 mixing, as in PG's `access/hash/hashfunc.c`) — the reference's
hash operator family hashes its time types with `hashint8` +
`hash_uint32` and combines per `src/period.c:781-810` — verified
against the 01_period_tbl golden (max(period_hash) over the
reference's own tables)."""

from __future__ import annotations

M32 = 0xFFFFFFFF


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & M32


def _final(a: int, b: int, c: int) -> int:
    c ^= b
    c = (c - _rot(b, 14)) & M32
    a ^= c
    a = (a - _rot(c, 11)) & M32
    b ^= a
    b = (b - _rot(a, 25)) & M32
    c ^= b
    c = (c - _rot(b, 16)) & M32
    a ^= c
    a = (a - _rot(c, 4)) & M32
    b ^= a
    b = (b - _rot(a, 14)) & M32
    c ^= b
    c = (c - _rot(b, 24)) & M32
    return c


def hash_uint32(k: int) -> int:
    """PG hash_uint32: lookup3 initialized for one word."""
    a = b = c = (0x9E3779B9 + 4 + 3923095) & M32
    a = (a + (k & M32)) & M32
    return _final(a, b, c)


def hashint8(val: int) -> int:
    """PG hashint8: fold the halves then hash_uint32
    (`hashfunc.c` — the sign-dependent XOR keeps hash(i4)==hash(i8)
    for values in int4 range)."""
    val &= 0xFFFFFFFFFFFFFFFF
    signed = val - (1 << 64) if val >> 63 else val
    lo = val & M32
    hi = (val >> 32) & M32
    lo ^= hi if signed >= 0 else (~hi & M32)
    return hash_uint32(lo)


PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01 vs Unix epoch


def period_hash(lower_us: int, upper_us: int,
                lower_inc: bool, upper_inc: bool) -> int:
    """`period_hash` (src/period.c:781-810): flags byte hashed with
    hash_uint32, bound hashes merged with XOR + rot1.  Bounds are
    Unix-epoch µs (the engine's convention); PG TimestampTz counts
    from 2000-01-01, so shift before hashing."""
    lower_us = int(lower_us) - PG_EPOCH_US
    upper_us = int(upper_us) - PG_EPOCH_US
    flags = (1 if lower_inc else 0) | (2 if upper_inc else 0)
    result = hash_uint32(flags)
    result ^= hashint8(lower_us)
    result = ((result << 1) | (result >> 31)) & M32
    result ^= hashint8(upper_us)
    # PG's hash type is int4: present the signed value
    return result - (1 << 32) if result >> 31 else result


def _mix(a: int, b: int, c: int) -> tuple[int, int, int]:
    a = (a - c) & M32; a ^= _rot(c, 4);  c = (c + b) & M32
    b = (b - a) & M32; b ^= _rot(a, 6);  a = (a + c) & M32
    c = (c - b) & M32; c ^= _rot(b, 8);  b = (b + a) & M32
    a = (a - c) & M32; a ^= _rot(c, 16); c = (c + b) & M32
    b = (b - a) & M32; b ^= _rot(a, 19); a = (a + c) & M32
    c = (c - b) & M32; c ^= _rot(b, 4);  b = (b + a) & M32
    return a, b, c


def hash_any(data: bytes) -> int:
    """PG hash_any (lookup3; hashfunc.c) — little-endian word
    assembly (the aligned and unaligned paths agree on LE)."""
    n = len(data)
    a = b = c = (0x9E3779B9 + n + 3923095) & M32
    i = 0
    while n - i >= 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & M32
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & M32
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & M32
        a, b, c = _mix(a, b, c)
        i += 12
    k = data[i:]
    r = len(k)
    if r >= 9:
        if r == 11:
            c = (c + (k[10] << 24)) & M32
        if r >= 10:
            c = (c + (k[9] << 16)) & M32
        c = (c + (k[8] << 8)) & M32  # lowest byte of c reserved for len
    if r >= 5:
        if r >= 8:
            b = (b + (k[7] << 24)) & M32
        if r >= 7:
            b = (b + (k[6] << 16)) & M32
        if r >= 6:
            b = (b + (k[5] << 8)) & M32
        b = (b + k[4]) & M32
    if r >= 1:
        if r >= 4:
            a = (a + (k[3] << 24)) & M32
        if r >= 3:
            a = (a + (k[2] << 16)) & M32
        if r >= 2:
            a = (a + (k[1] << 8)) & M32
        a = (a + k[0]) & M32
    return _final(a, b, c)


def hashfloat8(v: float) -> int:
    """PG hashfloat8: zero hashes to 0, else hash_any of the IEEE
    bytes."""
    import struct
    if v == 0.0:
        return 0
    return hash_any(struct.pack("<d", v))


def hashtext(s: str) -> int:
    return hash_any(s.encode("utf-8"))


def _as_int32(x: int) -> int:
    x &= M32
    return x - (1 << 32) if x >> 31 else x


def temporal_hash(tv, kind: str, vocab: "list[str] | None" = None) -> int:
    """temporal_hash (`src/temporalinst.c:757-788`, temporali.c:1749,
    temporalseq.c:3918, temporals.c:2370): per-instant
    rot1(value_hash) ^ hashint8(t), merged with the h*31-style
    `(h << 5) - h + x` fold — seed 1 for instant sets / sequence
    sets, hash_uint32(bounds flags) for sequences.

    ``kind``: 'bool' | 'int' | 'float' | 'text' (value hash per PG
    operator class); ``vocab`` decodes text values."""
    def inst_hash(value: float, t_us: int) -> int:
        if kind == "bool":
            vh = hash_uint32(1 if value > 0.5 else 0)
        elif kind == "int":
            vh = hash_uint32(int(value) & M32)
        elif kind == "float":
            vh = hashfloat8(float(value))
        else:
            vh = hashtext(vocab[int(value)])
        th = hashint8(int(t_us) - PG_EPOCH_US) & M32
        return (_rot(vh & M32, 1) ^ th) & M32

    from .types import INSTANT, INSTANTSET, SEQUENCE

    def seq_hash(s) -> int:
        flags = (1 if s.lower_inc else 0) | (2 if s.upper_inc else 0)
        h = hash_uint32(flags) & M32
        for t, v in zip(s.times, s.values[:, 0]):
            h = ((h << 5) - h + inst_hash(float(v), int(t))) & M32
        return h

    if tv.duration == INSTANT:
        s = tv.seqs[0]
        return _as_int32(inst_hash(float(s.values[0][0]),
                                   int(s.times[0])))
    if tv.duration == INSTANTSET:
        h = 1
        for s in tv.seqs:
            for t, v in zip(s.times, s.values[:, 0]):
                h = ((h << 5) - h + inst_hash(float(v), int(t))) & M32
        return _as_int32(h)
    if tv.duration == SEQUENCE:
        return _as_int32(seq_hash(tv.seqs[0]))
    h = 1
    for s in tv.seqs:
        h = ((h << 5) - h + seq_hash(s)) & M32
    return _as_int32(h)


def tpoint_value_hash(coords) -> int:
    """PostGIS lwgeom_hash for a point value, as pinned by the
    51-suite comparison block: PG hash_any over the little-endian
    coordinate doubles.  (Hashing the type/npoints-prefixed
    gserialized data contradicts 6 of the 192 pinned outcomes;
    the coords-only layout reproduces all of them.)"""
    import struct
    return hash_any(
        b"".join(struct.pack("<d", float(x)) for x in coords)) & M32


def tpoint_hash(tv) -> int:
    """temporal_hash for tgeompoint/tgeogpoint (`temporalinst.c:757`
    with lwgeom_hash as the value hash) — same rot1-xor-hashint8
    instant merge and (h<<5)-h fold as temporal_hash above."""
    from .types import INSTANT, INSTANTSET, SEQUENCE

    def inst_hash(coords, t_us: int) -> int:
        vh = tpoint_value_hash(coords)
        th = hashint8(int(t_us) - PG_EPOCH_US) & M32
        return (_rot(vh, 1) ^ th) & M32

    if tv.duration == INSTANT:
        s = tv.seqs[0]
        return _as_int32(inst_hash(s.values[0], int(s.times[0])))
    if tv.duration == INSTANTSET:
        h = 1
        for s in tv.seqs:
            for t, v in zip(s.times, s.values):
                h = ((h << 5) - h + inst_hash(v, int(t))) & M32
        return _as_int32(h)

    def seq_hash(s) -> int:
        flags = (1 if s.lower_inc else 0) | (2 if s.upper_inc else 0)
        h = hash_uint32(flags) & M32
        for t, v in zip(s.times, s.values):
            h = ((h << 5) - h + inst_hash(v, int(t))) & M32
        return h

    if tv.duration == SEQUENCE:
        return _as_int32(seq_hash(tv.seqs[0]))
    h = 1
    for s in tv.seqs:
        h = ((h << 5) - h + seq_hash(s)) & M32
    return _as_int32(h)
