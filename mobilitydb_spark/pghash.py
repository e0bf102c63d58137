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
