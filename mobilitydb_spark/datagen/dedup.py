"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the dedup family a 100 TB text pipeline needs.

Execution shapes (scale notes):
- exact: one hash-groupBy (map-side partial agg applies)
- MinHash+LSH: shingle → signature entirely in Catalyst expressions
  (arrays of xxhash64, no Python); LSH bands explode ×n_bands then a
  band-key self-join.  Degenerate buckets (near-empty docs hashing
  identically) are capped — a bucket of B docs creates B² candidate
  pairs, so the cap bounds the worst-case task.
- SimHash: pure Catalyst (token explode + md5 + 64 partial-agg SUM
  votes) → 64-bit signature; hamming-≤-r pairs via pigeonhole chunk
  banding (exact for hamming ≤ r).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Canonical representative per distinct text (hash groupBy)."""
    return (df.groupBy(text_col)
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_dups"))
              .select("keep_id", "n_dups"))


def shingles_from_tokens(toks, n: int = 3):
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column.  ``toks`` must be an attribute from a previous projection:
    interpreted lambda evaluation has no common-subexpression
    elimination, so an inlined split(text) would re-tokenize the text
    for every element_at — O(tokens²) per document."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                "|", *[F.element_at(toks, i + j) for j in range(n)]))))


def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles — same construction as the
    DuckDB oracle (1-based element_at).  Prefer a two-step projection
    (split → ``shingles_from_tokens``) in hot paths, see above."""
    return shingles_from_tokens(F.split(F.col(text_col), " "), n)


def _shingles_df(df: DataFrame, id_col: str, text_col: str,
                 shingle_n: int) -> DataFrame:
    """(id, sh) with the token array materialized between projections."""
    tk = df.select(F.col(id_col).alias("id"),
                   F.split(F.col(text_col), " ").alias("tk"))
    return tk.select("id", shingles_from_tokens(F.col("tk"),
                                                shingle_n).alias("sh"))


def base_hash_col(shingles):
    """x = xxhash64(s) mod M per shingle — materialize this ONCE as a
    column before applying the n_hashes permutations (Catalyst's
    CollapseProject keeps a non-cheap projection referenced n times as
    a separate step, so the shingles are hashed once, not n times)."""
    return F.transform(shingles,
                       lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31)))


def minhash_from_base(base, n_hashes: int = 48, seed: int = 42):
    """Array of n_hashes minhash values over a pre-hashed shingle
    array: h_j(x) = (a_j·x + b_j) mod (2³¹−1)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE31, n_hashes, dtype=np.int64)

    def perm(aj: int, bj: int):
        # single-arg lambda: a 2-arg lambda would receive the element
        # INDEX as its second argument from F.transform
        return lambda x: F.pmod(x * F.lit(aj) + F.lit(bj), F.lit(MERSENNE31))

    return F.array(*[
        F.array_min(F.transform(base, perm(int(a[j]), int(b[j]))))
        for j in range(n_hashes)])


def minhash_signature(shingles, n_hashes: int = 48, seed: int = 42):
    """Array of n_hashes minhash values, all in Catalyst expressions:
    h_j(s) = (a_j·x + b_j) mod (2³¹−1) over x = xxhash64(s) mod M.

    Prefer ``base_hash_col`` + ``minhash_from_base`` on a two-step
    projection so the shingle hashing runs once."""
    return minhash_from_base(base_hash_col(shingles), n_hashes, seed)


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 48,
                      n_bands: int = 16, threshold: float = 0.8,
                      shingle_n: int = 3,
                      max_bucket: int = 2000) -> DataFrame:
    """Near-duplicate pairs (i < j) with exact shingle-Jaccard ≥
    threshold, candidates from MinHash LSH banding.

    Returns (id_i, id_j, jaccard).  Buckets larger than ``max_bucket``
    are dropped (degenerate — e.g. empty docs) rather than exploding
    into B² pairs; the exact verify step keeps the output precise.

    Banding is 16 bands × 3 rows: a pair at the 0.8 Jaccard threshold
    is missed with probability (1 − 0.8³)¹⁶ ≈ 1.1e-5 (the previous
    8×4 layout missed ~1.5% of borderline pairs, which made parity
    against the brute-force oracle flaky at other scales).
    """
    rows = n_hashes // n_bands
    # SIGNATURE path is ROW-LOCAL and string-free: hash each token
    # once, combine consecutive n-gram hashes numerically (xxhash64
    # over hash pairs via zip_with of slices), then take the n_hashes
    # permutation minima per row with array_min — a pure map, no
    # shuffle at all (a minhash signature is a per-document function;
    # measured 1M docs in 1.3 s at 8 cores vs 11 s for an
    # explode+groupBy formulation whose 48-column hash-agg maps
    # thrashed memory).  MIN is duplicate-insensitive, so no distinct
    # here (the exact verify below still uses distinct string
    # shingles).  Each array stage lives in its OWN projection:
    # interpreted lambda eval has no CSE, so an inlined producer is
    # recomputed per element.
    rng = np.random.default_rng(42)
    a = rng.integers(1, MERSENNE31, n_hashes, dtype=np.int64)
    b_ = rng.integers(0, MERSENNE31, n_hashes, dtype=np.int64)
    tk = df.select(F.col(id_col).alias("id"),
                   F.split(F.col(text_col), " ").alias("tk"))
    th = tk.select("id", F.transform(
        "tk", lambda t: F.xxhash64(t)).alias("th"))
    hxd = th.where(F.size("th") >= shingle_n)

    # The 48 permutation minima ran as interpreted HOF transforms (48
    # lambda passes over every shingle hash — ~10 s of the 16.6 s
    # query at sf1.0, measured with a noop sink on the sig stage
    # alone).  A numpy Arrow kernel computes the SAME values with the
    # same integer arithmetic: numpy's % on int64 has Python/pmod
    # non-negative semantics, r < 2^31 and a_j < 2^31 keep r*a_j+b_j
    # under 2^62 (no overflow), and MIN over exact integers is
    # order-insensitive, so the signature is bit-identical to the
    # previous Catalyst expression (guide §4.2: hand whole batches to
    # vectorized native code).  The per-band bucket key is a splitmix64
    # fold of the band's minhash values — docs share a bucket iff the
    # band's minhash triple is equal, exactly the previous
    # xxhash64(concat_ws) intent (either keying differs only through
    # 2^-64 hash collisions, and the exact-Jaccard verify below pins
    # the output either way).
    def _mix64(h: np.ndarray, x: np.ndarray) -> np.ndarray:
        z = (h ^ x) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    # Spark's xxhash64 over BIGINT args, ported to uint64 numpy
    # (XXH64 hashLong chained with seed 42) — verified bit-equal to
    # the Catalyst expression on random and fixture inputs
    # (tests/test_r06_optimizations.py); lets the n-gram combine run
    # inside the Arrow kernel instead of shingle_n-1 interpreted
    # zip_with passes over every token hash
    _P1 = np.uint64(0x9E3779B185EBCA87)
    _P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    _P3 = np.uint64(0x165667B19E3779F9)
    _P4 = np.uint64(0x85EBCA77C2B2AE63)
    _P5 = np.uint64(0x27D4EB2F165667C5)

    def _xxh64_long(l: np.ndarray, seed) -> np.ndarray:
        h = seed + _P5 + np.uint64(8)
        k1 = l * _P2
        k1 = ((k1 << np.uint64(31)) | (k1 >> np.uint64(33))) * _P1
        h ^= k1
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * _P1 + _P4
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
        return h

    def sig_kernel(batches):
        import pandas as pd
        M = np.int64(MERSENNE31)
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf["th"].to_numpy()
            lens = np.fromiter((len(v) for v in col), np.int64, len(col))
            tflat = np.concatenate(col).astype(np.int64).view(np.uint64)
            tstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # n-gram combine: comb_i = fold of xxhash64 over the
            # shingle's token hashes, exactly the zip_with chain
            ms = lens - (shingle_n - 1)
            starts = np.concatenate(([0], np.cumsum(ms)[:-1]))
            pos = np.arange(int(ms.sum())) - np.repeat(starts, ms)
            src = np.repeat(tstarts, ms) + pos
            # comb starts as the RAW first token hash; each chain step
            # is one two-arg xxhash64(prev, t_j) = hashLong(t_j,
            # hashLong(prev, 42)) — every call re-seeds from 42
            with np.errstate(over="ignore"):
                comb = tflat[src]
                for j in range(1, shingle_n):
                    comb = _xxh64_long(tflat[src + j],
                                       _xxh64_long(comb, np.uint64(42)))
            flat = comb.view(np.int64)
            r = flat % M
            mins = np.empty((len(col), n_hashes), dtype=np.int64)
            for j in range(n_hashes):
                y = (r * a[j] + b_[j]) % M
                mins[:, j] = np.minimum.reduceat(y, starts)
            keys = np.zeros((len(col), n_bands), dtype=np.uint64)
            um = mins.astype(np.uint64)
            with np.errstate(over="ignore"):
                for bb in range(n_bands):
                    h = np.zeros(len(col), dtype=np.uint64)
                    for rr in range(rows):
                        h = _mix64(h, um[:, bb * rows + rr])
                    keys[:, bb] = h
            out = pdf[["id"]].copy()
            out["bkeys"] = list(keys.astype(np.int64))
            yield out

    sig = hxd.mapInPandas(sig_kernel, "id bigint, bkeys array<bigint>")
    bands = sig.select(
        "id", F.posexplode("bkeys").alias("band", "bkey"))
    # ONE exchange on the bucket key co-locates each bucket; a
    # partition-local kernel then emits each bucket's (id_i < id_j)
    # pairs directly with the ``max_bucket`` cap applied from the
    # bucket's own (fully local) size — the previous shape consumed
    # the exchange three times (bucket-size aggregate + both
    # candidate self-join sides); same candidate set, two fewer
    # passes (r6, the _bucket_gram_pairs shape minus the vectors)
    bands = bands.repartition("band", "bkey")

    def pair_kernel(batches):
        import pandas as pd
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        band = pdf["band"].to_numpy()
        bkey = pdf["bkey"].to_numpy()
        ids = pdf["id"].to_numpy()
        order = np.lexsort((ids, bkey, band))
        band, bkey, ids = band[order], bkey[order], ids[order]
        cuts = np.flatnonzero((np.diff(band) != 0)
                              | (np.diff(bkey) != 0)) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(ids)]))
        sizes_arr = ends - starts
        out_i: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        for gi in np.flatnonzero((sizes_arr >= 2)
                                 & (sizes_arr <= max_bucket)):
            g = ids[starts[gi]:ends[gi]]
            iu, ju = np.triu_indices(len(g), 1)
            out_i.append(g[iu])
            out_j.append(g[ju])
        if out_i:
            yield pd.DataFrame({"id_i": np.concatenate(out_i),
                                "id_j": np.concatenate(out_j)})

    cand = bands.mapInPandas(pair_kernel, "id_i bigint, id_j bigint") \
        .distinct()
    # exact verify: distinct string-shingle jaccard, computed ONLY for
    # the candidate rows (joining the full shingle arrays for every
    # document would recompute them table-wide)
    di = df.select(F.col(id_col).alias("id_i"),
                   F.split(F.col(text_col), " ").alias("tk_i"))
    dj = df.select(F.col(id_col).alias("id_j"),
                   F.split(F.col(text_col), " ").alias("tk_j"))
    cand = (cand.join(di, "id_i").join(dj, "id_j")
            .select("id_i", "id_j",
                    shingles_from_tokens(F.col("tk_i"), shingle_n)
                    .alias("sh_i"),
                    shingles_from_tokens(F.col("tk_j"), shingle_n)
                    .alias("sh_j")))
    inter = F.size(F.array_intersect("sh_i", "sh_j"))
    uni = F.size(F.array_union("sh_i", "sh_j"))
    jac = inter.cast("double") / F.greatest(uni, F.lit(1)).cast("double")
    return (cand.select("id_i", "id_j", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (the brute baseline
    the LSH path approximates; quadratic — small inputs only)."""
    sh = _shingles_df(df, id_col, text_col, shingle_n)
    l = sh.select(F.col("id").alias("id_i"), F.col("sh").alias("sh_i"))
    r = sh.select(F.col("id").alias("id_j"), F.col("sh").alias("sh_j"))
    cand = l.crossJoin(r).where(F.col("id_i") < F.col("id_j"))
    inter = F.size(F.array_intersect("sh_i", "sh_j"))
    uni = F.size(F.array_union("sh_i", "sh_j"))
    jac = inter.cast("double") / F.greatest(uni, F.lit(1)).cast("double")
    return (cand.select("id_i", "id_j", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_64(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document — pure Catalyst, no Python kernel.

    Token hash = md5(token)'s 128 bits truncated to 64 (two 32-bit
    halves parsed from hex).  The per-bit vote is LANE-PACKED: four
    16-bit counters per 64-bit SUM, so the explode + hash-aggregate
    carries 16 map-side-combinable SUMs + one COUNT instead of 64
    SUMs (bit b of the signature is set iff 2·Σbit_b > n_tokens —
    algebraically identical to the previous ±1 vote sign).  md5 is
    identical across engines, so the signature is deterministic AND
    SQL-expressible (the DuckDB oracle reproduces it bit-for-bit).

    Lane-width constraint: the packed path is exact only while the
    per-document token count stays below 2¹⁵ (a 16-bit lane).  Docs
    at or over that are detected from the aggregate's own exact COUNT
    and recomputed through the unpacked 64-SUM aggregation (a second
    pass over only the oversized docs' tokens — rare by construction,
    so the fallback costs ~nothing and the guard makes oversized docs
    correct instead of silently corrupted by lane carry).

    100 TB shape: tokenize-explode (like wordcount) → partial-agg
    groupBy(doc_id) — no UDF, no skew beyond token-count variance.
    """
    toks = (df.select(id_col,
                      F.explode(F.split(F.col(text_col), r"\s+"))
                       .alias("tok"))
            .where(F.col("tok") != ""))
    # md5 + two base-16 convs per token OCCURRENCE cost ~1.9 s of the
    # 6 s query at sf1.0 (noop-isolated); hashing each DISTINCT token
    # once and broadcast-joining the (tok, hi, lo) dim back is
    # value-identical (md5 is a pure function of the token) and drops
    # that work to the vocabulary size (guide §4.2 flavor: hoist the
    # expensive pure function off the hot cardinality)
    # The vote expressions are built as SQL STRINGS and handed to one
    # F.expr each: composing them from 64×4 Column operators costs
    # hundreds of py4j round trips (~3 s of pure driver-side build
    # time per invocation, measured at sf0.1 — more than the job's
    # whole cluster-side execution).  Same Catalyst tree either way.
    def bit_sql(b: int) -> str:
        src = "lo" if b < 32 else "hi"
        return f"(shiftrightunsigned({src}, {b % 32}) & 1)"

    def packed_sql(j: int) -> str:
        # lanes L=0..3 of SUM j hold bits 4j+L at 16-bit offsets
        return " + ".join(f"shiftleft({bit_sql(4 * j + L)}, {16 * L})"
                          for L in range(4))

    # the lane-packed vote terms are pure functions of the token, so
    # they are evaluated once per DISTINCT token in the dim and
    # broadcast-joined back (r6): the hot path per token occurrence is
    # a broadcast-hash probe + 16 plain column sums instead of md5 +
    # two base-16 convs + 64 shift/case terms — noop-isolated, the
    # md5+conv alone cost ~1.9 s of the 6 s query at sf1.0
    dim = toks.select("tok").distinct() \
        .select("tok", F.md5("tok").alias("m")) \
        .select(
            "tok",
            F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("lo")) \
        .selectExpr("tok", *[f"({packed_sql(j)}) AS pk{j}"
                             for j in range(16)])
    hv = toks.join(F.broadcast(dim), "tok") \
        .select(id_col, *[f"pk{j}" for j in range(16)])

    # try_sum: at >= 2^15 tokens the L=3 lane (shifted 48) overflows
    # the 64-bit SUM itself under ANSI mode — oversized docs get NULL
    # lanes here and are recomputed through the unpacked path below
    # (their ntok COUNT stays exact either way)
    votes = hv.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("ntok"),
        *[F.expr(f"try_sum(pk{j})").alias(f"p{j}") for j in range(16)])

    def lane_sql(b: int) -> str:
        return (f"(shiftrightunsigned(p{b // 4}, {16 * (b % 4)})"
                f" & {0xFFFF})")

    def vote_sql(term: str, b: int) -> str:
        # two's-complement reassembly: bit 63 contributes -2^63
        # (shiftleft wraps to MIN_LONG; bit ops are exempt from ANSI)
        one = ("shiftleft(CAST(1 AS BIGINT), 63)" if b == 63
               else f"CAST({1 << b} AS BIGINT)")
        return (f"(CASE WHEN {term} * 2 > ntok THEN {one} "
                f"ELSE CAST(0 AS BIGINT) END)")

    sig_sql = " + ".join(vote_sql(lane_sql(b), b)
                         for b in range(63, -1, -1))
    sig = votes.where(F.col("ntok") < (1 << 15)) \
        .select(id_col, F.expr(f"CAST(({sig_sql}) AS BIGINT)")
                .alias("simhash"))
    # lane-overflow fallback: docs with >= 2^15 tokens would carry a
    # saturated 16-bit vote lane into its neighbour; recompute them
    # with the unpacked 64-SUM aggregation (only their tokens — the
    # semi-join prunes before the shuffle, and AQE broadcasts the
    # usually-tiny oversized-id list)
    big_ids = votes.where(F.col("ntok") >= (1 << 15)).select(id_col)
    # Re-explode only the oversized docs' text (semi-join on the ~5k-row
    # doc table, THEN tokenize): probing hv directly would re-run the
    # full explode+md5+conv pipeline over every token a third time even
    # when no doc is oversized.  votes' own exchange is reused between
    # the sig and big_ids branches, so the packed aggregation runs once.
    big_docs = df.join(big_ids, id_col, "left_semi")
    big_toks = (big_docs.select(id_col,
                                F.explode(F.split(F.col(text_col), r"\s+"))
                                 .alias("tok"))
                .where(F.col("tok") != ""))
    big_m = big_toks.select(id_col, F.md5("tok").alias("m"))
    big_hv = big_m.select(
        id_col,
        F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("lo"))
    big_votes = big_hv.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("ntok"),
        *[F.expr(f"sum({bit_sql(b)})").alias(f"b{b}") for b in range(64)])
    big_sql = " + ".join(vote_sql(f"b{b}", b) for b in range(63, -1, -1))
    big_sig = big_votes.select(id_col, F.expr(f"CAST(({big_sql}) AS BIGINT)")
                               .alias("simhash"))
    sig = sig.unionByName(big_sig)
    # docs with zero tokens get signature 0
    return (df.select(id_col).join(sig, id_col, "left")
            .select(id_col, F.coalesce("simhash", F.lit(0))
                    .cast("long").alias("simhash")))


def simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL reproducing simhash_64 + simhash_near_pairs exactly
    (pigeonhole banding is exact for hamming ≤ r, so brute-force
    all-pairs is a faithful oracle)."""
    def half(off: int) -> str:
        return ("CAST(list_sum(list_transform(range(1,9), i -> "
                "CAST(strpos('0123456789abcdef', substr(m, i + {off}, 1))"
                " - 1 AS BIGINT) << (4*(8-i)))) AS BIGINT)"
                .format(off=off))
    sums = ",\n           ".join(
        "CAST(SUM(2 * ((({src} >> {sh}) & 1)) - 1) AS BIGINT) AS s{b}"
        .format(src="lo" if b < 32 else "hi", sh=b % 32, b=b)
        for b in range(64))
    recon = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) "
        f"ELSE CAST(0 AS BIGINT) END)" for b in range(63))
    recon = (f"(CASE WHEN s63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
             f"ELSE CAST(0 AS BIGINT) END) + {recon}")
    return f"""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
        WHERE tok <> ''),
    h AS (SELECT doc_id, md5(tok) AS m FROM toks),
    hv AS (SELECT doc_id, {half(0)} AS hi, {half(8)} AS lo FROM h),
    votes AS (
        SELECT doc_id,
           {sums}
        FROM hv GROUP BY doc_id),
    sig0 AS (SELECT doc_id, CAST({recon} AS BIGINT) AS simhash FROM votes),
    sig AS (
        SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
        FROM documents d LEFT JOIN sig0 s USING (doc_id))
    SELECT a.doc_id AS id_i, b.doc_id AS id_j,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY id_i, id_j
    """


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via pigeonhole
    banding: split 64 bits into max_hamming+1 chunks — any pair within
    the radius shares ≥1 exact chunk (exact, not probabilistic).

    Scale note: exact-duplicate documents share the full signature and
    pair quadratically (that is the correct output, not a bucket
    artifact) — at 100 TB run ``exact_dedup`` first so each distinct
    text appears once, which bounds every chunk bucket."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = F.posexplode(F.array(*[
        F.shiftrightunsigned(F.col("simhash"), c * width)
         .bitwiseAND(F.lit((1 << width) - 1))
        for c in range(n_chunks)])).alias("chunk", "ckey")
    b = sigs.select(F.col(id_col).alias("id"), "simhash", chunks)
    # one reused exchange on the chunk key: both self-join sides
    # otherwise re-run the upstream signature aggregate (the
    # tokenize-explode-md5 wordcount, the pipeline's dominant cost).
    # A bucket-local pair kernel (the minhash shape) was A/B'd here
    # and REVERTED: simhash explodes into ~1e5 tiny 16-bit-key
    # buckets and the per-group Python overhead lost to the join
    # (same-session: join 3.2-3.7 s vs kernel 4.8-5.4 s at sf1.0);
    # the kernel pays off only where buckets are few (minhash's mixed
    # 64-bit band keys).
    b = b.repartition("chunk", "ckey")
    l = b.select(F.col("id").alias("id_i"),
                 F.col("simhash").alias("sh_i"), "chunk", "ckey")
    r = b.select(F.col("id").alias("id_j"),
                 F.col("simhash").alias("sh_j"), "chunk", "ckey")
    cand = (l.join(r, ["chunk", "ckey"])
             .where(F.col("id_i") < F.col("id_j"))
             .select("id_i", "id_j", "sh_i", "sh_j").distinct())
    hamming = F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j"))).cast("int")
    return (cand.select("id_i", "id_j", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
