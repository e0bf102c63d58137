"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the dedup family a 100 TB text pipeline needs.

Execution shapes (scale notes):
- exact: one hash-groupBy (map-side partial agg applies)
- MinHash+LSH: shingle → signature entirely in Catalyst expressions
  (arrays of xxhash64, no Python); LSH bands explode ×n_bands then a
  band-key self-join.  Degenerate buckets (near-empty docs hashing
  identically) are capped — a bucket of B docs creates B² candidate
  pairs, so the cap bounds the worst-case task.
- SimHash: one Arrow-batched numpy kernel per batch → 64-bit
  signature; hamming-≤-r pairs via pigeonhole chunk banding.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
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


def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles — same construction as the
    DuckDB oracle (1-based element_at)."""
    toks = F.split(F.col(text_col), " ")
    return F.when(F.size(toks) < n, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                "|", *[F.element_at(toks, i + j) for j in range(n)]))))


def minhash_signature(shingles, n_hashes: int = 32, seed: int = 42):
    """Array of n_hashes minhash values, all in Catalyst expressions:
    h_j(s) = (a_j·x + b_j) mod (2³¹−1) over x = xxhash64(s) mod M."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE31, n_hashes, dtype=np.int64)
    base = F.transform(shingles,
                       lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31)))

    def perm(aj: int, bj: int):
        # single-arg lambda: a 2-arg lambda would receive the element
        # INDEX as its second argument from F.transform
        return lambda x: F.pmod(x * F.lit(aj) + F.lit(bj), F.lit(MERSENNE31))

    return F.array(*[
        F.array_min(F.transform(base, perm(int(a[j]), int(b[j]))))
        for j in range(n_hashes)])


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 32,
                      n_bands: int = 8, threshold: float = 0.8,
                      shingle_n: int = 3,
                      max_bucket: int = 2000) -> DataFrame:
    """Near-duplicate pairs (i < j) with exact shingle-Jaccard ≥
    threshold, candidates from MinHash LSH banding.

    Returns (id_i, id_j, jaccard).  Buckets larger than ``max_bucket``
    are dropped (degenerate — e.g. empty docs) rather than exploding
    into B² pairs; the exact verify step keeps the output precise.
    """
    rows = n_hashes // n_bands
    sh = df.select(F.col(id_col).alias("id"),
                   shingles_col(text_col, shingle_n).alias("sh"))
    sig = sh.select(
        "id", "sh", minhash_signature(F.col("sh"), n_hashes).alias("mh"))
    bands = sig.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(
                ",", *[F.element_at("mh", b * rows + r + 1).cast("string")
                       for r in range(rows)]))
            for b in range(n_bands)])).alias("band", "bkey"))
    sizes = bands.groupBy("band", "bkey").count() \
        .where(F.col("count") <= max_bucket)
    bands = bands.join(sizes.select("band", "bkey"), ["band", "bkey"])
    l = bands.select(F.col("id").alias("id_i"), "band", "bkey")
    r = bands.select(F.col("id").alias("id_j"), "band", "bkey")
    cand = (l.join(r, ["band", "bkey"])
             .where(F.col("id_i") < F.col("id_j"))
             .select("id_i", "id_j").distinct())
    # exact verify: shingle jaccard
    cand = (cand
            .join(sh.select(F.col("id").alias("id_i"),
                            F.col("sh").alias("sh_i")), "id_i")
            .join(sh.select(F.col("id").alias("id_j"),
                            F.col("sh").alias("sh_j")), "id_j"))
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
    sh = df.select(F.col(id_col).alias("id"),
                   shingles_col(text_col, shingle_n).alias("sh"))
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

def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _token_hash(tokens: list[str]) -> np.ndarray:
    h = np.array([hash(t) & 0x7FFFFFFFFFFFFFFF for t in tokens],
                 dtype=np.uint64)
    return _splitmix64(h)


def simhash_64(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (Arrow-batched numpy kernel).

    NOTE: python hash() is seed-dependent across processes —
    PYTHONHASHSEED is pinned by Spark for workers, so signatures are
    stable within a job; persist signatures rather than recomputing
    across jobs for cross-run stability."""
    out_schema = f"{id_col} bigint, simhash bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            sigs = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                toks = text.split()
                if not toks:
                    continue
                th = _token_hash(toks)
                bitmat = ((th[:, None] & bits[None, :]) != 0)
                score = bitmat.sum(axis=0) * 2 - len(toks)
                sig = np.uint64(0)
                sig = (bits[score > 0]).sum(dtype=np.uint64)
                sigs[i] = np.int64(sig.astype(np.uint64).view(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "simhash": sigs})

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id") -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via pigeonhole
    banding: split 64 bits into max_hamming+1 chunks — any pair within
    the radius shares ≥1 exact chunk."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = F.posexplode(F.array(*[
        F.shiftrightunsigned(F.col("simhash"), c * width)
         .bitwiseAND(F.lit((1 << width) - 1))
        for c in range(n_chunks)])).alias("chunk", "ckey")
    b = sigs.select(F.col(id_col).alias("id"), "simhash", chunks)
    l = b.select(F.col("id").alias("id_i"),
                 F.col("simhash").alias("sh_i"), "chunk", "ckey")
    r = b.select(F.col("id").alias("id_j"),
                 F.col("simhash").alias("sh_j"), "chunk", "ckey")
    cand = (l.join(r, ["chunk", "ckey"])
             .where(F.col("id_i") < F.col("id_j"))
             .select("id_i", "id_j", "sh_i", "sh_j").distinct())
    hamming = F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j")))
    return (cand.select("id_i", "id_j", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
