"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting — all pure Catalyst expressions (no Python in the
hot path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "de", "est", "pour", "dans"],
    "es": ["el", "la", "los", "y", "de", "es", "para", "en"],
    "ru": ["i", "v", "ne", "na", "chto", "eto", "kak", "po"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, r"\s+")


def bpe_ish_count_col(text: Column) -> Column:
    """BPE-ish token count: letters runs + digit runs + punctuation
    singles (regexp, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


def quality_cols(text: Column) -> dict[str, Column]:
    """Quality-signal columns: length, token stats, punct/stopword
    ratios (cheap heuristics of the C4/Gopher style)."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_distinct = F.size(F.array_distinct(toks))
    return {
        "n_chars": n_char.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "n_distinct_tokens": n_distinct.cast("bigint"),
        "mean_token_len": (n_char - n_tok + 1).cast("double") / n_tok,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_char, F.lit(1)),
        "distinct_ratio": n_distinct.cast("double") / F.greatest(n_tok, F.lit(1)),
    }


def langid_col(text: Column, tie_order: list[str] | None = None) -> Column:
    """Stopword-overlap language ID: argmax over per-language stopword
    hit counts, ties broken by language code order."""
    langs = sorted(STOPWORDS) if tie_order is None else tie_order
    # ONE pass over the full token array: intersect with the UNION
    # stopword list first (array_intersect dedups, so per-language
    # scores over the tiny hit array are provably identical — each
    # language list ⊆ the union).  The hit array is bound as a
    # transform lambda variable so it is evaluated once per row; the
    # previous element_at(scored, i)-inside-transform form
    # re-evaluated every intersect per sequence element (the
    # interpreted-lambda CSE trap — up to L² full-token passes).
    toks = tokens_col(F.lower(text))
    union_words = sorted({w for ws in STOPWORDS.values() for w in ws})
    hits = F.array_intersect(toks, F.array(*[F.lit(w)
                                             for w in union_words]))

    def rank(h: Column) -> Column:
        # deterministic winner: sort desc on (score, neg-rank) —
        # ties resolve to the earliest language code
        return F.sort_array(F.array(*[
            F.struct(
                F.size(F.array_intersect(h, F.array(
                    *[F.lit(w) for w in STOPWORDS[lg]]))).alias("score"),
                F.lit(len(langs) - i).alias("pref"),
                F.lit(lg).alias("lang"))
            for i, lg in enumerate(langs)]), asc=False)

    one = F.transform(F.array(hits), rank)
    return F.element_at(F.element_at(one, 1), 1)["lang"]


def fingerprint_md5_col(text: Column) -> Column:
    """Exact-dup fingerprint: md5 hex of the raw text bytes."""
    return F.md5(text)


def rolling_fingerprints_col(text: Column, k: int = 5,
                             keep_mod: int = 8) -> Column:
    """Winnowing-style k-gram fingerprint set: xxhash64 of each k-token
    window, keeping hashes ≡ 0 (mod keep_mod) — a compact document
    sketch for containment detection.  Spark-only (xxhash64 seed)."""
    toks = tokens_col(text)
    n = F.size(toks)
    grams = F.when(n < k, F.array()).otherwise(F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.xxhash64(F.concat_ws(
            "\x1f", *[F.element_at(toks, i + j) for j in range(k)]))))
    return F.sort_array(F.array_distinct(
        F.filter(grams, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)))


def rolling_fingerprints(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5,
                         keep_mod: int = 8) -> DataFrame:
    """(id, fps): md5-based mod-sampled k-gram fingerprint sets —
    deterministic across engines (md5 is shared with DuckDB, unlike
    xxhash64's seed), so the sketch itself is oracle-checkable.

    The token array is materialized in its own projection: interpreted
    lambda eval has no CSE, so an inlined split(text) would re-tokenize
    per element (O(tokens²) per document)."""
    tk = df.select(F.col(id_col).alias("id"),
                   F.split(F.col(text_col), " ").alias("tk"))
    n = F.size("tk")
    gram = lambda i: F.concat_ws(
        "\x1f", *[F.element_at("tk", i + j) for j in range(k)])
    h = lambda i: F.conv(F.substring(F.md5(gram(i)), 1, 8), 16, 10) \
        .cast("bigint")
    grams = F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(1), n - (k - 1)), h))
    fps = F.sort_array(F.array_distinct(
        F.filter(grams, lambda x: F.pmod(x, F.lit(keep_mod)) == 0)))
    return tk.select("id", fps.alias("fps"))


def doc_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_cols(F.col(text_col))
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return out
