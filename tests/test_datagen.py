"""Datagen operator tests: dedup (exact/minhash/simhash), similarity
(brute vs LSH recall), text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobilitydb_spark.datagen import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_exact_dedup_counts(spark, docs):
    out = dedup.exact_dedup(docs).toPandas()
    assert out["n_dups"].sum() == docs.count()


def test_minhash_lsh_matches_bruteforce(spark, docs):
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.8).toPandas()
    brute = dedup.ngram_jaccard_pairs(docs.limit(200), threshold=0.8) \
        .toPandas()
    lsh_set = set(map(tuple, lsh[["id_i", "id_j"]].itertuples(index=False)))
    brute_set = set(map(tuple,
                        brute[["id_i", "id_j"]].itertuples(index=False)))
    # LSH must find every brute pair within the restricted id range
    assert brute_set <= lsh_set
    assert len(lsh) >= len(brute_set)
    # every reported pair really has jaccard >= 0.8 (exact verify step)
    assert (lsh["jaccard"] >= 0.8).all()


def test_simhash_near_pairs_find_exact_dups(spark, docs):
    sigs = dedup.simhash_64(docs)
    pairs = dedup.simhash_near_pairs(sigs, max_hamming=3).toPandas()
    # exact duplicate texts must be found at hamming 0
    dup_pairs = (docs.alias("a").join(docs.alias("b"),
                 (F.col("a.text") == F.col("b.text"))
                 & (F.col("a.doc_id") < F.col("b.doc_id")))
                 .select(F.col("a.doc_id").alias("i"),
                         F.col("b.doc_id").alias("j"))).toPandas()
    got = set(map(tuple, pairs[["id_i", "id_j"]].itertuples(index=False)))
    for i, j in dup_pairs.itertuples(index=False):
        assert (i, j) in got or len(dup_pairs) == 0
    if len(pairs):
        assert (pairs["hamming"] <= 3).all()


def test_lsh_topk_recall_vs_brute(spark, emb):
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    brute = similarity.brute_topk(q, c, 5).toPandas()
    ann = similarity.lsh_topk(q, c, 5, probe_bits=1).toPandas()
    assert set(ann["qid"]) == set(brute["qid"])
    # every query returns exactly k ranked rows
    assert (ann.groupby("qid").size() == 5).all()
    # recall@5 of the ANN path vs brute
    recall = 0.0
    for qid, grp in brute.groupby("qid"):
        b = set(grp["cid"])
        a = set(ann[ann["qid"] == qid]["cid"])
        recall += len(a & b) / 5
    recall /= brute["qid"].nunique()
    assert recall >= 0.6, recall


def test_langid_matches_stopword_argmax(spark):
    rows = [(1, "the cat and the dog is here"),
            (2, "der hund und die katze ist von zu"),
            (3, "le chat et la maison est pour les"),
            (4, "xyzzy qwerty plugh")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = dict(df.select("id", text.langid_col(F.col("text")).alias("lg"))
               .collect())
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "de"  # zero hits everywhere → first code wins


def test_quality_cols(spark, docs):
    out = text.doc_quality(docs.limit(50)).toPandas()
    assert (out["n_tokens"] > 0).all()
    assert (out["distinct_ratio"] <= 1.0).all()
    assert (out["n_chars"] == out["text"].str.len()).all()


def test_rolling_fingerprints_detect_containment(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    rows = [(1, base), (2, base + " phi chi psi omega extra tail words"),
            (3, "completely different words with no overlap at all here")]
    df = spark.createDataFrame(rows, "id int, text string")
    fp = df.select("id", text.rolling_fingerprints_col(F.col("text"))
                   .alias("fp")).toPandas()
    f = {r["id"]: set(r["fp"]) for _, r in fp.iterrows()}
    if f[1]:
        # doc2 contains doc1 → shares its fingerprints
        assert f[1] <= f[2]
        assert not (f[1] & f[3])


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world! x2 (ok)")],
                               "id int, text string")
    n = df.select(text.bpe_ish_count_col(F.col("text")).alias("n")).first()["n"]
    # hello , world ! x 2 ( ok )  → 9
    assert n == 9


def test_multimodal_stub_pipeline(spark):
    media = multimodal.fake_media(spark, 30)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 30
    assert feats["decode_ok"].all()
    assert (feats["feat"].str.len() == 16).all()
    assert set(feats["kind"]) == {"image", "audio", "video"}
    # deterministic across runs
    feats2 = multimodal.extract_features(media).toPandas()
    a = [tuple(map(float, f)) for f in feats.sort_values("media_id")["feat"]]
    b = [tuple(map(float, f)) for f in feats2.sort_values("media_id")["feat"]]
    assert a == b


def test_ivf_topk_recall_and_exact_k(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    ivf = similarity.ivf_topk(q, c, 5).toPandas()
    brute = similarity.brute_topk(q, c, 5).toPandas()
    # exact-k guarantee: every query returns exactly k ranked rows
    assert (ivf.groupby("qid").size() == 5).all()
    iv = {(r.qid, r.cid) for r in ivf.itertuples()}
    br = {(r.qid, r.cid) for r in brute.itertuples()}
    assert len(iv & br) / len(br) >= 0.8


def test_ivf_sample_quantizer_recall_and_exact_k(spark):
    """The sample-centroid quantizer (the driver-oracled variant) must
    hold the same exact-k guarantee and a usable recall."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), "embedding")
    ivf = similarity.ivf_topk(q, c, 5, quantizer="sample").toPandas()
    brute = similarity.brute_topk(q, c, 5).toPandas()
    assert (ivf.groupby("qid").size() == 5).all()
    iv = {(r.qid, r.cid) for r in ivf.itertuples()}
    br = {(r.qid, r.cid) for r in brute.itertuples()}
    assert len(iv & br) / len(br) >= 0.8


def test_cosine_neardup_recall_on_planted_dups(spark):
    """The pigeonhole-banded cosine near-dup path must find planted
    high-cosine pairs (the operator's real use case: dedup at
    cosine >= 0.9)."""
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 40 near-dups: id 1000+i is a small perturbation of i
    pert = base[:40] + rng.standard_normal((40, 64)) * 0.03
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    rows = [(i, v.astype(np.float32).tolist())
            for i, v in enumerate(base)] + \
           [(1000 + i, v.astype(np.float32).tolist())
            for i, v in enumerate(pert)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = similarity.cosine_neardup_pairs(df, 0.9).toPandas()
    found = {(r.id_i, r.id_j) for r in got.itertuples()}
    want = {(i, 1000 + i) for i in range(40)}
    recall = len(found & want) / len(want)
    assert recall >= 0.9, recall
    # every reported pair really is above threshold (exact refine)
    assert (got["score"] >= 0.9).all()


def _ref_simhash(tokens: list[str]) -> int:
    """Independent Python reference for the md5-based 64-bit simhash:
    bit b set iff 2 * count(tokens whose hash-bit b is 1) > n."""
    import hashlib
    from collections import Counter
    cnt = Counter(tokens)
    n = sum(cnt.values())
    bits = [0] * 64
    for tok, c in cnt.items():
        h = hashlib.md5(tok.encode()).hexdigest()
        hi, lo = int(h[0:8], 16), int(h[8:16], 16)
        for b in range(64):
            src = lo if b < 32 else hi
            if (src >> (b % 32)) & 1:
                bits[b] += c
    sig = 0
    for b in range(64):
        if 2 * bits[b] > n:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_lane_overflow_guard(spark):
    """ADVICE r3: a doc with >= 2^15 tokens must take the unpacked
    64-SUM fallback — at >= 2^16 tokens the packed 16-bit vote lanes
    carry into their neighbours and silently corrupt the signature.
    70k tokens makes the corruption real, not just theoretical."""
    words = [f"tok{i}" for i in range(37)]
    big = [words[(i * 7) % 37] for i in range(70000)]
    small = big[:200]
    df = spark.createDataFrame(
        [(1, " ".join(big)), (2, " ".join(small))],
        "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in dedup.simhash_64(df).collect()}
    assert got[1] == _ref_simhash(big)
    assert got[2] == _ref_simhash(small)


def test_cosine_neardup_banded_recall_and_parity(spark):
    """OR-of-bands cosine near-dup (B=16 x R=10): planted-dup recall
    >= 0.9 at cosine >= 0.9, and exact agreement with the SQL oracle
    on the driver fixture."""
    import duckdb
    import pandas as pd
    rng = np.random.default_rng(5)
    base = rng.standard_normal((200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base[:40] + rng.standard_normal((40, 64)) * 0.03
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    rows = [(i, v.astype(np.float32).tolist())
            for i, v in enumerate(base)] + \
           [(1000 + i, v.astype(np.float32).tolist())
            for i, v in enumerate(pert)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    got = similarity.cosine_neardup_banded(df, 0.9).toPandas()
    found = {(r.id_i, r.id_j) for r in got.itertuples()}
    want = {(i, 1000 + i) for i in range(40)}
    assert len(found & want) / len(want) >= 0.9
    assert (got["score"] >= 0.9).all()
    # oracle parity on the driver fixture
    sf = "/root/testdata/sf0.001"
    from mobilitydb_spark import queries as qmod
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    eng = similarity.cosine_neardup_banded(emb, qmod._COS_TAU).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    odf = con.sql(qmod._oracle_cosine_banded()).df()
    a = {(r.id_i, r.id_j, r.score) for r in eng.itertuples()}
    b = {(r.id_i, r.id_j, r.score) for r in odf.itertuples()}
    assert a == b


def test_cosine_neardup_bucket_cap_matches_oracle(spark):
    """ADVICE r3 (medium): the engine's max_bucket cap must be part of
    the SQL-replicated semantics.  Run engine and oracle with a TINY
    cap that actually trips on the fixture and assert they agree —
    and that the cap really dropped candidates vs. the uncapped run."""
    import duckdb
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    capped = similarity.cosine_neardup_pairs(
        emb, 0.42, max_bucket=30).toPandas()
    uncapped = similarity.cosine_neardup_pairs(
        emb, 0.42, max_bucket=10**9).toPandas()
    assert len(capped) < len(uncapped)  # the cap must actually trip
    from mobilitydb_spark import queries as qmod
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    odf = con.sql(qmod._oracle_cosine_lsh(max_bucket=30)).df()
    got = {(r.id_i, r.id_j) for r in capped.itertuples()}
    want = {(r.id_i, r.id_j) for r in odf.itertuples()}
    assert got == want


def test_multimodal_resize_plumbing(spark):
    """resize_images: deterministic area pooling with real batch
    plumbing (schema, dtype round-trip, per-row flag)."""
    import numpy as np
    from mobilitydb_spark.datagen import multimodal
    media = multimodal.fake_media(spark, 12)
    small = multimodal.resize_images(media, 8, 8).toPandas()
    assert len(small) == 12 and small["decode_ok"].all()
    assert (small["width"] == 8).all() and (small["height"] == 8).all()
    assert (small["payload"].str.len() == 64).all()
    # deterministic across runs
    small2 = multimodal.resize_images(media, 8, 8).toPandas()
    a = small.sort_values("media_id")["payload"].tolist()
    b = small2.sort_values("media_id")["payload"].tolist()
    assert a == b
    # exact 2x2 mean-pool check against a hand computation for one row
    # (float64, the decode stub's documented sample dtype — the SQL
    # oracle for multimodal_features replicates the same double fold)
    row = media.where("media_id = 0").toPandas().iloc[0]
    px = np.frombuffer(bytes(row.payload), np.uint8).astype(np.float64)
    img = np.resize(px / 255.0, 64 * 64).reshape(64, 64)
    want = img.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    got = np.frombuffer(
        bytes(small.set_index("media_id").loc[0, "payload"]),
        np.uint8).reshape(8, 8)
    assert (got == np.clip(want * 255.0, 0, 255).astype(np.uint8)).all()


def test_band_signatures_match_oracle_band_keys(spark):
    """ADVICE r5 (low): the engine's band keys must equal the SQL
    oracle's bit-for-bit.  band_signatures folds the projection
    strictly left-to-right over dim (not a BLAS matmul, whose pairwise
    summation can flip the sign of a near-zero projection vs DuckDB's
    sequential list_dot_product); this guard compares every
    (vec_id, band) key on the driver fixture."""
    import duckdb
    from mobilitydb_spark import queries as qmod
    sf = "/root/testdata/sf0.001"
    bands, R = 16, 10
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    eng = similarity.band_signatures(
        emb, "vec_id", "embedding", bands, R).toPandas()
    got = {(r.vec_id, b): int(k)
           for r in eng.itertuples() for b, k in enumerate(r.keys)}
    planes = qmod._lsh_planes(bands * R)
    per_band = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        f"{qmod._band_key_sql('v', planes, b, R)} AS key FROM e"
        for b in range(bands))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    odf = con.sql(
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings) {per_band}").df()
    want = {(r.vec_id, r.band): int(r.key) for r in odf.itertuples()}
    assert got == want
