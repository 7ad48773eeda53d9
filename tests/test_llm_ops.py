"""LLM-pipeline operator semantics on *constructed* corpora — the
fixtures contain no planted duplicates, so recall/precision of the
dedup and ANN operators is asserted here on data with known structure."""

import pyspark.sql.functions as F
import pytest

from novlake_spark.operators import dedup as D
from novlake_spark.operators import knn as K
from novlake_spark.operators import text as T

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark):
    near = BASE.replace("warm", "cold")  # 1-token change → near-dup
    far = "completely different content about distributed query engines and columnar storage formats"
    rows = [
        (0, BASE),
        (1, BASE),            # exact dup of 0
        (2, near),            # near dup of 0
        (3, far),
        (4, "short text only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_planted(corpus):
    out = D.exact_dedup(corpus).collect()
    by_keep = {r.keep_id: r.n_copies for r in out}
    assert by_keep[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 4


def test_minhash_lsh_finds_near_dup(corpus):
    sig = D.minhash_signatures(corpus, num_hashes=32, shingle_k=3)
    pairs = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sig).collect()}
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup recalled
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated not paired


def test_minhash_deterministic(corpus):
    s1 = D.minhash_signatures(corpus).orderBy("doc_id").collect()
    s2 = D.minhash_signatures(corpus).orderBy("doc_id").collect()
    assert s1 == s2


def test_simhash_hamming(corpus, spark):
    df = corpus.select("doc_id", T.simhash(T.tokens(F.col("text")), bits=32).alias("h"))
    h = {r.doc_id: r.h for r in df.collect()}
    assert h[0] == h[1]  # identical text → identical signature

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(h[0], h[2]) <= 6       # near-dup → few bits differ
    assert hamming(h[0], h[3]) > hamming(h[0], h[2])  # unrelated differs more


def test_jaccard_values(corpus, spark):
    t = corpus.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    a = t.filter("doc_id = 0").select(F.col("toks").alias("ta"))
    for other, lo, hi in [(1, 1.0, 1.0), (2, 0.8, 0.99), (3, 0.0, 0.05)]:
        b = t.filter(f"doc_id = {other}").select(F.col("toks").alias("tb"))
        j = a.crossJoin(b).select(D.jaccard(F.col("ta"), F.col("tb")).alias("j")).first().j
        assert lo <= j <= hi, (other, j)


def test_lsh_knn_recall_vs_bruteforce(spark, sf_small):
    from novlake_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    exact = K.knn_join_blocked(emb.withColumn("_all", F.lit(1)), "_all", k=5)
    approx = K.lsh_bucketed_knn(emb, k=5, n_planes=3)
    e = {(r.a_id, r.b_id) for r in exact.collect()}
    a = {(r.a_id, r.b_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 8 buckets on random unit vectors: recall well above random chance
    # (1/8 ≈ 0.12); planted-duplicate vectors would sit near 1.0.
    assert recall > 0.2, recall

    # OR-amplification: 3 independent tables strictly beat one
    multi = {(r.a_id, r.b_id) for r in K.lsh_bucketed_knn(emb, k=5, n_planes=3, n_tables=3).collect()}
    assert len(e & multi) / len(e) > recall


def test_knn_single_matches_manual(spark, sf_small):
    from novlake_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    top = K.knn_single(emb, query_id=0, k=3).collect()
    assert len(top) == 3
    assert top[0].score >= top[1].score >= top[2].score


def test_fingerprint_stable_under_dup(corpus):
    fp = corpus.select("doc_id", T.fingerprint(T.tokens(F.col("text"))).alias("fp")).collect()
    m = {r.doc_id: r.fp for r in fp}
    assert m[0] == m[1]
    assert m[0] != m[3]


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    out = df.select(T.shingles(T.tokens(F.col("text")), 5).alias("s")).first().s
    assert out == []
