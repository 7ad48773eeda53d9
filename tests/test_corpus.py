"""Semantics + plan shapes for the corpus/embedding-analytics keys
(inventory/corpus.py, SURVEY §2 L21–L24)."""

import re

from novlake_spark import plans
from novlake_spark.inventory.corpus import (
    q_emb_centroid_assign,
    q_emb_gram,
    q_emb_norm_stats,
    q_llm_curriculum,
    q_llm_source_overlap,
    q_llm_zipf,
)
from novlake_spark.sources.tables import load_table


def test_source_overlap_bounds_and_pairs(spark, sf_small):
    rows = q_llm_source_overlap(spark, sf_small).collect()
    n_sources = load_table(spark, sf_small, "documents").select("source").distinct().count()
    # one row per unordered pair with shared vocabulary; the word-soup
    # fixture shares stopwords everywhere, so expect the full C(n,2)
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["n_common"] >= 1


def test_centroid_assign_partitions_all_vectors(spark, sf_small):
    rows = q_emb_centroid_assign(spark, sf_small).collect()
    emb = load_table(spark, sf_small, "embeddings")
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert {r["assigned"] for r in rows} <= labels


def test_centroid_assign_deterministic(spark, sf_small):
    """Argmin ties break on label inside the struct compare, and
    centroids are rounded before the distance fold — two runs (two
    independent centroid collections) must agree exactly."""
    a = sorted(map(tuple, q_emb_centroid_assign(spark, sf_small).collect()))
    b = sorted(map(tuple, q_emb_centroid_assign(spark, sf_small).collect()))
    assert a == b


def test_centroid_assign_scan_side_is_shuffle_free(spark, sf_small):
    """Centroids enter as literals, so the per-vector argmin is pure
    codegen over the scan — the only KEYED exchange in the final plan
    is the 4-ish-group confusion agg (vectors never shuffle by key;
    round 11 adds an explicit width-only RoundRobin spread of the
    one-row-group scan below the argmin — ensure_parallelism, guide
    §2.5 — so the pin distinguishes partitioning kinds instead of
    counting Exchange nodes)."""
    df = q_emb_centroid_assign(spark, sf_small)
    plan = plans.explain_str(df)
    assert plan.count("hashpartitioning") == 1, plan
    assert "zip_with" not in plan.lower() or "Python" not in plan


def test_curriculum_bins_partition_corpus(spark, sf_small):
    rows = {r["bin"]: r for r in q_llm_curriculum(spark, sf_small).collect()}
    docs = load_table(spark, sf_small, "documents")
    assert set(rows) == {1, 2, 3, 4}
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    # quartile bins are ordered and non-overlapping on token count
    for lo, hi in ((1, 2), (2, 3), (3, 4)):
        assert rows[lo]["max_tokens"] < rows[hi]["min_tokens"]


def test_curriculum_has_no_global_sort(spark, sf_small):
    """The scale contract: quartile cut-points via a tiny aggregate +
    broadcast, NOT ntile over a total-order window (single-reducer
    sort at 100 TB). No window, no global Sort in the plan."""
    plan = plans.explain_str(q_llm_curriculum(spark, sf_small))
    assert "Window" not in plan, plan
    assert not re.search(r"Sort \(\d+\)[^\n]*global=true", plan), plan


def test_gram_matrix_shape_and_psd_necessaries(spark, sf_small):
    rows = q_emb_gram(spark, sf_small).collect()
    emb = load_table(spark, sf_small, "embeddings")
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    assert len(rows) == dim * (dim + 1) // 2  # strict upper triangle + diag
    by_cell = {(r["dim_i"], r["dim_j"]): r for r in rows}
    diag_sum = 0.0
    for (i, j), r in by_cell.items():
        assert i <= j and r["n_vecs"] == n
        if i == j:
            assert r["e_xy"] >= 0  # E[x²] — necessary for PSD
            diag_sum += r["e_xy"]
        else:
            # Cauchy–Schwarz: |E[xy]| <= sqrt(E[x²] E[y²])
            bound = (by_cell[(i, i)]["e_xy"] * by_cell[(j, j)]["e_xy"]) ** 0.5
            assert abs(r["e_xy"]) <= bound + 1e-6
    # unit vectors ⇒ trace of the second-moment matrix == 1
    assert abs(diag_sum - 1.0) < 1e-3


def test_gram_single_exchange(spark, sf_small):
    """Products are generated inside codegen and partially aggregated
    map-side — the plan's only exchange is the (i, j) hash agg."""
    plan = plans.explain_str(q_emb_gram(spark, sf_small))
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1, plan


def test_zipf_fit_sane(spark, sf_small):
    (row,) = q_llm_zipf(spark, sf_small).collect()
    # frequency is non-increasing in rank, so the fitted slope must be
    # negative; the uniform word-soup fixture is FLAT (|slope| << 1) —
    # exactly the degenerate-corpus signature the diagnostic exists for
    assert row["n_fit"] >= 10
    assert -1.0 < row["slope"] < 0.0
    assert row["intercept"] > 0


def test_norm_stats_confirms_unit_vectors(spark, sf_small):
    rows = q_emb_norm_stats(spark, sf_small).collect()
    emb = load_table(spark, sf_small, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        # fixture embeddings are L2-normalized; the key is the QA gate
        # that would catch it if they ever weren't
        assert abs(r["avg_norm"] - 1.0) < 1e-3, r
        assert r["min_norm"] > 0.99 and r["max_norm"] < 1.01
        assert r["min_dim0"] <= r["avg_dim0"] <= r["max_dim0"]
