"""Deterministic sampling / splitting / mixing operator properties."""

from pyspark.sql import functions as F

from novlake_spark.operators import sampling as S
from novlake_spark.sources.tables import load_table


def test_det_sample_reproducible_and_near_rate(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem")
    n = li.count()
    s1 = S.det_sample(li, ["l_orderkey", "l_linenumber"], 0.25)
    s2 = S.det_sample(li, ["l_orderkey", "l_linenumber"], 0.25)
    c1, c2 = s1.count(), s2.count()
    assert c1 == c2  # bit-identical across runs
    assert abs(c1 / n - 0.25) < 0.05  # within 5pp of the target rate
    # repartitioning must not change membership (cluster-size invariance)
    c3 = S.det_sample(li.repartition(13), ["l_orderkey", "l_linenumber"], 0.25).count()
    assert c3 == c1


def test_det_sample_nested_rates(spark, sf_small):
    """A 10% sample is a subset of the 50% sample (threshold monotonic)."""
    li = load_table(spark, sf_small, "lineitem")
    keys = ["l_orderkey", "l_linenumber"]
    small = S.det_sample(li, keys, 0.1).select(*keys)
    big = S.det_sample(li, keys, 0.5).select(*keys)
    assert small.exceptAll(big).count() == 0


def test_rate_bounds():
    assert S._threshold_hex(0.0) == "00"
    assert S._threshold_hex(1.0) == "zz"  # sorts above 'ff'
    assert S._threshold_hex(0.5) == "80"


def test_stratified_rates(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    rates = {"en": 0.1, "de": 1.0, "es": 0.5, "fr": 0.5, "zh": 1.0}
    got = {
        r["lang"]: r["n"]
        for r in S.stratified_sample(docs, ["doc_id"], "lang", rates)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == tot["de"] and got["zh"] == tot["zh"]  # rate 1.0 keeps all
    assert got["en"] < 0.25 * tot["en"]  # dominant lang downsampled hard


def test_split_disjoint_exhaustive_stable(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    splits = {"test": 0.125, "val": 0.125, "train": 0.75}
    assigned = docs.select("doc_id", S.split_assign(["doc_id"], splits))
    counts = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # exhaustive (disjoint by CASE construction)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stability: the same doc_id maps to the same split in a re-derivation
    again = docs.select("doc_id", S.split_assign(["doc_id"], splits))
    assert assigned.exceptAll(again).count() == 0


def test_reservoir_per_group_fixed_budget(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    out = S.reservoir_per_group(docs, ["doc_id"], "lang", 5)
    per_group = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per_group.items():
        assert n == min(5, sizes[lang])
    # deterministic and cluster-size invariant
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in S.reservoir_per_group(docs.repartition(13), ["doc_id"], "lang", 5).collect()
    )
    assert ids1 == ids2


def test_mix_epochs_arithmetic_invariants(spark, sf_small):
    """S9: the epoching plan is self-consistent pure-integer output."""
    from novlake_spark.inventory.sampling import q_mix_epochs

    rows = {r["source"]: r for r in q_mix_epochs(spark, sf_small).collect()}
    total = sum(r["n_tokens"] for r in rows.values())
    n_src = len(rows)
    for r in rows.values():
        # even split of the 3x budget, true integer division
        assert r["target_tokens"] == (3 * total) // n_src
        assert 0 <= r["full_epochs"] <= 4
        assert 0 <= r["frac_rate_u32"] < 2**32
        if r["full_epochs"] < 4:
            # consumed + fractional pass reconstructs the target
            rem = r["target_tokens"] - r["full_epochs"] * r["n_tokens"]
            assert 0 <= rem < r["n_tokens"]
            assert r["frac_rate_u32"] == (rem * 2**32) // r["n_tokens"]
        else:
            assert r["frac_rate_u32"] == 0


def test_mix_epochs_cap_binds_on_scarce_source(spark, sf_small):
    """Shrinking one source's tokens below target/4 must hit the cap."""
    from novlake_spark.inventory.sampling import q_mix_epochs

    plan = q_mix_epochs(spark, sf_small)
    # with budget = 3x corpus split evenly, a source holding far less
    # than its even share repeats up to the cap: assert the cap rule
    # holds pointwise rather than trusting fixture balance
    for r in plan.collect():
        uncapped = r["target_tokens"] // r["n_tokens"]
        assert r["full_epochs"] == min(4, uncapped)
