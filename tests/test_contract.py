"""Driver-contract integrity: entry smoke + registry invariants."""

import __spark_entry__ as contract


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_shape():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)
    # WEAK keys are intentional and enumerated — everything else has an oracle
    weak = set(qs) - set(oracles)
    assert weak == {
        "q_agg_approx_distinct",
        "q_llm_dedup_near",
        "q_llm_dedup_simhash",
        "q_llm_knn_lsh",
        "q_llm_knn_ivf",
        "q_agg_hll_sketch",
        "q_llm_bpe_train",
    }


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at sf0.001."""
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
