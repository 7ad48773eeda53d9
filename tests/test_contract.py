"""Driver-contract integrity: entry smoke + registry invariants."""

import __spark_entry__ as contract
from novlake_spark import registry


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
    # Every key either has an oracle or was EXPLICITLY declared weak at
    # registration (register(..., weak=True) — the single source of
    # truth); a forgotten oracle can't pose as an intentional WEAK key.
    assert set(qs) - set(oracles) == registry.weak_keys()


def test_priority_order():
    """The driver grades ~the first 50 keys of queries() — assert the
    priority list is typo-free (every entry resolves) and that the
    graded window spans every SURVEY §2 family."""
    qs = contract.queries()
    missing = [k for k in registry.PRIORITY if k not in qs]
    assert not missing, f"PRIORITY names unregistered keys: {missing}"
    head = list(qs)[:50]
    for prefix in (
        "q_project", "q_filter", "q_join", "q_agg", "q_win", "q_set",
        "q_fn", "q_stream", "q_udf", "q_llm", "q_tpch", "q_subquery",
    ):
        assert any(k.startswith(prefix) for k in head), prefix
    assert "q_scd2_build" in head
    # every graded slot in the ~50-key window must yield a HASH grade —
    # WEAK keys belong in the tail, not the window
    oracles = contract.oracle_sql()
    assert all(k in oracles for k in head), [k for k in head if k not in oracles]


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at sf0.001."""
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
