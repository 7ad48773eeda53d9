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
    """The driver grades ~the first 50 keys of queries(). Round 3
    rotates the window onto keys never driver-graded in rounds 1–2
    (VERDICT r2 next-round #1) — assert the list is typo-free, the
    window is all-FULL (every graded slot yields a hash grade), and no
    slot is wasted re-grading an already-green key."""
    import json
    import os

    qs = contract.queries()
    missing = [k for k in registry.PRIORITY if k not in qs]
    assert not missing, f"PRIORITY names unregistered keys: {missing}"
    head = list(qs)[:50]
    oracles = contract.oracle_sql()
    assert all(k in oracles for k in head), [k for k in head if k not in oracles]
    already = set()
    for rec in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), rec)
        if os.path.exists(p):
            with open(p) as f:
                already |= set(json.load(f))
    assert not (set(head) & already), sorted(set(head) & already)


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at sf0.001."""
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
