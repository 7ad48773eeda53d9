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
    """The driver grades ~the first 50 keys of queries(). Round 4's
    window is the FINAL rotation (VERDICT r3 next-round #1): every key
    never driver-graded in rounds 1–3 — the last 28 FULL keys plus the
    8 rows-only WEAK keys — must sit inside the graded head, completing
    driver-verified coverage at 166/166."""
    import json
    import os

    qs = contract.queries()
    missing = [k for k in registry.PRIORITY if k not in qs]
    assert not missing, f"PRIORITY names unregistered keys: {missing}"
    head = list(qs)[:50]
    already = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rec in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        p = os.path.join(root, rec)
        if os.path.exists(p):
            with open(p) as f:
                already |= set(json.load(f))
    never = [k for k in qs if k not in already]
    outside = [k for k in never if k not in head]
    assert not outside, f"never-graded keys outside the graded window: {outside}"


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at sf0.001."""
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
