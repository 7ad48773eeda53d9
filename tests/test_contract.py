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
    """The driver grades ~the first 50 keys of queries(). After round 4
    the driver-graded union reached every registered key, so the
    standing policy (registry.PRIORITY docstring) is evidence FRESHNESS:
    any key with NO driver grade in any recorded CORRECTNESS_r0*.json —
    i.e. keys added this round — must sit inside the graded head, and
    the head must be exactly the window the driver will take."""
    import glob
    import json
    import os

    qs = contract.queries()
    missing = [k for k in registry.PRIORITY if k not in qs]
    assert not missing, f"PRIORITY names unregistered keys: {missing}"
    head = list(qs)[:50]
    already = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
        with open(p) as f:
            already |= set(json.load(f))
    never = [k for k in qs if k not in already]
    outside = [k for k in never if k not in head]
    assert not outside, f"never-graded keys outside the graded window: {outside}"
    assert len(registry.PRIORITY) == len(set(registry.PRIORITY)), "dup PRIORITY keys"


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at sf0.001."""
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
