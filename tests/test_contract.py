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


def _latest_grades():
    """Latest driver grade per key, from rounds STRICTLY BEFORE
    registry.ROUND — the evidence that existed when the current
    PRIORITY window was rotated. Including the current round's file
    (which the driver writes AFTER the builder's final commit) made the
    suite red at every round boundary (VERDICT r6 wrong #2): the fresh
    grades make the just-set window stale by construction."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    # _r(\d+) not split("_r0"): CORRECTNESS_r10.json must keep matching
    # or round 10+ silently drops out of the staleness recompute that
    # the ROUND gate makes load-bearing (ADVICE r7).
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd >= registry.ROUND:
            continue
        with open(p) as f:
            for k in json.load(f):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def test_priority_order():
    """The driver grades ~the first 50 keys of queries(): PRIORITY must
    name only registered keys, without duplicates, and any key with NO
    driver grade in any recorded CORRECTNESS_r0*.json (i.e. keys added
    this round) must sit inside the graded window."""
    qs = contract.queries()
    missing = [k for k in registry.PRIORITY if k not in qs]
    assert not missing, f"PRIORITY names unregistered keys: {missing}"
    assert len(registry.PRIORITY) == len(set(registry.PRIORITY)), "dup PRIORITY keys"
    head = list(qs)[:50]
    latest = _latest_grades()
    never = [k for k in qs if k not in latest]
    outside = [k for k in never if k not in head]
    assert not outside, f"never-graded keys outside the graded window: {outside}"


def test_priority_rotation():
    """Machine-check of the rotation policy the PRIORITY comment states
    (VERDICT r5 wrong #3: hand-maintained arithmetic in the comment
    drifted twice, so the counts now live HERE, recomputed from the
    CORRECTNESS history): the window is ROUND_HEAD (keys changed since
    their last grade — must be re-graded) plus the stalest evidence,
    meaning no key OUTSIDE the window may have an older latest-grade
    than any non-head key INSIDE it."""
    qs = contract.queries()
    window = list(qs)[:50]
    in_window = set(window)
    for k in registry.ROUND_HEAD:
        assert k in in_window, f"ROUND_HEAD key {k} outside the graded window"
    latest = _latest_grades()
    non_head = [k for k in window if k not in registry.ROUND_HEAD]
    # never-graded keys count as staleness 0 (most urgent)
    worst_inside = max(latest.get(k, 0) for k in non_head)
    staler_outside = [
        k for k in qs if k not in in_window and latest.get(k, 0) < worst_inside
    ]
    assert not staler_outside, (
        f"keys staler than the window's non-head tail (r{worst_inside}) were "
        f"left outside it: {staler_outside}"
    )


def test_plan_audit_covers_bench_set():
    """PLANS.json is the repo's main scale evidence (per-query plan-shape
    counters: exchanges, broadcast joins, Python evals). VERDICT r5
    missing #2: it silently lagged the bench set by two keys. Pin
    set(PLANS.json) == set(bench.HEADLINE) so plan coverage can't drift
    from what the benchmark claims to measure."""
    import json
    import os

    import bench

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.json")) as f:
        plans = json.load(f)
    assert set(plans) == set(bench.HEADLINE), (
        f"PLANS.json out of sync with bench.HEADLINE — missing: "
        f"{sorted(set(bench.HEADLINE) - set(plans))}, stale: "
        f"{sorted(set(plans) - set(bench.HEADLINE))}"
    )


def test_bench_line_stays_under_capture_window():
    """The driver records bench.py's ONE JSON line through a ~2 KB tail
    capture; overflowing it records parsed:null (the r4 failure, nearly
    repeated at r7 when the per-query dict hit 1631 bytes). The line is
    now digest-form (anchors + counts + sha256 pointer to
    BENCH_FULL.json) and must STAY size-bounded no matter how many keys
    register: rebuild it exactly as bench.main does, with worst-case
    widths, and pin the budget with 2× headroom."""
    import json

    import bench

    times = {k: 9999.999 for k in bench.HEADLINE}
    out = {
        "metric": "bench_total_warm", "value": 999999.999, "unit": "sec",
        "queries": {"q_agg_groupby": 9999.999, "q_join_star": 9999.999},
        "n_queries": len(times),
        "note": f"anchors only; all {len(times)} in BENCH_FULL.json",
        "sf": 0.1,
        "txlog": {"sec": 99999.999, "n": 99, "file": "TXLOG_BENCH.json"},
        "full": {"file": "BENCH_FULL.json", "sha256_12": "f" * 12},
        "sf1": {"sec": 99999.999, "n": len(times), "file": "SCALE_sf1.json"},
    }
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < 1000, f"bench line grew to {len(line)} bytes"


def test_all_queries_documented():
    for key, fn in contract.queries().items():
        assert fn.__doc__, f"{key} missing docstring"


def test_no_complex_typed_result_columns(spark, sf_small):
    """VERDICT r6 task #2, the sweep that kills the array-column class:
    the driver's canonicalizer (pandas sort_values over all columns)
    cannot hash array/map/struct cells — both r6 red rows were exactly
    that. No registered key may RETURN a complex-typed column; emit
    integer rows (posexplode) or a joined string (the q_agg_collect
    discipline) instead.

    Builds each plan lazily (no execution) EXCEPT side-effecting keys
    (txlog lifecycles, incremental dedup), where merely calling the
    query function runs full commits/merges/streams: those keys carry a
    registry ``declared_schema`` the sweep reads instead, and
    test_queries_run_at_sf0001 pins the declaration to the executed
    schema so it cannot drift (ADVICE r7 — the old sweep re-ran every
    lakehouse lifecycle a second time)."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    from pyspark.sql.types import _parse_datatype_string

    declared = registry.declared_schemas()
    offenders = []
    for key, fn in contract.queries().items():
        if key in declared:
            fields = _parse_datatype_string(declared[key]).fields
        else:
            fields = fn(spark, sf_small).schema.fields
        for f in fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{key}.{f.name}:{f.dataType.simpleString()}")
    assert not offenders, f"driver-unhashable result columns: {offenders}"


def test_queries_run_at_sf0001(spark, sf_small):
    """Every declared key executes and returns a stable schema at
    sf0.001 — and for side-effecting keys, the executed schema must
    match the registry declaration the contract sweep relies on."""
    from pyspark.sql.types import _parse_datatype_string

    declared = registry.declared_schemas()
    for key, fn in contract.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, key
        assert df.count() >= 0, key
        if key in declared:
            want = [
                (f.name, f.dataType.simpleString())
                for f in _parse_datatype_string(declared[key]).fields
            ]
            got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            assert got == want, (
                f"{key}: declared_schema drifted from the executed schema "
                f"— declared {want}, got {got}"
            )
