"""The local correctness gate must be DRIVER-faithful (round-5 lesson).

CORRECTNESS_r05's only red row shipped because tools/verify_local.py
canonicalized float ``6.0`` and int ``6`` to the same hash token while
the driver's hash distinguishes them: a DuckDB oracle whose windowed
``sum(BIGINT)`` widened to HUGEINT→float64 passed locally and failed on
the driver. These tests pin the harness behaviors that kill the class:
type-faithful value hashing and the dtype-kind failure gate.
"""

import importlib.util
import math
import os
import sys

import pandas as pd


def _load_verify():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "verify_local", os.path.join(root, "tools", "verify_local.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("verify_local", mod)
    spec.loader.exec_module(mod)
    return mod


V = _load_verify()


def test_cell_distinguishes_float_from_int():
    """The exact round-5 failure shape: int64 6 vs float64 6.0."""
    assert V._cell(6) != V._cell(6.0)
    assert V._cell(6) == "6"
    assert V._cell(6.0) == "6.0"


def test_cell_float_still_engine_agnostic():
    # 9-dp rounding still absorbs cross-engine last-ulp noise
    assert V._cell(0.1 + 0.2) == V._cell(0.3)
    assert V._cell(float("nan")) == V._cell(None) == "@N"


def test_canon_hash_int_vs_float_column_mismatch():
    """A frame of longs must NOT hash equal to the same values as doubles
    — this is what the driver saw and the old harness missed."""
    ints = pd.DataFrame({"cum": pd.array([1, 3, 6], dtype="int64")})
    floats = pd.DataFrame({"cum": pd.array([1.0, 3.0, 6.0], dtype="float64")})
    assert V.canon_hash(ints) != V.canon_hash(floats)


def test_dtype_kind_gate_matches_driver_repro():
    """DuckDB's windowed sum(BIGINT)→HUGEINT reaches pandas as float64;
    the harness's kind check must see int64 vs float64 as a mismatch
    (and the CAST ... AS BIGINT oracle repair as a match)."""
    import duckdb

    con = duckdb.connect()
    hug = con.execute(
        "SELECT sum(x) OVER (ORDER BY x) AS c FROM (VALUES (1),(2),(3)) t(x)"
    ).fetchdf()
    assert hug["c"].dtype.kind == "f"  # the round-5 trap, still true
    fixed = con.execute(
        "SELECT CAST(sum(x) OVER (ORDER BY x) AS BIGINT) AS c "
        "FROM (VALUES (1),(2),(3)) t(x)"
    ).fetchdf()
    assert fixed["c"].dtype.kind == "i"
    spark_side = pd.DataFrame({"c": pd.array([1, 3, 6], dtype="int64")})
    assert spark_side["c"].dtype.kind != hug["c"].dtype.kind
    assert spark_side["c"].dtype.kind == fixed["c"].dtype.kind
    assert V.canon_hash(spark_side) == V.canon_hash(fixed)


def test_unhashable_cells_flags_arrays():
    """The round-6 failure class: the driver's _canon sort_values the
    result frame and numpy-array cells are unhashable (CORRECTNESS_r06
    q_emb_quantize + q_multimodal_phash_clusters both crashed there
    while this harness sailed through). unhashable_cells must flag the
    exact shapes that shipped red."""
    import numpy as np

    # q_emb_quantize's old shape: codes as ndarray cells (toPandas of
    # array<int> yields object column of np.ndarray)
    quantize_old = pd.DataFrame(
        {"vec_id": [1, 2], "codes": [np.array([1, 2]), np.array([3, 4])]}
    )
    assert V.unhashable_cells(quantize_old) == ["codes"]
    # q_multimodal_phash_clusters' old shape: members as list cells
    clusters_old = pd.DataFrame({"cluster_rep": [0], "members": [[0, 1, 2]]})
    assert V.unhashable_cells(clusters_old) == ["members"]
    # the driver dies on these frames exactly as CORRECTNESS_r06 recorded
    import pytest

    with pytest.raises(TypeError):
        quantize_old.sort_values(by=list(quantize_old.columns))


def test_unhashable_cells_passes_repaired_shapes():
    """The round-7 repairs — posexplode'd integer rows and the
    array_join'd string — must be clean, as must ordinary frames."""
    quantize_new = pd.DataFrame(
        {"vec_id": [1, 1, 2], "pos": [0, 1, 0], "code": [5, -3, 7]}
    )
    clusters_new = pd.DataFrame(
        {"cluster_rep": [0], "n_members": [3], "members": ["0,1,2"]}
    )
    plain = pd.DataFrame({"a": [1.5, None], "b": ["x", None], "c": [b"\x00", b"y"]})
    for df in (quantize_new, clusters_new, plain):
        assert V.unhashable_cells(df) == []
        df.sort_values(by=list(df.columns))  # driver-canon survives


def test_floor_cents_boundary_free():
    """floor(x*100 + 0.5) is the shared cents form on both engines: no
    rounding-mode boundary exists, so repr-vs-binary .5 disagreements
    (F.round HALF_UP on shortest-repr vs DuckDB round on the binary
    double) cannot occur. Spot-check values whose scaled product sits
    off the decimal half by one ulp in each direction."""
    import duckdb

    con = duckdb.connect()
    # The graded column is a parquet DOUBLE, so the oracle's arithmetic
    # is pure IEEE-double — the literals must be CAST to DOUBLE here or
    # DuckDB types them as exact DECIMALs (1.005*100 = 100.500 exactly,
    # where the double is 100.49999999999999) and the comparison would
    # measure literal typing, not engine behavior.
    vals = [2.675, 1.005, 0.125, 0.335, 10.555, 99.994999, 0.005]
    sql = "SELECT " + ", ".join(
        f"CAST(floor(CAST({v!r} AS DOUBLE)*100 + 0.5) AS BIGINT) AS c{i}"
        for i, v in enumerate(vals)
    )
    row = con.execute(sql).fetchone()
    assert list(row) == [math.floor(v * 100 + 0.5) for v in vals]
