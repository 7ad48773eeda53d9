"""Plan-shape pins for the TPC-H-adapted suite (§4 discipline): the
properties that decide whether these joins survive a 100x scale-up."""

from novlake_spark import plans
from novlake_spark.inventory import tpch


def test_q6_pushes_whole_predicate_to_scan(spark, sf_small):
    df = tpch.q_tpch_q6(spark, sf_small)
    assert plans.has_pushed_filters(df, "l_shipdate")
    assert plans.has_pushed_filters(df, "l_quantity")
    cols = plans.pruned_read_schema(df, "lineitem")
    assert set(cols) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols


def test_q5_broadcasts_dimensions(spark, sf_small):
    # nation/region (and at this SF, AQE may add more) must broadcast —
    # a shuffled nation join at 100 TB would exchange the fact table
    # five times over.
    assert plans.has_broadcast_hash_join(tpch.q_tpch_q5(spark, sf_small))


def test_q4_semi_join_not_inner(spark, sf_small):
    # EXISTS must plan as a semi join (no fact-side duplication).
    plan = plans.explain_str(tpch.q_tpch_q4(spark, sf_small))
    assert "LeftSemi" in plan


def test_q17_scan_reuse_or_exchange_reuse(spark, sf_small):
    # lineitem feeds both the per-part average and the probe side; the
    # optimizer should not read it more than twice (self-join shape),
    # and the brand filter must reach the part scan.
    import re

    df = tpch.q_tpch_q17(spark, sf_small)
    plan = plans.explain_str(df)
    # formatted explain names each scan node twice (tree + detail);
    # count detail headers: lineitem x2 (agg + probe) and part x1.
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 3
    assert plans.has_pushed_filters(df, "p_brand")


def test_q18_having_is_post_agg_filter(spark, sf_small):
    # HAVING on sum(qty) must not become a join; one aggregate + filter.
    plan = plans.explain_str(tpch.q_tpch_q18(spark, sf_small))
    assert "TakeOrderedAndProject" in plan  # top-100 never global-sorts


def test_q22_anti_join(spark, sf_small):
    plan = plans.explain_str(tpch.q_tpch_q22(spark, sf_small))
    assert "LeftAnti" in plan


def test_q2_region_filter_below_fact_shuffle(spark, sf_small):
    # The ASIA supplier list must reach lineitem as a broadcast semi
    # join BEFORE the (partkey, suppkey) aggregate — aggregating the
    # world's lineitem only to drop 80% of suppliers afterwards would
    # shuffle 5x the needed data at 100 TB.
    plan = plans.explain_str(tpch.q_tpch_q2(spark, sf_small))
    assert "LeftSemi" in plan
    assert "Window" in plan  # decorrelated per-part min
    df = tpch.q_tpch_q2(spark, sf_small)
    assert plans.has_pushed_filters(df, "p_size")


def test_q11_single_fact_scan(spark, sf_small):
    # The global-total scalar re-aggregates the per-part rows; a second
    # lineitem scan here would double the query's IO.
    import re

    df = tpch.q_tpch_q11(spark, sf_small)
    plan = plans.explain_str(df)
    li_scans = [m for m in re.findall(r"\(\d+\) Scan parquet[^\n]*", plan) if "lineitem" in m]
    assert len(li_scans) <= 1, plan
    assert "LeftSemi" in plan  # nation filter below the shuffle


def test_q12_predicates_reach_scan(spark, sf_small):
    df = tpch.q_tpch_q12(spark, sf_small)
    assert plans.has_pushed_filters(df, "l_returnflag")
    assert plans.has_pushed_filters(df, "l_shipdate")
    cols = plans.pruned_read_schema(df, "lineitem")
    assert set(cols) == {"l_orderkey", "l_returnflag", "l_shipdate"}, cols


def test_q20_partname_prefix_pushes_down(spark, sf_small):
    # LIKE 'large%' compiles to StringStartsWith — pushable; the part
    # id-list then semi-joins lineitem below the only fact shuffle.
    df = tpch.q_tpch_q20(spark, sf_small)
    assert plans.has_pushed_filters(df, "p_name")
    plan = plans.explain_str(df)
    assert "LeftSemi" in plan
    assert "Window" in plan  # decorrelated per-part total


def test_q21_semi_and_anti_joins(spark, sf_small):
    # EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, top-100 -> bounded
    # TakeOrderedAndProject (never a global sort).
    plan = plans.explain_str(tpch.q_tpch_q21(spark, sf_small))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan
