"""Generate distribution-matched fixtures at arbitrary scale factor.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The
scale REHEARSAL (VERDICT r3 #4) needs sf1 — 10× the bench scale — to
catch quadratic tails and skew sensitivity that sf0.1 hides. This
generator reproduces the driver tables' schemas, key ranges, value
domains and cardinality ratios (sampled from sf0.1 with DuckDB:
uniform keys, 5-way categorical splits, ~4.07 lineitem lines/order,
64-dim unit embeddings with 10 labels, 31-word document vocabulary,
Jan-2024 events), scaled linearly. It does NOT byte-match a driver
sf1 (none exists) — hashes are still cross-checkable against DuckDB
on the same generated files, which is how bench_sf1.py uses it.

Generation is Spark-parallel (spark.range + column expressions, no
driver-side loops) so sf1 (~6M lineitem) takes seconds. Output goes
under the repo (gitignored), never into /root/testdata.

Usage: python tools/gen_sf.py [sf] [outdir] [--skew] [--clustered]

``--skew`` replaces the uniform event/order keys with a power-law-ish
draw (key = floor(n·u⁴): the hottest user takes (1/n)^(1/4) of all
events ≈ 9% at sf1) so AQE skew handling can be rehearsed on keys the
driver fixtures never stress.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from novlake_spark.session import get_session

WORDS = (
    "spark line column order sort scan hash value table query key group "
    "filter stream slow fast small large the a part customer agg vector "
    "batch join row plan shuffle cache"
).split()


def _pick(col, options: list[str]):
    """Deterministic categorical pick: options[col % len]."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (col % len(options) + 1).cast("int"))


def generate(spark, sf: float, out: str, skew: bool = False, clustered: bool = False) -> None:
    s = lambda n: int(n * sf)  # noqa: E731
    os.makedirs(out, exist_ok=True)

    def write(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"  {name}: {df.count()} rows", flush=True)

    h = lambda *cols: F.abs(F.xxhash64(*cols))  # noqa: E731 — seeded, per-row

    region = spark.createDataFrame(
        [(i, n) for i, n in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])],
        "r_regionkey int, r_name string",
    )
    write(region, "region", 1)

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    write(nation, "nation", 1)

    n_cust, n_supp, n_part, n_ord = s(150_000), s(10_000), s(200_000), s(1_500_000)
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", "id").alias("c_name"),
        (h("id", F.lit(1)) % 25).cast("int").alias("c_nationkey"),
        (F.round((h("id", F.lit(2)) % 1_100_000) / 100.0 - 1000.0, 2)).alias("c_acctbal"),
        _pick(h("id", F.lit(3)), ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]).alias("c_mktsegment"),
    )
    write(customer, "customer", max(1, s(4)))

    supplier = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", "id").alias("s_name"),
        (h("id", F.lit(4)) % 25).cast("int").alias("s_nationkey"),
        (F.round((h("id", F.lit(5)) % 1_100_000) / 100.0 - 1000.0, 2)).alias("s_acctbal"),
    )
    write(supplier, "supplier", 1)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            _pick(h("id", F.lit(6)), ["large", "small", "hot", "cold", "old", "new", "blue", "red"]),
            F.lit(" "),
            _pick(h("id", F.lit(7)), ["ring", "bolt", "plate", "screw", "wheel", "gear"]),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (h("id", F.lit(8)) % 25 + 1)).alias("p_brand"),
        _pick(h("id", F.lit(9)), ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "SMALL", "PROMO"]).alias("p_type"),
        (h("id", F.lit(10)) % 50 + 1).cast("int").alias("p_size"),
        F.round(900.0 + (h("id", F.lit(11)) % 10_000) / 100.0, 2).alias("p_retailprice"),
    )
    write(part, "part", max(1, s(4)))

    def key_draw(col_seed: int, n: int):
        u = (h("id", F.lit(col_seed)) % 1_000_000) / 1e6
        if skew:
            return F.floor(F.lit(n) * F.pow(u, 4)).cast("long")
        return h("id", F.lit(col_seed)) % n

    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        key_draw(12, n_cust).alias("o_custkey"),
        _pick(h("id", F.lit(13)), ["O", "P", "F"]).alias("o_orderstatus"),
        F.round(1000.0 + (h("id", F.lit(14)) % 49_900_000) / 100.0, 2).alias("o_totalprice"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
            + (h("id", F.lit(15)) % 2404) * 86400
        ).alias("o_orderdate"),
        _pick(h("id", F.lit(16)), ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]).alias("o_orderpriority"),
    )
    write(orders, "orders", max(1, s(8)))

    # ~4.07 lines/order via per-order line count 1..7 then explode
    lineitem = (
        spark.range(n_ord)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(F.sequence(F.lit(1), (h("id", F.lit(17)) % 7 + 1).cast("int"))).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            (h("l_orderkey", "l_linenumber", F.lit(18)) % n_part).alias("l_partkey"),
            (h("l_orderkey", "l_linenumber", F.lit(19)) % n_supp).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (h("l_orderkey", "l_linenumber", F.lit(20)) % 50 + 1).cast("double").alias("l_quantity"),
            F.round(900.0 + (h("l_orderkey", "l_linenumber", F.lit(21)) % 10_410_000) / 100.0, 2).alias("l_extendedprice"),
            ((h("l_orderkey", "l_linenumber", F.lit(22)) % 11) / 100.0).alias("l_discount"),
            ((h("l_orderkey", "l_linenumber", F.lit(23)) % 9) / 100.0).alias("l_tax"),
            _pick(h("l_orderkey", "l_linenumber", F.lit(24)), ["A", "N", "R"]).alias("l_returnflag"),
            _pick(h("l_orderkey", "l_linenumber", F.lit(25)), ["F", "O"]).alias("l_linestatus"),
            F.timestamp_seconds(
                F.unix_timestamp(F.lit("1995-01-02 00:00:00"))
                + (h("l_orderkey", "l_linenumber", F.lit(26)) % 2498) * 86400
            ).alias("l_shipdate"),
        )
    )
    write(lineitem, "lineitem", max(2, s(32)))

    n_ev, n_users = s(1_000_000), s(15_000)
    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
            + (h("id", F.lit(27)) % (30 * 86400))
            + (h("id", F.lit(28)) % 1_000_000) / 1e6
        ).alias("ts"),
        key_draw(29, n_users).alias("user_id"),
        _pick(h("id", F.lit(30)), ["click", "view", "purchase", "signup", "error"]).alias("event_type"),
        # exp-ish: median ~35, tail to ~560 (matches sampled sf0.1 moments)
        F.round(-F.log(1.0 - (h("id", F.lit(31)) % 999_000) / 1e6) * 50.0, 2).alias("value"),
        F.format_string('{"k": %d}', (h("id", F.lit(32)) % 100).cast("int")).alias("props"),
    )
    write(events, "events", max(1, s(8)))

    n_docs = s(50_000)
    word_arr = F.array(*[F.lit(w) for w in WORDS])
    lens = (h("id", F.lit(33)) % 90 + 8).cast("int")  # 8..97 words ≈ 44..580 chars
    documents = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), lens),
                lambda i: F.element_at(
                    word_arr,
                    (F.abs(F.xxhash64(F.col("id"), i, F.lit(34))) % len(WORDS) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
        F.when(h("id", F.lit(35)) % 10 < 4, F.lit("en"))
        .otherwise(_pick(h("id", F.lit(36)), ["de", "es", "fr", "zh"]))
        .alias("lang"),
        F.concat(F.lit("src"), (h("id", F.lit(37)) % 20)).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    write(documents, "documents", max(1, s(4)))

    n_emb, dim = s(20_000), 64
    if clustered:
        # Planted topic clusters (VERDICT r4 next #8): the i.i.d. draw
        # below has NO neighborhood structure — every vector's true
        # neighbors are random, so ANN recall ceilings there measure
        # the fixture, not the index. Real corpora cluster; this mode
        # plants 50 topic centroids (uniform[-1,1]^64, per-dim var 1/3)
        # and draws each vector as centroid + 0.5·uniform noise (var
        # 1/12): same-topic cosine ≈ .33/(.33+.083) ≈ 0.8, cross-topic
        # ≈ 0 — realistic separation for recall measurement.
        n_topics = 50
        base = spark.range(n_emb).select(
            F.col("id").alias("vec_id"),
            (h("id", F.lit(40)) % n_topics).cast("int").alias("_c"),
        )
        raw = base.select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    (F.abs(F.xxhash64(F.col("_c"), i, F.lit(41))) % 2_000_001) / 1e6 - 1.0
                )
                + 0.5
                * ((F.abs(F.xxhash64(F.col("vec_id"), i, F.lit(42))) % 2_000_001) / 1e6 - 1.0),
            ).alias("v"),
            (F.col("_c") % 10).cast("int").alias("label"),
        )
    else:
        raw = spark.range(n_emb).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.abs(F.xxhash64(F.col("id"), i, F.lit(38))) % 2_000_001) / 1e6 - 1.0,
            ).alias("v"),
            (h("id", F.lit(39)) % 10).cast("int").alias("label"),
        )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    embeddings = raw.select(
        "vec_id",
        F.transform("v", lambda x: (x / norm).cast("float")).alias("embedding"),
        "label",
    )
    write(embeddings, "embeddings", max(1, s(4)))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew = "--skew" in sys.argv
    clustered = "--clustered" in sys.argv
    sf = float(args[0]) if args else 1.0
    suffix = ("-skew" if skew else "") + ("-clustered" if clustered else "")
    out = args[1] if len(args) > 1 else f"/root/repo/.sfgen/sf{sf:g}{suffix}"
    spark = get_session("gen-sf", master="local[32]", shuffle_partitions=32)
    print(f"generating sf={sf} skew={skew} clustered={clustered} under {out}", flush=True)
    generate(spark, sf, out, skew=skew, clustered=clustered)
    print("done", flush=True)
