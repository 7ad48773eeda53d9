"""§2.B scans + §2.I scalar function families.

Everything here is a single narrow stage (scan → project), fully inside
whole-stage codegen — the shapes that should run at raw Parquet-scan
speed regardless of data volume. Cross-engine function-semantics
divergences (day-of-week origin, HALF_UP vs HALF_EVEN rounding, 0- vs
1-based indexing) are resolved explicitly per SURVEY.md §2.I notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table

_SCAN_TABLES = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
}


@register(
    "q_scan_parquet",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS tbl, count(*) AS n_rows, CAST(sum({k}) AS BIGINT) AS key_sum FROM {t}"
        for t, k in _SCAN_TABLES.items()
    ),
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: scan every relational table — row count + key checksum each.

    Seven independent scans unioned; each aggregates map-side to a
    single row, so this is pure scan-throughput.
    """
    parts = []
    for tbl, key in _SCAN_TABLES.items():
        df = load_table(spark, sf_dir, tbl).agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum(key).alias("key_sum")
        )
        parts.append(df.select(F.lit(tbl).alias("tbl"), "n_rows", "key_sum"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "q_scan_events_ts",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           CAST(floor(value * 100 + 0.5) AS BIGINT) / CAST(100 AS DOUBLE) AS value
    FROM events
    """,
)
def q_scan_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: full events scan through the nanosecond-timestamp shim.

    Spark reads the TIMESTAMP(NANOS) column as a raw long (legacy conf)
    and sources.load_table converts with integer division to the same
    microsecond instants DuckDB's native ns→µs truncation produces —
    compared here at full µs precision as strings.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        # per-row grid, not round() — the residual HALF_UP-vs-binary
        # class, migrated round 10 as this key rotated
        (grid(F.col("value"), 100) / F.lit(100.0)).alias("value"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7/I6: JSON-string field extraction on every event row.

    ``from_json`` with an explicit schema, not ``get_json_object``:
    measured at sf1 (SCALING.md §JSON, VERDICT r4 next #7) the typed
    parse is ~25% faster warm (0.40–0.48 s vs 0.54–0.63 s) — one
    Jackson parse into a typed struct vs per-path evaluation — and the
    gap widens with more extracted fields, since ``get_json_object``
    re-parses per path while ``from_json`` amortizes one parse across
    every field. Spark 4's ``parse_json``/``variant_get`` measured the
    same as ``from_json`` here (single int field); ``from_json`` wins
    on portability. Malformed JSON yields NULL under both (PERMISSIVE
    mode), so oracle parity is unchanged. Zero-exchange codegen plan
    either way — this was the worst CPU-linear sf1 ratio (8.3×), hence
    the measurement."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS up_brand,
           length(p_name)                                   AS name_len,
           substring(p_name, 1, 8)                          AS name8,
           concat_ws('|', p_brand, p_type)                  AS brand_type,
           replace(p_type, ' ', '_')                        AS type_u,
           lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size4,
           string_split(p_type, ' ')[1]                     AS type_head,
           regexp_extract(p_brand, '([0-9]+)', 1)           AS brand_num,
           strpos(p_name, 'a')                              AS a_pos,
           CAST(starts_with(p_name, 's') AS INT)            AS s_start
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1: string function family over part."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("up_brand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
        F.col("p_name").startswith("s").cast("int").alias("s_start"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                  AS yr,
           month(o_orderdate)                                 AS mo,
           day(o_orderdate)                                   AS dom,
           dayofweek(o_orderdate)                             AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d')   AS plus30,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(epoch(o_orderdate) AS BIGINT)                 AS epoch_s
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: date/time family. Day-of-week normalized to Sunday=0 on both
    engines (Spark dayofweek is Sun=1, DuckDB dayofweek is Sun=0)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)        AS abs_d,
           CAST(ceil(l_extendedprice)  AS BIGINT)  AS ceil_p,
           CAST(floor(l_extendedprice) AS BIGINT)  AS floor_p,
           round(sqrt(l_quantity), 6)              AS sqrt_q,
           round(pow(1 + l_discount, 2), 6)        AS pow_d,
           round(ln(l_extendedprice), 6)           AS ln_p,
           round(log10(l_extendedprice), 6)        AS log_p,
           round(exp(l_discount), 6)               AS exp_d,
           l_orderkey % 7                          AS mod7,
           CAST(sign(l_discount - 0.05) AS INT)    AS sgn,
           round(greatest(l_quantity, l_discount * 100), 2) AS gr,
           round(least(l_quantity, l_tax * 100), 2)         AS le
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: math family (positive domains chosen so % and sign agree
    across engines; transcendentals rounded to 6 dp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.ceil("l_extendedprice").alias("ceil_p"),
        F.floor("l_extendedprice").alias("floor_p"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("pow_d"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.pmod("l_orderkey", F.lit(7)).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sgn"),
        F.round(F.greatest("l_quantity", F.col("l_discount") * 100), 2).alias("gr"),
        F.round(F.least("l_quantity", F.col("l_tax") * 100), 2).alias("le"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                    AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)            AS first_v,
           round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6)     AS max_v,
           len(list_filter(embedding, x -> x > 0))           AS n_pos
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: array family (higher-order functions) over the embedding
    column — size/index/slice/fold/max/filter, float32 cast to double
    before arithmetic (SURVEY.md §5.3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_v"),
        F.round(F.aggregate(head, F.lit(0.0), lambda a, x: a + x), 6).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_v"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                     AS low_byte,
           o_orderkey | 4096                    AS with_flag,
           xor(o_orderkey, 1)                   AS flipped,
           o_orderkey << 2                      AS shl,
           o_orderkey >> 3                      AS shr
    FROM orders
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9: bitwise family (mask/flag/xor/shifts) — flag-packing ops used
    in feature hashing and bitmap-style filters."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1)).alias("flipped"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@register(
    "q_fn_hash",
    oracle="SELECT doc_id, md5(text) AS text_md5 FROM documents",
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I8: md5 content hashing (the only hash both engines define
    identically; xxhash64 seeds differ and stays Spark-internal)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5("text").alias("text_md5"))


@register(
    "q_fn_map",
    oracle="""
    SELECT p_partkey,
           p_brand                        AS brand_v,
           CAST(3 AS BIGINT)              AS n_keys,
           'brand,name,type'              AS keys_csv,
           TRUE                           AS has_type,
           upper(p_type)                  AS type_upper
    FROM part
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5: map-typed column family — build a map from part attributes
    (``create_map``), then read it back through ``element_at`` /
    ``size`` / ``map_keys`` / ``map_contains_key`` /
    ``transform_values``. All JVM-side codegen expressions; a map column
    adds no shuffle and prunes like any other column. The oracle
    computes the same outputs from the base columns (DuckDB's map
    extraction returns lists, so sharing SQL text would compare
    different shapes); the key's claim is that Spark's map round-trip
    reproduces the flat truth."""
    parts = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("name"), F.col("p_name"),
        F.lit("type"), F.col("p_type"),
    )
    return parts.select("p_partkey", m.alias("m")).select(
        "p_partkey",
        F.element_at("m", F.lit("brand")).alias("brand_v"),
        F.size("m").cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_csv"),
        F.map_contains_key("m", F.lit("type")).alias("has_type"),
        F.element_at(
            F.transform_values("m", lambda _k, v: F.upper(v)), F.lit("type")
        ).alias("type_upper"),
    )


@register(
    "q_fn_posexplode",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents WHERE doc_id < 10)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
    FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    """,
)
def q_fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4b: UNNEST WITH ORDINALITY — posexplode carries the element
    index alongside the value (the ordinality column Presto exposes).
    DuckDB spells it as a lateral unnest over the index range."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


@register(
    "q_fn_struct",
    oracle="""
    SELECT p_partkey,
           p_brand                          AS brand_v,
           p_size + 1                       AS size_next,
           concat(p_brand, ':', p_size)     AS packed
    FROM part
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5b: struct-typed column family — pack part attributes into a
    named struct, transform THROUGH the struct (withField), then read
    fields back out. Structs are Catalyst's zero-cost nesting: field
    access compiles to a direct column reference (no shuffle, codegen
    throughout), which is why pushing a computed field into a struct
    and projecting it back is free. The oracle computes the same flat
    truth (DuckDB structs exist but field-access SQL differs; the
    claim is the Spark struct round-trip)."""
    parts = load_table(spark, sf_dir, "part")
    s = F.struct(
        F.col("p_brand").alias("brand"), F.col("p_size").alias("sz")
    ).withField("size_next", F.col("p_size") + 1)
    return parts.select("p_partkey", s.alias("s")).select(
        "p_partkey",
        F.col("s.brand").alias("brand_v"),
        F.col("s.size_next").alias("size_next"),
        F.concat_ws(":", F.col("s.brand"), F.col("s.sz").cast("string")).alias("packed"),
    )
