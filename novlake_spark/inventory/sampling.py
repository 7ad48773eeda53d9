"""Deterministic sampling / splitting / corpus-mixing query keys.

Training-data pipeline extension (BASELINE.json north star): every key
here is a *reproducible* content-hash decision (operators.sampling), so
it is shuffle-free, cluster-size-invariant, and expressible verbatim in
the DuckDB oracle (md5 + hex-prefix compare) — FULL parity throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from novlake_spark.operators import sampling as S
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table


@register(
    "q_sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE substring(md5(concat_ws('-', CAST(l_orderkey AS VARCHAR),
                                       CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of lineitem keyed on the unique row key.

    Map-side filter, no shuffle; same rows selected at any cluster size
    (unlike seed-based `df.sample`, which depends on partitioning).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return S.det_sample(li, ["l_orderkey", "l_linenumber"], 0.1).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN 'zz' WHEN 'es' THEN '80'
                      WHEN 'fr' THEN '80' WHEN 'zh' THEN 'zz' ELSE '00' END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus rebalancing: downsample the dominant language
    (en → 12.5%), keep low-resource strata at 50–100%."""
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.125, "de": 1.0, "es": 0.5, "fr": 0.5, "zh": 1.0}
    return S.stratified_sample(docs, ["doc_id"], "lang", rates).select("doc_id", "lang")


@register(
    "q_sample_split",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20' THEN 'test'
                  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40' THEN 'val'
                  ELSE 'train' END AS split,
             n_chars
      FROM documents)
    SELECT split, count(*) AS n_docs,
           CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars
    FROM s GROUP BY split
    """,
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train/val/test assignment (75/12.5/12.5) as a pure function of
    doc_id — disjoint and exhaustive by construction, stable forever.

    avg_chars is the exact-integer-sum form, not ``round(avg(...))``
    (round 9 float-class audit): the sum of an INT column is exact, so
    ONE IEEE division yields the bit-identical double on both engines —
    while round() near a 1e-2 boundary resolves by decimal-string
    HALF_UP on Spark vs binary rounding on DuckDB and can flip the
    hash on fixture luck (ORACLE_NOTES.md #4)."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        S.split_assign(["doc_id"], {"test": 0.125, "val": 0.125, "train": 0.75}), "n_chars"
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "q_sample_split_leakage_safe",
    oracle="""
    WITH c AS (SELECT doc_id,
                      min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS cluster_id
               FROM documents)
    SELECT doc_id, cluster_id,
           CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '20' THEN 'test'
                WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < '40' THEN 'val'
                ELSE 'train' END AS split
    FROM c
    """,
)
def q_sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (round 9): LEAKAGE-SAFE train/val/test assignment — split by
    duplicate CLUSTER, not by document. Splitting docs independently
    puts near-identical copies on both sides of the train/test fence
    (the classic eval-inflation bug: the model "generalizes" to its own
    training text); the safe protocol assigns every member of a dup
    cluster the same split by hashing the cluster's canonical id
    instead of the doc's. Here the cluster relation is the exact-dup
    component (min doc_id per normalized-text digest — q_llm_dedup_
    cluster's relation); swapping in the MinHash/LSH component ids from
    q_llm_dup_components generalizes it to near-dups with the same
    shape. Composition: one window over the 16-byte digest (never
    text), then the split is a pure function of cluster_id — disjoint,
    exhaustive, engine-stable, and structurally incapable of splitting
    a cluster."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    clustered = docs.select(
        "doc_id", F.min("doc_id").over(w).alias("cluster_id")
    )
    return clustered.select(
        "doc_id",
        "cluster_id",
        S.split_assign(
            ["cluster_id"], {"test": 0.125, "val": 0.125, "train": 0.75}
        ),
    )


@register(
    "q_mix_corpus",
    oracle="""
    WITH s AS (SELECT source, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
               FROM documents)
    SELECT source, count(*) AS n_docs
    FROM s
    WHERE (source IN ('src0','src1','src2','src3','src4') AND h < 'c0')
       OR (source NOT IN ('src0','src1','src2','src3','src4') AND h < '40')
    GROUP BY source
    """,
)
def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: preferred sources at 75%, the long tail
    at 25% — the deterministic analogue of dataset-mixture weights in a
    pretraining data recipe."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(S.hash_key("doc_id"), 1, 2)
    preferred = F.col("source").isin(*[f"src{i}" for i in range(5)])
    mixed = docs.filter((preferred & (h < F.lit("c0"))) | (~preferred & (h < F.lit("40"))))
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "q_sample_reservoir",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget per-group sample: exactly 20 docs per language,
    selected by deterministic hash rank (reservoir-sample semantics,
    reproducible across runs and cluster sizes).

    Complements rate-based q_sample_stratified: budgets, not
    proportions — the eval-set construction shape. One shuffle on the
    group key; row_number prunes to k rows per group immediately.
    """
    docs = load_table(spark, sf_dir, "documents")
    return S.reservoir_per_group(docs, ["doc_id"], "lang", 20).select("doc_id", "lang")


@register(
    "q_sample_priority",
    oracle="""
    SELECT o_orderkey, w_cents, priority
    FROM (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_cents,
             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE)
               / (CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                       AS BIGINT) + 1) AS priority
      FROM orders)
    ORDER BY priority DESC, o_orderkey
    LIMIT 200
    """,
)
def q_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: weight-proportional sampling without replacement — priority
    sampling (Duffield, Lund & Thorup, JACM'07): each item gets
    priority w/u with u uniform from its content hash, and the top-k
    priorities form the sample (inclusion probability ∝ weight, with
    variance-optimal subset-sum estimates). The weighted complement to
    the uniform q_sample_hash: mixing boards sample documents
    proportional to quality scores or token counts, and this is the
    reproducible, single-pass, cluster-size-invariant way to do it.

    Cross-engine exactness: w_cents and u_int are exact integers (the
    cents grid; first 8 md5 hex chars + 1, both < 2^53), and priority
    is ONE IEEE division of those integers — the repo's single-division
    discipline — so the doubles are bit-identical and the (priority,
    key) sort boundary cuts the same 200 rows on both engines.

    Plan: map-side hash + division, then TakeOrderedAndProject — a
    per-partition top-k heap merged at the driver, no global sort at
    any scale (same shape as q_topk_global)."""
    o = load_table(spark, sf_dir, "orders")
    w = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    scored = o.select(
        "o_orderkey",
        w.alias("w_cents"),
        (w.cast("double") / u).alias("priority"),
    )
    return scored.orderBy(F.desc("priority"), F.asc("o_orderkey")).limit(200)


@register(
    "q_mix_temperature",
    oracle="""
    WITH n AS (SELECT lang, count(*) AS ns FROM documents GROUP BY lang),
    thr AS (
      SELECT lang,
             CAST(floor(sqrt((SELECT CAST(min(ns) AS DOUBLE) FROM n))
                        / sqrt(CAST(ns AS DOUBLE)) * 4294967296) AS BIGINT) AS t
      FROM n
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr ON d.lang = thr.lang
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) < thr.t
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: temperature-flattened corpus mixing (the multilingual
    alpha-sampling of mBERT/XLM-R lineage, alpha = 0.5): sampling mass
    p_s proportional to n_s^alpha means the WITHIN-stratum retention
    rate scales as n_s^(alpha-1) = 1/sqrt(n_s) — the smallest language
    keeps 100% and every larger one downsamples by sqrt(n_min/n_s),
    flattening the head without starving the tail (the fixture's lang
    column is the skewed stratum: en dominates ~3:1, so en actually
    downsamples to ~54% — `source` is uniform and would degenerate to
    an all-pass filter). Complements q_mix_corpus (fixed per-source
    rates): here the rates are COMPUTED from the corpus itself, the
    production shape.

    Cross-engine exactness of a float-derived threshold: sqrt is
    IEEE-correctly-rounded (unlike pow, which is why alpha is 0.5 and
    not 0.3), the rate is ONE division of two sqrt results, and the
    2^32 scaling is a power-of-two exponent shift (exact) — so
    floor(rate·2^32) is the same BIGINT on both engines and the md5
    prefix comparison selects identical rows. The repo's det_sample
    discipline with a computed, not literal, rate.

    Plan: one tiny per-source count (map-side partial), broadcast the
    derived threshold table, map-side hash filter — cluster-size
    invariant and one scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("ns"))
    mn = n.agg(F.min("ns").cast("double").alias("mn"))
    thr = n.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("mn")) / F.sqrt(F.col("ns").cast("double")) * F.lit(4294967296)
        )
        .cast("long")
        .alias("t"),
    )
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .filter(h < F.col("t"))
        .select("doc_id", "lang")
    )


@register(
    "q_mix_epochs",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS all_tokens,
                   CAST(count(*) AS BIGINT) AS n_src
            FROM s),
    plan AS (
      SELECT source, n_docs, n_tokens,
             (3 * all_tokens) // n_src AS target_tokens,
             CASE WHEN ((3 * all_tokens) // n_src) // n_tokens > 4
                  THEN 4
                  ELSE ((3 * all_tokens) // n_src) // n_tokens END AS full_epochs
      FROM s, tot
    )
    SELECT source, n_docs, n_tokens, target_tokens, full_epochs,
           CASE WHEN full_epochs < 4
                THEN ((target_tokens - full_epochs * n_tokens)
                      * 4294967296) // n_tokens
                ELSE 0 END AS frac_rate_u32
    FROM plan
    """,
)
def q_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 (round 11): data-constrained epoching plan — how many times
    to REPEAT each source to hit a token budget when unique data runs
    out (the Muennighoff et al. 2023 regime: up to ~4 epochs of
    repetition is near-free, beyond that returns decay, so the plan
    caps full epochs at 4 and carries the remainder as a fractional
    sampling rate). Budget = 3× the corpus, split evenly across
    sources: each source gets `full_epochs` complete passes plus a
    deterministic subsample at `frac_rate_u32 / 2^32` of one more pass
    (the same u32-grid md5 threshold every det_sample key uses, so the
    fractional pass composes directly with q_sample_hash's filter).

    Cross-engine exactness: pure BIGINT arithmetic end to end — token
    counts are exact, `div`/`//` is true integer division in both
    engines (never a float quotient), the 4-epoch cap is an integer
    CASE, and the u32 rate is (remainder·2^32) div n_tokens with
    remainder < n_tokens, so every product stays far below 2^63.
    No float exists anywhere in this key.

    Plan shape: ONE corpus scan with map-side partial aggregation into
    a ≤|sources|-row table, then a broadcast of the 1-row total — the
    planning query is O(sources) after the scan at any corpus size;
    the EXECUTION of the plan (materializing repeats) is the composed
    union of full passes + one det_sample pass, each a separate
    already-graded shape."""
    from novlake_spark.cache import track

    docs = load_table(spark, sf_dir, "documents")
    # The per-source stats table is referenced twice (plan rows + the
    # 1-row total); unpersisted, Catalyst re-runs the corpus scan per
    # reference. The KN cache rule: persist the tiny high-fan-in table
    # (<= |sources| rows) so the corpus is scanned ONCE at any scale.
    s = track(
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        )
        .persist()
    )
    tot = s.agg(
        F.sum("n_tokens").cast("long").alias("all_tokens"),
        F.count(F.lit(1)).alias("n_src"),
    )
    plan = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(3 * all_tokens) div n_src").alias("target_tokens"),
        F.least(
            F.lit(4).cast("long"),
            F.expr("((3 * all_tokens) div n_src) div n_tokens"),
        ).alias("full_epochs"),
    )
    return plan.select(
        "source",
        "n_docs",
        "n_tokens",
        "target_tokens",
        "full_epochs",
        F.when(
            F.col("full_epochs") < 4,
            F.expr(
                "((target_tokens - full_epochs * n_tokens) * 4294967296)"
                " div n_tokens"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("frac_rate_u32"),
    )
