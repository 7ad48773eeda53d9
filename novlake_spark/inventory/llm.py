"""§2.L — LLM-data-pipeline operators over documents & embeddings.

Implementations live in novlake_spark.operators.{text,dedup,knn}; this
module binds them to graded query keys with DuckDB oracles. The fixture
corpus has no planted duplicates (verified: 500/500 distinct texts,
max within-label cosine ≈ 0.47), so dedup keys validate the *mechanics*
against the oracle here, while tests/test_llm_ops.py plants real
near-duplicates and asserts recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from novlake_spark.operators import dedup as D
from novlake_spark.operators import graph as G
from novlake_spark.operators import knn as K
from novlake_spark.operators import lm as LM
from novlake_spark.operators import text as T
from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import ensure_parallelism, load_table


@register(
    "q_llm_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS text_hash,
           min(doc_id) AS keep_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
)
def q_llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup — group by normalized-content digest, keep min id."""
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "q_llm_dedup_keeper",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS text_hash,
           CAST((row_number() OVER (
                    PARTITION BY md5(lower(trim(text)))
                    ORDER BY length(text) DESC, doc_id ASC) = 1) AS INT)
             AS is_keeper
    FROM documents
    """,
)
def q_llm_dedup_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L64 (round 8): canonical-keeper selection — the policy step every
    dedup family feeds into (VERDICT r7 task #8): within each
    exact-duplicate cluster, keep the LONGEST raw text (most complete
    variant — normalization may have collapsed whitespace/case
    differences), breaking ties by lowest doc_id, and emit a per-doc
    keep/drop verdict. Stated entirely in SQL (a rank-1 window over the
    cluster), so the oracle is FULL — unlike min(doc_id) dedup, the
    keeper policy is an ORDERING rule, and a wrong sort key or an
    unstable tie-break flips is_keeper bits and breaks the hash. Scale:
    the window shuffles only (doc_id, digest, length) — the text column
    is projected away BEFORE the exchange, so a 100 TB corpus shuffles
    ~40 bytes/doc; cluster partitions are duplicate groups (tiny), so
    no skew shape exists."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"),
        F.length("text").alias("_len"),
    )
    w = (
        Window.partitionBy("text_hash")
        .orderBy(F.col("_len").desc(), F.col("doc_id").asc())
    )
    return docs.select(
        "doc_id",
        "text_hash",
        (F.row_number().over(w) == 1).cast("int").alias("is_keeper"),
    )


@register("q_llm_dedup_near", weak=True)  # WEAK: MinHash/LSH is algorithm-specific, rows-only check
def q_llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: near-dup detection — MinHash(32) → LSH(8 bands × 4) candidate
    pairs → exact-Jaccard verification score per candidate.

    Deterministic (seeded hashing) but not SQL-portable → WEAK oracle.
    Recall on planted near-dups is asserted in tests/test_llm_ops.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.near_dup_pairs(docs, threshold=0.0)


@register(
    "q_llm_dedup_near_planted",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0),
    sh AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS ss
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM corpus)
      WHERE len(toks) >= 3),
    keyed AS (SELECT doc_id, md5(array_to_string(ss, chr(31))) AS k,
                     CAST(len(ss) AS BIGINT) AS n
              FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_shingles
    FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
    """,
)
def q_llm_dedup_near_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 FULL-graded half (round 11, VERDICT r10 missing #3): the REAL
    MinHash(32) → LSH(8×4) → verify pipeline, hash-graded by planting
    duplicates whose detection is arithmetically FORCED. Corpus =
    documents ∪ an exact copy of every doc_id % 5 == 0 doc (id-offset
    +1e6); verification keeps candidates whose distinct 3-token shingle
    SETS are EQUAL (threshold 1.0 in set terms — an integer comparison,
    no float anywhere).

    Why the oracle is exact: equal shingle sets ⇒ equal shingle-hash
    sets ⇒ identical MinHash signatures ⇒ equal in EVERY band ⇒
    guaranteed LSH candidate (loss would need >max_bucket collisions in
    all 8 bands simultaneously; the 3-SF sweep checks the cap never
    bites). Conversely any candidate with unequal sets — incidental
    band collisions included — is filtered by the verify stage in both
    engines. So the emitted set is EXACTLY {pairs with equal shingle
    sets}, which DuckDB derives directly (canonical sorted-set md5
    join; the md5 key never crosses engines, so collation order is
    irrelevant — only within-engine set equality matters). The general
    thresholded pipeline stays separately graded as q_llm_dedup_near
    (rows-only by declared design) with planted-pair recall in pytest;
    THIS key makes the detection half hash-checkable without
    pretending banded MinHash at threshold <1 is engine-portable.

    Scale shape: identical to q_llm_dedup_near — signatures are one
    Arrow pass over the corpus, banding is one O(docs·bands) exchange
    of (band, bucket, id), pair expansion happens inside bucket rows
    (never a self-join), and the verify join touches only candidate
    ids with a 40 B/doc (md5, n) projection — shingle strings never
    shuffle."""
    from novlake_spark.cache import track

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    # Round 11 (guide §2.5/§4.4/§5): spread the 2-partition union before
    # the Python stages (scan-side shingling otherwise runs on 2 of 32
    # cores; minhash_signatures sees ≥parallelism partitions and skips
    # its own shuffle), and tracked-persist ``keyed`` — it feeds BOTH
    # join sides, and unpersisted the whole corpus+shingle subtree
    # executed once per side (the before-plan holds FOUR copies of the
    # shingle ArrowEvalPython chain). The nondeterministic marking stops
    # the size-filter pushdown from doubling the UDF inside the one
    # remaining evaluation.
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
    sig = D.minhash_signatures(corpus)  # 32 hashes, 3-token shingles
    cand = D.lsh_candidate_pairs(sig)  # 8 bands × 4 rows
    # canonical per-doc shingle-set key: sorted distinct shingles, md5
    # over a chr(31)-joined serialization (tokens are space-split so
    # shingle strings contain spaces; the control char keeps boundaries
    # unambiguous — fixtures verified free of chr(31))
    keyed = track(
        corpus.select(
            "doc_id",
            F.sort_array(
                T.shingles_arrow(F.col("text"), 3, unique=True, nondeterministic=True)
            ).alias("ss"),
        )
        .filter(F.size("ss") >= 1)
        .select(
            "doc_id",
            F.md5(F.concat_ws("\x1f", "ss")).alias("k"),
            F.size("ss").cast("long").alias("n"),
        )
        .persist()
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("k").alias("ka"), F.col("n").alias("na")
    )
    b = keyed.select(F.col("doc_id").alias("id_b"), F.col("k").alias("kb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("ka") == F.col("kb"))
        .select("id_a", "id_b", F.col("na").alias("n_shingles"))
    )


@register("q_llm_dedup_simhash", weak=True)  # WEAK: xxhash64 has no DuckDB equivalent
def q_llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b: 32-bit SimHash signature per document (Hamming-dedup input)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.simhash(T.tokens(F.col("text")), bits=32).alias("simhash32"))


@register(
    "q_llm_jaccard_pairs",
    oracle="""
    WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))
                 / (len(a.toks) + len(b.toks)
                    - len(list_filter(a.toks, x -> list_contains(b.toks, x)))), 4) AS jaccard
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
)
def q_llm_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2c: exact token-set Jaccard similarity on consecutive doc pairs."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select("doc_a", "doc_b", F.round(D.jaccard(F.col("ta"), F.col("tb")), 4).alias("jaccard"))
    )


@register(
    "q_llm_containment_pairs",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_distinct(string_split(lower(text), ' ')) AS toks
               FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS BIGINT)
               AS n_common,
           CAST(len(a.toks) AS BIGINT) AS n_a,
           CAST(len(b.toks) AS BIGINT) AS n_b
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
)
def q_llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L62 (round 7): token-set CONTAINMENT — the asymmetric near-dup
    signal Jaccard hides: a document quoted wholesale inside a much
    longer one has containment |A∩B|/|A| ≈ 1 while Jaccard ≈ |A|/|B|
    stays small, which is exactly the doc-inside-doc case dedup
    adjudication cares about (Broder's containment, the quantity
    MinHash-with-prefix estimates at scale). Graded over the same
    consecutive-id 1:1 pairs as q_llm_jaccard_pairs; output is the raw
    INTEGER triple (intersection + both set sizes) so BOTH directed
    ratios derive with no rounding boundary in the oracle. Production
    shape: the same intersection behind LSH candidates, never
    all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
    )
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    return a.join(b, F.col("doc_b") == F.col("doc_a") + 1).select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_common"),
        F.size("ta").cast("long").alias("n_a"),
        F.size("tb").cast("long").alias("n_b"),
    )


@register(
    "q_llm_dedup_embed",
    oracle="""
    WITH d AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
           CAST(floor(list_dot_product(a.v, b.v) * 10000 + 0.5) AS BIGINT)
               / CAST(10000 AS DOUBLE) AS score
    FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) > 0.4
    """,
)
def q_llm_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2d: embedding-cosine near-dup pairs, label-blocked (cos > 0.4).

    Exact small-block variant: the blocking key bounds the pairwise cost
    to Σ label-block², and ``block_cosine_pairs``'s ``max_block`` guard
    drops degenerate blocks before pair expansion (same policy as
    ``max_bucket`` in LSH). The 20-label fixture never trips the cap, so
    the FULL oracle holds; the scale route for coarse labels is
    ``semdedup_pairs`` (IVF cells) / LSH buckets next door.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return D.block_cosine_pairs(
        emb, block_col="label", id_col="vec_id", vec_col="embedding", threshold=0.4
    )


@register(
    "q_llm_cosine_pairs",
    oracle="""
    WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(a.v, b.v), 4) AS cosine
    FROM d a JOIN d b ON b.vec_id = a.vec_id + 1
    """,
)
def q_llm_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: cosine similarity (≡ dot product, unit vectors) on fixed id
    pairs — zip_with + fold, all JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select("a_id", "b_id", F.round(K.dot(F.col("va"), F.col("vb")), 4).alias("cosine"))
    )


@register(
    "q_llm_knn_single",
    oracle="""
    WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         q AS (SELECT v FROM d WHERE vec_id = 0)
    SELECT d.vec_id, round(list_dot_product(d.v, q.v), 4) AS score
    FROM d, q WHERE d.vec_id <> 0
    ORDER BY score DESC, d.vec_id LIMIT 10
    """,
)
def q_llm_knn_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: brute-force top-10 neighbours of vector 0 (broadcast query,
    map-side scoring, TakeOrderedAndProject)."""
    return K.knn_single(load_table(spark, sf_dir, "embeddings"), query_id=0, k=10)


@register(
    "q_llm_knn_join",
    oracle="""
    WITH d AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE label = 3 AND vec_id < 5000)
    SELECT * FROM (
      SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_dot_product(a.v, b.v), 4) AS score,
             -- rank on the ROUNDED score (like the Spark side): ties at
             -- 4 dp must break on b_id identically in both engines
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY round(list_dot_product(a.v, b.v), 4) DESC, b.vec_id) AS rn
      FROM d a JOIN d b ON a.vec_id <> b.vec_id
    ) WHERE rn <= 5
    """,
)
def q_llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: EXACT k-NN join (k=5) via the blocked self-join — the
    ground-truth tier, graded over an EXPLICITLY BOUNDED slice
    (``label = 3 AND vec_id < 5000``, the L67 hard-negatives
    discipline). The within-block kernel is O(|block|²) by definition;
    the id bound caps |block| at a constant so the graded artifact is
    exact-but-bounded at EVERY scale factor (VERDICT r8 wrong #2: the
    unbounded slice measured 113.8× wall for 10× data at sf10 — the
    quadratic term, exactly as knn.py documents). Unbounded
    exact-vs-approx comparison lives in tools/ann_tier.py, where a
    deliberately quadratic ground truth is the point; the SCALE paths
    for full-corpus k-NN are q_llm_knn_lsh / q_llm_knn_ivf (measured
    recall in ANN_TIER.json)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("label") == 3) & (F.col("vec_id") < 5000)
    )
    return K.knn_join_blocked(emb, "label", k=5)


@register("q_llm_knn_lsh", weak=True)  # WEAK: approximate — recall asserted in unit tests
def q_llm_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: approximate k-NN via sign-random-projection buckets (the
    100 TB scale path: 2^p buckets divide the pairwise cost ~4^p)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.lsh_bucketed_knn(emb, k=5, n_planes=4)


@register("q_llm_knn_ivf", weak=True)  # WEAK: approximate — recall asserted in unit tests
def q_llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5c: approximate k-NN via an IVF coarse quantizer (seeded k-means
    cells, exact search within cell) — the data-adaptive alternative to
    SRP-LSH bucketing; recall vs brute force pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.ivf_knn(emb, k=5, n_cells=8)


@register(
    "q_llm_textstats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) / count(*) AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) / count(*) AS avg_tokens,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
)
def q_llm_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: corpus statistics per language partition. Exactness (round-10
    float phase 2): both averages are ONE division of an exact integer
    sum by an exact count — no ``round()`` on a float aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = T.token_count(F.col("text"))
    n = F.count(F.lit(1))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars") / n).alias("avg_chars"),
        (F.sum(ntok) / n).alias("avg_tokens"),
        F.sum(ntok).alias("total_tokens"),
    )


@register(
    "q_llm_quality",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           round(len(list_distinct(toks)) / len(toks), 4) AS distinct_ratio,
           round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks), 4) AS mean_tok_len,
           n_chars
    FROM t
    """,
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6b: per-document quality signals (length, lexical diversity)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(T.distinct_ratio(toks), 4).alias("distinct_ratio"),
        F.round(T.mean_token_len(toks), 4).alias("mean_tok_len"),
        "n_chars",
    )


@register(
    "q_llm_quality_percentile",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, source,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(floor((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                            * 1000000 + 0.5) AS BIGINT) AS iscore
          FROM t),
    r AS (SELECT doc_id, source, n_tokens, iscore,
                 percent_rank() OVER (PARTITION BY source
                                      ORDER BY iscore, doc_id) AS pr
          FROM s)
    SELECT doc_id, source, n_tokens, iscore / 1000000.0 AS quality
    FROM r WHERE pr >= 0.75
    """,
)
def q_llm_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L73 (round 11): per-source RELATIVE quality filtering — keep each
    source's top quality quartile (percent_rank ≥ 0.75 within source)
    rather than a global absolute threshold. The FineWeb/RefinedWeb
    curation pattern: absolute thresholds over-prune clean domains and
    under-prune noisy ones; ranking within source normalizes for
    domain-level quality drift.

    Exactness: the quality score is lexical diversity on the 1e-6 grid
    — one division of two exact integers, then floor — so rank keys
    are exact BIGINTs with doc_id tie-breaks (a total order: tied
    scores get distinct ranks identically in both engines, making
    percent_rank a pure permutation statistic). percent_rank is
    (rank−1)/(n−1), one division of exact ints in both engines; the
    ≥ 0.75 comparison is against an exactly-representable double.

    Scale shape: ONE shuffle on source for the window. source is
    low-cardinality, so at 100 TB the production variant computes each
    source's threshold with approx_percentile in a tiny per-source agg
    and broadcast-joins it back (no full-corpus window); the window
    form graded here is the exact-semantics spec for that rewrite —
    same discipline as the skew-safe window family (L37–L39), which
    shows the mechanical two-phase rewrite when a single key dominates
    a partition."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        grid(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 1000000
        ).alias("iscore"),
    )
    w = Window.partitionBy("source").orderBy(F.col("iscore").asc(), F.col("doc_id").asc())
    return (
        s.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.75)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("iscore") / F.lit(1000000.0)).alias("quality"),
        )
    )


@register(
    "q_llm_quality_auc",
    oracle="""
    WITH s AS (
      SELECT source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             CAST(floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' '))) * 1000000 + 0.5) AS BIGINT)
               AS iscore
      FROM documents
    ),
    r AS (
      SELECT source, pos,
             2 * rank() OVER (PARTITION BY source ORDER BY iscore)
               + count(*) OVER (PARTITION BY source, iscore) - 1 AS ar2
      FROM s
    ),
    g AS (
      SELECT source,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(pos) AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN pos = 1 THEN ar2 ELSE 0 END)
                  AS BIGINT) AS sum_ar2_pos
      FROM r GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           sum_ar2_pos - n_pos * (n_pos + 1) AS u2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN CAST(sum_ar2_pos - n_pos * (n_pos + 1) AS DOUBLE)
                     / (2 * n_pos * n_neg)
                END AS auc
    FROM g
    """,
)
def q_llm_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L76 (round 11): classifier-evaluation AUC as a pure rank
    statistic — per source, the probability that a random English doc
    outranks a random non-English doc on the lexical-diversity score
    (Mann-Whitney U / Wilcoxon form: AUC = (Σavg-ranks₊ −
    n₊(n₊+1)/2) / (n₊·n₋)). The eval half every quality-filter
    pipeline needs: L15/L73 SCORE documents; this key measures how
    well a score separates a labeled slice, per stratum, without a
    single float fold.

    Exactness: the score is the 1e-6-grid lexical diversity (exact
    BIGINT); tie handling is the textbook average rank, carried as
    2·avgrank = 2·rank + tiecount − 1 so EVERYTHING stays integer
    (u2 = 2U exactly); AUC is ONE division of exact integers, NULL
    when a source lacks a class in both engines (DuckDB and Spark
    both short-circuit the guarded CASE — x/0 is engine-dependent,
    the guard is not).

    Scale: one shuffle on source for the rank window (same shape and
    same 100 TB rewrite note as L73 — per-source rank statistics can
    move to a broadcast threshold/histogram form when a single source
    dominates); the U aggregation is map-side partial on top."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s = docs.select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        grid(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 1000000
        ).alias("iscore"),
    )
    wr = Window.partitionBy("source").orderBy("iscore")
    wt = Window.partitionBy("source", "iscore")
    r = s.select(
        "source",
        "pos",
        (
            F.lit(2) * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - F.lit(1)
        ).alias("ar2"),
    )
    g = r.groupBy("source").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos") == 1, F.col("ar2")).otherwise(0))
        .cast("long")
        .alias("sum_ar2_pos"),
    )
    u2 = F.col("sum_ar2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return g.select(
        "source",
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u2.cast("double") / (F.lit(2) * F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


@register(
    "q_llm_tf_topk",
    oracle="""
    SELECT tok, count(*) AS tf
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY tf DESC, tok
    LIMIT 20
    """,
)
def q_llm_tf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: global term frequency, top-20 (explode → count → top-k).

    Stays pure JVM deliberately: split+explode are codegen and the
    partial hash aggregate collapses to (token, count) per partition
    BEFORE the exchange, so the shuffle never carries raw occurrences.
    Swapping in the Arrow per-doc-count UDF (the perplexity/tfidf
    trick) was measured 2× SLOWER here (0.21 s → 0.42 s at sf0.1):
    with no pre-aggregation join in the plan, the UDF only adds Python
    where codegen already did the collapsing for free."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(20)
    )


@register(
    "q_llm_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf  AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
         df  AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
         n   AS (SELECT count(*) AS n FROM documents)
    SELECT tf.doc_id, tf.tok,
           round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
    FROM tf JOIN df USING (tok), n
    ORDER BY tfidf DESC, tf.doc_id, tf.tok
    LIMIT 30
    """,
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: tf-idf, top 30 (doc, term) scores.

    The (doc, term, tf) table is a map-side explode of per-doc token
    counts (text.token_counts_arrow) — the groupBy(doc, tok) exchange
    the naive formulation pays is gone entirely (plan: 3 exchanges →
    1). Local wall-time is flat (0.86 s → 0.82 s at sf0.1: the removed
    exchange was already partial-agg-collapsed to distinct pairs), but
    at 100 TB that exchange is a corpus-sized shuffle and Arrow-batch
    CPU is the cheaper currency. df then derives from tf
    (docs-per-token == tf rows per token), so the only wide shuffle
    left is the small df aggregation; N joins in as a broadcast 1-row
    aggregate, keeping the whole plan lazy (no separate count() job).

    The tf⋈df join is deliberately UNhinted: df has one row per distinct
    corpus token, which is tiny at sf0.1 but 1e8–1e9 rows on a 100 TB
    crawl (Heaps' law) — a forced broadcast would OOM every executor.
    AQE promotes it to broadcast-hash iff runtime stats say it fits
    (same policy as the perplexity model join, operators/lm.py).

    Round 11 (guide §2.3/§5): tf, df and N all fan out of ONE
    tracked-persisted per-doc token-count table — the before-plan ran
    the tokenize ArrowEvalPython TWICE (once for tf, once for df;
    Catalyst has no common-subplan dedup) and on a single scan
    partition. ensure_parallelism spreads the Python stage; the cache
    holds only (doc_id, map<tok,int>) — the narrow pre-explode rows,
    the same cache point as BM25's ``base``.
    """
    from novlake_spark.cache import track

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tc = track(
        docs.select(
            "doc_id", T.token_counts_arrow(F.col("text")).alias("_tc")
        ).persist()
    )
    n = tc.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    tf = tc.select("doc_id", F.explode("_tc").alias("tok", "tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 4).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("tok").asc())
        .limit(30)
    )


@register(
    "q_llm_dsir_weights",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(lower(text), ' ') AS toks
                 FROM documents),
    bg AS (SELECT doc_id, source,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1])) AS bg
           FROM tok),
    b AS (SELECT doc_id, source, substr(md5(bg), 1, 2) AS bk FROM bg),
    t AS (SELECT bk, count(*) AS ct FROM b WHERE source = 'src0' GROUP BY bk),
    s AS (SELECT bk, count(*) AS cs FROM b WHERE source <> 'src0' GROUP BY bk),
    tot AS (SELECT CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS tt,
                   CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ts
            FROM b),
    lam AS (SELECT s.bk,
                   CAST(floor(ln(((coalesce(ct, 0) + 1) / (CAST(tt AS DOUBLE) + 256))
                                 / ((cs + 1) / (CAST(ts AS DOUBLE) + 256)))
                              * 1000000 + 0.5) AS BIGINT) AS ilam
            FROM s LEFT JOIN t USING (bk), tot)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(sum(ilam) AS BIGINT) / CAST(1000000 AS DOUBLE) AS weight
    FROM b JOIN lam USING (bk)
    WHERE source <> 'src0'
    GROUP BY doc_id
    """,
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L71 (round 10): DSIR importance weights — data selection via
    hashed-n-gram importance resampling (Xie et al., NeurIPS 2023),
    the method behind targeted pretraining-mixture reweighting: score
    every raw document by how much more likely its hashed-bigram bag
    is under the TARGET distribution (here: the source='src0' slice,
    the same designated slice the contamination keys use) than under
    the raw pool, w(d) = Σ_features ln(p̂_target/p̂_raw) with add-one
    smoothing over 256 md5-prefix buckets (paper uses 10k buckets;
    bucket count is a constant in the expressions below).

    Exactness (the lm.py grid-nll contract): bucket counts and totals
    are exact integers; each per-bucket log-ratio is a FIXED tree of
    IEEE ops over exact inputs, mirrored op-for-op in the oracle
    (ratio of two quotients, never reassociated; ln is the libm
    residual class the 1e-6 grid absorbs); per-doc weights are sums of
    gridded BIGINTs — order-free — with one presentation division.

    Scale shape (round 11: 2 scans → 1): ONE corpus scan emits
    per-(doc, source, bucket) counts, tracked-persisted; the ≤256-row
    histogram and the per-doc scoring both fold that cache, so the
    bigram UDF runs exactly once. λ joins the score pass as a ≤256-row
    broadcast and the only data-sized exchanges carry (doc, bk, count)
    rows — ≤256 per doc. Bigram STRINGS never shuffle — they reduce to
    2-hex-char bucket keys at the map side. At 100 TB this is exactly
    the DSIR paper's architecture: a streaming histogram pass + an
    embarrassing per-doc score pass, with the intermediate a bounded
    per-doc sketch rather than the raw bigram stream."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # T.shingles_arrow(·, 2) = bigrams of lower(text) split on spaces,
    # short-doc-guarded — value-identical to the oracle's
    # list_transform over string_split(lower(text)) (the same helper
    # the sibling bigram keys use; self-review: don't re-implement its
    # edge cases inline)
    b = docs.select(
        "doc_id", "source", F.explode(T.shingles_arrow(F.col("text"), 2)).alias("bg")
    ).select("doc_id", "source", F.substring(F.md5(F.col("bg")), 1, 2).alias("bk"))
    is_target = F.col("source") == "src0"
    # Round 11 (guide §2.3): ONE bigram pass total. The r10 shape still
    # ran the corpus-sized shingle UDF twice — once into the histogram,
    # once into the scoring aggregate. The bucket stream itself is
    # tracked-persisted AT THE MAP SIDE (no exchange added: the cache
    # point sits before any shuffle, so filling it costs exactly the
    # one UDF pass) and both consumers fold the cache with their
    # original partial aggregations. A per-(doc, source, bucket)
    # pre-reduction was tried first and REVERTED: the fixture's short
    # docs leave bucket counts ≈ 1, so the added exchange shuffled as
    # many rows as it "reduced" and measured 2× worse at sf1
    # (2.2 s → 4.3 s) — guide §1.1's "ideal plan is slower for a
    # gotcha" loop, resolved empirically.
    from novlake_spark.cache import track

    b = track(b.persist())
    # Histogram: both slices' bucket counts fold in a single ≤256-row
    # aggregate, also persisted (totals and λ both reference it). The
    # oracle's t/s/tot decomposition computes the identical exact
    # integers: ct is 0 (not NULL) for a target-absent bucket, matching
    # coalesce(ct,0); Σct / Σcs over all buckets ARE the slice totals.
    hist = track(
        b.groupBy("bk")
        .agg(
            F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("ct"),
            F.sum(F.when(~is_target, 1).otherwise(0)).cast("long").alias("cs"),
        )
        .persist()
    )
    tot = hist.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cs").cast("long").alias("ts")
    )
    # expression tree kept IDENTICAL to the oracle's, op for op
    lam = (
        hist.filter(F.col("cs") > 0)
        .crossJoin(F.broadcast(tot))
        .select(
            "bk",
            grid(
                F.log(
                    ((F.col("ct") + 1) / (F.col("tt").cast("double") + 256))
                    / ((F.col("cs") + 1) / (F.col("ts").cast("double") + 256))
                ),
                1000000,
            ).alias("ilam"),
        )
    )
    return (
        b.filter(~is_target)
        .join(F.broadcast(lam), "bk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("ilam").cast("long") / F.lit(1000000.0)).alias("weight"),
        )
    )


#: Fixed BM25 parameters (Robertson et al., TREC-3; the k1=1.2 b=0.75
#: defaults every Lucene/Elasticsearch deployment ships). Both engines
#: read the same literals, so the doubles are bit-identical.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("table", "scan", "merge")

#: Shared oracle CTE block: per-doc INTEGER BM25 scores (1e-6 grid) for
#: the fixed 3-term query — ONE spelling, consumed by q_llm_bm25 and
#: q_llm_hybrid_rrf (the grid_sql lesson: shared SQL forms are
#: structural, not copy-discipline). ``lexs.ibm25`` is an exact BIGINT,
#: so every downstream rank/tie-break is integer arithmetic.
_BM25_SQL_CTES = """
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok IN ('table', 'scan', 'merge')
      GROUP BY doc_id, tok),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sumdl
              FROM documents),
    lexs AS (
      SELECT tf.doc_id,
             CAST(sum(CAST(floor(
               ln((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               * (tf * CAST(2.2 AS DOUBLE))
               / (tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE) * (dl / (CAST(sumdl AS DOUBLE) / n))))
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS ibm25
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id)
"""


def _bm25_int_scores(docs: DataFrame) -> DataFrame:
    """Per-doc exact-integer BM25 scores ``(doc_id, ibm25)`` for the
    fixed 3-term query — the Spark twin of :data:`_BM25_SQL_CTES`,
    factored out of q_llm_bm25 (round 11) so the hybrid-RRF key fuses
    the IDENTICAL lexical scorer rather than a copy.

    Scale shape (round 11, the provisional-queue two-scan fold,
    measured at 3 SFs before adoption): ONE corpus scan emits the
    narrow per-doc table ``(doc_id, dl, matched-token array)`` — the
    IN-filter runs INSIDE the array (`F.filter` HOF, duplicates kept)
    so text is tokenized exactly once and only a few bytes per doc are
    persisted (tracked). Both the (N, Σdl) stats (which need ALL docs,
    so they can never come from the postings table) and the tf
    aggregation derive from that cache; tf itself is deliberately NOT
    persisted — its exchange is O(matching postings) and the
    no-persist form measured best-or-tied at every SF (warm medians:
    sf0.1 0.85 s vs 1.2 current vs 1.06 tf-persisted; sf1 0.75 / 1.1
    / 1.07; sf10 1.8 / 1.8 / 1.63 — the KN rule's cache point moved
    one stage earlier, where the high-fan-in table is the narrow scan
    output). df (3 rows) and stats (1 row) broadcast."""
    from novlake_spark.cache import track

    terms = list(_BM25_TERMS)
    toks = F.split("text", " ")
    base = track(
        docs.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.filter(toks, lambda t: t.isin(terms)).alias("arr"),
        ).persist()
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("sumdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("arr").alias("tok"))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # expression tree kept IDENTICAL to the oracle's, op for op
    idf = F.log(
        ((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * (F.col("dl") / avgdl)
    )
    contrib = idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(grid(contrib, 1000000)).cast("long").alias("ibm25"))
    )


@register(
    "q_llm_bm25",
    oracle=f"""
    WITH {_BM25_SQL_CTES}
    SELECT doc_id, ibm25 / 1000000.0 AS bm25
    FROM lexs
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
    """,
)
def q_llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L70: BM25 retrieval — top-50 documents for a fixed 3-term query
    (Okapi BM25, k1=1.2 b=0.75), composing the tf construction of
    q_llm_tfidf with the df statistics the inverted index maintains.

    Exactness (the perplexity family's contract): tf, df, dl, N and
    Σdl are exact integers; avgdl is ONE division; each per-(doc,term)
    BM25 contribution is a fixed tree of IEEE ops over those exact
    inputs — identical doubles in both engines (ln is libm, the
    documented residual class the 1e-6 grid absorbs) — floor-gridded
    to BIGINT so the per-doc sum over query terms is order-free, then
    one presentation division.

    Scale shape: see :func:`_bm25_int_scores` (the scorer was factored
    out in round 11 so q_llm_hybrid_rrf fuses the identical pipeline;
    this key's plan is unchanged — the helper inlines into the same
    tree). The final top-50 runs as TakeOrderedAndProject
    (zero-exchange per-partition heaps); ORDER on the presentation
    double is monotone in the exact BIGINT ibm25."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_int_scores(docs)
        .select("doc_id", (F.col("ibm25") / F.lit(1000000.0)).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(50)
    )


#: RRF constant k=60 (Cormack, Clarke & Buettcher, SIGIR 2009 — the
#: value every hybrid-search deployment ships).
_RRF_K = 60
_RRF_DEPTH = 50  # per-list candidate depth feeding the fusion


@register(
    "q_llm_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_SQL_CTES},
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY ibm25 DESC, doc_id) AS lex_rank
      FROM lexs QUALIFY lex_rank <= {_RRF_DEPTH}),
    d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    qv AS (SELECT v FROM d WHERE vec_id = 0),
    den AS (SELECT d.vec_id,
                   CAST(floor(list_dot_product(d.v, qv.v) * 10000 + 0.5) AS BIGINT) AS isc
            FROM d, qv WHERE d.vec_id <> 0),
    denr AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY isc DESC, vec_id) AS dense_rank
      FROM den QUALIFY dense_rank <= {_RRF_DEPTH})
    SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
           l.lex_rank, r.dense_rank,
           CAST(floor((COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + l.lex_rank), 0)
                       + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + r.dense_rank), 0))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS rrf
    FROM lexr l FULL JOIN denr r ON l.doc_id = r.doc_id
    """,
)
def q_llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L72 (round 11): hybrid retrieval via reciprocal-rank fusion —
    the standard RAG primitive composing the two green retrieval
    scorers: lexical BM25 (the q_llm_bm25 pipeline, reused verbatim
    through :func:`_bm25_int_scores`) and dense top-k (the q_llm_knn
    brute-force kernel: cosine against the broadcast query vector,
    vec_id 0). Each list keeps its top-50 by exact-integer score with
    doc-id tie-breaks; fused score is RRF with k=60 (Cormack et al.,
    SIGIR 2009): Σ_lists 1/(60 + rank), docs absent from a list
    contribute 0 for it. vec_id ≡ doc_id in the fixtures (one
    embedding per document, the dedup_embed/semdedup convention).

    Exactness: both rank keys are exact BIGINTs (BM25 on the 1e-6
    grid, dot product on the 1e-4 grid of bit-identical fold-order
    doubles), so ranks are exact integers in both engines; each RRF
    term is ONE IEEE division of small exact integers, their sum is a
    single commutative double add, and the presentation grid floors
    identical doubles. The full outer join keeps single-list docs with
    a NULL rank on the other side — graded as values.

    Scale shape: both candidate lists collapse to ≤50 rows BEFORE the
    fusion join — lexical via TakeOrderedAndProject on the O(matching
    postings) scored set, dense via TakeOrderedAndProject on the
    map-side-scored corpus (the knn_single shape: broadcast query, no
    data-sized exchange) — so the rank windows and the full-outer
    fusion join run on ≤50-row inputs (one tiny exchange each; the
    windows' SinglePartition sort is over 50 rows, not the corpus).
    At 100 TB the corpus-sized work is exactly the two scorer passes
    already graded separately; fusion adds O(depth) regardless of
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical list: top-50 by exact integer score, THEN rank the tiny
    # result (orderBy+limit plans TakeOrderedAndProject; the subsequent
    # row_number sorts 50 rows on one partition)
    lex_top = (
        _bm25_int_scores(docs)
        .orderBy(F.col("ibm25").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
    )
    w_lex = Window.orderBy(F.col("ibm25").desc(), F.col("doc_id").asc())
    lexr = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    # dense list: broadcast the single query vector, score map-side on
    # the exact 1e-4 grid, top-50 via per-partition heaps
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    den_top = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            grid(K.dot(F.col("embedding"), F.col("_qv")), 10000).alias("isc"),
        )
        .orderBy(F.col("isc").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
    )
    w_den = Window.orderBy(F.col("isc").desc(), F.col("doc_id").asc())
    denr = den_top.select(
        "doc_id", F.row_number().over(w_den).alias("dense_rank")
    )

    # fusion: ≤50-row full outer join; each term is one exact division
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)), F.lit(0.0)
    )
    return (
        lexr.join(denr, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            (
                grid(term("lex_rank") + term("dense_rank"), 1000000).cast("long")
                / F.lit(1000000.0)
            ).alias("rrf"),
        )
    )


@register(
    "q_llm_ngrams",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents)
    SELECT bg, count(*) AS n
    FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
          FROM t)
    GROUP BY bg
    ORDER BY n DESC, bg
    LIMIT 20
    """,
)
def q_llm_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9: bigram extraction + counting, top 20."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.shingles_arrow(F.col("text"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bg").asc())
        .limit(20)
    )


@register(
    "q_llm_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           list_min(list_transform(range(1, len(toks) - 3),
                    i -> md5(toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]))) AS fp
    FROM t
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2e: document fingerprint = min MD5 over 5-token shingles (1-hash
    MinHash / winnowing-style content signature)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(T.tokens(F.col("text")), k=5).alias("fp"))


@register(
    "q_llm_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens
    FROM documents
    """,
)
def q_llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6c: token counting two ways — whitespace split and a BPE-ish
    regex (alpha runs | digit runs | single other-char), the standard
    pre-tokenizer shape for LLM data budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast("long").alias(
            "bpe_ish_tokens"
        ),
    )


def _langseg_oracle() -> str:
    from novlake_spark.operators.text import LANG_MARKERS

    hit = {
        lang: f"len(list_filter(seg, x -> x IN ({', '.join(repr(m) for m in ms)})))"
        for lang, ms in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(hit.values())})"
    cases = " ".join(f"WHEN {hit[lang]} = best THEN '{lang}'" for lang in LANG_MARKERS)
    return f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    segs AS (SELECT doc_id,
                    unnest(list_transform(
                        range(0, greatest(CAST(ceil(len(toks) / 10.0) AS INT), 1)),
                        i -> list_slice(toks, i * 10 + 1, i * 10 + 10))) AS seg
             FROM t),
    scored AS (SELECT doc_id, seg, {best} AS best FROM segs),
    langs AS (SELECT doc_id, CASE {cases} ELSE 'und' END AS seg_lang FROM scored),
    counts AS (SELECT doc_id, seg_lang, count(*) AS n FROM langs GROUP BY 1, 2),
    ranked AS (SELECT doc_id, seg_lang, n,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY n DESC, seg_lang) AS rn,
                      CAST(sum(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_segments,
                      CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_langs
               FROM counts)
    SELECT doc_id, n_segments, n_langs,
           seg_lang AS majority_lang, CAST(n AS BIGINT) AS majority_count
    FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """


@register("q_llm_langseg", oracle=_langseg_oracle())
def q_llm_langseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L55 (round 6): per-SEGMENT language analysis — the mixed-language
    curation signal whole-document langid (L langid row) washes out: a
    document is split into fixed 10-token segments, each segment gets
    the same marker-cascade language call, and the doc reports segment
    count, distinct-language count, the majority language and its
    segment count (integers + a categorical ONLY — a mixed-fraction
    ratio would put a float round on a boundary for nothing; the
    consumer divides). Majority ties break on (count desc, lang asc),
    stated identically in both engines' window. The windowed sum in the
    oracle CASTs back to BIGINT — the round-6 HUGEINT discipline.

    Plan shape: segmentation + per-segment langid are pure codegen
    (explode of JVM-side slices, CASE cascade); one exchange keys the
    (doc, lang) counts; the majority window partitions by doc_id —
    bounded at the languages-per-doc fan-in, never a hot-key risk."""
    from pyspark.sql.window import Window

    # ensure_parallelism (round 11, guide §2.5): the segment/langid
    # lambdas run interpreted (no codegen for array lambdas) — on the
    # one-row-group scan the whole pass was single-core.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    toks = F.split(F.lower(F.col("text")), " ")
    n_seg = F.greatest(F.ceil(F.size(toks) / F.lit(10.0)).cast("int"), F.lit(1))
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.slice(toks, i * 10 + 1, 10),
    )
    seg_lang = (
        docs.select("doc_id", F.explode(segs).alias("seg"))
        .select("doc_id", T.lang_id(F.col("seg")).alias("seg_lang"))
    )
    counts = seg_lang.groupBy("doc_id", "seg_lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id")
    ranked = (
        counts.withColumn(
            "rn",
            F.row_number().over(w.orderBy(F.col("n").desc(), F.col("seg_lang").asc())),
        )
        .withColumn("n_segments", F.sum("n").over(w).cast("long"))
        .withColumn("n_langs", F.count(F.lit(1)).over(w).cast("long"))
    )
    out = ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        "n_segments",
        "n_langs",
        F.col("seg_lang").alias("majority_lang"),
        F.col("n").cast("long").alias("majority_count"),
    )
    return _cache_before_sort(out).orderBy("doc_id")


def _langid_oracle() -> str:
    from novlake_spark.operators.text import LANG_MARKERS

    hit = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in ms)})))"
        for lang, ms in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(hit.values())})"
    cases = " ".join(f"WHEN {hit[lang]} = best THEN '{lang}'" for lang in LANG_MARKERS)
    return f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         s AS (SELECT doc_id, toks, {best} AS best FROM t)
    SELECT doc_id, CASE {cases} ELSE 'und' END AS pred_lang
    FROM s
    """


@register("q_llm_langid", oracle=_langid_oracle())
def q_llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-langid: marker-token language-ID heuristic (argmax of per-lang
    marker hits, first-match tie-break). FULL parity on the mechanism;
    the synthetic corpus shares one vocabulary so labels are arbitrary.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(T.tokens(F.col("text"))).alias("pred_lang"))


@register(
    "q_llm_edit_distance",
    oracle="""
    WITH t AS (SELECT doc_id, substring(text, 1, 80) AS head FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist,
           CAST(greatest(length(a.head), length(b.head)) AS BIGINT) AS max_len
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
)
def q_llm_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L61 (round 7): edit-distance pairs — the character-level
    fuzzy-dedup primitive the shingle/MinHash family can't express
    (Levenshtein catches single-character template drift that leaves
    most shingles intact but matters for exact-ish near-dup
    adjudication). Graded over consecutive-id pairs on the first 80
    chars: the 1:1 id-join keeps the graded shape linear (the
    production pattern runs the SAME JVM `levenshtein` as the verify
    step behind LSH candidate pairs — a bounded-candidate set, never
    all-pairs; cost is O(len²) per CANDIDATE, which is why the
    candidates come from LSH, not why the metric is wrong). Output is
    integers (distance + max length — the consumer derives the
    similarity ratio; lengths use CHARACTER semantics on both engines
    — DuckDB `length`, not byte-counting `strlen`). Cross-engine:
    Spark's `levenshtein` and DuckDB's agree on classic
    single-character insert/delete/substitute counts, pinned here by
    the hash over the whole corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("head")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("head").alias("ha"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("head").alias("hb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("ha", "hb").cast("long").alias("edit_dist"),
            F.greatest(F.length("ha"), F.length("hb")).cast("long").alias("max_len"),
        )
    )


def _fertility_oracle() -> str:
    return f"""
    WITH langid AS ({_langid_oracle()}),
    feat AS (SELECT doc_id,
                    len(string_split(text, ' ')) AS ws,
                    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe
             FROM documents)
    SELECT pred_lang AS lang, count(*) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe) AS BIGINT) AS bpe_tokens
    FROM langid JOIN feat USING (doc_id)
    GROUP BY pred_lang
    """


@register("q_llm_fertility", oracle=_fertility_oracle())
def q_llm_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L60 (round 7): tokenizer fertility by language — the
    multilingual-tokenizer health metric (BPE-ish tokens per whitespace
    word, aggregated per predicted language): languages a vocabulary
    under-serves show inflated fertility and eat the token budget.
    Output is INTEGER SUMS plus doc counts (the consumer divides —
    no rounding boundary), grouped by the same marker-cascade langid
    the graded q_llm_langid uses, so the two keys compose into one
    consistent per-language view. Plan: one scan computes langid AND
    both token counts (pure codegen, zero Python), then a
    language-cardinality groupBy — the shuffle carries ≤ |languages|
    partial rows per task, nothing document-sized."""
    # ensure_parallelism (round 11, guide §2.5): regexp_extract_all over
    # every doc on a one-row-group scan was single-core.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    feat = docs.select(
        T.lang_id(T.tokens(F.col("text"))).alias("lang"),
        F.size(F.split("text", " ")).cast("long").alias("ws"),
        F.size(
            F.regexp_extract_all(
                F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ).cast("long").alias("bpe"),
    )
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpe_tokens"),
    )


@register(
    "q_llm_perplexity",
    oracle="""
    WITH t  AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS bg
                FROM t),
         c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
         c1 AS (SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
         model AS (SELECT bg, CAST(floor(-ln(c2 / c1) * 1000000 + 0.5) AS BIGINT) AS inll
                   FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS cross_entropy,
           floor(exp(CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0)
                 * 10000 + 0.5) / 10000 AS ppl
    FROM bg JOIN model USING (bg)
    GROUP BY doc_id
    """,
)
def q_llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6d: perplexity-proxy quality score — per-doc cross-entropy under
    a corpus-estimated bigram MLE (operators.lm). The model-based
    quality signal used to rank/filter pretraining documents."""
    # Parallelism guard measured 2x here (multi-stage critical path:
    # two explodes + model join); other text keys are map-side-partial
    # cheap and do NOT benefit — see tables.ensure_parallelism.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return LM.perplexity_scores(docs)


@register(
    "q_llm_perplexity_kn",
    oracle="""
    WITH t  AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
         bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS bg
                FROM t),
         c2 AS (SELECT bg, count(*) AS c2,
                       string_split(bg, ' ')[1] AS w1,
                       string_split(bg, ' ')[2] AS w2
                FROM bg GROUP BY bg),
         w1s AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY w1),
         w2s AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY w2),
         tot AS (SELECT count(*) AS b FROM c2),
         model AS (SELECT bg,
                          CAST(floor(-ln(
                              (CAST(c2 AS DOUBLE) - 0.75) / c1
                              + ((0.75 * n1f) / c1)
                                * (CAST(n1b AS DOUBLE) / b)
                          ) * 1000000 + 0.5) AS BIGINT) AS inll
                   FROM c2 JOIN w1s USING (w1) JOIN w2s USING (w2) CROSS JOIN tot)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS cross_entropy,
           floor(exp(CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0)
                 * 10000 + 0.5) / 10000 AS ppl
    FROM bg JOIN model USING (bg)
    GROUP BY doc_id
    """,
)
def q_llm_perplexity_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L69 (round 9): per-doc cross-entropy under an INTERPOLATED
    KNESER-NEY bigram model (operators.lm.kn_bigram_model) — the
    properly-smoothed upgrade of the MLE scorer: absolute discount
    d=0.75 on every observed bigram, held-out mass redistributed by
    continuation counts (Kneser–Ney 1995 / Chen–Goodman 1998). The
    practical difference as a data-quality signal: MLE rewards docs
    that repeat high-frequency continuations; KN's continuation term
    scores versatile words above context-locked ones, separating
    formulaic/templated text from organic prose at the same MLE score.
    Exactness contract = the perplexity family's: integer counts, one
    FIXED tree of correctly-rounded IEEE ops mirrored in the oracle,
    grid-nll BIGINT sums, floor-gridded exp. Plan: both w1 statistics
    fold in one groupBy, the global distinct-bigram count is a 1-row
    broadcast — shuffles carry (token, count) rows, never text. The
    four-way model fan-in is absorbed by a tracked persist of the
    AGGREGATED distinct-bigram table (lm._kn_model_from — the measured
    cache point; persisting the raw per-doc table doubled the key)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return LM.kn_perplexity_scores(docs)


@register(
    "q_llm_dedup_cluster",
    oracle="""
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS cluster_id,
           doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS is_canonical
    FROM documents
    """,
)
def q_llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1b: exact-dup cluster assignment — every doc labeled with its
    cluster's canonical (min) id plus a keep/drop flag; the projection
    step that turns dedup groups into a filtered corpus."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    cid = F.min("doc_id").over(w)
    return docs.select(
        "doc_id", cid.alias("cluster_id"), (F.col("doc_id") == cid).alias("is_canonical")
    )


@register(
    "q_llm_dup_components",
    oracle="""
    WITH RECURSIVE
      d AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      e AS (SELECT a.vec_id AS ea, b.vec_id AS eb
            FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) > 0.35),
      ue AS (SELECT ea, eb FROM e UNION ALL SELECT eb AS ea, ea AS eb FROM e),
      walk(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT ue.eb, walk.lbl FROM walk JOIN ue ON ue.ea = walk.id
      )
    SELECT id AS vec_id, min(lbl) AS component_id
    FROM walk GROUP BY id
    """,
)
def q_llm_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2f: duplicate-cluster transitive closure — connected components
    (iterative min-label propagation, operators.graph) over the
    label-blocked embedding-similarity graph (cos > 0.35). Oracle is the
    same fixpoint via DuckDB WITH RECURSIVE."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("label").alias("_blk"), F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("label").alias("_blk"), F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    edges = (
        a.join(b, "_blk")
        .filter(F.col("a") < F.col("b"))
        .filter(K.dot(F.col("va"), F.col("vb")) > 0.35)
        .select("a", "b")
    )
    return G.connected_components(emb.select("vec_id"), edges, id_col="vec_id")


_DUP_COMPONENTS_ORACLE = """
    WITH RECURSIVE
      d AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      e AS (SELECT a.vec_id AS ea, b.vec_id AS eb
            FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) > 0.35),
      ue AS (SELECT ea, eb FROM e UNION ALL SELECT eb AS ea, ea AS eb FROM e),
      walk(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT ue.eb, walk.lbl FROM walk JOIN ue ON ue.ea = walk.id
      )
    SELECT id AS vec_id, min(lbl) AS component_id
    FROM walk GROUP BY id
    """


@register("q_llm_dup_components_ls", oracle=_DUP_COMPONENTS_ORACLE)
def q_llm_dup_components_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2g: same component semantics as q_llm_dup_components, computed
    with the large-star/small-star alternation
    (operators.graph.connected_components_two_phase) — O(log n) rounds
    independent of graph diameter, the scale path for long-chain
    duplicate graphs. Oracle: identical DuckDB WITH RECURSIVE fixpoint,
    so the driver checks both formulations agree with the closure."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("label").alias("_blk"), F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("label").alias("_blk"), F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    edges = (
        a.join(b, "_blk")
        .filter(F.col("a") < F.col("b"))
        .filter(K.dot(F.col("va"), F.col("vb")) > 0.35)
        .select("a", "b")
    )
    return G.connected_components_two_phase(emb.select("vec_id"), edges, id_col="vec_id")


_HELDOUT_SPLIT = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


@register(
    "q_llm_perplexity_heldout",
    oracle=f"""
    WITH tr AS (SELECT string_split(lower(text), ' ') AS toks
                FROM documents WHERE {_HELDOUT_SPLIT} < '80'),
         ho AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
                FROM documents WHERE {_HELDOUT_SPLIT} >= '80'),
         bg_tr AS (SELECT unnest(list_transform(range(1, len(toks)),
                                                i -> toks[i] || ' ' || toks[i+1])) AS bg
                   FROM tr),
         c2 AS (SELECT bg, count(*) AS c2 FROM bg_tr GROUP BY bg),
         c1 AS (SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
         model AS (SELECT bg, CAST(floor(-ln(c2 / c1) * 1000000 + 0.5) AS BIGINT) AS inll
                   FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1),
         bg_ho AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(toks)),
                                                i -> toks[i] || ' ' || toks[i+1])) AS bg
                   FROM ho)
    SELECT doc_id,
           count(*) AS n_bigrams,
           CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS cross_entropy,
           floor(exp(CAST(CAST(sum(inll) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0)
                 * 10000 + 0.5) / 10000 AS ppl
    FROM bg_ho JOIN model USING (bg)
    GROUP BY doc_id
    """,
)
def q_llm_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6e: held-out perplexity — bigram MLE estimated on a deterministic
    ~50% hash split of the corpus, scoring the OTHER half (the honest
    quality-filter protocol: a model must not score its own training
    text). Split is the md5-hex-prefix predicate from operators.sampling
    (shuffle-free, cluster-size invariant); bigrams unseen in training
    drop out of the average (inner join), and n_bigrams counts scored
    bigrams so coverage is visible."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "80"
    model = LM.bigram_model(docs.filter(is_train))
    return LM.score_perplexity(docs.filter(~is_train), model)


@register(
    "q_llm_seq_pack",
    oracle="""
    WITH t AS (SELECT doc_id,
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents)
    SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS tok_offset,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / 2048) AS BIGINT) AS seq_id
    FROM t
    WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack: sequence packing for pretraining — concatenate documents
    in a deterministic order and assign each its token offset and the
    2048-token training sequence it starts in (floor(offset/2048)).
    Sharded by an md5-prefix of doc_id (16 shards) so the cumulative
    sum is a per-shard window, not a global single-reducer sort — at
    100 TB each shard packs independently and in parallel; within-shard
    order (doc_id) is total and engine-independent."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    off = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        off.alias("tok_offset"),
        F.floor(off / F.lit(2048)).alias("seq_id"),
    )


@register(
    "q_llm_seq_pack_split",
    oracle="""
    WITH t AS (SELECT doc_id,
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    off AS (SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS tok_begin
            FROM t
            WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    ex AS (SELECT doc_id, shard, tok_begin, n_tokens,
                  unnest(generate_series(tok_begin // 2048,
                                         (tok_begin + n_tokens - 1) // 2048)) AS seq_id
           FROM off)
    SELECT doc_id, shard, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(tok_begin, seq_id * 2048) - seq_id * 2048 AS BIGINT) AS seq_off,
           CAST(least(tok_begin + n_tokens, (seq_id + 1) * 2048)
                - greatest(tok_begin, seq_id * 2048) AS BIGINT) AS tok_in_seq
    FROM ex
    """,
)
def q_llm_seq_pack_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-pack-split (round 7, VERDICT r6 task #8c): token-count-EXACT
    sequence packing with boundary documents SPLIT across sequences —
    what real pretraining packers do (q_llm_seq_pack assigns each doc
    only the sequence it STARTS in; here a doc straddling a 2048-token
    boundary emits one row per sequence it touches, with its in-sequence
    offset and token count, so every sequence is exactly 2048 tokens
    except each shard's last). Pure integer arithmetic over the same
    md5-sharded prefix sum as q_llm_seq_pack: start = exclusive cumsum
    within shard, the doc spans sequences floor(start/2048) ..
    floor((start+n-1)/2048), contributing
    min(end,(s+1)·2048) − max(start,s·2048) tokens to sequence s. FULL
    integer-only oracle (the DuckDB window sum is CAST back to BIGINT —
    the HUGEINT trap; division is integral `div`/`//` on both engines,
    no float boundary anywhere). Scale shape: per-shard windows (no
    global sort), and the explode fans out ~1 row per doc (docs are
    ≪ 2048 tokens on average), so the shuffle volume stays one row per
    document; at 100 TB shards pack independently and the split rows
    are written partition-local."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    off = t.withColumn("tok_begin", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    ex = off.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr("tok_begin div 2048"),
                F.expr("(tok_begin + n_tokens - 1) div 2048"),
            )
        ),
    )
    start_in = F.greatest(F.col("tok_begin"), F.col("seq_id") * 2048)
    end_in = F.least(F.col("tok_begin") + F.col("n_tokens"), (F.col("seq_id") + 1) * 2048)
    return ex.select(
        "doc_id",
        "shard",
        "seq_id",
        (start_in - F.col("seq_id") * 2048).alias("seq_off"),
        (end_in - start_in).alias("tok_in_seq"),
    )


@register(
    "q_llm_dedup_incremental",
    weak=True,  # WEAK: LSH admission, no SQL oracle
    # side-effecting (two-batch txlog index replay per call): the
    # contract schema sweep reads this declaration instead
    declared_schema="batch int, n_submitted bigint, n_admitted bigint, n_planted_admitted bigint",
)
def q_llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L54 as a GRADED key (round 7, VERDICT r6 task #8a): incremental
    corpus dedup against the PERSISTENT SignatureIndex — two batches
    replayed through txlog-backed inverted-LSH state, the admission
    path a daily-increment corpus build runs at 100 TB. Batch 1 = even
    doc_ids; batch 2 = odd doc_ids PLUS exact copies of 50 batch-1
    documents under shifted ids (the planted cross-batch duplicates —
    identical text ⇒ identical MinHash signature ⇒ estimated Jaccard
    1.0, rejected at any threshold). The output is the bounded
    per-batch admission summary (submitted/admitted/planted-admitted —
    planted_admitted MUST be 0); exactness of the underlying index is
    pinned by tests/test_incdedup.py (cross-batch rejection, index
    growth, txn replay, streaming foreachBatch). Rows-only grade: LSH
    candidate generation + signature-agreement admission has no
    cross-engine SQL oracle, but the output is deterministic (hash
    family is seeded, no randomness). Scale shape: the probe join
    touches only the batch's (band,bucket) footprint — never rescans
    the corpus; driver state is commit metadata plus these six
    scalars."""
    import shutil
    import tempfile

    from novlake_spark.operators.incdedup import SignatureIndex

    # doc_id < 250 slice (round 8, VERDICT r7 task #6): the grading
    # semantics need two batches and the 50 cross-batch plants, not the
    # whole corpus — the slice halves the MinHash/LSH work while the
    # plants (even doc_ids < 100 = exactly 50 at every SF) are intact
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 250)
    )
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    planted = batch1.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    batch2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(planted)

    root = tempfile.mkdtemp(prefix="novlake-incdedup-")
    try:
        idx = SignatureIndex(spark, root)
        # admission counts come from the COMMITTED index, not the
        # returned DataFrames: admit() unpersists its signature cache on
        # return, so counting the returned semi-join would recompute the
        # whole MinHash lineage (measured 29 s → 9 s at sf0.01); the
        # index read is a plain parquet scan of ≤ one row per admitted
        # doc
        idx.admit(batch1, threshold=0.9, txn="q-incdedup:b1")
        n_adm1 = idx.indexed_count()
        idx.admit(batch2, threshold=0.9, txn="q-incdedup:b2")
        sigs = idx.sigs.read().select("doc_id")
        n_total = sigs.count()
        planted_admitted = sigs.filter(F.col("doc_id") >= 1000000).count()
        row1 = (int(batch1.count()), n_adm1, 0)
        row2 = (int(batch2.count()), n_total - n_adm1, int(planted_admitted))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(1, *row1), (2, *row2)],
        "batch int, n_submitted bigint, n_admitted bigint, n_planted_admitted bigint",
    ).orderBy("batch")


@register(
    "q_llm_contamination",
    oracle="""
    WITH sh AS (SELECT doc_id, source,
                       unnest(list_transform(range(1, len(toks) - 3),
                              i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4])) AS sh
                FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents)),
         bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
         ev AS (SELECT doc_id, sh.sh, (bench.sh IS NOT NULL)::INT AS hit
                FROM sh LEFT JOIN bench ON sh.sh = bench.sh
                WHERE source <> 'src0')
    SELECT doc_id,
           count(*) AS n_shingles,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           floor(sum(hit) / count(*) * 10000 + 0.5) / 10000 AS contaminated_frac
    FROM ev GROUP BY doc_id
    """,
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-contam: benchmark-contamination check — fraction of each
    document's 5-token shingles that appear anywhere in a designated
    benchmark corpus (here: source='src0'). The standard pre-training
    hygiene scan (n-gram overlap against eval sets). Plan: one shingle
    explode, distinct benchmark shingle set, LEFT join + per-doc ratio.
    NO broadcast hint (VERDICT r4 wrong #1): a REAL eval set is small
    and a user may hint it, but THIS query's benchmark side is
    corpus-derived (the distinct shingles of source='src0', ~5% of the
    corpus's shingles) — it grows linearly with corpus size, so a
    forced broadcast OOMs executors at 100 TB exactly like the tfidf
    vocabulary hint round 4 removed. AQE owns the decision from size
    estimates, same policy as every other SF-scaled side in the repo
    (plan-pinned: tests/test_plans.py asserts zero hinted broadcasts in
    this module outside provably-bounded sides). Short docs (<5 tokens)
    have no shingles and drop out. Shingling runs in the Arrow pandas
    UDF (text.shingles_arrow, ~18× the interpreted-lambda path measured
    at sf0.1) behind the parallelism guard so the Python batches spread
    across cores."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id", "source", F.explode(T.shingles_arrow(F.col("text"), 5)).alias("sh")
    )
    bench = sh.filter(F.col("source") == "src0").select("sh").distinct()
    ev = (
        sh.filter(F.col("source") != "src0")
        .join(bench.withColumn("_hit", F.lit(1)), "sh", "left")
        .select("doc_id", F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"))
    )
    frac = F.sum("hit") / F.count(F.lit(1)) * 10000 + F.lit(0.5)
    return ev.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("hit").cast("long").alias("n_hits"),
        (F.floor(frac) / 10000).alias("contaminated_frac"),
    )


@register(
    "q_llm_repetition",
    oracle="""
    WITH bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
                FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)),
         per AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           floor(max(c) / sum(c) * 10000 + 0.5) / 10000 AS top_bigram_frac,
           floor((sum(c) - count(*)) / sum(c) * 10000 + 0.5) / 10000 AS dup_bigram_frac
    FROM per GROUP BY doc_id
    """,
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6f: Gopher-style repetition signals per document — fraction of
    all bigram occurrences taken by the single most frequent bigram,
    and fraction that are repeats of an already-seen bigram. High
    values flag boilerplate/looping text for pretraining filters.
    One explode + two-level aggregation, fully map-reducible."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select("doc_id", F.explode(T.shingles_arrow(F.col("text"), 2)).alias("bg"))
    per = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    r4 = lambda x: F.floor(x * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        r4(F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        r4((F.sum("c") - F.count(F.lit(1))) / F.sum("c")).alias("dup_bigram_frac"),
    )


@register(
    "q_llm_shuffle_det",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY md5('shuffle42-' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
    FROM documents
    """,
)
def q_llm_shuffle_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-shuffle: deterministic global corpus shuffle — reproducible
    training order as rank under a seeded content hash. Computed
    scalably: the hash's 2-hex-char prefix shards rows into 256 groups
    whose within-group row_numbers are offset by the (tiny, windowed)
    cumulative group counts — global total order with no single-reducer
    sort, because the shard key is a prefix of the sort key. Oracle is
    the equivalent one-window row_number."""
    docs = load_table(spark, sf_dir, "documents")
    sk = F.md5(F.concat(F.lit("shuffle42-"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", sk.alias("sk"), F.substring(sk, 1, 2).alias("shard"))
    cum = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        keyed.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("shard", F.coalesce(F.sum("_n").over(cum), F.lit(0)).alias("_base"))
    )
    within = Window.partitionBy("shard").orderBy("sk", "doc_id")
    return (
        keyed.join(F.broadcast(offsets), "shard")
        .select("doc_id", (F.row_number().over(within) + F.col("_base")).cast("long").alias("pos"))
    )


def _simhash_md5_oracle() -> str:
    bits = ", ".join(
        f"CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END AS p{i}"
        for i in range(32)
    )
    total = " + ".join(f"p{i}" for i in range(32))
    return f"""
    WITH tok AS (SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS h
                 FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                       FROM documents)),
         b AS (SELECT doc_id, {bits} FROM tok GROUP BY doc_id)
    SELECT doc_id, CAST({total} AS BIGINT) AS simhash32 FROM b
    """


@register("q_llm_simhash_md5", oracle=_simhash_md5_oracle())
def q_llm_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b-FULL: engine-portable 32-bit SimHash — per-token hash is the
    first 8 hex chars of md5 (identical in any engine), each bit's
    counter is a conditional ±1 sum, bit set iff the sum is positive
    (ties -> 0 in both engines). Formulated as explode + 32 conditional
    aggregates: map-side partial aggregation applies, so the wide
    explode never shuffles — only 32 longs per doc do. The xxhash64
    variant (q_llm_dedup_simhash) stays as the JVM fast path; this one
    is the cross-engine-verifiable specification of the same algorithm.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")).select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(32)
    ]
    b = tok.groupBy("doc_id").agg(*bit_sums)
    total = None
    for i in range(32):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        total = term if total is None else total + term
    return b.select("doc_id", total.cast("long").alias("simhash32"))


def _minhash_md5_oracle(n_hashes: int = 16) -> str:
    sigs = ", ".join(f"min(md5('{j}:' || sh)) AS mh{j}" for j in range(n_hashes))
    return f"""
    WITH sh AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 1),
                              i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])) AS sh
                FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
    SELECT doc_id, {sigs} FROM sh GROUP BY doc_id
    """


@register("q_llm_minhash_md5", oracle=_minhash_md5_oracle())
def q_llm_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-FULL: engine-portable MinHash signature — 16 hash families
    h_j(s) = md5('j:' || s) over 3-token shingles, signature j = the
    lexicographic minimum. min-over-occurrences equals min-over-set, so
    no distinct is needed and the aggregation is map-side partial.
    Cross-engine-verifiable counterpart of the numpy fast path in
    operators.dedup (q_llm_dedup_near); banding/bucketing composes on
    top of these columns identically in either form.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(T.shingles_arrow(F.col("text"), 3)).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"mh{j}") for j in range(16)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


@register(
    "q_llm_curation",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
                      md5(lower(trim(text))) AS h
               FROM documents),
         q AS (SELECT doc_id, lang, len(toks) AS n_tokens,
                      len(list_distinct(toks)) / len(toks) AS dr, h,
                      min(doc_id) OVER (PARTITION BY h) AS keep
               FROM t)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM q
    WHERE n_tokens >= 5 AND dr >= 0.3 AND doc_id = keep
    """,
)
def q_llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-curate: the SQL-expressible core of the curation pipeline
    (pipelines.curate) as one Catalyst plan — per-doc quality signals
    (token count, lexical diversity) gate the corpus, exact-dup groups
    keep their minimum id. One scan + one hash-partition window on the
    content digest; the MinHash near-dup stage (not SQL-portable) is
    exercised by its own keys and the pytest pipeline. Threshold
    comparisons are IEEE-double divisions, identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    t = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("dr"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    keep = F.min("doc_id").over(Window.partitionBy("h"))
    return (
        t.withColumn("keep", keep)
        .filter((F.col("n_tokens") >= 5) & (F.col("dr") >= 0.3) & (F.col("doc_id") == F.col("keep")))
        .select("doc_id", "lang", "n_tokens")
    )


@register(
    "q_llm_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''),
    p AS (SELECT token, doc_id,
                 row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
          FROM tok)
    SELECT t.token,
           CAST(count(*) AS BIGINT) AS df,
           (SELECT array_to_string(list_sort(list(doc_id)), ',')
            FROM p WHERE p.token = t.token AND p.rn <= 20) AS first_postings
    FROM tok t
    GROUP BY t.token
    """,
)
def q_llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L: inverted-index construction — token → document frequency +
    the first 20 postings (by doc_id), the IR/retrieval building block.

    The full posting list for a frequent token is O(corpus) — never
    collect it. The bounded prefix comes from a per-token row_number
    window over the distinct (token, doc) pairs, so executor memory
    holds ≤20 postings per token regardless of corpus size; df is a
    plain count over the same distinct pairs. The join of the two
    aggregates is deliberately UNhinted: both sides are vocabulary-sized
    (1e8-1e9 rows on a crawl-scale corpus — a forced broadcast OOMs);
    AQE promotes to broadcast iff runtime stats fit, the same policy as
    the tf-idf df join above."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    df_counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("token").orderBy("doc_id")
    postings = (
        tok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("token")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("first_postings"))
    )
    return df_counts.join(postings, "token").select(
        "token", "df", "first_postings"
    )


@register("q_llm_bpe_train", weak=True)  # WEAK: iterative algorithm, not SQL-expressible
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L: BPE tokenizer training — 16 merge rounds over the corpus
    word-frequency table (operators/bpe.py).

    The corpus-sized stage is one word-count shuffle; the merge loop is
    vocab-bounded driver work (Sennrich split — see module docstring
    for why that's the scalable shape, not N cluster jobs). Output is
    the deterministic merge table: rank, pair, merged symbol, count.
    Rows-only check: the fixed point of an iterative algorithm has no
    single-query SQL equivalent."""
    from novlake_spark.operators import bpe as B

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return B.train_bpe(d, n_merges=16)


@register(
    "q_llm_pii_scrub",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             text || ' Contact: user' || doc_id || '@example.com or 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS raw_text
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g')                    AS clean_text,
           CAST(len(regexp_extract_all(raw_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw_text, '\\d{3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones
    FROM raw
    """,
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L: PII redaction — regex-scrub emails and phone numbers, report
    per-document redaction counts.

    A standard pre-training hygiene pass. The fixture corpus carries no
    PII, so each row first gets a DETERMINISTIC synthetic email+phone
    (derived from doc_id — same injection in the oracle SQL), making
    the scrub verifiable end-to-end rather than vacuously matching on
    zero replacements. Both regexes use only syntax Java's engine and
    DuckDB's RE2 interpret identically (classes, bounded repeats — no
    backrefs/lookaround). Entirely map-side JVM codegen: no shuffle, no
    Python — at 100 TB this runs at scan speed, and the same column
    expressions drop into any ingest pipeline."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\d{3}-\d{3}-\d{4}"
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"), F.col("doc_id").cast("string"), F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"), F.lit("."),
        ).alias("raw_text"),
    )
    return raw.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw_text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("clean_text"),
        F.size(F.regexp_extract_all("raw_text", F.lit(email_re), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("raw_text", F.lit(phone_re), 0)).cast("long").alias("n_phones"),
    )


@register(
    "q_llm_span_dedup",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
          FROM t)
    SELECT ngram,
           count(*)    AS n_docs,
           min(doc_id) AS first_doc
    FROM g GROUP BY ngram HAVING count(*) > 1
    """,
)
def q_llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L: cross-document span duplication — token 3-gram spans occurring
    in more than one document, with the canonical keeper (min doc_id).

    The detection half of substring-level training-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): repeated spans across documents are memorization
    fuel even when whole-document hashes differ. Plan shape at 100 TB:
    shingling is map-side (Arrow-vectorized) and intra-doc repeats
    collapse INSIDE the UDF (``unique=True``), so the plan's ONE
    exchange keys on the span text with partial aggregation — a
    ``distinct`` formulation costs a second full-width shuffle
    (measured in PLANS.json round 2 and removed). Skewed hot spans
    (boilerplate) are exactly what AQE skew-split handles; the output
    is the span→first_doc map a scrubber broadcast-joins against."""
    # ensure_parallelism (round 11, guide §2.5): the shingle UDF on a
    # one-row-group scan otherwise runs on a single core.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    spans = docs.select(
        "doc_id", F.explode(T.shingles_arrow(F.col("text"), 3, unique=True)).alias("ngram")
    )
    return (
        spans.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "q_llm_span_coverage",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(range(1, len(toks) - 1)) AS i,
                 unnest(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
          FROM t),
    dup AS (SELECT ngram, min(doc_id) AS first_doc
            FROM (SELECT DISTINCT doc_id, ngram FROM g)
            GROUP BY ngram HAVING count(*) > 1),
    cov AS (SELECT g.doc_id, unnest([g.i, g.i + 1, g.i + 2]) AS p
            FROM g JOIN dup USING (ngram)
            WHERE g.doc_id <> dup.first_doc),
    cnt AS (SELECT doc_id, count(DISTINCT p) AS n_dup_pos FROM cov GROUP BY doc_id)
    SELECT t.doc_id, len(t.toks) AS n_tokens,
           COALESCE(cnt.n_dup_pos, 0) AS n_dup_pos
    FROM t LEFT JOIN cnt USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_llm_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L52 (round 6): per-document duplicated-span coverage — the APPLY
    half of substring-level training-data dedup (Lee et al. 2022),
    completing q_llm_span_dedup's detection half: for every document,
    how many of its token positions sit inside a 3-gram that also
    occurs in another document (the canonical min-doc_id holder keeps
    its spans — only non-keeper occurrences count as duplication).
    This is the standard curation signal for "mostly boilerplate"
    filtering and memorization-risk scoring.

    Output is INTEGERS ONLY (n_tokens, covered positions) — the ratio
    is the consumer's one division; emitting it here would put a
    round() on a float boundary for no reason (SURVEY §5.3 discipline).

    Plan at 100 TB (round 11: ONE shingle pass): shingling is Arrow
    map-side and runs exactly once — the positional table is
    tracked-persisted (narrow (doc, pos, span) rows; the cache is the
    price of not running the corpus-sized Python pass twice, the same
    trade as the KN bigram cache) and the duplicated-span set derives
    from it via count_distinct(doc) per span (two-phase aggregate; the
    intra-doc repeats the old unique=True second pass removed map-side
    now collapse in the partial (span, doc) phase). The positions join
    shuffles triples only for spans that ARE duplicated —
    boilerplate-heavy skew lands on AQE's skew-split because this is a
    JOIN, not a window; the final distinct-position count keys on
    doc_id. No driver state, no broadcast of SF-scaled sides (hint
    policy: AQE decides)."""
    from novlake_spark.cache import track

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(F.lower(F.col("text")), " ")

    # Round 11 (guide §2.3/§5): ONE shingle pass total. The r10 shape
    # ran shingles_arrow twice over the corpus — positional for the
    # coverage join and unique for the dup table — each on a single
    # scan partition. The positional table is tracked-persisted and the
    # dup table derives from it (count_distinct collapses the intra-doc
    # repeats the unique=True pass used to remove map-side); both
    # engines' dup sets are the same exact integers.
    pos = track(
        docs.select(
            "doc_id",
            F.posexplode(T.shingles_arrow(F.col("text"), 3)).alias("i", "ngram"),
        ).persist()
    )
    dup = (
        pos.groupBy("ngram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .select("ngram", "first_doc")
    )
    # The (doc, position) explosion after the dup join is the
    # size-dominant stage (3 positions per duplicated occurrence —
    # ~1.5e9 rows at sf10): run its exchange at full cluster width
    # instead of the session's shuffle_partitions, which is sized for
    # aggregate-shaped keys (the q_graph_triangles discipline; measured
    # at sf10/local[32]: 41.1 s → ~20 s — the 32-partition distinct agg
    # was spilling, and on a real cluster a 32-wide exchange would cap
    # the key at 32 cores regardless of executor count).
    spark_ = docs.sparkSession
    width = max(
        spark_.sparkContext.defaultParallelism,
        int(spark_.conf.get("spark.sql.shuffle.partitions", "8")),
    )
    covered = (
        pos.join(dup, "ngram")
        .filter(F.col("doc_id") != F.col("first_doc"))
        .select("doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 2)).alias("p"))
        .repartition(width, "doc_id")
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("n_dup_pos"))
    )
    return _cache_before_sort(
        docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup_pos"), F.lit(0).cast("long")).alias("n_dup_pos"),
        )
    ).orderBy("doc_id")


@register(
    "q_llm_normalize_unicode",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               nfc_normalize('e' || chr(769) || ' ' || text
                             || chr(7) || '  o' || chr(776)),
               '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'),
             ' {2,}', ' ', 'g') AS clean_text
    FROM documents
    ORDER BY doc_id
    """,
)
def q_llm_normalize_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L53 (round 6): Unicode normalization — the curation stage that
    runs BEFORE any hashing/dedup, so visually-identical strings digest
    identically: NFC composition (crawled text freely mixes composed
    é with decomposed e+U+0301), C0/C1-control stripping (except tab
    and newline), and space-run collapse. FULL constructive oracle:
    both engines build the same damaged input in-query (a decomposed
    accent pair, a BEL control, a double space appended around each
    document's text) and state the cleaned output independently —
    Python's unicodedata NFC vs DuckDB's nfc_normalize, and the same
    explicit regex class on both sides; canonical composition is
    standardized, so the hash match is a real cross-implementation
    check, not an echo. Zero shuffle: one ArrowEval over the scan
    (the orderBy is oracle-comparison framing only)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    messy = F.concat(
        F.lit("e\u0301 "),        # decomposed e + COMBINING ACUTE
        F.col("text"),
        F.lit("\u0007  o\u0308"),  # BEL control, space run, decomposed o-diaeresis
    )
    clean = T.nfc_clean_udf()
    return _cache_before_sort(
        docs.select("doc_id", clean(messy).alias("clean_text"))
    ).orderBy("doc_id")


@register("q_llm_bpe_encode", weak=True)  # WEAK: depends on the iterative trainer
def q_llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14: apply a trained BPE merge table to the corpus — top-30
    (token, total count) pairs across all documents.

    Exercises the scale-shaped encoder (operators/bpe.py encode_words):
    Python touches each DISTINCT word once via an Arrow pandas UDF and
    the (word → tokens) table joins back — no per-corpus-token
    interpreter work. Deterministic (trainer ties broken
    lexicographically) but downstream of an iterative algorithm, so
    rows-only. Output capped to top-30 tokens ordered (count desc,
    token) for a stable driver check."""
    from novlake_spark.operators import bpe as B

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    merges_df = B.train_bpe(d, n_merges=16)
    merges = [
        (r["rank"], r["left"], r["right"], r["pair_count"]) for r in merges_df.collect()
    ]
    enc = B.encode_words(d, merges)
    return (
        enc.groupBy("bpe_token")
        .agg(F.sum("n").alias("total"))
        .orderBy(F.col("total").desc(), "bpe_token")
        .limit(30)
    )


@register(
    "q_multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)  AS byte_len,
           sha256(text)                                AS sha_hex,
           lower(substr(hex(encode(text)), 1, 16))     AS head_hex
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: opaque-binary payload processing through the REAL multimodal
    path — binary column in, Arrow-batched ``mapInPandas`` feature
    extraction out (byte length, SHA-256, head bytes hex).

    The fixture has no media files, so document text bytes stand in as
    the payload; the pipeline is byte-identical to what a codec UDF
    sees (BinaryType column → pandas batches of raw bytes → typed
    feature frame, schema declared up front so Catalyst plans
    downstream ops normally — operators/multimodal.py holds the codec
    variants). Constant memory per batch, no shuffle: at 100 TB this is
    scan + Python-parallel map, the exact shape of a distributed
    decode/embed stage. FULL oracle: every extracted feature is
    recomputable in SQL from the same bytes."""
    import hashlib

    import pandas as pd

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def run(batches):
        for pdf in batches:
            raw = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(b) for b in raw],
                    "sha_hex": [hashlib.sha256(b).hexdigest() for b in raw],
                    "head_hex": [b[:8].hex() for b in raw],
                }
            )

    return payloads.mapInPandas(
        run, schema="doc_id long, byte_len long, sha_hex string, head_hex string"
    )


@register(
    "q_llm_quality_logreg",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS digit_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS mean_tok_len
      FROM documents),
    z AS (
      SELECT doc_id,
             -1.2 + 0.8 * ln(1.0 + n_tokens) - 6.0 * punct_ratio
                  - 4.0 * digit_ratio - 0.15 * abs(mean_tok_len - 5.0) AS z
      FROM f)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-z)), 4) AS score,
           z > 0.0 AS keep
    FROM z
    """,
)
def q_llm_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6c: classifier-style quality filtering — a fixed-weight logistic
    model over cheap text features (the fastText-classifier stage of
    CCNet/GPT-3-style pipelines, with public hand-set weights so the
    score is deterministic and cross-engine verifiable).

    All features are JVM regexp/length expressions — the whole scoring
    pass is one map-side whole-stage-codegen projection, zero shuffle,
    zero Python: at 100 TB this runs at scan speed, which is exactly
    why production pipelines front-load a linear scorer before any
    model-based filter.
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = F.size(F.split(text, " ")).cast("double")
    tlen = F.greatest(F.length(text), F.lit(1))
    punct_ratio = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double") / tlen
    digit_ratio = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double") / tlen
    mean_tok_len = (
        F.length(F.regexp_replace(text, r" ", "")).cast("double")
        / F.greatest(n_tokens, F.lit(1.0))
    )
    z = (
        F.lit(-1.2)
        + F.lit(0.8) * F.log(F.lit(1.0) + n_tokens)
        - F.lit(6.0) * punct_ratio
        - F.lit(4.0) * digit_ratio
        - F.lit(0.15) * F.abs(mean_tok_len - F.lit(5.0))
    )
    return docs.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4).alias("score"),
        (z > F.lit(0.0)).alias("keep"),
    )


@register(
    "q_llm_semdedup_planted",
    oracle="""
    SELECT vec_id, true AS kept FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, false FROM embeddings WHERE vec_id % 5 = 0
    """,
)
def q_llm_semdedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2g (round 11): the SemDeDup detection path made FULL-gradable by
    construction — the q_llm_dedup_near_planted discipline applied to
    the semantic family. Corpus = embeddings ∪ EXACT copies of the
    vec_id%5==0 slice (copy id = original + 1,000,000, above every
    fixture id). An identical vector lands in the SAME k-means cell as
    its original by determinism of the assignment computation —
    whatever the engine-specific cells are — and, having the higher
    id, sees cosine ≈ 1.0 to a lower-id cluster-mate, which exceeds
    the 0.99 threshold no organic fixture pair can reach (measured
    max non-identical cosine ≈ 0.47; a random 64-dim pair at 0.99 is
    astronomically unlikely and would be a planted dup anyway). The
    kept verdict is therefore EXACTLY "is this a planted copy",
    restated by the oracle as id arithmetic — while the execution
    runs the REAL pipeline: seeded k-means cells, per-cell vectorized
    matmul, lower-id-keeper rule. Engine-specific floats (cell id,
    max_cos_prior) stay out of the graded projection; the general
    thresholded key remains weak-by-design as L2e with planted-recall
    pytest. Scale: identical Σ cell² bound as the weak key."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    return D.semantic_dedup(corpus, threshold=0.99, n_cells=8).select(
        "vec_id", "kept"
    )


@register("q_llm_semdedup", weak=True)  # WEAK: k-means cells are engine-specific
def q_llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2e: SemDeDup semantic deduplication (cluster embeddings, drop
    near-cosine-duplicates within each cluster; arXiv:2303.09540).

    WEAK by design: the k-means cell assignment has no DuckDB
    equivalent. Rows-only here (one verdict row per vector);
    tests/test_llm_ops.py plants true semantic duplicates and asserts
    they are the rows flagged kept=false with the right keeper.
    Σ cell² pairwise bound, vectorized matmul per cell — see
    operators/dedup.py:semantic_dedup for the 100 TB shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return D.semantic_dedup(emb, threshold=0.4, n_cells=8)


@register(
    "q_llm_gopher_rules",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY doc_id, tok),
    s AS (
      SELECT doc_id,
             sum(c) AS n_words,
             sum(c * length(tok)) AS sum_len,
             sum(CASE WHEN tok IN ('a','the','of','to','and','in','is','that','for','it')
                      THEN c ELSE 0 END) AS n_stop,
             max(c) AS max_tf
      FROM tf GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(CAST(sum_len AS BIGINT) AS DOUBLE) / n_words AS mean_word_len,
           CAST(CAST(n_stop AS BIGINT) AS DOUBLE) / n_words AS frac_stop,
           CAST(CAST(max_tf AS BIGINT) AS DOUBLE) / n_words AS max_tf_ratio,
           (n_words BETWEEN 20 AND 1000
            AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
            AND n_stop * 100 >= n_words * 3
            AND max_tf * 100 <= n_words * 18) AS passes
    FROM s
    """,
)
def q_llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6d: Gopher-style rule-based quality filtering (Rae et al. 2021,
    arXiv:2112.11446 Table A1, thresholds adapted to the fixture's word
    distribution): word-count bounds, mean-word-length band, minimum
    stop-word fraction, and a max-term-frequency repetition cap.

    Scale shape: ONE explode feeding two partial-aggregable hash
    aggregates — (doc, token) counts collapse map-side before the first
    exchange, then per-doc stats fold in a second; no join-back (every
    signal, including max term frequency, derives from the token
    counts). The pass/fail flags use integer cross-multiplication
    (``n_stop*100 >= n*3``), never float thresholds, so the verdict is
    bit-identical on any engine or partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    stops = ("a", "the", "of", "to", "and", "in", "is", "that", "for", "it")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.sum(F.col("c") * F.length("tok")).alias("sum_len"),
        F.sum(
            F.when(F.col("tok").isin(*stops), F.col("c")).otherwise(F.lit(0))
        ).alias("n_stop"),
        F.max("c").alias("max_tf"),
    )
    n = F.col("n_words")
    return s.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        # exact-integer ratios, one IEEE division each — bit-identical
        # both engines, no round() boundary (round 9 float-class audit)
        (F.col("sum_len").cast("double") / n).alias("mean_word_len"),
        (F.col("n_stop").cast("double") / n).alias("frac_stop"),
        (F.col("max_tf").cast("double") / n).alias("max_tf_ratio"),
        (
            n.between(20, 1000)
            & (F.col("sum_len") >= 3 * n)
            & (F.col("sum_len") <= 10 * n)
            & (F.col("n_stop") * 100 >= n * 3)
            & (F.col("max_tf") * 100 <= n * 18)
        ).alias("passes"),
    )


@register(
    "q_llm_chunk",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 8)) AS st FROM t)
    SELECT doc_id,
           CAST(st // 8 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, st + 1, st + 16), ' ') AS chunk_text,
           CAST(least(16, len(toks) - st) AS BIGINT) AS n_tokens
    FROM s
    """,
)
def q_llm_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15: sliding-window document chunking — 16-token windows with
    stride 8 (50% overlap), the context-window splitting step of every
    RAG / embedding / pretraining-tokenization pipeline.

    Pure JVM higher-order functions: ``sequence`` builds the start
    offsets, ``transform``+``slice`` cut each window, one ``explode``
    emits the chunks — zero shuffle, zero Python, whole-stage codegen
    end to end. Output grows ×(1/overlap) over the corpus, so at
    100 TB the only cost that matters is the map-side explode this
    plan already minimizes (no joins, no window functions).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1, F.lit(8)),
        lambda s: F.struct(
            (s / 8).cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, s + 1, F.lit(16)), " ").alias("chunk_text"),
            F.least(F.lit(16), n - s).cast("long").alias("n_tokens"),
        ),
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.chunk_text", "c.n_tokens"
    )


@register(
    "q_llm_embed_centroid",
    oracle="""
    SELECT label,
           CAST(dim - 1 AS INT) AS dim,
           CAST(CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                     AS BIGINT) AS DOUBLE)
             / count(*) / 1000000.0 AS centroid,
           count(*) AS n_vecs
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    """,
)
def q_llm_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20: per-class embedding centroids in long format (label, dim,
    mean component) — the class-prototype computation behind SemDeDup
    cell seeding, nearest-class-mean classification, and drift
    monitoring of an embedding column.

    posexplode keeps the dimension index JVM-side; the (label, dim)
    hash aggregate collapses map-side before its single exchange, so
    the shuffle carries K·D partial sums (tiny), never the vectors.
    Deliberately NOT a Python/Arrow path: at 100 TB the vectors stream
    through codegen once and only the centroid matrix moves.

    Float discipline (round 8 — the sf0.001 cross-SF sweep CAUGHT this
    key): the old ``round(avg(v), 4)`` summed raw floats, whose value
    depends on summation ORDER (Spark partial aggregation vs DuckDB's
    sequential fold), then rounded — and near-zero centroids sit right
    on rounding boundaries, so an ULP of order noise flipped a cell to
    ``-0.0`` vs ``0.0002`` at sf0.001 while sf0.01 passed by luck.
    Now each component lands on an exact 1e-6 grid FIRST
    (``floor(v·1e6 + 0.5)`` of the bit-identical double — the
    boundary-free form, same in both engines), the BIGINT sum is
    order-free, and the centroid is the same two IEEE divisions of
    identical integers on both sides. Zero round() calls; quantization
    bias ≤ 5e-7 — noise for a drift/prototype diagnostic."""
    emb = load_table(spark, sf_dir, "embeddings")
    grid = F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5)).cast("long")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (F.sum(grid).cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
                "centroid"
            ),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@register(
    "q_llm_stopword_ratio",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '),
                           x -> list_contains(['the', 'a'], x))) AS stop_n,
           len(string_split(text, ' ')) AS n_toks,
           floor(len(list_filter(string_split(text, ' '),
                                 x -> list_contains(['the', 'a'], x)))
                 * 10000.0 / len(string_split(text, ' '))) / 10000 AS stop_ratio
    FROM documents
    """,
)
def q_llm_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6e: per-document stopword ratio — the classic quality-filter
    signal (Gopher rule 7 uses a 2-stopword floor; this is the dense
    ratio form). Pure codegen projection, zero shuffle.

    Float discipline: the ratio is floored at 4 dp rather than rounded
    — ratios like 1/32 land exactly on a .xxxx5 rounding boundary where
    Spark (HALF_UP) and DuckDB (HALF_EVEN) disagree; floor() of the
    identical IEEE double agrees everywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    stop_n = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    return docs.select(
        "doc_id",
        stop_n.alias("stop_n"),
        F.size(toks).alias("n_toks"),
        (F.floor(stop_n * 10000.0 / F.size(toks)) / 10000).alias("stop_ratio"),
    )


@register(
    "q_llm_word_len_hist",
    oracle="""
    SELECT length(w) AS wlen, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY 1
    """,
)
def q_llm_word_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6f: corpus word-length histogram — the cheapest corpus-health
    fingerprint (tokenizer drift and boilerplate injection both move
    it). One explode + one partial-agg shuffle of (len, count) ints."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .groupBy(F.length("w").alias("wlen"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_llm_dedup_prefix",
    oracle="""
    SELECT md5(substr(text, 1, 40)) AS prefix_hash,
           min(doc_id) AS keep_id,
           count(*)    AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def q_llm_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1b: prefix dedup — group by a digest of the first 40 chars.
    Catches template/boilerplate families that exact whole-text dedup
    misses (same preamble, differing tails) at identical cost: the
    shuffle carries 16-byte digests, never documents. The near-dup
    ladder (MinHash, SimHash, SemDeDup) sits next door for the rest."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("prefix_hash", F.md5(F.substring("text", 1, 40)))
        .groupBy("prefix_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q_fn_regexp",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'sp\\w+')) AS n_sp,
           regexp_extract(text, 'sp\\w+')          AS first_sp
    FROM documents
    """,
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1b: regular-expression functions — extract-all count + first
    match per document (both engines: RE2-compatible ASCII \\w, empty
    string on no match). Pure codegen projection, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"sp\w+"), F.lit(0))).alias("n_sp"),
        F.regexp_extract("text", r"sp\w+", 0).alias("first_sp"),
    )


@register(
    "q_multimodal_decode",
    oracle="""
    WITH imgs AS (SELECT i, 16 + (i % 4) * 8 AS w, 12 + (i % 3) * 8 AS h
                  FROM range(30) t(i)),
         sums AS (SELECT i,
                         CAST(sum((x * 3 + y * 7 + c * 31 + i * 13) % 256)
                              AS BIGINT) AS s
                  FROM imgs
                  CROSS JOIN range(40) xs(x)
                  CROSS JOIN range(28) ys(y)
                  CROSS JOIN range(3) cs(c)
                  WHERE x < w AND y < h AND i % 5 <= 2
                  GROUP BY i)
    SELECT imgs.i AS media_id, imgs.w AS width, imgs.h AS height,
           COALESCE(sums.s, -1) AS px_sum
    FROM imgs LEFT JOIN sums ON imgs.i = sums.i
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10b: REAL image decoding, distributed — deterministic
    BMP/PPM/PNG/GIF/JPEG payloads (synthesize_images: every codec
    implemented from scratch in operators/multimodal.py + jpeg.py, no
    image library in the environment) stream through the mapInPandas
    decode path and come back as per-image features.

    FULL constructive oracle (round 8, VERDICT r7 task #2): the graded
    payloads use the ``arith=True`` closed-form pixels, so the oracle
    restates — WITHOUT decoding anything — the exact (width, height)
    of every image from the generator arithmetic, plus the exact int64
    channel-byte sum for the three LOSSLESS codecs (bmp/ppm/png: the
    encoders rotate i % 5, losslessness means decoded == generated, so
    the sum is Σ (x·3+y·7+c·31+i·13) mod 256 over the pixel grid,
    computed in SQL by a bounded 40×28×3 range cross-join). GIF is
    palette-quantized and JPEG lossy, so their checksums grade as the
    -1 sentinel — but their ROWS still grade: a crashed Huffman parse
    or a wrong SOF dimension quarantines/mis-sizes the row and breaks
    the hash. The float means stay in the operator output for users;
    the graded projection is integer-only (cross-engine discipline).
    Codec exactness beyond this is pinned by round-trip/adversarial
    tests in tests/test_multimodal.py."""
    from novlake_spark.operators.multimodal import (
        decode_image_stdlib,
        synthesize_images,
    )

    media = synthesize_images(spark, n=30, arith=True)
    feats = decode_image_stdlib(media)
    fmts = media.select("media_id", F.col("meta.format").alias("_fmt"))
    out = feats.join(fmts, "media_id").select(
        "media_id",
        "width",
        "height",
        F.when(F.col("_fmt").isin("bmp", "ppm", "png"), F.col("px_sum"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("px_sum"),
    )
    return _cache_before_sort(out).orderBy("media_id")


@register(
    "q_multimodal_phash_planted",
    oracle="""
    WITH bits AS (
      SELECT i, r*8 + j AS p,
             CASE WHEN (i + 8*r + j) % 3 = 0 THEN 1 ELSE 0 END AS b
      FROM range(40) t(i) CROSS JOIN range(8) rs(r) CROSS JOIN range(8) js(j)
    ),
    v AS (
      SELECT i,
             CAST(sum(CASE WHEN p > 0 AND b = 1
                           THEN (CAST(1 AS BIGINT) << (63 - p))
                           ELSE 0 END) AS BIGINT) AS low,
             max(CASE WHEN p = 0 THEN b END) AS msb
      FROM bits GROUP BY i
    )
    SELECT i AS media_id,
           CASE WHEN msb = 1 THEN low + (-9223372036854775807 - 1)
                ELSE low END AS dhash
    FROM v
    """,
)
def q_multimodal_phash_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10g (round 11): the perceptual-hash pipeline hash-graded — the
    planted-FULL discipline (L2f/L2g) applied to the image family. The
    REAL path runs end to end: lossless encode (rotating bmp/ppm/png
    from-scratch codecs) → decode → ITU-R 601 luma → 8×9 bilinear
    resample → 64-bit dHash — but the inputs are staircase images
    whose every gradient sign is the arithmetic predicate
    ``(i + 8r + j) % 3 == 0`` (operators/multimodal.py:
    synthesize_phash_planted documents why each pipeline stage
    preserves it exactly). The oracle restates the 64-bit hash as pure
    SQL bit arithmetic — MSB handled by two's-complement into int64 —
    so a codec regression, a luma-coefficient drift, a resample
    off-by-one, or a bit-packing order bug each flips the hash. The
    general random-image key stays weak-by-design as L10d with
    Hamming-LSH recall tests."""
    from novlake_spark.operators.multimodal import (
        phash_images,
        synthesize_phash_planted,
    )

    media = synthesize_phash_planted(spark, n=40)
    return phash_images(media).select("media_id", "dhash")


@register("q_multimodal_phash", weak=True)  # WEAK: pixel hashes have no SQL oracle
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10d (round 6): perceptual image fingerprints — the image twin
    of MinHash dedup: decode (all five from-scratch codecs) → luma →
    8×9 bilinear downsample → 64-bit dHash, 8 bytes per image leaving
    the task. Near-dup PAIRING composes via Hamming LSH
    (operators/multimodal.phash_near_dup_pairs: 16-bit bands give
    pigeonhole-guaranteed recall ≤3 bits, JVM bit_count verification) —
    recall/separation pinned by planted-duplicate tests in
    tests/test_multimodal.py. Rows-only grade: pixel hashes have no
    cross-engine SQL oracle; deterministic across runs (seeded
    synthesis, deterministic codecs + kernel)."""
    from novlake_spark.operators.multimodal import phash_images, synthesize_images

    media = synthesize_images(spark, n=30)
    return _cache_before_sort(phash_images(media)).orderBy("media_id")


@register("q_multimodal_phash_clusters", weak=True)  # WEAK: pixel hashes, no SQL oracle
def q_multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10f (round 6): image near-dup CLUSTERS — the step between
    detection and deletion: dHash pairs (Hamming LSH + bit_count
    verification) feed the SoCC'14 two-phase connected components, so
    transitive near-dups (a≈b≈c with a,c outside each other's radius)
    collapse into ONE cluster with the min-id canonical — exactly the
    keep-one-per-cluster input an image dedup pass deletes against.
    Same composition shape as q_llm_dup_components over MinHash pairs;
    clusters here are planted-tested over a chained-perturbation
    fixture in tests/test_multimodal.py. Deterministic; rows-only.
    Round 7 (VERDICT r6 wrong #1): ``members`` is emitted as a
    comma-joined STRING — the q_agg_collect stringify discipline
    (aggregates.py) — because the driver's canonicalizer cannot hash
    array-typed cells (pandas sort_values → unhashable ndarray)."""
    from novlake_spark.operators.graph import connected_components
    from novlake_spark.operators.multimodal import (
        phash_images,
        phash_near_dup_pairs,
        synthesize_images,
    )

    hashes = phash_images(synthesize_images(spark, n=30))
    # 8 bands: pigeonhole guarantees recall for pairs ≤ 7 bits apart and
    # tools/phash_tier.py measures 0.99 at the d=10 radius used here —
    # the 4-band default was 0.72 at d=10 (ANN_TIER.json "phash")
    pairs = phash_near_dup_pairs(hashes, max_distance=10, num_bands=8)
    comp = connected_components(
        hashes.select(F.col("media_id").alias("id")),
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
    )
    return (
        comp.groupBy(F.col("component_id").alias("cluster_rep"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("members"),
        )
        .orderBy("cluster_rep")
    )


@register(
    "q_multimodal_audio",
    oracle="""
    SELECT i AS media_id,
           CASE WHEN i % 2 = 0 THEN 'wav' ELSE 'aiff' END AS container,
           8000 AS sample_rate,
           CAST(8 * (120 + (i * 37) % 400) AS BIGINT) AS n_samples,
           120 + (i * 37) % 400 AS duration_ms
    FROM range(24) t(i)
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10e (round 6): REAL audio feature extraction, distributed —
    completes the graded modality triple (image decode, video decode,
    audio features): alternating WAV (stdlib wave) and AIFF (the
    from-scratch FORM/80-bit-extended writer) payloads stream through
    the container-agnostic mapInPandas path and come back with the
    standard cheap curation signals.

    FULL constructive oracle (round 8, VERDICT r7 task #2): the
    generator arithmetic states container (i alternates wav/aiff),
    sample rate (8000 — through the AIFF 80-bit-extended decode path!),
    sample count (8000·dur_ms/1000 = 8·dur_ms, an exact integer), and
    duration, all without parsing a byte: a wrong 80-bit exponent, a
    truncated SSND chunk, or a WAV frame-count bug breaks the hash.
    The spectral features stay in the operator output — rFFT dominant
    frequency recovers the synthesized tone within one bin and
    zero-crossings are integer-exact, both pinned by pytest — but they
    depend on IEEE sin/argmax behavior near bin boundaries, which has
    no cross-engine SQL restatement, so the graded projection carries
    the container-arithmetic columns only."""
    from novlake_spark.operators.multimodal import audio_features, synthesize_audio

    media = synthesize_audio(spark, n=24)
    return _cache_before_sort(
        audio_features(media).select(
            "media_id", "container", "sample_rate", "n_samples", "duration_ms"
        )
    ).orderBy("media_id")


@register(
    "q_multimodal_video",
    oracle="""
    WITH v AS (SELECT i, 48 + (i % 3) * 16 AS w, 32 + (i % 2) * 16 AS h,
                      4 + (i % 3) * 2 AS fps
               FROM range(6) t(i)),
         f AS (SELECT unnest([0, 2, 4, 6]) AS frame_idx)
    SELECT v.i AS media_id, f.frame_idx,
           CAST(floor(f.frame_idx * 1000.0 / v.fps) AS INT) AS frame_ms,
           v.w AS width, v.h AS height
    FROM v CROSS JOIN f
    """,
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10c: REAL video decoding, distributed — MJPEG-in-AVI payloads
    (synthesize_videos: RIFF container written and parsed from scratch
    in operators/multimodal.py, frames through the from-scratch JPEG
    codec) stream through mapInPandas and come back as per-sampled-frame
    features (every 2nd frame — the training-pipeline sampling knob).

    FULL constructive oracle (round 8, VERDICT r7 task #2): the
    generator arithmetic states, per video, the frame geometry
    (w = 48+(i%3)·16, h = 32+(i%2)·16), the sampled frame indices
    (every 2nd of 8 → 0,2,4,6 — grading the sampling knob itself), and
    each frame's timestamp floor(idx·1000/fps) with fps = 4+(i%3)·2 —
    so a mis-parsed RIFF header, a dropped MJPEG frame, an off-by-one
    in the sampler, or a wrong SOF dimension in any of the 24 decoded
    frames breaks rows or hash, without the oracle touching a byte of
    AVI. Frame pixels are JPEG-lossy → mean_intensity stays in the
    operator output but out of the graded projection; pixel parity is
    pinned by tests/test_multimodal.py."""
    from novlake_spark.operators.multimodal import (
        decode_video_frames,
        synthesize_videos,
    )

    media = synthesize_videos(spark, n=6)
    return _cache_before_sort(
        decode_video_frames(media, every_n=2)
        .select("media_id", "frame_idx", "frame_ms", "width", "height")
    ).orderBy("media_id", "frame_idx")


@register(
    "q_html_extract",
    oracle="""
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
               || ' Contact: a & b — end' AS extracted
    FROM documents
    ORDER BY doc_id
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L41: HTML → text extraction, the first stage of a crawl pipeline —
    with a FULL oracle for a real parser. Deterministic pages are built
    around each fixture document JVM-side (title/style/script, site
    chrome, entity-escaped body, named + numeric charrefs), then the
    stdlib-html.parser extractor (operators/htmltext.py) strips the
    boilerplate channel structurally and decodes entities. The DuckDB
    oracle reconstructs the expected text by pure concatenation:
    extract ∘ wrap == identity on content while nav/header/footer/
    script/style/form text must vanish — any boilerplate leak or
    entity miss breaks the hash."""
    from novlake_spark.operators.htmltext import (
        extract_html_text,
        wrap_documents_html,
    )

    # ensure_parallelism (round 11, guide §2.5): the one-row-group scan
    # otherwise runs the html.parser ArrowEvalPython on a single core.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    pages = wrap_documents_html(docs)
    return _cache_before_sort(
        extract_html_text(pages).select("doc_id", "extracted")
    ).orderBy("doc_id")


@register(
    "q_url_canonicalize",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
             || '://www.example-' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             || CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 1 THEN ':80'
                     WHEN doc_id % 3 = 1 THEN ':8080'
                     ELSE '' END
             || '/Path/' || CAST(doc_id AS VARCHAR)
             || '/index.html?a=1&b=2&id=' || CAST(doc_id AS VARCHAR) AS canonical,
           'example-' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain
    FROM documents
    ORDER BY doc_id
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L42: URL canonicalization — the pre-fetch dedup key of a crawl
    pipeline, with a FULL oracle by construction. Deterministically
    dirty URLs (uppercase scheme/host, default AND non-default ports,
    utm_ tracking params, unsorted query, fragment) are synthesized
    from doc_id JVM-side; canonical_url must lowercase scheme+host,
    drop http:80 but KEEP https:80 and :8080, strip utm_*, SORT the
    remaining params and drop the fragment — the DuckDB oracle states
    the expected canonical string directly by the same arithmetic, so
    any rule the canonicalizer gets wrong breaks the hash. Pure
    codegen (parse_url + array HOFs), zero Python, zero extra
    shuffle."""
    from novlake_spark.operators.urls import canonical_url, registered_domain

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":80"))
        .when(F.col("doc_id") % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Path/"), d, F.lit("/index.html"),
        F.lit("?utm_source=feed&id="), d, F.lit("&b=2&a=1"),
        F.lit("#sec"), d,
    )
    urls = docs.select("doc_id", dirty.alias("url"))
    return urls.select(
        "doc_id",
        canonical_url(F.col("url")).alias("canonical"),
        registered_domain(F.lower(F.parse_url(F.col("url"), F.lit("HOST")))).alias("domain"),
    ).orderBy("doc_id")


@register(
    "q_warc_extract",
    oracle="""
    SELECT doc_id,
           200 AS status,
           'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
             || CASE WHEN doc_id % 2 = 1 THEN ' café – fin' ELSE '' END
             AS extracted
    FROM documents
    ORDER BY doc_id
    """,
)
def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L43: WARC ingestion end-to-end — the format the web arrives in
    (CommonCrawl's container), with a FULL oracle by construction.

    The chain is the real crawl pipeline: documents are wrapped into
    HTML pages and packed into gzip-per-record WARC blobs (one blob
    per 50 docs, built DISTRIBUTED via applyInPandas — deterministic
    bytes: fixed WARC-Date, mtime=0 gzip), then operators/warc.py
    parses record framing + embedded HTTP responses, the Content-Type
    charset selects the body decoder (even docs utf-8, odd docs
    iso-8859-1 with a real 0xE9 é byte AND a &#8211; charref — both
    decode layers proven), the html.parser extractor strips the chrome,
    and doc_id is recovered from WARC-Target-URI. The DuckDB oracle
    states the expected text by concatenation; any framing, charset,
    HTTP or extraction error breaks the hash.

    Scale shape: one WARC blob = one task (records never split);
    the only exchange is the doc→blob grouping that EXISTS to create
    blobs — a real crawl reads blobs straight off the lake with zero
    shuffle before this point."""
    import html as _html

    import pandas as pd  # noqa: F401

    from novlake_spark.operators.warc import encode_warc_record, read_warc_html_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf):
        blob = b""
        srt = pdf.sort_values("doc_id")
        for i, text in zip(srt["doc_id"], srt["text"]):
            i = int(i)
            esc = _html.escape(str(text))
            extra = "<p>café &#8211; fin</p>" if i % 2 else ""
            page = (
                f"<html><body><nav>Home | <a href='/l'>Login</a></nav>"
                f"<main><h1>Doc {i}</h1><p>{esc}</p>{extra}</main>"
                f"<footer>&copy; 2026</footer></body></html>"
            )
            charset = "iso-8859-1" if i % 2 else "utf-8"
            blob += encode_warc_record(
                f"http://ex.com/doc/{i}",
                200,
                f"text/html; charset={charset}",
                page.encode(charset),
                record_id=f"urn:example:{i}",
            )
        import pandas as _pd

        return _pd.DataFrame({"warc": [blob]})

    blobs = _blob_buckets(docs, spark).groupBy("bucket").applyInPandas(
        build, schema="warc binary"
    )
    # Fused WARC-parse → HTML-extract (round 12, guide §4.1): one
    # mapInPandas, the page text crosses the Python boundary once.
    extracted = read_warc_html_text(blobs)
    return _cache_before_sort(
        extracted.select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
            F.col("status"),
            "extracted",
        )
    ).orderBy("doc_id")


@register(
    "q_robots_filter",
    oracle="""
    SELECT doc_id,
           'www.example-' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
           (doc_id % 7) % 3 <> 0 AS allowed
    FROM documents
    ORDER BY doc_id
    """,
)
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L44: robots.txt politeness filtering — crawl-frontier admission,
    with a FULL oracle by construction. Each of the 7 synthetic domains
    gets a deterministic robots.txt exercising real rule semantics:
    domain%3==0 adds `Disallow: /Path/` (our URLs blocked), %3==1 has
    `Allow: /Path/` BEFORE `Disallow: /` (allowed only because the
    stdlib parser honors order-of-appearance — a longest-match
    implementation would also allow, but a naive first-Disallow scan
    would not), %3==2 disallows only /private/. The stdlib
    urllib.robotparser evaluates can_fetch per URL with per-batch
    memoized parsing; the oracle states expected admission by the same
    arithmetic. The robots side joins un-hinted (per-domain, bounded
    by frontier domain count — AQE's decision)."""
    from novlake_spark.operators.urls import robots_filter

    # ensure_parallelism (round 11, guide §2.5): the can_fetch UDF runs
    # scan-side; single-split input serialized it.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://www.example-"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/Path/"),
            F.col("doc_id").cast("string"),
            F.lit("/index.html"),
        ).alias("url"),
        F.concat(
            F.lit("www.example-"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ).alias("domain"),
    )
    rows = []
    for d in range(7):
        txt = "User-agent: *\nDisallow: /private/\n"
        if d % 3 == 0:
            txt += "Disallow: /Path/\n"
        elif d % 3 == 1:
            txt += "Allow: /Path/\nDisallow: /\n"
        rows.append((f"www.example-{d}.com", txt))
    robots = spark.createDataFrame(rows, "domain string, robots_txt string")
    return _cache_before_sort(
        robots_filter(urls, robots).select("doc_id", "domain", "allowed")
    ).orderBy("doc_id")


@register(
    "q_crawl_linkgraph",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents)
    SELECT doc_id AS src, doc_id % 7 AS dst,
           'hub ' || CAST(doc_id % 7 AS VARCHAR) AS anchor
    FROM d
    UNION ALL
    SELECT doc_id, doc_id + 1, 'next ' || CAST(doc_id + 1 AS VARCHAR) FROM d
    UNION ALL
    SELECT doc_id, (doc_id * 3) % 11, 'rel ' || CAST((doc_id * 3) % 11 AS VARCHAR)
    FROM d
    """,
)
def q_crawl_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L74 (round 11): link-graph extraction — the crawl-frontier /
    web-graph construction stage between HTML fetch and PageRank
    (GR1): parse every page's anchors with the REAL html.parser link
    collector (operators/htmltext.py:extract_links — attribute access,
    charref decode, nested-anchor depth discipline; never regex),
    keep in-site /doc/ links (the nav /login chrome must be excluded
    by the href filter), and emit (src, dst, anchor) edges.

    FULL oracle by construction (the L41 wrap∘extract discipline):
    pages carry outlinks that are pure doc_id arithmetic — hub d%7,
    next d+1 (dangling at the corpus edge, as real crawls are), rel
    3d%11 — so DuckDB restates the exact edge list without parsing
    anything; any parser miss (attribute, entity, anchor-text
    whitespace) or filter leak breaks the hash. All values exact
    integers/strings.

    Scale shape: parse is per-page and shuffle-free (Arrow batches;
    only (href, anchor) pairs leave the stage, never page bytes —
    the phash projection discipline applied to HTML); the edge list
    needs NO exchange at all here (no dedup/agg in this stage — graph
    analytics downstream shuffle on the packed edge key, GR1/GR2).
    One blob = one task, the CommonCrawl unit."""
    from novlake_spark.operators.htmltext import (
        extract_html_links,
        wrap_documents_html_links,
    )

    # ensure_parallelism (round 11, guide §2.5): single-split scan would
    # serialize the link-collector ArrowEvalPython.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    pages = wrap_documents_html_links(docs)
    return (
        extract_html_links(pages)
        .filter(F.col("href").startswith("/doc/"))
        .select(
            F.col("doc_id").alias("src"),
            F.substring("href", 6, 20).cast("long").alias("dst"),
            "anchor",
        )
    )


@register(
    "q_crawl_anchor_text",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    e AS (
      SELECT doc_id % 7 AS dst, 'hub ' || CAST(doc_id % 7 AS VARCHAR) AS anchor
      FROM d
      UNION ALL
      SELECT doc_id + 1, 'next ' || CAST(doc_id + 1 AS VARCHAR) FROM d
      UNION ALL
      SELECT (doc_id * 3) % 11, 'rel ' || CAST((doc_id * 3) % 11 AS VARCHAR)
      FROM d
    ),
    c AS (SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n_links
          FROM e GROUP BY dst, anchor),
    r AS (SELECT dst, anchor, n_links,
                 row_number() OVER (PARTITION BY dst
                                    ORDER BY n_links DESC, anchor) AS rk
          FROM c)
    SELECT dst, anchor, n_links, rk FROM r WHERE rk <= 3
    """,
)
def q_crawl_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L75 (round 11): inbound anchor-text consolidation — for every
    link TARGET, the top-3 most frequent anchor surface forms with
    their counts. The web-corpus trick of using what OTHER pages call
    a document as a high-precision description of it (the signal
    behind anchor-text retrieval and WebText-lineage quality
    filtering); composes the L74 link-graph parse with a frequency
    top-k per target.

    Exactness: counts are exact BIGINTs and the per-target rank orders
    by (n_links DESC, anchor ASC) over rows whose (dst, anchor) is
    unique after the count — a total order, so row_number cuts the
    same top-3 in both engines. Oracle restates the planted arithmetic
    edges (L74's construction) and applies the same relational
    consolidation; the Spark side parses real HTML.

    Scale shape: the count aggregates on the FINE (dst, anchor)
    composite with map-side partial aggregation, so a hub target whose
    inlinks all carry one anchor string collapses to one row per
    mapper before the exchange — the collect-the-anchors formulation
    this key deliberately avoids would ship every hub inlink to one
    reducer (the L34 mode-vs-collect lesson). The rank window then
    runs per dst over ≤ distinct-anchor rows (small by construction
    of the consolidation). Parse stage identical to L74: per-page,
    zero exchanges, only (href, anchor) pairs leave."""
    from novlake_spark.operators.htmltext import (
        extract_html_links,
        wrap_documents_html_links,
    )

    # ensure_parallelism (round 11, guide §2.5): same rationale as L74.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    edges = (
        extract_html_links(wrap_documents_html_links(docs))
        .filter(F.col("href").startswith("/doc/"))
        .select(
            F.substring("href", 6, 20).cast("long").alias("dst"),
            "anchor",
        )
    )
    counts = edges.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("dst", "anchor", "n_links", "rk")
    )


@register(
    "q_crawl_pipeline",
    oracle="""
    WITH admitted AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) + 2 AS n_tokens
        FROM documents
        WHERE (doc_id % 7) % 3 <> 0
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
             || '://www.example-' || CAST(doc_id % 7 AS VARCHAR) || '.com'
             || CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 1 THEN ':80'
                     WHEN doc_id % 3 = 1 THEN ':8080'
                     ELSE '' END
             || '/Path/' || CAST(doc_id AS VARCHAR)
             || '/index.html?a=1&b=2&id=' || CAST(doc_id AS VARCHAR) AS url,
           'www.example-' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
           n_tokens
    FROM admitted
    WHERE n_tokens >= 40
    ORDER BY doc_id
    """,
)
def q_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L45: the composite crawl pipeline — every round-5 stage chained
    into ONE Catalyst plan with ONE constructive oracle:

      frontier:  dirty URL synth → canonical_url (L42 codegen) +
                 robots.txt admission (L44, order-of-appearance rules —
                 domains ≡ 0 (mod 3) drop out here, BEFORE any fetch)
      fetch:     admitted docs packed into gzip-per-record WARC blobs,
                 distributed (L43)
      extract:   WARC parse → HTTP → html.parser boilerplate strip
                 (L41), doc_id recovered from WARC-Target-URI (the
                 canonical URL — round-tripped through the container)
      curate:    token-count quality gate on the EXTRACTED text
                 (codegen split/size — the Gopher-style length rule)

    The oracle recomputes the surviving set and every output column by
    pure arithmetic: a fault in ANY stage — a canonicalization rule, a
    robots verdict, WARC framing, charset, extraction, tokenization, or
    the gate — changes the rows or the hash. This is the user-facing
    promise of the repo: CommonCrawl-shaped bytes to a curated corpus
    in one declarative pipeline."""
    import html as _html

    import pandas as _pd

    from novlake_spark.operators.urls import canonical_url, robots_filter
    from novlake_spark.operators.warc import encode_warc_record, read_warc_html_text

    # ensure_parallelism (round 11, guide §2.5): canonical_url + the
    # robots admission UDF run BEFORE the blob-bucket exchange — on the
    # one-row-group scan they were single-task.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    d = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example-"), (F.col("doc_id") % 7).cast("string"), F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":80"))
        .when(F.col("doc_id") % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Path/"), d, F.lit("/index.html"),
        F.lit("?utm_source=feed&id="), d, F.lit("&b=2&a=1"),
        F.lit("#sec"), d,
    )
    frontier = docs.select(
        "doc_id",
        "text",
        canonical_url(dirty).alias("url"),
        F.concat(
            F.lit("www.example-"), (F.col("doc_id") % 7).cast("string"), F.lit(".com")
        ).alias("domain"),
    )
    rules = []
    for k in range(7):
        txt = "User-agent: *\nDisallow: /private/\n"
        if k % 3 == 0:
            txt += "Disallow: /Path/\n"
        elif k % 3 == 1:
            txt += "Allow: /Path/\nDisallow: /\n"
        rules.append((f"www.example-{k}.com", txt))
    robots = spark.createDataFrame(rules, "domain string, robots_txt string")
    admitted = robots_filter(frontier, robots).filter(F.col("allowed"))

    def build(pdf: _pd.DataFrame) -> _pd.DataFrame:
        blob = b""
        srt = pdf.sort_values("doc_id")
        for i, text, url in zip(srt["doc_id"], srt["text"], srt["url"]):
            page = (
                f"<html><body><nav>Home</nav><main><h1>Doc {int(i)}</h1>"
                f"<p>{_html.escape(str(text))}</p></main>"
                f"<footer>&copy; 2026</footer></body></html>"
            )
            blob += encode_warc_record(
                str(url), 200, "text/html; charset=utf-8",
                page.encode("utf-8"), record_id=f"urn:example:{int(i)}",
            )
        return _pd.DataFrame({"warc": [blob]})

    blobs = _blob_buckets(admitted, spark).groupBy("bucket").applyInPandas(
        build, schema="warc binary"
    )
    # Fused WARC-parse → HTML-extract (round 12, guide §4.1): one
    # mapInPandas, the page text crosses the Python boundary once.
    pages = read_warc_html_text(blobs)
    curated = pages.select(
        F.regexp_extract("target_uri", r"/Path/(\d+)/", 1).cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.lower(F.parse_url("target_uri", F.lit("HOST"))).alias("domain"),
        F.size(F.split("extracted", " ")).alias("n_tokens"),
    )
    return _cache_before_sort(curated.filter(F.col("n_tokens") >= 40)).orderBy(
        "doc_id"
    )


@register("q_llm_compress_ratio", weak=True)  # WEAK: DuckDB has no DEFLATE
def q_llm_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L46: zlib compression ratio — the FineWeb/Gopher quality signal
    that no token statistic replicates: templated/repetitive text
    compresses far below natural prose, gibberish barely compresses.
    deflated_len/raw_len at fixed level 6, deterministic byte-for-byte,
    so rows-only grading is backed by exactness tests (pytest pins
    determinism, planted-document ordering repetitive < natural <
    random, and null/empty handling). One Arrow-batched pandas UDF,
    zero shuffle — per-document CPU exactly like the other quality
    signals it joins in the curation gate."""
    from novlake_spark.operators.text import compression_ratio_udf

    # ensure_parallelism (round 11, guide §2.5): single-split scan would
    # serialize the DEFLATE pass.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ratio = compression_ratio_udf()
    return _cache_before_sort(
        docs.select("doc_id", ratio(F.col("text")).alias("compress_ratio"))
    ).orderBy("doc_id")


@register(
    "q_sitemap_parse",
    oracle="""
    SELECT (doc_id % 7) AS site,
           'https://www.example-' || CAST(doc_id % 7 AS VARCHAR)
             || '.com/doc/' || CAST(doc_id AS VARCHAR) AS loc,
           '2026-0' || CAST(1 + doc_id % 9 AS VARCHAR) || '-01' AS lastmod
    FROM documents
    ORDER BY site, loc
    """,
)
def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L47: sitemap XML parsing — the crawl frontier's seed list and the
    repo's XML format family (JSON/CSV/Parquet/HTML/WARC already have
    graded parsers). One sitemap document is synthesized per site
    (urlset with namespaced <url><loc><lastmod> entries, an XML
    comment, and an entity reference in an ignored field — parser
    noise, not regex food), assembled DISTRIBUTED via collect_list over
    per-site groups, parsed back with stdlib ElementTree inside one
    Arrow-batched pandas UDF, and exploded to frontier rows. FULL
    constructive oracle: the expected (site, loc, lastmod) rows follow
    from doc_id arithmetic; a namespace, nesting or entity mistake
    breaks the hash."""
    from novlake_spark.operators.urls import parse_sitemap_udf

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    site = (F.col("doc_id") % 7).alias("site")
    entry = F.concat(
        F.lit("<url><loc>https://www.example-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com/doc/"), d, F.lit("</loc><lastmod>2026-0"),
        (1 + F.col("doc_id") % 9).cast("string"),
        F.lit("-01</lastmod><priority>0.5</priority></url>"),
    )
    sitemaps = (
        docs.select(site, entry.alias("entry"), "doc_id")
        .groupBy("site")
        .agg(F.array_join(F.array_sort(F.collect_list("entry")), "").alias("body"))
        .select(
            "site",
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    "<!-- generated seed list: &amp; entities are the parser's job -->"
                    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.col("body"),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    parse = parse_sitemap_udf()
    parsed = sitemaps.select("site", F.explode(parse(F.col("xml"))).alias("e"))
    return _cache_before_sort(
        parsed.select(
            "site", F.col("e.loc").alias("loc"), F.col("e.lastmod").alias("lastmod")
        )
    ).orderBy("site", "loc")


@register(
    "q_pdf_extract",
    oracle="""
    SELECT doc_id, 0 AS page,
           'Doc ' || CAST(doc_id AS VARCHAR) AS text
    FROM documents
    UNION ALL
    SELECT doc_id, 1 AS page, text FROM documents
    ORDER BY doc_id, page
    """,
)
def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L48: PDF text extraction — the format books and papers arrive
    in, FULL-oracle-graded. Two-page PDFs (title page + body) are
    written per document DISTRIBUTED (operators/pdftext.encode_pdf:
    correct xref, FlateDecoded content streams, escaped literals),
    then extract_pdf_text reads them back WITHOUT trusting the xref —
    tolerant linear object scan, bounded inflate, BT/ET walk,
    Tj/TJ/'/hex show-op strings with full escape handling. The oracle
    states both pages per doc by construction; any stream-framing,
    inflate, escape or show-op mistake breaks the hash. Scope honesty
    (CMap/CID/OCR excluded) is documented in the module — the
    machine-written-text case this grades is exact."""
    import pandas as _pd

    from novlake_spark.operators.pdftext import encode_pdf, extract_pdf_text

    # Round 11 (guide §4.1/§2.5): encode and extract FUSED into one
    # mapInPandas — the r10 plan chained two MapInPandas nodes, so every
    # PDF's bytes crossed JVM↔Python twice (Arrow serialize + transpose
    # each way) purely to hand the payload from the builder to the
    # parser; and the whole chain ran on the scan's single row-group
    # split. Both codec halves still execute unchanged (encode_pdf →
    # extract_pdf_text per document, same quarantine contract as
    # extract_pdf_docs); only the boundary crossings are gone.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )

    def build_and_extract(batches):
        for pdf in batches:
            out = {"doc_id": [], "page": [], "text": []}
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                try:
                    texts = extract_pdf_text(encode_pdf([f"Doc {i}", str(text)]))
                except ValueError:
                    continue  # corrupt payload: quarantine, same as extract_pdf_docs
                for page, t in enumerate(texts):
                    out["doc_id"].append(i)
                    out["page"].append(page)
                    out["text"].append(t)
            yield _pd.DataFrame(out)

    return _cache_before_sort(
        docs.mapInPandas(
            build_and_extract, schema="doc_id long, page int, text string"
        )
    ).orderBy("doc_id", "page")


@register(
    "q_pdf_cmap_extract",
    oracle="""
    SELECT doc_id, 0 AS page,
           'Doc ' || CAST(doc_id AS VARCHAR) AS text
    FROM documents
    WHERE doc_id % 4 = 0
    UNION ALL
    SELECT doc_id, 1 AS page, text FROM documents
    WHERE doc_id % 4 = 0
    ORDER BY doc_id, page
    """,
)
def q_pdf_cmap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L48b (round 6): PDF text extraction through a subset-embedded
    font's /ToUnicode CMap — how REAL machine-written PDFs encode text:
    the body page's show strings are glyph CODES in first-use order
    (what font subsetters assign), unreadable without applying the
    CMap stream's bfchar/bfrange mapping back to Unicode; the title
    page stays on the plain standard-encoding font, so one document
    also exercises Tf font SWITCHING between decoders. The same
    constructive FULL oracle as q_pdf_extract: any fault in the object
    graph walk (/Resources /Font → font object → /ToUnicode stream),
    the CMap parse, or the per-show font tracking yields mojibake and
    breaks the hash. Scale shape unchanged: one document = one task
    (mapInPandas), zero shuffle on the parse path. Round 7 (VERDICT r6
    task #7): the graded key samples ``doc_id % 4 == 0`` ON BOTH
    ENGINES — 5.45 s of the sf0.1 bench was honest per-doc
    encode+parse work, but bench cost is a budget and the plain-font
    full-corpus path is already graded by q_pdf_extract; the oracle
    stays FULL and constructive over the sampled quarter."""
    import pandas as _pd

    from novlake_spark.operators.pdftext import encode_pdf, extract_pdf_text

    # Round 11: same fuse-and-spread as q_pdf_extract (guide §4.1/§2.5)
    # — one mapInPandas, zero payload round trips, full-width tasks.
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    ).select("doc_id", "text")

    def build_and_extract(batches):
        for pdf in batches:
            out = {"doc_id": [], "page": [], "text": []}
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                try:
                    texts = extract_pdf_text(
                        encode_pdf([f"Doc {i}", str(text)], subset_font=[False, True])
                    )
                except ValueError:
                    continue  # corrupt payload: quarantine, same as extract_pdf_docs
                for page, t in enumerate(texts):
                    out["doc_id"].append(i)
                    out["page"].append(page)
                    out["text"].append(t)
            yield _pd.DataFrame(out)

    return _cache_before_sort(
        docs.mapInPandas(
            build_and_extract, schema="doc_id long, page int, text string"
        )
    ).orderBy("doc_id", "page")


@register(
    "q_tar_extract",
    oracle="""
    SELECT doc_id,
           'corpus/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
           strlen(text) AS n_bytes,
           text
    FROM documents
    ORDER BY doc_id
    """,
)
def q_tar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L49: tar-archive ingestion — the container model dumps and
    dataset releases ship in, FULL-oracle-graded. Documents are packed
    into deterministic ustar archives DISTRIBUTED (one per 50 docs,
    zeroed metadata), then operators/warc.parse_tar reads members back
    with the family guards (declared member sizes bounded BEFORE
    reading, member-count cap, non-regular members skipped, TarError →
    quarantine) and doc_id is recovered from the member path. The
    oracle states (name, byte length, text) by construction — Spark's
    octet_length and DuckDB's strlen both count UTF-8 bytes, so the
    length column is engine-exact even for non-ASCII text."""
    import pandas as _pd

    from novlake_spark.operators.warc import encode_tar, read_tar

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf: _pd.DataFrame) -> _pd.DataFrame:
        srt = pdf.sort_values("doc_id")
        members = [
            (f"corpus/doc_{int(i)}.txt", str(t).encode("utf-8"))
            for i, t in zip(srt["doc_id"], srt["text"])
        ]
        return _pd.DataFrame({"tar": [encode_tar(members)]})

    tars = _blob_buckets(docs, spark).groupBy("bucket").applyInPandas(
        build, schema="tar binary"
    )
    members = read_tar(tars)
    return _cache_before_sort(
        members.select(
            F.regexp_extract("name", r"doc_(\d+)\.txt$", 1).cast("long").alias("doc_id"),
            "name",
            F.octet_length(F.col("data").cast("string")).alias("n_bytes"),
            F.col("data").cast("string").alias("text"),
        )
    ).orderBy("doc_id")


@register(
    "q_fix_mojibake",
    oracle="""
    SELECT doc_id, text || ' café — fin' AS text
    FROM documents
    ORDER BY doc_id
    """,
)
def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L50: mojibake repair with a FULL oracle — the charset-damage
    inverse proven by construction. Real mojibake is synthesized
    JVM-side (append a non-ASCII suffix, encode UTF-8, decode
    Latin-1: 'café — fin' becomes 'cafÃ© â€” fin'), then the
    pandas-UDF repair must invert it exactly: the oracle states the
    CLEAN text, so an incorrect or incomplete repair — or one that
    corrupts the ASCII body — breaks the hash. The strict
    encode/decode guard means clean text is untouched (pinned in
    pytest alongside double-mojibake unwinding)."""
    from novlake_spark.operators.text import fix_mojibake_udf

    # ensure_parallelism (round 11, guide §2.5): single-split scan would
    # serialize the repair UDF.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    dirty = F.decode(
        F.encode(F.concat(F.col("text"), F.lit(" café — fin")), "UTF-8"),
        "ISO-8859-1",
    )
    fix = fix_mojibake_udf()
    return _cache_before_sort(
        docs.select("doc_id", fix(dirty).alias("text"))
    ).orderBy("doc_id")


@register(
    "q_zip_extract",
    oracle="""
    SELECT doc_id,
           'corpus/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
           strlen(text) AS n_bytes,
           text
    FROM documents
    ORDER BY doc_id
    """,
)
def q_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L51: ZIP-archive ingestion — tar's random-access sibling (zip
    carries a central directory + per-member DEFLATE + CRC-32, the
    layout dataset releases and HF bundles use). Same constructive
    FULL oracle as L49: documents packed into deterministic archives
    distributed, members read back with the family guards (declared
    sizes bounded, count caps, reads capped at declared+1, CRC
    verified by the reader — corruption quarantines), doc_id recovered
    from the member path. Sharing the tar oracle is deliberate: the
    two containers must agree byte-for-byte on the extracted corpus."""
    import pandas as _pd

    from novlake_spark.operators.warc import encode_zip, read_zip

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf: _pd.DataFrame) -> _pd.DataFrame:
        srt = pdf.sort_values("doc_id")
        members = [
            (f"corpus/doc_{int(i)}.txt", str(t).encode("utf-8"))
            for i, t in zip(srt["doc_id"], srt["text"])
        ]
        return _pd.DataFrame({"zip": [encode_zip(members)]})

    zips = _blob_buckets(docs, spark).groupBy("bucket").applyInPandas(
        build, schema="zip binary"
    )
    members = read_zip(zips)
    return _cache_before_sort(
        members.select(
            F.regexp_extract("name", r"doc_(\d+)\.txt$", 1).cast("long").alias("doc_id"),
            "name",
            F.octet_length(F.col("data").cast("string")).alias("n_bytes"),
            F.col("data").cast("string").alias("text"),
        )
    ).orderBy("doc_id")


def _cache_before_sort(df: DataFrame) -> DataFrame:
    """Tracked persist for a small result that is about to be globally
    sorted (round 11, guide §1.4/§5): a global ``orderBy`` plans a
    RangePartitioning exchange whose boundary-SAMPLING job executes the
    entire child plan once before the real pass — measured directly
    this round (accumulator probe: the Python stage under a plain
    orderBy processes exactly 2× its rows; with a persist in between,
    1×, and wall time drops). Every Python/codec pipeline that ends in
    a presentation sort was silently paying its scan+UDF chain twice
    per action. The persist is tracked (novlake_spark.cache), so
    bench.py and verify sweeps release it after each timed action —
    nothing survives across runs.

    Storage level (round 12, VERDICT r11 #7): MEMORY_AND_DISK in its
    SERIALIZED form, not the deserialized default — these results carry
    full extracted text/bytes payloads, and the deserialized row format
    is ~2-4× the on-wire size; serialized blocks roughly halve the
    executor-storage pressure of the double-execution fix and spill to
    disk under pressure instead of evicting. The plan shape
    (InMemoryTableScan below the sort exchange) is unchanged.
    """
    from pyspark import StorageLevel

    from novlake_spark.cache import track

    return track(df.persist(StorageLevel.MEMORY_AND_DISK))


def _blob_buckets(df, width_of) -> "DataFrame":
    """(doc_id, …) → same rows with a ``bucket`` column (doc_id DIV 50),
    explicitly hash-repartitioned on it at cluster width (round 11,
    guide §2.2/§2.5): the archive keys' ``groupBy(bucket).applyInPandas``
    grouping exchange carries only ~KBs at bench SF, so AQE's
    partition coalescing legally shrank it to ~1 post-shuffle partition
    — and the ENTIRE build→parse→extract Python chain downstream
    inherited that width and ran serially. A user-specified repartition
    width is exempt from coalescing; FlatMapGroupsInPandas reuses the
    hash partitioning (no second exchange). Width = defaultParallelism,
    a cluster-derived knob — on a real cluster the same expression
    yields full width, so this is not a local[32] constant.
    """
    width = width_of.sparkContext.defaultParallelism
    return df.withColumn(
        "bucket", (F.col("doc_id") / 50).cast("long")
    ).repartition(width, "bucket")


def _cdc_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, text, s, e) chunk spans per the CDC boundary spec —
    shared derivation for q_llm_cdc_chunks (span/signature listing) and
    q_llm_cdc_dedup (cross-document duplicate-chunk stats)."""
    d = docs.select("doc_id", "text", F.char_length("text").alias("n"))
    pos = d.select(
        "doc_id",
        "text",
        "n",
        F.explode(
            F.when(F.col("n") >= 8, F.sequence(F.lit(8), F.col("n"))).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("i"),
    )
    u = F.conv(
        F.substring(F.md5(F.expr("substring(text, i - 7, 8)")), 1, 8), 16, 10
    ).cast("long")
    # Round 11 (guide §2.3/§5): the boundary table feeds BOTH the lag
    # window (c1) and the per-doc max aggregate (mb); unpersisted, the
    # rolling-hash subtree — one JVM md5 per character position, the
    # dominant cost of both CDC keys — executed twice per action.
    # Round 12 (ADVICE r11 on the O(Σ len²/64) text duplication in this
    # cache): both narrow-cache restructures were built and MEASURED
    # slower at sf0.1 before rejecting them — (a) per-doc boundary
    # arrays (collect_list + transform/explode, no window, no persist):
    # 1.12→1.55 s chunks / 1.42→1.62 s dedup; (b) narrow (doc_id, i)
    # persist + one text re-join: 1.17→1.87 / 1.22→1.58 same-window
    # min-of-4 — the extra text exchange+sort costs more than the wide
    # cache saves at any SF where the cache fits. Kept the fast shape;
    # the storage concern is bounded instead by persisting SERIALIZED
    # (≈2-4× smaller than deserialized rows, spills to disk under
    # pressure), and released per action like every tracked persist.
    from pyspark import StorageLevel

    from novlake_spark.cache import track

    b = track(
        pos.filter(u % 64 == 0)
        .select("doc_id", "text", "i")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    c1 = b.select(
        "doc_id",
        "text",
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("s"),
        F.col("i").alias("e"),
    )
    mb = b.groupBy("doc_id").agg(F.max("i").alias("mb"))
    tl = (
        d.join(mb, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            (F.coalesce(F.col("mb"), F.lit(0)) + 1).alias("s"),
            F.col("n").alias("e"),
        )
        .filter(F.col("e") >= F.col("s"))
    )
    return c1.unionByName(tl)


_CDC_SPANS_CTE = """
    d AS (SELECT doc_id, text, len(text) AS n FROM documents),
    pos AS (SELECT doc_id, text, n, unnest(range(8, n + 1)) AS i FROM d),
    b AS (SELECT doc_id, text, i FROM pos
          WHERE CAST(('0x' || substring(md5(substring(text, CAST(i - 7 AS INT), 8)), 1, 8))
                     AS BIGINT) % 64 = 0),
    c1 AS (SELECT doc_id, text,
                  coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
                  i AS e
           FROM b),
    tl AS (SELECT d.doc_id, d.text, coalesce(mb.mb, 0) + 1 AS s, d.n AS e
           FROM d LEFT JOIN (SELECT doc_id, max(i) AS mb FROM b GROUP BY doc_id) mb
             USING (doc_id)
           WHERE d.n >= coalesce(mb.mb, 0) + 1),
    alls AS (SELECT * FROM c1 UNION ALL SELECT * FROM tl)
"""


@register(
    "q_llm_cdc_chunks",
    oracle=f"""
    WITH {_CDC_SPANS_CTE}
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) AS INT) AS chunk_idx,
           CAST(s AS INT) AS start_pos,
           CAST(e - s + 1 AS INT) AS chunk_len,
           substring(md5(substring(text, CAST(s AS INT), CAST(e - s + 1 AS INT))), 1, 8)
             AS chunk_sig
    FROM alls
    """,
)
def q_llm_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L66: content-defined chunking (LBFS/Rabin lineage, Muthitacharoen
    et al. SOSP'01) — split each document at positions where the hash of
    the trailing 8-char window is ≡ 0 mod 64 (expected chunk ~64 chars).
    Because boundaries depend only on LOCAL content, an edit shifts only
    the chunks it touches — the property that makes chunk-level dedup
    robust to insertions where fixed-size blocks resynchronize never.
    The chunk_sig digests feed exactly the exact-dedup path
    (q_llm_dedup_exact) at sub-document granularity: boilerplate shared
    across documents dedups even when the documents differ elsewhere.

    Engine-portable spec: the window hash is md5 of the 8-char
    substring itself (the SPEC is hash-of-window; a production Rabin
    fingerprint computes the same decision in O(1) per position — an
    implementation detail, like sort algorithms). Both engines take
    character-based substring semantics on the same UTF-8 text, so
    boundaries and signatures agree exactly. Honest scope: the
    classical min/max chunk-size clamps are SEQUENTIAL state (each
    boundary depends on the previous accept) and are deliberately out
    of the declarative spec — at 100 TB the unclamped form is also the
    parallel-friendly one (every position decides independently; one
    explode + one per-doc window).

    Plan: explode positions (bounded by chars/doc), filter to ~1/64 of
    them, one per-doc window for chunk assembly — no cross-doc shuffle
    anywhere; cost is linear in corpus bytes and embarrassingly
    parallel per document."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    spans = _cdc_spans(docs)
    iw = Window.partitionBy("doc_id").orderBy("s")
    return spans.select(
        "doc_id",
        F.row_number().over(iw).cast("int").alias("chunk_idx"),
        F.col("s").cast("int").alias("start_pos"),
        (F.col("e") - F.col("s") + 1).cast("int").alias("chunk_len"),
        F.substring(F.md5(F.expr("substring(text, s, e - s + 1)")), 1, 8).alias("chunk_sig"),
    )


@register(
    "q_llm_cdc_dedup",
    oracle=f"""
    WITH {_CDC_SPANS_CTE},
    sig AS (SELECT doc_id,
                   substring(md5(substring(text, CAST(s AS INT),
                                           CAST(e - s + 1 AS INT))), 1, 16) AS sig16,
                   CAST(e - s + 1 AS INT) AS chunk_len
            FROM alls)
    SELECT sig16, chunk_len,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST((count(*) - 1) * chunk_len AS BIGINT) AS chars_saved
    FROM sig
    GROUP BY sig16, chunk_len
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_llm_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L66b: chunk-level exact dedup — the step CDC chunking exists to
    feed. Identical chunks ACROSS documents (boilerplate headers,
    license blocks, quoted passages) are found by grouping chunk
    digests; `chars_saved` is the dedup value of each duplicated chunk
    — (copies − 1) · length. This is what chunk-granular storage dedup
    (the LBFS design) and sub-document corpus dedup actually compute;
    whole-document exact dedup (q_llm_dedup_exact) misses all of it
    when any other byte differs.

    The digest here is 16 hex chars (64 bits) rather than the display
    key's 8: at corpus scale the birthday bound on 32 bits makes
    accidental collisions plausible (≈15% odds of one somewhere at a
    mere 36 k chunks), and a collision would fuse two unrelated chunks'
    stats. Both engines compute the identical md5 prefix, so grading is
    exact either way — the width choice is semantic hygiene, and the
    (sig16, chunk_len) group key means a surviving collision would
    still need equal lengths to fuse.

    Plan: the chunk derivation (shared with q_llm_cdc_chunks), then ONE
    groupBy on the 8-byte digest — partial aggregation map-side, so the
    shuffle carries one row per distinct chunk per task, never the
    corpus. Text never shuffles: the digest is computed scan-side."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    spans = _cdc_spans(docs)
    sig = spans.select(
        "doc_id",
        F.substring(F.md5(F.expr("substring(text, s, e - s + 1)")), 1, 16).alias("sig16"),
        (F.col("e") - F.col("s") + 1).cast("int").alias("chunk_len"),
    )
    return (
        sig.groupBy("sig16", "chunk_len")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "sig16",
            "chunk_len",
            "n_docs",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("chunk_len")).cast("long").alias("chars_saved"),
        )
    )
