"""Corpus- and embedding-analytics query keys (SURVEY.md §2 L21–L24).

Round-3 additions: cross-source contamination surface (vocabulary
overlap), embedding-space QA (nearest-class-centroid confusion,
norm-distribution checks) and curriculum binning — the corpus-level
diagnostics a training-data pipeline runs *between* the per-document
filters (quality/langid/dedup) and the final mix/pack stages.

Cross-engine float discipline (what makes these FULL oracles): every
vector reduction is a LEFT-TO-RIGHT sequential fold in both engines
(`F.aggregate` here, `list_reduce` in DuckDB), so the IEEE sums are
bit-identical; centroid components are rounded to 6 decimals on both
sides before any distance math so aggregation-order noise in `avg`
can't leak into the argmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from novlake_spark.operators.numerics import grid
from novlake_spark.registry import register
from novlake_spark.sources.tables import ensure_parallelism, load_table


@register(
    "q_llm_source_overlap",
    oracle="""
    WITH v AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM v GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.source = src_a
               JOIN sizes sb ON sb.source = src_b
    """,
)
def q_llm_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21: pairwise source-vocabulary Jaccard — the corpus-level
    contamination/redundancy surface ("how much does crawl A share with
    crawl B?") that decides which sources are worth deduplicating
    against each other before the expensive document-level passes.

    Scale shape: the expensive object is the distinct (source, token)
    vocabulary — tokens stream through codegen once and the `distinct`
    collapses map-side before its single exchange, so the shuffle
    carries the vocabulary, never the corpus. The token self-join then
    keys on vocabulary terms; a term present in S sources yields
    C(S,2) pairs, bounded by the (tiny) source count squared — no
    quadratic blowup in documents. Union sizes come from
    inclusion–exclusion (|A∪B| = |A|+|B|−|A∩B|) off a broadcast
    per-source size table, so no second corpus pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes).alias("sa")
    sb = F.broadcast(sizes).alias("sb")
    return (
        inter.join(sa, F.col("src_a") == F.col("sa.source"))
        .join(sb, F.col("src_b") == F.col("sb.source"))
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )


@register(
    "q_emb_centroid_assign",
    oracle="""
    WITH cent AS (
      SELECT label AS cl, list(c ORDER BY dim) AS cvec
      FROM (SELECT label, dim,
                   CAST(CAST(sum(iv) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS c
            FROM (SELECT label,
                         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                              AS BIGINT) AS iv,
                         generate_subscripts(embedding, 1) AS dim
                  FROM embeddings)
            GROUP BY label, dim)
      GROUP BY label
    ),
    e AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings),
    d AS (
      SELECT e.vec_id, e.label, cent.cl,
             list_reduce(list_transform(range(1, 65),
                                        i -> (emb[i] - cvec[i]) * (emb[i] - cvec[i])),
                         (a, b) -> a + b) AS dist
      FROM e CROSS JOIN cent
    ),
    best AS (SELECT vec_id, label, min(struct_pack(d := dist, cl := cl)) AS b
             FROM d GROUP BY vec_id, label)
    SELECT label, b.cl AS assigned, count(*) AS n_vecs
    FROM best GROUP BY label, b.cl
    """,
)
def q_emb_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L22: nearest-class-centroid assignment confusion matrix — the
    embedding-space QA check behind nearest-class-mean classification,
    SemDeDup cell seeding and label-noise audits ("do the vectors
    actually cluster by their label?").

    Scale shape: centroids are a K·D matrix (bounded driver state, the
    same contract as the IVF centroids in operators/knn.py) collected
    from one map-side-combined (label, dim) partial agg; they re-enter
    the plan as array LITERALS, so the per-vector argmin is pure
    whole-stage codegen over a broadcast-free scan — vectors are read
    once and never shuffled. The argmin itself is `array_min` over
    (dist, label) structs, giving the deterministic label tie-break
    both engines agree on.

    Cross-engine exactness (round 9 float-class audit — the old
    ``round(avg(v), 6)`` summed raw floats, the exact class the r8
    sweep caught on its sibling q_llm_embed_centroid): each component
    lands on the 1e-6 integer grid FIRST (floor of the deterministic
    float32→double value), the BIGINT sum is order-free, and the
    centroid is two correctly-rounded divisions — bit-identical on
    both engines with no rounding boundary. Both distance folds are
    sequential left-to-right (`F.aggregate` / `list_reduce`), so
    distances are bit-identical and the confusion counts hash-match.
    """
    # ensure_parallelism (round 11, guide §2.5): spread the scan — the
    # posexplode (n_vectors × dim) and the assignment distance folds
    # below otherwise run single-task.
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    iv = grid(F.col("v").cast("double"), 1000000)
    cent_rows = (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(iv).cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)
            ).alias("c")
        )
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        cents.setdefault(r["label"], {})[r["dim"]] = r["c"]

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    candidates = []
    for label in sorted(cents):
        comps = cents[label]
        arr = F.array(*[F.lit(comps[d]) for d in sorted(comps)])
        diff2 = F.zip_with(vec, arr, lambda x, y: (x - y) * (x - y))
        dist = F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)
        candidates.append(F.struct(dist.alias("d"), F.lit(label).alias("cl")))
    best = F.array_min(F.array(*candidates))

    return (
        emb.select("label", best["cl"].alias("assigned"))
        .groupBy("label", "assigned")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


@register(
    "q_llm_curriculum",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
    q AS (SELECT quantile_cont(CAST(n_tokens AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST(n_tokens AS DOUBLE), 0.50) AS q2,
                 quantile_cont(CAST(n_tokens AS DOUBLE), 0.75) AS q3 FROM t)
    SELECT bin, count(*) AS n_docs, min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens,
           CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) / count(*) AS avg_tokens
    FROM (SELECT CASE WHEN n_tokens <= q1 THEN 1 WHEN n_tokens <= q2 THEN 2
                      WHEN n_tokens <= q3 THEN 3 ELSE 4 END AS bin, n_tokens
          FROM t CROSS JOIN q)
    GROUP BY bin
    """,
)
def q_llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23: length-curriculum binning — assign each document to a
    token-count quartile and report per-bin stats, the bucketing step
    of curriculum schedules (short→long) and length-balanced batch mix.

    Deliberately NOT `ntile` over a global window: a total-order window
    is a single-reducer sort at 100 TB. Instead exact quartile
    cut-points come from one tiny aggregate (three doubles), re-enter
    via a broadcast 1-row cross join, and the bin assignment is a
    map-side CASE — the only exchange left is the 4-group partial agg.
    Boundary semantics differ from ntile's equal-split by the tie rule
    (all docs with equal n_tokens land in one bin), which is what a
    curriculum actually wants. Both engines use linear-interpolation
    (type-7) quantiles, so cut-points agree exactly; n_tokens is an
    integer compared against those cut-points, so bin edges can't
    float-drift.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    q = t.agg(
        F.expr(
            "percentile(CAST(n_tokens AS DOUBLE), array(0.25, 0.5, 0.75))"
        ).alias("qs")
    ).select(
        F.col("qs")[0].alias("q1"), F.col("qs")[1].alias("q2"), F.col("qs")[2].alias("q3")
    )
    binned = t.crossJoin(F.broadcast(q)).select(
        "n_tokens",
        F.when(F.col("n_tokens") <= F.col("q1"), F.lit(1))
        .when(F.col("n_tokens") <= F.col("q2"), F.lit(2))
        .when(F.col("n_tokens") <= F.col("q3"), F.lit(3))
        .otherwise(F.lit(4))
        .alias("bin"),
    )
    # avg on the exact-integer-sum form, not round(avg(...)) — the
    # token sum is exact, ONE IEEE division is bit-identical on both
    # engines, and there is no rounding boundary left to flip
    # (round 9 float-class audit; ORACLE_NOTES.md #4)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


@register(
    "q_emb_gram",
    oracle="""
    WITH e AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
                      generate_subscripts(embedding, 1) - 1 AS i, vec_id
               FROM embeddings)
    SELECT a.i AS dim_i, b.i AS dim_j,
           CAST(CAST(sum(CAST(floor(a.v * b.v * 1000000 + 0.5) AS BIGINT))
                     AS BIGINT) AS DOUBLE)
             / count(*) / 1000000.0 AS e_xy,
           count(*) AS n_vecs
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def q_emb_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L25: upper-triangle Gram / second-moment matrix E[x_i·x_j] of the
    embedding column — the one-pass sufficient statistic behind PCA,
    whitening, and covariance-drift monitoring (cov = E[xy] − μ_i·μ_j,
    with μ from the centroid key [[q_llm_embed_centroid]]).

    Scale shape: the D(D+1)/2 products per vector are generated INSIDE
    codegen (nested `transform` over a `slice`, no join, no second
    scan), and the (i, j) hash aggregate collapses map-side, so the
    single exchange carries D²/2 partial sums per task — never rows.
    At this fixture's D=64 that is 2,080 cells; for D in the thousands
    the right variant is a per-partition NumPy matmul in `mapInPandas`
    tree-reduced to the driver — same output, fewer flops per cell —
    which is exactly the `knn.py` IVF trade documented there.

    DuckDB mirrors with an index self-join. Float discipline (round 8
    — the cross-SF sweep caught this key at sf0.1): the old
    ``round(avg(xy), 6)`` did NOT absorb ordering noise — zero-centered
    products mean near-zero cells, and a cell whose mean rounded to
    zero came back ``+0.0`` from one engine and ``-0.0`` from the
    other (the sign of zero SURVIVES round(), and the type-faithful
    hash distinguishes them). Each product now lands on an exact 1e-6
    grid first (``floor(xy·1e6 + 0.5)`` of the bit-identical double),
    the BIGINT sum is order-free, and the mean is the same two IEEE
    divisions on both engines — zero round(), no signed zero possible
    (integer 0 / n = +0.0 everywhere).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pairs = F.flatten(
        F.transform(
            vec,
            lambda x, i: F.transform(
                F.slice(vec, i + 1, F.size(vec)),
                lambda y, j: F.struct(
                    i.alias("i"),
                    (i + j).alias("j"),
                    grid(x * y, 1000000).alias("xy6"),
                ),
            ),
        )
    )
    return (
        emb.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.i").cast("long").alias("dim_i"),
            F.col("p.j").cast("long").alias("dim_j"),
        )
        .agg(
            (
                F.sum("p.xy6").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)
            ).alias("e_xy"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@register(
    "q_llm_zipf",
    oracle="""
    WITH counts AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
            FROM counts ORDER BY c DESC, tok LIMIT 1000),
    l AS (SELECT log10(CAST(r AS DOUBLE)) AS x, log10(CAST(c AS DOUBLE)) AS y FROM top)
    SELECT count(*) AS n_fit,
           round((count(*) * sum(x*y) - sum(x) * sum(y))
                 / (count(*) * sum(x*x) - sum(x) * sum(x)), 4) AS slope,
           round((sum(y) * sum(x*x) - sum(x) * sum(x*y))
                 / (count(*) * sum(x*x) - sum(x) * sum(x)), 4) AS intercept
    FROM l
    """,
)
def q_llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L26: Zipf log-log fit over the corpus's token frequency head —
    the corpus-health diagnostic that catches degenerate data (template
    spam flattens the slope toward 0; natural language sits near −1;
    single-token floods steepen it past −2) before a single training
    step is spent on it.

    Scale shape: token counts collapse map-side (shuffle carries the
    vocabulary); the head is a TOP-K by (count, token) — fixed K, so
    the ordered stage is O(K) whatever the corpus, never a global sort
    of the vocabulary — and the least-squares slope/intercept are
    closed-form sums over K rows. Deterministic rank tie-break on the
    token keeps both engines' ranks identical; log10 of identical
    integers is bit-identical, so round(…,4) only has to absorb
    sum-order noise.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.desc("c"), "tok").limit(1000)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    )
    l = ranked.select(
        F.log10(F.col("r").cast("double")).alias("x"),
        F.log10(F.col("c").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    det = n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    return l.agg(
        n.alias("n_fit"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / det, 4
        ).alias("slope"),
        F.round(
            (
                F.sum("y") * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum(F.col("x") * F.col("y"))
            )
            / det,
            4,
        ).alias("intercept"),
    )


@register(
    "q_llm_vocab_coverage",
    oracle="""
    WITH counts AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
                   count(*) AS vocab_size
            FROM counts),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
            FROM counts ORDER BY c DESC, tok LIMIT 10000)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST((SELECT sum(c) FROM top WHERE r <= ks.k) AS BIGINT)
               AS tokens_covered,
           tot.total_tokens,
           tot.vocab_size
    FROM (VALUES (100), (1000), (10000)) ks(k), tot
    """,
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L59 (round 7): top-k vocabulary coverage — the tokenizer-design
    diagnostic (what share of all corpus tokens would a k-entry vocab
    cover?): tokens_covered at k ∈ {100, 1000, 10000} plus the corpus
    totals, ALL INTEGERS (the consumer does the one division — no
    rounding boundary exists in the graded output).

    Scale shape (the q_llm_zipf pattern): token counts collapse
    map-side (the shuffle carries the VOCABULARY, not tokens); the head
    is exact top-k by (count desc, token) via orderBy+limit —
    TakeOrderedAndProject, a distributed per-partition heap + driver
    merge of K rows, never a global sort of the vocabulary — and the
    row_number/cumulation run on K ≤ 10000 rows (one bounded
    partition). The totals are a 1-row aggregate broadcast-joined onto
    3 rows. Deterministic: the (count desc, token asc) tie-break is a
    total order on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    top = counts.orderBy(F.desc("c"), "tok").limit(10000)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    )
    ks = spark.createDataFrame([(100,), (1000,), (10000,)], "k bigint")
    covered = (
        ks.join(ranked, ranked["r"] <= ks["k"])
        .groupBy("k")
        .agg(F.sum("c").cast("long").alias("tokens_covered"))
    )
    return covered.crossJoin(F.broadcast(tot))


@register(
    "q_emb_norm_stats",
    oracle="""
    WITH r AS (SELECT label,
                 CAST(floor(sqrt(list_reduce(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (a, b) -> a + b)) * 1000000 + 0.5) AS BIGINT) AS inrm,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS ic0
          FROM embeddings)
    SELECT label, count(*) AS n_vecs,
           CAST(CAST(sum(inrm) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS avg_norm,
           CASE WHEN count(*) > 1 THEN
             sqrt(CAST(count(*) * sum(inrm * inrm) - sum(inrm) * sum(inrm) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * (count(*) - 1))) / 1000000.0
           END AS sd_norm,
           CAST(min(inrm) AS DOUBLE) / 1000000.0 AS min_norm,
           CAST(max(inrm) AS DOUBLE) / 1000000.0 AS max_norm,
           CAST(CAST(sum(ic0) AS BIGINT) AS DOUBLE) / count(*) / 1000000.0 AS avg_dim0,
           CAST(min(ic0) AS DOUBLE) / 1000000.0 AS min_dim0,
           CAST(max(ic0) AS DOUBLE) / 1000000.0 AS max_dim0
    FROM r
    GROUP BY label
    """,
)
def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24: per-label embedding-norm distribution + first-component
    range — the vector-column QA gate a pipeline runs before any
    cosine-based stage (un-normalized or zero vectors silently corrupt
    cosine ≡ dot-product shortcuts; this check proves ‖v‖≈1 holds, and
    the dim-0 stats catch constant/degenerate dimensions).

    Every statistic lives on the exact 1e-6 integer grid (round 9
    float-class audit — this key's old ``round(avg(float), 4)`` was
    the exact class the r8 sweep caught twice): each per-row norm is a
    deterministic double (sequential fold matching DuckDB's
    list_reduce order, then correctly-rounded sqrt), floor-gridded to
    BIGINT; sums of BIGINT are order-free; the mean is one division.
    The stddev comes from the EXACT sum/sum-of-squares identity
    (n·Σx² − (Σx)²) computed in decimal space — engine-native
    stddev_samp implementations (Welford merge vs pairwise) differ in
    low bits by partial-agg ORDER even on identical inputs, which is
    the same flake class wearing a different aggregate.

    Scale shape: one scan, map-side partial agg, shuffle carries K
    rows of scalars. The decimal(38) moment sums survive 2^63 (Σinrm²
    ≈ 1e12/row passes BIGINT at ~9M rows; decimal is exact to 1e38).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    nrm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))
    g6 = lambda c: grid(c, 1000000)  # noqa: E731
    rows = emb.select(
        "label",
        g6(nrm).alias("inrm"),
        g6(F.col("embedding")[0].cast("double")).alias("ic0"),
    )
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("inrm").cast("decimal(38,0)"))
    s2 = F.sum((F.col("inrm") * F.col("inrm")).cast("decimal(38,0)"))
    var_num = (n.cast("decimal(38,0)") * s2 - s1 * s1).cast("double")
    return rows.groupBy("label").agg(
        n.alias("n_vecs"),
        (F.sum("inrm").cast("double") / n / F.lit(1000000.0)).alias("avg_norm"),
        # n=1 guard (ADVICE r9): the identity would compute 0.0/0.0 →
        # NaN where stddev_samp semantics say NULL (and DuckDB's
        # NaN-vs-NULL hashing depends on a session flag) — both engines
        # now yield NULL for a single-vector label.
        F.when(
            n > 1,
            F.sqrt(var_num / (n.cast("double") * (n - 1))) / F.lit(1000000.0),
        ).alias("sd_norm"),
        (F.min("inrm").cast("double") / F.lit(1000000.0)).alias("min_norm"),
        (F.max("inrm").cast("double") / F.lit(1000000.0)).alias("max_norm"),
        (F.sum("ic0").cast("double") / n / F.lit(1000000.0)).alias("avg_dim0"),
        (F.min("ic0").cast("double") / F.lit(1000000.0)).alias("min_dim0"),
        (F.max("ic0").cast("double") / F.lit(1000000.0)).alias("max_dim0"),
    )


@register(
    "q_emb_cosine_hist",
    oracle="""
    WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    p AS (SELECT round(list_dot_product(a.v, b.v), 4) AS c
          FROM d a JOIN d b ON b.vec_id = a.vec_id + 1)
    SELECT CAST(floor(c * 10) AS INT) AS bucket, count(*) AS n
    FROM p GROUP BY 1
    """,
)
def q_emb_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-L: cosine-similarity histogram over consecutive-id pairs — the
    distribution-drift monitor for an embedding corpus (a near-dup
    injection shows up as mass at bucket 9 before any dedup run pays
    for itself). Join fan-in is 1:1 (id+1), then a K-row aggregate:
    cost is one scan + one tiny shuffle regardless of corpus size.

    Bucketing floors round(cos,4)*10: the 4-dp round (the proven
    cross-engine discipline from q_llm_cosine_pairs) kills float fuzz
    first, so both engines floor the identical double.
    """
    from novlake_spark.operators.knn import dot

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select(F.round(dot(F.col("va"), F.col("vb")), 4).alias("c"))
        .groupBy(F.floor(F.col("c") * 10).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_emb_quantize",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(len(codes))) AS INT) AS pos,
           unnest(codes) AS code
    FROM (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)
                                   * (127.0 / list_max(list_transform(embedding,
                                          y -> abs(CAST(y AS DOUBLE)))))
                                   + 0.5) AS INT)) AS codes
        FROM embeddings
    )
    ORDER BY vec_id, pos
    """,
)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L56 (round 6, output reshaped round 7): symmetric int8 embedding
    quantization — the storage/serving step of every embedding pipeline
    (4× smaller than float32): per vector, scale = 127/amax,
    code_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. FULL oracle with the
    boundary-free shared floor(x·s + 0.5) form (the round-6 cents
    discipline): both engines widen float32→double first, then the
    divide and multiply are IEEE-correctly-rounded identical operations,
    so the codes are bit-equal cross-engine with no rounding-mode
    boundary anywhere. Round-7 reshape (VERDICT r6 wrong #1): the graded
    output is (vec_id, pos, code) INTEGER ROWS via posexplode, never an
    array column — the driver's canonicalizer sort_values the pandas
    frame over all columns and ndarray cells are unhashable (both r6
    red rows were exactly this). Position-wise rows also STRENGTHEN the
    oracle: a transposed code pair now fails the hash. Zero shuffle —
    one codegen transform + generator over the scan (the orderBy is
    oracle-comparison framing). Contract: vectors must be non-zero
    (the fixture's are unit-norm) — an all-zero vector has no symmetric
    scale (127/0), and the engines diverge on the degenerate case
    (Spark casts the resulting inf to NULL, DuckDB errors), so a
    production wrapper filters amax > 0 first."""
    # ensure_parallelism (round 11, guide §2.5): the interpreted HOF
    # transforms below otherwise run on the single row-group split.
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    # hoist the scale to its own column: referencing the amax
    # sub-expression INSIDE the per-element lambda re-evaluates the
    # whole array_max per element — O(d²) interpreted HOF work per row,
    # measured 3.4 s at sf1 vs ~0.5 s hoisted
    amax = F.array_max(
        F.transform(F.col("embedding"), lambda y: F.abs(y.cast("double")))
    )
    scaled = emb.withColumn("_scale", F.lit(127.0) / amax)
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.col("_scale") + F.lit(0.5)).cast("int"),
    )
    # no orderBy: the driver's hash is order-insensitive, and a global
    # sort over the exploded rows (n_vectors × dim) is the one operation
    # here that would NOT survive a 100× scale-up (measured sf1: 5.9 s
    # with the sort, 2.0 s without — the oracle keeps its ORDER BY for
    # readability, which the comparison ignores)
    return scaled.select("vec_id", codes.alias("codes")).select(
        "vec_id", F.posexplode("codes").alias("pos", "code")
    )


@register(
    "q_emb_pq_encode",
    oracle="""
    WITH comp AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS INT) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                  AS BIGINT) AS ei
      FROM embeddings
    ),
    cb AS (
      SELECT CAST(a.k AS INT) AS k, CAST(b.pos AS INT) AS pos,
             CAST(((a.k * 1231 + b.pos * 337 + 911) % 2001) - 1000
                  AS BIGINT) AS c
      FROM (SELECT unnest(range(16)) AS k) a,
           (SELECT unnest(range(64)) AS pos) b
    ),
    d AS (
      SELECT comp.vec_id, CAST(comp.pos // 8 AS INT) AS m, cb.k,
             CAST(sum((comp.ei - cb.c) * (comp.ei - cb.c)) AS BIGINT) AS dist
      FROM comp JOIN cb ON comp.pos = cb.pos
      GROUP BY 1, 2, 3
    ),
    best AS (SELECT vec_id, m, min(dist) AS md FROM d GROUP BY 1, 2)
    SELECT d.vec_id, d.m, CAST(min(d.k) AS INT) AS code
    FROM d JOIN best
      ON d.vec_id = best.vec_id AND d.m = best.m AND d.dist = best.md
    GROUP BY d.vec_id, d.m
    """,
)
def q_emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L65: product-quantization encode (Jégou et al., PAMI'11) — the
    storage layout behind every large-scale ANN index (FAISS IVF-PQ):
    split each 64-dim vector into M=8 contiguous subvectors and store,
    per subvector, the id of the nearest of K=16 codebook centroids —
    64 float32 bytes become 8 nibbles.

    Graded with a DETERMINISTIC integer codebook (a trained codebook is
    k-means output — engine-specific; the ENCODE step is the exact,
    gradable part): components land on the exact 1e-3 grid
    (floor(x·1000 + 0.5) of the bit-identical widened double — the
    established centroid/Gram discipline), codebook cells are the pure
    integer formula ((k·1231 + pos·337 + 911) mod 2001) − 1000, so
    every squared distance is exact BIGINT arithmetic and the argmin
    (ties → lowest code, via lexicographic min(struct(dist, k))) is
    bit-identical cross-engine.

    Plan: posexplode components once, broadcast the 1024-row codebook,
    one (vec, m, k) partial-agg shuffle, then the per-(vec, m) argmin —
    all JVM codegen. Scale shape: the shuffle carries 16 longs per
    subvector; at billion-vector scale the production encode fuses the
    distance loop into one Arrow batch matmul (operators.knn's block
    pattern) — the graded join formulation IS the semantics spec."""
    # ensure_parallelism (round 11, guide §2.5): single-split scan would
    # serialize the component explode feeding the codebook join.
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    comp = emb.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        grid(F.col("x").cast("double"), 1000).alias("ei"),
    )
    cb = (
        spark.range(16)
        .select(F.col("id").cast("int").alias("k"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("pos")))
        .select(
            "k",
            "pos",
            (((F.col("k") * 1231 + F.col("pos") * 337 + 911) % 2001) - 1000)
            .cast("long")
            .alias("c"),
        )
    )
    d = (
        comp.join(F.broadcast(cb), "pos")
        .groupBy(
            "vec_id", F.expr("pos DIV 8").cast("int").alias("m"), "k"
        )
        .agg(F.sum((F.col("ei") - F.col("c")) * (F.col("ei") - F.col("c"))).alias("dist"))
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "k")).alias("_b"))
        .select("vec_id", "m", F.col("_b.k").cast("int").alias("code"))
    )


@register(
    "q_llm_hard_negatives",
    oracle="""
    WITH g AS (
      SELECT vec_id, label,
             list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS ge
      FROM embeddings
    ),
    q AS (SELECT * FROM g WHERE vec_id < 50),
    p AS (
      SELECT q.vec_id,
             c.vec_id AS cid,
             CAST(list_sum(list_transform(range(len(q.ge)),
                  i -> q.ge[i + 1] * c.ge[i + 1])) AS BIGINT) AS dot
      FROM q JOIN g c ON q.label <> c.label
    ),
    best AS (SELECT vec_id, max(dot) AS md FROM p GROUP BY vec_id)
    SELECT p.vec_id, CAST(min(p.cid) AS BIGINT) AS neg_id,
           CAST(p.dot AS BIGINT) AS dot_i
    FROM p JOIN best ON p.vec_id = best.vec_id AND p.dot = best.md
    GROUP BY p.vec_id, p.dot
    """,
)
def q_llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L67: hard-negative mining — for each query vector, the most
    similar vector carrying a DIFFERENT label. The contrastive-training
    data step (dense retrievers, CLIP-style encoders): easy negatives
    teach nothing, so batches are built around the near-miss neighbors
    this query finds. Also the embedding-QA dual of
    q_emb_centroid_assign: a high cross-label dot is exactly where
    class boundaries blur.

    Cross-engine exactness: components land on the 1e-3 integer grid
    first, so every dot product is an exact BIGINT sum (order-free) and
    the argmax (ties → lowest candidate id, via min over the max-dot
    set / lexicographic min(struct(-dot, id)) in Spark) is
    bit-identical. The graded query set is the bounded vec_id < 50
    slice — the deterministic modulo/prefix sampling discipline — so
    the oracle's brute-force pairing stays 50×N.

    Plan: the 50-row query side broadcasts into a nested-loop join
    against the full corpus (label inequality admits no equi-key);
    per-pair work is one fused zip_with/aggregate over the arrays —
    JVM codegen, no Python. At billion-vector scale the same contract
    runs behind the IVF/LSH candidate tiers (operators.knn): brute
    force IS the spec, the index is the execution strategy."""
    # ensure_parallelism (round 11, guide §2.5): the interpreted
    # zip_with/aggregate dot-product fold below runs on the stream side
    # of a broadcast nested-loop join — on the one-row-group scan that
    # was a single task doing all 50×N pair folds.
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    gridded = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: grid(x.cast("double"), 1000),
        ).alias("ge"),
    )
    q = gridded.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("ge").alias("qge"),
    ).filter(F.col("qid") < 50)
    dot = F.aggregate(
        F.zip_with("qge", "ge", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        F.broadcast(q)
        .join(gridded, F.col("qlabel") != F.col("label"))
        .select(F.col("qid"), F.col("vec_id").alias("cid"), dot.alias("dot"))
    )
    best = pairs.groupBy("qid").agg(
        F.min(F.struct((-F.col("dot")).alias("nd"), F.col("cid").alias("cid"))).alias("_b")
    )
    return best.select(
        F.col("qid").alias("vec_id"),
        F.col("_b.cid").cast("long").alias("neg_id"),
        (-F.col("_b.nd")).cast("long").alias("dot_i"),
    )
