"""Similarity search over embedding columns (SURVEY.md §2.L L3–L5).

Fixture embeddings are unit-normalized (Σx²=1, verified in FIXTURES.md)
so cosine similarity ≡ dot product; all arithmetic casts float32→double
first (§5.3) and stays in built-in higher-order functions (zip_with +
aggregate fold — JVM-side, no Python round trip).

Scale ladder:
1. ``knn_single``  — one query vs the corpus: broadcast the query row,
   map-side score, TakeOrderedAndProject top-k. Linear scan, no shuffle.
2. ``knn_join_blocked`` — all-pairs k-NN restricted to a blocking key
   (label, LSH bucket, shard): cost Σ block², embarrassingly parallel
   per block. This is the only sane all×all shape at 100 TB.
3. ``lsh_bucketed_knn`` — approximate: sign-random-projection buckets
   (deterministic hyperplanes from a seeded RNG) shrink candidate sets;
   recall/cost tunes via n_planes. Brute force within bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    """Σ a_i·b_i with float→double widening, left-to-right fold (matches
    DuckDB's list_dot_product accumulation at 4-dp rounding)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def knn_single(emb: DataFrame, query_id: int, k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbours of one stored vector, brute force.

    The single query row is broadcast — scoring happens in the scan
    stage; the only data movement is k rows per task to the driver.
    """
    query = emb.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qv"))
    return (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(query))
        .select(id_col, F.round(dot(F.col(vec_col), F.col("_qv")), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _fold_order_scores(qm: np.ndarray, dm: np.ndarray) -> np.ndarray:
    """All-pairs dot products in FOLD order: 0.0 + q₀·d₀ + q₁·d₁ + …
    left-to-right, one dimension per accumulation step.

    Deliberately NOT ``qm @ dm.T``: BLAS uses blocked/pairwise
    summation whose last-ulp results differ from the sequential fold
    that :func:`dot` performs and that DuckDB's ``list_dot_product``
    matches at 4-dp rounding. Accumulating one outer product per
    dimension executes the exact same IEEE double sequence (separate
    multiply then add, no FMA) as the scalar fold, so the vectorized
    path is BIT-IDENTICAL to the JVM expression — FULL-oracle keys can
    use it without losing cross-engine hash parity. Cost is ~2× a BLAS
    matmul at dim 64; the win over per-pair interpreted folds is ~50×.
    """
    acc = np.zeros((qm.shape[0], dm.shape[0]))
    for d in range(qm.shape[1]):
        acc += np.outer(qm[:, d], dm[:, d])
    return acc


def _round_half_up_4dp(x: np.ndarray) -> np.ndarray:
    """Vectorized twin of Spark's ``F.round(col, 4)`` on doubles.

    Spark's Round on DoubleType is ``BigDecimal.valueOf(d)`` (i.e. the
    SHORTEST-ROUNDTRIP decimal string, same algorithm as Python's
    ``repr(float)``) ``.setScale(4, HALF_UP)`` — half away from zero.
    ``np.round`` is HALF_EVEN on the scaled binary value, so the two
    disagree at .xxxx5 boundaries. Fast path: scale by 1e4 and
    floor(+0.5)/ceil(−0.5). The fast path can disagree with Java
    anywhere the DECIMAL value of x's shortest repr sits on (or within
    rounding error of) a half at the 4th decimal place — that includes
    cells whose binary scaled product is NOT exactly a half-integer:
    ``repr(0.00015)`` ends in 5 but 0.00015*1e4 is 1.4999999999999998,
    so an exact-half test misses it while Spark still rounds UP to
    0.0002 (ADVICE r5). Since |decimal(repr(x))·1e4 − x·1e4| ≤ ~1.5 ulp
    of the scaled value, every possible disagreement lives within a few
    ulps of a half-integer: re-resolve EVERY cell within a conservative
    tolerance of a half (absolute 1e-9, widened relatively for large
    magnitudes — vastly above the ulp bound, still a ~0 fraction of
    random doubles) through ``decimal.Decimal(repr(x))``, bit-faithful
    to ``Double.toString``. Everything else stays vectorized, and an
    over-wide tolerance only costs extra Decimal calls — the Decimal
    path IS the ground truth, so correctness never depends on the
    tolerance being tight.
    """
    scaled = x * 10000.0
    with np.errstate(invalid="ignore"):  # ±inf sentinel rows → nan in frac
        r = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5))
        tol = np.maximum(1e-9, np.abs(scaled) * 1e-11)
        half = np.isfinite(scaled) & (
            np.abs(scaled - np.floor(scaled) - 0.5) <= tol
        )
    if half.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.0001")
        flat_r, flat_x = r.ravel(), x.ravel()
        for i in np.flatnonzero(half.ravel()):
            flat_r[i] = float(
                Decimal(repr(float(flat_x[i]))).quantize(q, rounding=ROUND_HALF_UP)
            ) * 10000.0
    return r / 10000.0


def _topk_final_order(sims: np.ndarray, b_ids: np.ndarray, kk: int) -> np.ndarray:
    """Per-row top-``kk`` column indices under the FINAL candidate
    ordering (Spark-HALF_UP-rounded score desc, b_id asc) — exactly what
    a downstream ``F.round``-then-window top-k selects.

    Round-5 measured the straightforward form (round the FULL Q×D score
    matrix, lexsort whole rows) costing q_llm_knn_join +45% at sf1, so
    this takes an argpartition prefilter with an exactness guarantee
    rather than a heuristic: keep the top ``M ≥ kk+64`` candidates by
    RAW score, round/lexsort only those, then PROVE per row that nothing
    excluded can reach the selection — rounding is monotone, so if the
    raw cutoff (the M-th best raw score) rounds strictly below the row's
    kk-th selected ROUNDED value, every excluded candidate rounds below
    it too and can neither beat nor tie it. Rows where the proof fails
    (a rounding-boundary tie straddles the cut — rare, but e.g. blocks
    of near-identical vectors hit it) fall back to the exact full-row
    path, so the result is bit-identical to the unfiltered form always,
    not just usually.
    """
    n_d = sims.shape[1]
    m = min(n_d, max(4 * kk, kk + 64))
    if m >= n_d:
        rounded = _round_half_up_4dp(sims)
        return np.lexsort((np.broadcast_to(b_ids, sims.shape), -rounded), axis=1)[:, :kk]
    part = np.argpartition(-sims, m - 1, axis=1)[:, :m]  # top-m raw, unordered
    sub = np.take_along_axis(sims, part, axis=1)
    sub_rounded = _round_half_up_4dp(sub)
    order = np.lexsort((b_ids[part], -sub_rounded), axis=1)[:, :kk]
    sel = np.take_along_axis(part, order, axis=1)
    # exactness proof per row; -inf sentinels (self-pairs) round to -inf
    # and only ever FAIL the proof, routing the row to the exact path
    with np.errstate(invalid="ignore"):
        cut_rounded = _round_half_up_4dp(sub.min(axis=1))
        kth_rounded = np.take_along_axis(sub_rounded, order, axis=1)[:, -1]
        bad = ~(cut_rounded < kth_rounded)
    if bad.any():
        full_rounded = _round_half_up_4dp(sims[bad])
        sel[bad] = np.lexsort(
            (np.broadcast_to(b_ids, full_rounded.shape), -full_rounded), axis=1
        )[:, :kk]
    return sel


def blocked_topk_candidates(
    queries: DataFrame,
    data: DataFrame,
    block_col: str,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-block top-k neighbour candidates: (block, a_id, b_id, score).

    One Arrow batch per block through a cogrouped ``applyInPandas``;
    scoring is one fold-order "matmul" per block (never per-pair
    expressions — measured ~50× on 20k×64 vectors, same reasoning as
    the MinHash Arrow rationale in operators/dedup.py). Per-(query,
    block) output is capped at k rows chosen by the FINAL ordering
    (rounded score desc, b_id asc), so a downstream global top-k over
    multi-block candidate unions selects exactly what the naive
    join would — the emitted ``score`` stays the RAW double and the
    caller applies ``F.round`` so JVM-side rounding semantics (HALF_UP)
    are preserved end-to-end.

    Scale shape: shuffle is one hash partition by block; candidate
    output is ≤ k rows per (query, block) — the Σ block² term lives
    only inside the per-block numpy kernel, never in the shuffle.
    """
    import pandas as pd

    blk_type = dict(queries.dtypes)[block_col]
    out_schema = f"`{block_col}` {blk_type}, a_id long, b_id long, score double"
    empty = {block_col: [], "a_id": [], "b_id": [], "score": []}

    q = queries.select(block_col, F.col(id_col).alias("_aid"), F.col(vec_col).alias("_v"))
    d = data.select(block_col, F.col(id_col).alias("_bid"), F.col(vec_col).alias("_v"))

    def per_block(key, qdf: pd.DataFrame, ddf: pd.DataFrame) -> pd.DataFrame:
        if qdf.empty or ddf.empty:
            return pd.DataFrame(empty)
        qm = np.vstack(qdf["_v"].to_numpy()).astype(np.float64)
        dm = np.vstack(ddf["_v"].to_numpy()).astype(np.float64)
        sims = _fold_order_scores(qm, dm)
        a_ids = qdf["_aid"].to_numpy()
        b_ids = ddf["_bid"].to_numpy()
        sims[a_ids[:, None] == b_ids[None, :]] = -np.inf  # self-pairs out
        kk = min(k, sims.shape[1])
        # selection must use the FINAL ordering (rounded score desc,
        # b_id asc) or boundary ties would keep different rows than the
        # downstream window. ADVICE r4: the rounding must be the
        # WINDOW's rounding (Java HALF_UP via F.round), not np.round's
        # HALF_EVEN; _topk_final_order guarantees that selection while
        # only rounding/sorting an argpartitioned candidate slice (the
        # r5 full-matrix form cost q_llm_knn_join +45% at sf1).
        order = _topk_final_order(sims, b_ids, kk)
        top_scores = np.take_along_axis(sims, order, axis=1)
        keep = np.isfinite(top_scores)
        return pd.DataFrame(
            {
                block_col: np.repeat(key[0], keep.sum()),
                "a_id": np.repeat(a_ids, kk)[keep.ravel()],
                "b_id": b_ids[order].ravel()[keep.ravel()],
                "score": top_scores.ravel()[keep.ravel()],
            }
        )

    return (
        q.groupBy(block_col)
        .cogroup(d.groupBy(block_col))
        .applyInPandas(per_block, out_schema)
    )


def knn_join_blocked(
    emb: DataFrame,
    block_col: str,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbours for every vector, within its block.

    Candidates come from the per-block vectorized kernel
    (:func:`blocked_topk_candidates` — one fold-order matmul per block,
    bit-identical to the :func:`dot` expression); the final top-k is a
    row_number window over ≤ k candidates per (query, block). Never a
    global cross join, and since each vector lives in exactly one
    block here, the window only re-ranks what the kernel already chose.

    Scale contract: this is the EXACT kernel — O(|block|²) dot
    products by definition, and the sf10 spot-run measured exactly
    that second derivative (block 2k → 20k vectors: 113.8× wall for
    10× data once the quadratic term outgrew fixed overhead;
    SCALING.md round-8). It is the ground-truth/verification path and
    the right choice only while blocks stay bounded (≤ ~10⁵ vectors);
    corpus-scale neighbor search goes through :func:`lsh_bucketed_knn`
    or :func:`ivf_knn`, whose bucketing divides the pairwise work and
    whose recall is measured in ANN_TIER.json (cells=32/probe=4:
    0.995 at a fraction of the cost).
    """
    scored = blocked_topk_candidates(emb, emb, block_col, k, id_col=id_col, vec_col=vec_col)
    scored = scored.select(block_col, "a_id", "b_id", F.round("score", 4).alias("score"))
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(block_col, "a_id", "b_id", "score", F.col("rn").cast("long").alias("rn"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-random-projection LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def srp_bucket(vec_col, planes: list[list[float]]) -> F.Column:
    """Sign-random-projection bucket id: bit p = (v·plane_p > 0)."""
    out = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(c)) for c in plane]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 8,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids seed deterministically from the ``n_cells`` lowest-id
    vectors, then ``lloyd_iters`` rounds of distributed k-means refine
    them (assignment is a broadcast argmax — one narrow pass; the
    update is a posexplode + per-dimension mean, shuffling only
    n_cells×dim aggregates). Returns (assigned df with ``cell``,
    centroid list). Only centroids — K×dim floats — ever reach the
    driver.
    """
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    ]

    def assign(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
        if len(centroids) > 64:
            # Large centroid counts (the bounded-cell-size regime of
            # semantic_dedup at sf1+, round 11): the literal-expression
            # score array would put K×dim literals into one projection
            # — past ~64 cells that blows the codegen budget and falls
            # back to interpreted eval. One Arrow-batched matmul per
            # batch instead: (rows × dim) @ (dim × K) → row-wise
            # argmax. Deterministic per row (each output is a dot of
            # that row with one centroid; ties break to the LOWEST
            # cell index on both paths), so identical vectors land in
            # identical cells regardless of batching — the invariant
            # the planted key grades.
            import numpy as np
            import pandas as pd

            cmat = np.array(centroids, dtype=np.float64).T  # (dim, K)

            @F.pandas_udf("int")
            def argmax_cell(vecs: pd.Series) -> pd.Series:
                mat = np.vstack(vecs.to_numpy()).astype(np.float64)
                return pd.Series(np.argmax(mat @ cmat, axis=1).astype("int32"))

            return df.withColumn("cell", argmax_cell(F.col(vec_col)))
        scores = F.array(
            *[
                dot(F.col(vec_col), F.array(*[F.lit(c) for c in cent]))
                for cent in centroids
            ]
        )
        return (
            df.withColumn("_scores", scores)
            .withColumn("cell", (F.array_position("_scores", F.array_max("_scores")) - 1).cast("int"))
            .drop("_scores")
        )

    assigned = assign(emb, cents)
    for _ in range(lloyd_iters):
        new = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.transform("dm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        by_cell = {r.cell: list(r.centroid) for r in new}
        cents = [by_cell.get(i, cents[i]) for i in range(n_cells)]
        assigned = assign(emb, cents)
    return assigned, cents


def ivf_knn(
    emb: DataFrame,
    k: int,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN join: exact search within probed IVF cells.

    The inverted-file structure bounds pairwise cost like label/LSH
    blocking, but cells follow the data distribution (k-means) instead
    of random projections. ``n_probe`` > 1 is query-time multi-probe:
    each vector searches its ``n_probe`` nearest cells, trading
    n_probe× join fan-out for recall of neighbours that fell across a
    cell boundary — the standard IVF recall knob (cost stays
    Σ n_probe·cell·|cell|, never n²).

    Default ``n_probe=2`` (round 5): on the CLUSTERED sf1 fixture —
    planted topics, i.e. the neighborhood structure real corpora have —
    probe=1 measures recall@10 = 0.88, probe=2 = 0.96, probe=4 = 0.99
    (SCALING.md §ANN, ANN_TIER.json). 2 is the knee: ≥0.9 recall at 2×
    fan-out. The i.i.d.-random fixture's lower numbers measure the
    fixture (no structure to find), not the index.
    """
    assigned, cents = ivf_assign(emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    if n_probe <= 1:
        return knn_join_blocked(assigned, "cell", k, id_col=id_col, vec_col=vec_col)

    # Query side: explode each vector's n_probe best cells (sort the
    # (score, cell) pairs descending, slice). Data side: primary cell.
    def scores_col(df):
        return F.array(
            *[dot(F.col(vec_col), F.array(*[F.lit(c) for c in cent])) for cent in cents]
        )

    ranked = F.transform(
        F.slice(
            F.array_sort(
                F.arrays_zip(
                    scores_col(emb).alias("s"),
                    F.transform(F.sequence(F.lit(0), F.lit(n_cells - 1)), lambda i: i).alias("c"),
                ),
                lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1).otherwise(0),
            ),
            1,
            n_probe,
        ),
        lambda s: s["c"],
    )
    queries = emb.select(F.col(id_col), F.col(vec_col), F.explode(ranked).alias("cell"))
    # per probed cell: vectorized top-k candidates; a pair surfacing
    # from two probes carries the bit-identical score (same fold-order
    # kernel), so dropDuplicates is exact
    scored = (
        blocked_topk_candidates(queries, assigned, "cell", k, id_col=id_col, vec_col=vec_col)
        .select("a_id", "b_id", F.round("score", 4).alias("score"))
        .dropDuplicates(["a_id", "b_id"])
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("a_id", "b_id", "score", F.col("rn").cast("long").alias("rn"))
    )


def lsh_bucketed_knn(
    emb: DataFrame,
    k: int,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN: exact knn_join within each SRP bucket.

    2^n_planes buckets shrink the pairwise cost by ~4^n_planes at the
    price of missing cross-bucket neighbours (recall measured in
    tests/test_llm_ops.py against brute force). ``n_tables`` > 1 is
    OR-amplification: independent hash tables (fresh hyperplane sets),
    candidates unioned before the final top-k — two near vectors only
    need to agree in ONE table, so recall ≈ 1-(1-p)^T for per-table
    collision probability p, at T× the within-bucket cost.

    Default ``n_tables=4`` (round 5): on the CLUSTERED sf1 fixture
    (planted topics — the structure real corpora have) tables=1/2/4
    measure recall@10 = 0.46/0.72/0.92 (SCALING.md §ANN), tracking the
    1-(1-p)^T amplification law; 4 is the first tier over the 0.9 bar.
    """
    if n_tables <= 1:
        planes = hyperplanes(dim, n_planes, seed)
        bucketed = emb.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
        return knn_join_blocked(bucketed, "_bucket", k, id_col=id_col, vec_col=vec_col).withColumnRenamed(
            "_bucket", "bucket"
        )
    # one (table, bucket) row per vector per table; blocking on the
    # composite key unions candidates across tables, scored by the
    # per-block vectorized kernel (scores bit-identical across tables →
    # dropDuplicates is exact)
    table_buckets = F.array(
        *[srp_bucket(F.col(vec_col), hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)]
    )
    exploded = emb.select(
        F.col(id_col), F.col(vec_col), F.posexplode(table_buckets).alias("_table", "_b")
    ).withColumn("_tb", F.concat_ws(":", "_table", "_b"))
    scored = (
        blocked_topk_candidates(exploded, exploded, "_tb", k, id_col=id_col, vec_col=vec_col)
        .select("a_id", "b_id", F.round("score", 4).alias("score"))
        .dropDuplicates(["a_id", "b_id"])
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("a_id", "b_id", "score", F.col("rn").cast("long").alias("rn"))
    )
