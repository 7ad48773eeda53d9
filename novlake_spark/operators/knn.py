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


def knn_join_blocked(
    emb: DataFrame,
    block_col: str,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbours for every vector, within its block.

    Self-join on the block key (hash join, shuffle by block) then
    per-query top-k via row_number — never a global cross join.
    """
    a = emb.select(F.col(block_col).alias("_blk"), F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(block_col).alias("_blk"), F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"))
    scored = (
        a.join(b, "_blk")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("_blk", "a_id", "b_id", F.round(dot(F.col("_va"), F.col("_vb")), 4).alias("score"))
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(F.col("_blk").alias(block_col), "a_id", "b_id", "score", F.col("rn").cast("long").alias("rn"))
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
    n_probe: int = 1,
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
    queries = emb.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("_va"),
        F.explode(ranked).alias("cell"),
    )
    data = assigned.select(F.col("cell"), F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"))
    scored = (
        queries.join(data, "cell")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", F.round(dot(F.col("_va"), F.col("_vb")), 4).alias("score"))
        .distinct()
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
    n_tables: int = 1,
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
    """
    if n_tables <= 1:
        planes = hyperplanes(dim, n_planes, seed)
        bucketed = emb.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
        return knn_join_blocked(bucketed, "_bucket", k, id_col=id_col, vec_col=vec_col).withColumnRenamed(
            "_bucket", "bucket"
        )
    # one (table, bucket) row per vector per table; blocking on the
    # composite key unions candidates across tables
    table_buckets = F.array(
        *[srp_bucket(F.col(vec_col), hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)]
    )
    exploded = emb.select(
        F.col(id_col), F.col(vec_col), F.posexplode(table_buckets).alias("_table", "_b")
    ).withColumn("_tb", F.concat_ws(":", "_table", "_b"))
    a = exploded.select(F.col("_tb"), F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"))
    b = exploded.select(F.col("_tb"), F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"))
    scored = (
        a.join(b, "_tb")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", F.round(dot(F.col("_va"), F.col("_vb")), 4).alias("score"))
        .distinct()
    )
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("a_id", "b_id", "score", F.col("rn").cast("long").alias("rn"))
    )
