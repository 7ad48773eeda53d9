"""Corpus bigram language model → perplexity-proxy quality scoring.

The standard "model-based quality" signal for pretraining-data curation
is perplexity under a cheap LM: documents whose token transitions are
improbable under the corpus-wide model are likely noise/boilerplate.
Here the LM is a bigram MLE estimated from the corpus itself:

    P(w2 | w1) = count(w1 w2) / count(w1 ·)

and a document's score is its per-bigram cross-entropy
``avg(-ln P)`` (perplexity = exp of that).

Plan shape (scales to 100 TB):
- one explode + groupBy builds the bigram count table (map-side
  partial aggregation applies);
- the prefix-count table derives from the bigram table (no second pass
  over the corpus);
- scoring is a key join of the corpus' bigrams against the model —
  broadcast when the model is small, shuffle-hash otherwise (AQE
  decides); joins/aggregations stay JVM-side. Bigram extraction itself
  runs in the Arrow-vectorized pandas UDF (text.shingles_arrow), which
  is ~18× faster than the interpreted higher-order-lambda expression in
  isolation (end-to-end the shuffles/joins dominate, so the full
  pipeline gain is smaller but real).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from novlake_spark.operators.numerics import grid
from pyspark.sql.functions import pandas_udf


def doc_bigram_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, bg, c): per-document DISTINCT bigrams with occurrence
    counts, aggregated INSIDE the Arrow UDF — map-side, no shuffle.

    This is the load-bearing perf choice (measured at sf0.1, round 2):
    emitting per-doc *counts* instead of raw occurrences shrinks the
    explode and every downstream join/aggregate by the intra-doc repeat
    factor for free. An earlier variant that built the same counts with
    a DataFrame groupBy was measured SLOWER than the naive explode —
    (doc, bigram) is nearly unique so the pre-aggregation SHUFFLE cost
    more than it saved (note kept: the win is doing it map-side in
    Python, not the pre-aggregation itself). Current numbers:
    naive explode 1.89 s, in-UDF counts 1.32 s end-to-end.
    """

    @pandas_udf("map<string,int>")
    def bg_counts(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = t.lower().split(" ")
            d: dict[str, int] = {}
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                d[bg] = d.get(bg, 0) + 1
            out.append(d)
        return pd.Series(out)

    return docs.select(F.col(id_col), F.explode(bg_counts(F.col(text_col))).alias("bg", "c"))


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bg, inll): negative log-likelihood -ln P(w2|w1) per corpus
    bigram, on the exact 1e-6 integer grid (round 9 float-class audit):
    the per-bigram double -ln(c2/c1) is deterministic (one division of
    exact counts + ln of the identical double), but keeping it FLOAT
    made every downstream per-doc average an order-dependent float sum
    — the ORACLE_NOTES.md #4 flake class. Gridding here makes every
    consumer's sum BIGINT-exact and order-free. (ln itself is libm —
    not IEEE-pinned cross-engine — the documented residual class; the
    grid absorbs sub-boundary ULP variance, rule #6.)"""
    return _mle_model_from(doc_bigram_counts(docs, "doc_id", text_col))


def _mle_model_from(bg: DataFrame) -> DataFrame:
    """MLE model from a prebuilt (id, bg, c) table. The split mirrors
    :func:`_kn_model_from`'s structure; only the KN pipeline persists
    and shares its aggregated bigram table — sharing/persisting the
    2-reference MLE scan MEASURED SLOWER than recomputing it
    (SCALING.md cache-point study), so :func:`perplexity_scores`
    deliberately does not (ADVICE r9: the old wording claimed a shared
    persisted scan that never existed)."""
    c2 = (
        bg.groupBy("bg")
        .agg(F.sum("c").alias("c2"))
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    inll = grid(-F.log(F.col("c2") / F.col("c1")), 1000000)
    return c2.join(c1, "w1").select("bg", inll.alias("inll"))


def kn_bigram_model(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """(bg, inll) under INTERPOLATED KNESER-NEY smoothing — the
    standard n-gram smoothing (Kneser & Ney 1995; Chen & Goodman 1998
    found it uniformly best), and the quality-scoring upgrade over the
    raw MLE of :func:`bigram_model`: MLE over-scores documents that
    repeat frequent continuations, KN discounts every observed bigram
    by ``d`` and redistributes the held-out mass by CONTINUATION count
    (how many distinct contexts a word completes), which is what makes
    "Francisco" (frequent but only after "San") score unlike "the".

        P(w2|w1) = (c(w1,w2) − d)/c(w1)
                 + (d·N1+(w1,•)/c(w1)) · (N1+(•,w2)/N1+(••))

    All inputs are exact integer counts; the formula is a FIXED tree of
    correctly-rounded IEEE ops (kept in lockstep with the SQL oracle
    restatement, association and all), so the per-bigram double is
    bit-identical cross-engine; ln is the documented libm residual and
    the 1e-6 grid absorbs sub-boundary variance — the same exactness
    contract as :func:`bigram_model`.

    Plan shape: the w1 statistics (context total c1 AND distinct-
    continuation count N1+) fold in ONE groupBy over the distinct-
    bigram table; the w2 continuation counts in another; the global
    distinct-bigram count enters as a 1-row broadcast. Everything
    shuffles (token, count) rows — never text."""
    return _kn_model_from(
        doc_bigram_counts(docs, "doc_id", text_col), discount
    )


def _kn_model_from(bg: DataFrame, discount: float = 0.75) -> DataFrame:
    """KN model from a prebuilt (id, bg, c) table — see
    :func:`_mle_model_from` for why this split exists.

    The persist point is ``c2`` — the AGGREGATED distinct-bigram table
    that all four model views (w1 stats, w2 stats, the global count,
    the final join) derive from — not the raw per-doc table: c2 is
    smaller by the cross-doc repeat factor and caching it saves three
    re-runs of the scan+groupBy, while caching the exploded per-doc
    table was measured to DOUBLE the key at sf0.1 (cache-write cost on
    the big table + a broken codegen pipeline into each consumer).
    Tracked for the caller's hand-back (novlake_spark/cache.py)."""
    from novlake_spark.cache import track

    c2 = track(
        bg.groupBy("bg")
        .agg(F.sum("c").alias("c2"))
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .withColumn("w2", F.split(F.col("bg"), " ")[1])
        .persist()
    )
    w1s = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    w2s = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    tot = c2.agg(F.count(F.lit(1)).alias("b"))
    d = F.lit(discount)
    # expression tree mirrored EXACTLY in the SQL oracles — reassociating
    # any of these ops changes low bits and breaks the cross-engine hash
    p = (F.col("c2").cast("double") - d) / F.col("c1") + (
        (d * F.col("n1f")) / F.col("c1")
    ) * (F.col("n1b").cast("double") / F.col("b"))
    inll = grid(-F.log(p), 1000000)
    return (
        c2.join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(tot))
        .select("bg", inll.alias("inll"))
    )


def score_perplexity(
    docs: DataFrame, model: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score ``docs`` against a (bg, inll) model — grid-integer
    negative log-likelihoods as built by :func:`bigram_model` or
    :func:`kn_bigram_model`.

    Per-document (id, n_bigrams, cross_entropy, ppl). Bigrams unseen
    by the model drop out of the average (inner join) — ``n_bigrams``
    counts *scored* bigram occurrences, so train-vs-heldout coverage
    is visible in the output rather than silently smoothed over.
    Documents with <2 tokens (or no scored bigram) yield no row. The
    average is occurrence-weighted over the per-doc count table —
    identical to the per-occurrence average, computed on
    repeat-factor-fewer rows.

    Exactness: the weighted sum is BIGINT (grid-nll × count — order
    free); cross_entropy is two correctly-rounded divisions of it, and
    ppl floor-grids exp() at 4 dp so a sub-boundary libm ULP cannot
    move the hash (the old ``round(float-sum)`` form was the
    ORACLE_NOTES.md #4 flake class).
    """
    doc_bg = doc_bigram_counts(docs, id_col, text_col)
    return _score_from(doc_bg, model, id_col)


def _score_from(doc_bg: DataFrame, model: DataFrame, id_col: str = "doc_id") -> DataFrame:
    wsum = F.sum(F.col("inll") * F.col("c"))
    n = F.sum("c")
    ce = wsum.cast("double") / n / F.lit(1000000.0)
    return (
        doc_bg.join(model, "bg")
        .groupBy(id_col)
        .agg(
            n.alias("n_bigrams"),
            ce.alias("cross_entropy"),
            (F.floor(F.exp(ce) * 10000 + F.lit(0.5)) / 10000).alias("ppl"),
        )
    )


def perplexity_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document perplexity under a model estimated on ``docs`` itself.

    Two scans (model pass + scoring pass) ON PURPOSE: the MLE pipeline
    references the bigram table only twice, and persisting it was
    MEASURED SLOWER at sf10 (7.0 s recomputed vs 9.5 s shared — the
    exploded (doc, bg, c) table is larger than the text it came from,
    so one saved Arrow scan doesn't pay for writing it to storage).
    The KN twin references it four times and shares (see
    :func:`kn_perplexity_scores`: 22.6 → 9.9 s). For the held-out
    variant — two different doc sets, nothing to share — estimate on a
    train split and score the rest:
    ``score_perplexity(heldout, bigram_model(train))``.
    """
    return score_perplexity(docs, bigram_model(docs, text_col), id_col, text_col)


def kn_perplexity_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document cross-entropy under a Kneser-Ney model estimated on
    ``docs`` itself. Two Arrow bigram scans (model + scoring, like the
    MLE twin); the four-way model fan-in is absorbed by the tracked c2
    persist inside :func:`_kn_model_from` — see its docstring for the
    measured cache-point comparison."""
    return score_perplexity(docs, kn_bigram_model(docs, text_col), id_col, text_col)
