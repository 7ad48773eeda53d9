"""Round-8 graded-key semantics: CDF snapshot reconstruction, the
canonical-keeper policy, version-pinned decontamination, and the
arith-pixel constructive-oracle mode for image decode."""

import pyspark.sql.functions as F

from novlake_spark.txlog import TxTable


def test_cdf_reconstruction_matches_snapshot(spark, tmp_path):
    """The q_txlog_cdf grading technique, pinned at the operator level:
    across commit + CoW delete + CoW update + DV delete, every row's
    net feed multiplicity (insert − delete) equals its presence in the
    final snapshot — the CDC-consumer idempotence invariant. This holds
    for the FILE-GRANULAR feed precisely because a rewrite's re-emitted
    untouched rows appear as one delete and one insert that cancel."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(i, i * 10) for i in range(40)], "k long, v long")
        .repartition(3)
    )
    t.delete([("k", "<", 10)])
    t.update({"v": "v + 1"}, where=[("k", ">=", 10), ("k", "<", 20)])
    t.delete([("k", ">=", 35)], dv=True)

    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    net = (
        t.changes(-1)
        .groupBy("k", "v")
        .agg(F.sum(sign).alias("n"))
    )
    bad = net.filter(~F.col("n").isin(0, 1)).count()
    assert bad == 0, "a feed row was dropped or double-delivered"
    rebuilt = sorted(
        (r.k, r.v) for r in net.filter(F.col("n") == 1).collect()
    )
    snapshot = sorted((r.k, r.v) for r in t.read().collect())
    assert rebuilt == snapshot
    assert rebuilt == [(k, k * 10 + (1 if 10 <= k < 20 else 0)) for k in range(10, 35)]


def test_keeper_prefers_longest_then_lowest_id(spark, sf_small):
    """q_llm_dedup_keeper policy on planted clusters: raw-length
    descending wins; equal lengths fall back to the lowest doc_id."""
    from novlake_spark.registry import queries

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),        # cluster A: same normalized text,
            (2, "  alpha beta  "),    # longer RAW text -> keeper
            (3, "alpha beta "),
            (7, "solo doc"),          # singleton: always its own keeper
            (10, "x y"),              # cluster B: equal lengths ->
            (11, "x y"),              # lowest id keeps
        ],
        "doc_id long, text string",
    )
    # the key reads the documents fixture, so the planted-cluster
    # policy is asserted on the same projection + window the key builds
    from pyspark.sql.window import Window

    proj = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"),
        F.length("text").alias("_len"),
    )
    w = Window.partitionBy("text_hash").orderBy(
        F.col("_len").desc(), F.col("doc_id").asc()
    )
    out = {
        r.doc_id: r.is_keeper
        for r in proj.select(
            "doc_id", (F.row_number().over(w) == 1).cast("int").alias("is_keeper")
        ).collect()
    }
    assert out == {1: 0, 2: 1, 3: 0, 7: 1, 10: 1, 11: 0}

    # and the registered key itself runs, emitting exactly one keeper
    # per cluster over the real fixture
    df = queries()["q_llm_dedup_keeper"](spark, sf_small)
    per_cluster = (
        df.groupBy("text_hash").agg(F.sum("is_keeper").alias("n_keep")).collect()
    )
    assert all(r.n_keep == 1 for r in per_cluster)


def test_contamination_snapshot_is_version_pinned(spark, sf_small):
    """q_llm_contamination_snapshot must answer from VERSION AS OF 0
    (the even-doc_id commit) even though a later commit added the odd
    half: every result row is an even doc_id, and none are src0."""
    from novlake_spark.registry import queries

    rows = queries()["q_llm_contamination_snapshot"](spark, sf_small).collect()
    assert rows, "empty decontamination result"
    assert all(r.doc_id % 2 == 0 for r in rows), "v1 leaked into the v0 run"


def test_arith_images_pixel_sum_is_stateable(spark):
    """synthesize_images(arith=True): for the lossless codecs the
    decoded channel-byte sum equals the closed form
    Σ (x*3 + y*7 + c*31 + i*13) mod 256 — the identity the
    q_multimodal_decode FULL oracle states in SQL."""
    import numpy as np

    from novlake_spark.operators.multimodal import (
        decode_image_stdlib,
        synthesize_images,
    )

    media = synthesize_images(spark, n=10, arith=True)
    feats = {r.media_id: r for r in decode_image_stdlib(media).collect()}
    assert len(feats) == 10  # every codec decoded, nothing quarantined
    for i in range(10):
        w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
        assert (feats[i].width, feats[i].height) == (w, h)
        if i % 5 <= 2:  # bmp / ppm / png: lossless
            xs = np.arange(w, dtype=np.int64)[None, :, None]
            ys = np.arange(h, dtype=np.int64)[:, None, None]
            cs = np.arange(3, dtype=np.int64)[None, None, :]
            want = int(((xs * 3 + ys * 7 + cs * 31 + i * 13) % 256).sum())
            assert feats[i].px_sum == want, f"image {i}"
