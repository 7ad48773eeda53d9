"""Incremental corpus dedup (SignatureIndex): batch admission against a
persistent inverted LSH index — exact dups rejected, near-dups rejected,
novel docs admitted, the index grows only by what was admitted, and a
later batch is checked against EARLIER batches' admissions."""

import pytest

from novlake_spark.operators.incdedup import SignatureIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a pale winter moon near the old stone "
    "bridge by the river"
)
OTHER = (
    "completely different subject matter entirely about spark query "
    "plans shuffles partitions joins aggregates windows and the art "
    "of distributed execution at scale"
)


@pytest.fixture()
def index(spark, tmp_path):
    return SignatureIndex(spark, str(tmp_path / "idx"))


def test_first_batch_within_batch_dedup(spark, index):
    batch = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),                      # exact dup of 1 → rejected
            (3, OTHER),                     # novel → admitted
            (4, "too short"),               # < shingle_k tokens → rejected
        ],
    )
    admitted = {r.doc_id for r in index.admit(batch, threshold=0.8).collect()}
    assert admitted == {1, 3}
    assert index.indexed_count() == 2


def test_cross_batch_rejection_and_index_growth(spark, index):
    b1 = _docs(spark, [(1, BASE), (2, OTHER)])
    assert {r.doc_id for r in index.admit(b1).collect()} == {1, 2}

    # batch 2: an exact dup of an INDEXED doc, a near-dup (one word
    # changed), and a novel doc
    near = BASE.replace("winter", "summer")
    b2 = _docs(
        spark,
        [
            (10, BASE),     # exact dup of indexed 1 → rejected
            (11, near),     # near-dup of indexed 1 → rejected
            (12, "a genuinely new document about matrix multiplication "
                 "kernels cache blocking and numerical stability of sums"),
        ],
    )
    admitted = {r.doc_id for r in index.admit(b2, threshold=0.8).collect()}
    assert admitted == {12}
    assert index.indexed_count() == 3

    # batch 3: dup of batch-2's ADMITTED doc proves the index UPDATED
    b3 = _docs(spark, [(20, "a genuinely new document about matrix "
                            "multiplication kernels cache blocking and "
                            "numerical stability of sums"),
                       (21, BASE + " extra trailing words here")])
    admitted = {r.doc_id for r in index.admit(b3, threshold=0.8).collect()}
    assert 20 not in admitted
    assert index.indexed_count() == 3 + len(admitted)


def test_threshold_is_respected(spark, index):
    index.admit(_docs(spark, [(1, BASE)]))
    near = BASE.replace("winter", "summer")
    # permissive threshold admits the near-dup; strict rejects it
    loose = SignatureIndex(index.spark, index.sigs.path.rsplit("/", 1)[0])
    admitted = {r.doc_id for r in loose.admit(_docs(spark, [(2, near)]), threshold=0.999).collect()}
    assert admitted == {2}


def test_exactly_once_txn_replay(spark, index):
    b1 = _docs(spark, [(1, BASE)])
    index.admit(b1, txn="batch-0001")
    v_sig = index.sigs.latest_version()
    # same txn key re-applied → idempotent (no duplicate signatures)
    index.admit(b1, txn="batch-0001")
    assert index.sigs.latest_version() == v_sig
    assert index.indexed_count() == 1


def test_bad_family_config_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="fit in num_hashes"):
        SignatureIndex(spark, str(tmp_path / "x"), num_hashes=8, num_bands=8, rows_per_band=4)


def test_streaming_admission_matches_batch(spark, tmp_path):
    """The streaming shape (round 6): raw docs land in a txlog table, a
    foreachBatch pipe admits each micro-batch through the SAME
    SignatureIndex — cross-batch near-dedup without rescanning admitted
    corpus, with availableNow == batch semantics. Two pump rounds share
    one checkpoint, so round 2's duplicates of round-1 ADMITTED docs
    must reject against the index the stream itself built."""
    from novlake_spark.sources.txlog_source import register_txlog_source
    from novlake_spark.txlog import TxTable

    register_txlog_source(spark)
    raw = TxTable(spark, str(tmp_path / "raw"))
    index = SignatureIndex(spark, str(tmp_path / "idx"))
    out = TxTable(spark, str(tmp_path / "admitted"))

    def admit_batch(batch_df, batch_id):
        adm = index.admit(batch_df, threshold=0.8, txn=f"b{batch_id}")
        out.commit(adm.select("doc_id", "text"), txn=f"out{batch_id}")

    def pump():
        q = (
            spark.readStream.format("txlog")
            .option("path", str(tmp_path / "raw"))
            .load()
            .writeStream.foreachBatch(admit_batch)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    raw.commit(_docs(spark, [(1, BASE), (2, BASE), (3, OTHER)]))
    pump()
    assert {r.doc_id for r in out.read().collect()} == {1, 3}

    # a solid near-dup (one appended token, true J ≈ 0.93 — well above
    # the threshold even under the 32-hash estimator's variance; a
    # single mid-string word swap sits at J ≈ 0.79, ON the 0.8 line,
    # where the estimate legitimately straddles)
    near = BASE + " coda"
    raw.commit(_docs(spark, [(10, near), (11, "fresh prose on entirely "
                                              "novel themes like gardening "
                                              "rainfall soil and patient compost")]))
    pump()
    assert {r.doc_id for r in out.read().collect()} == {1, 3, 11}
    assert index.indexed_count() == 3


def test_empty_batch_publishes_no_commit(spark, index):
    """An empty (or all-sub-shingle) batch must not grow the index log —
    a per-micro-batch streaming caller would otherwise publish an empty
    commit every tick."""
    index.admit(_docs(spark, [(1, BASE)]))
    v = index.sigs.latest_version()
    out = index.admit(_docs(spark, [(9, "too short")]))  # no shingles
    assert out.count() == 0
    assert index.sigs.latest_version() == v
    assert index.indexed_count() == 1
