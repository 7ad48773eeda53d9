"""BPE trainer: deterministic merges, cluster-size invariance, encoding."""

from novlake_spark.operators import bpe as B
from novlake_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_train_merges_classic_example():
    # The worked example from the BPE paper: 'es' pairs dominate.
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = B.train_merges(wc, 3)
    assert [(a, b) for _, a, b, _ in merges] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert [c for *_, c in merges] == [9, 9, 9]


def test_train_merges_tie_break_deterministic():
    # Two pairs with equal counts: lexicographically smaller merges first.
    wc = [("ab", 3), ("cd", 3)]
    merges = B.train_merges(wc, 3)
    assert merges[0][1:3] == ("a", "b")
    # the freshly-merged 'ab' now pairs with </w> at the same count and
    # sorts before ('c','d') — lexicographic tie-break is total
    assert merges[1][1:3] == ("ab", "</w>")
    assert merges[2][1:3] == ("c", "d")


def test_train_bpe_partitioning_invariant(spark):
    docs = load_table(spark, SF, "documents")
    one = B.train_bpe(docs.coalesce(1), n_merges=8).collect()
    many = B.train_bpe(docs.repartition(16), n_merges=8).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    assert len(one) == 8


def test_encode_words_consistent_with_merges(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    merge_rows = B.train_bpe(docs, n_merges=8).collect()
    merges = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in merge_rows]
    enc = B.encode_words(docs, merges)
    # every token is either a merged symbol, a single char, or char+</w>
    merged = {r["merged"] for r in merge_rows}
    for row in enc.limit(200).collect():
        t = row["bpe_token"]
        assert t in merged or len(t.replace(B.END, "x")) <= 2
