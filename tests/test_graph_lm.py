"""Connected components + bigram-LM perplexity operator tests."""

from pyspark.sql import functions as F

from novlake_spark.operators.graph import connected_components
from novlake_spark.operators.lm import perplexity_scores


def test_components_planted_clusters(spark):
    # graph: {1,2,3} chained, {4,5} pair, {6} singleton
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    edges = spark.createDataFrame([(2, 1), (3, 2), (5, 4)], "a long, b long")
    got = {r["id"]: r["component_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_components_long_path_converges(spark):
    # worst case for min-propagation: a path 0-1-2-…-n (diameter n)
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "a long, b long")
    got = connected_components(nodes, edges, max_iter=n + 1).collect()
    assert all(r["component_id"] == 0 for r in got)


def test_perplexity_ranks_repetition_as_predictable(spark):
    rows = [
        (1, "a b a b a b a b a b a b"),  # fully predictable transitions
        (2, "q w e r t y u i o p a s"),  # every bigram unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in perplexity_scores(docs).collect()}
    assert got[1]["ppl"] < got[2]["ppl"]
    assert got[1]["n_bigrams"] == 11 and got[2]["n_bigrams"] == 11
    # doc 1's transitions are near-deterministic -> cross-entropy ~ 0
    assert got[1]["cross_entropy"] < 0.2


def test_perplexity_drops_sub_bigram_docs(spark):
    docs = spark.createDataFrame([(1, "solo"), (2, "two tokens")], "doc_id long, text string")
    ids = [r["doc_id"] for r in perplexity_scores(docs).select("doc_id").collect()]
    assert ids == [2]


def test_components_ignore_edge_direction(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    fwd = connected_components(nodes, spark.createDataFrame([(1, 2)], "a long, b long")).collect()
    rev = connected_components(nodes, spark.createDataFrame([(2, 1)], "a long, b long")).collect()
    assert sorted(map(tuple, fwd)) == sorted(map(tuple, rev)) == [(1, 1), (2, 1)]


def test_two_phase_matches_propagation_on_random_graph(spark):
    import random

    rng = random.Random(7)
    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(rng.randrange(n), rng.randrange(n)) for _ in range(45)], "a long, b long"
    )
    from novlake_spark.operators.graph import connected_components_two_phase

    want = sorted(map(tuple, connected_components(nodes, edges).collect()))
    got = sorted(map(tuple, connected_components_two_phase(nodes, edges).collect()))
    assert got == want


def test_two_phase_long_path_needs_few_rounds(spark):
    # diameter-24 path: min-propagation needs ~24 rounds, the star
    # alternation must land well under log-linear bounds.
    from novlake_spark.operators.graph import connected_components_two_phase

    n = 24
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "a long, b long")
    got = connected_components_two_phase(nodes, edges, max_iter=7).collect()
    assert len(got) == n + 1
    assert all(r["component_id"] == 0 for r in got)


def test_two_phase_singletons_and_direction(spark):
    from novlake_spark.operators.graph import connected_components_two_phase

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    got = {
        (r["id"], r["component_id"])
        for r in connected_components_two_phase(
            nodes, spark.createDataFrame([(2, 1)], "a long, b long")
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 3)}
