"""Graph-analytics query keys: PageRank and triangle counting.

Training-data curation leans on link analysis — crawl frontiers are
prioritized by PageRank-family scores (the CommonCrawl/OpenWebText
lineage: rank pages, keep the head), and triangle-derived clustering
coefficients separate organic link neighborhoods from link farms. Both
are ITERATIVE/combinatorial ops that SQL engines don't ship natively,
so they are the strongest test of the repo's "express it as DataFrame
ops, grade it cross-engine" discipline:

- PageRank is graded on an exact INTEGER grid (rank_ppm): float ranks
  are order-of-summation-dependent and therefore not reproducible
  across engines OR across cluster sizes; the integer spec is both.
- Triangle counts are orientation-invariant, so the Spark side can run
  the degree-ordered algorithm that survives hub skew at 100 TB while
  the oracle states the naive id-ordered definition.

The graph is derived from the fixtures: parts are nodes, co-occurrence
in an order is an edge (the market-basket projection), restricted to
even part keys — the deterministic modulo-sampling discipline
(ORACLE_NOTES.md; q_pdf_cmap_extract precedent) that keeps the sf0.1
oracle sweep affordable (wedge count grows with deg², so a 2× node
sample cuts the oracle's join ~4×) while exercising identical code
paths on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novlake_spark.operators.graph import _track, pagerank_int, triangles_per_node
from novlake_spark.registry import register
from novlake_spark.sources.tables import load_table

_EDGES_SQL = """b AS (SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem WHERE l_partkey % 2 = 0),
    e AS (SELECT DISTINCT a.l_partkey AS p1, c.l_partkey AS p2
          FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey)"""


def _co_occurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part co-occurrence pairs (p1 < p2), even part keys.

    Both self-join sides derive from one distinct (order, part) scan,
    so the orderkey exchange is planned once; per-order pair fan-out is
    bounded by basket size (≤13 items), never cross-basket — the same
    linearity argument as q_market_basket."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 2 == 0)
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    c = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    return (
        a.join(c, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        # lazy persist: both graph operators symmetrize this list (two
        # references), and Catalyst has no common-subplan dedup — the
        # basket self-join would otherwise run twice before the
        # operator's own reuse points even kick in. Tracked so the
        # caller releases it after its action (ADVICE r8: these leaked
        # into executor storage for the session lifetime otherwise).
        .distinct()
        .persist()
        .transform(_track)
    )


def _pagerank_oracle(iters: int = 3) -> str:
    ctes = [
        _EDGES_SQL,
        """sym AS (SELECT p1 AS src, p2 AS dst FROM e
              UNION ALL SELECT p2, p1 FROM e),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (SELECT s.dst AS node, CAST(sum(r.r // g.d) AS BIGINT) AS m
           FROM sym s JOIN r{i - 1} r ON s.src = r.node
                      JOIN deg g ON s.src = g.src
           GROUP BY s.dst),
    r{i} AS (SELECT node, CAST(150000 + (85 * m) // 100 AS BIGINT) AS r
             FROM c{i})"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node AS part, r AS rank_ppm FROM r{iters}"
    )


@register("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR1: 3-iteration damped PageRank (d=0.85) over the part
    co-occurrence graph, on an exact integer grid (rank_ppm: initial
    mass 1e6/node, update 150000 + (85·inflow) DIV 100 with truncating
    division — floor == truncate on non-negative values, so DuckDB
    ``//`` and Spark ``DIV`` agree bit-for-bit).

    Plan: per iteration one node-keyed join (edge list × rank vector)
    + one destination groupBy — the same exchange key every round, so
    the shuffle partitioning is reused. The oracle unrolls the three
    iterations as CTEs; the Spark side is the reusable
    operators.graph.pagerank_int. At crawl scale the rank vector is
    ~16 bytes/node and edges shuffle once per iteration — PageRank's
    canonical MapReduce shape."""
    return pagerank_int(
        _co_occurrence_edges(spark, sf_dir), src="p1", dst="p2"
    ).select(F.col("node").alias("part"), "rank_ppm")


@register(
    "q_graph_triangles",
    oracle=f"""
    WITH {_EDGES_SQL},
    t AS (SELECT e1.p1 AS a, e1.p2 AS b2, e2.p2 AS c2
          FROM e e1
          JOIN e e2 ON e1.p2 = e2.p1
          JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
    x AS (SELECT a AS node FROM t
          UNION ALL SELECT b2 FROM t
          UNION ALL SELECT c2 FROM t)
    SELECT node AS part, CAST(count(*) AS BIGINT) AS n_triangles
    FROM x GROUP BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR2: per-node triangle participation over the part co-occurrence
    graph — the clustering-coefficient numerator.

    The Spark side runs the degree-ordered "forward" algorithm
    (operators.graph.triangles_per_node): wedges pivot at each
    triangle's LOWEST-(degree,id) vertex, bounding fan-out by oriented
    out-degree ≤ O(sqrt(|E|)) — the hub-skew survival trick (Suri &
    Vassilvitskii, WWW'11). The oracle states the naive id-ordered
    three-way join; the triangle SET is a graph invariant, so the two
    formulations must agree row-for-row — grading the optimization
    against the definition."""
    return triangles_per_node(
        _co_occurrence_edges(spark, sf_dir), src="p1", dst="p2"
    ).select(F.col("node").alias("part"), "n_triangles")
