"""Graph / link-analysis query surface.

The engine's curation toolkit at web-corpus scale needs link-graph
signals (authority scores drive crawl-frontier and quality weighting
— the shape every large pretraining-corpus pipeline runs over its URL
graph). The testdata has no URL graph, so the gated query builds the
natural bipartite purchase graph (customer ↔ supplier through
orders×lineitem) and ranks it; the operator itself
(`operators/graph.py::pagerank`) is graph-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.graph import pagerank, pagerank_oracle_cte
from ..tables import load_table
from .base import Registry

REG = Registry()

_EDGES_SQL = """
        SELECT src, dst FROM (
            SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                            'S' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )
        UNION
        SELECT dst, src FROM (
            SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                            'S' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )"""


@REG.add(
    "g_pagerank",
    pagerank_oracle_cte(_EDGES_SQL, iters=2)
    + """
    SELECT node AS node_id, rank AS pr
    FROM ranks
    ORDER BY pr DESC, node_id
    LIMIT 100
    """,
    doc="Integer-exact PageRank (2 unrolled iterations, damping 0.85, "
    "rank mass x 1e6, truncated contributions) over the bidirectional "
    "customer-supplier purchase graph; top-100 hubs. Every iteration "
    "is one src-keyed join + one dst-keyed partial-agg'd shuffle; "
    "integer arithmetic makes the result order- and "
    "partitioning-independent, so the DuckDB oracle (the same "
    "recurrence as unrolled CTEs) matches bit-for-bit.",
)
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = cs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        cs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=2)
    return (
        ranks.select(F.col("node").alias("node_id"), F.col("rank").alias("pr"))
        .orderBy(F.desc("pr"), "node_id")
        .limit(100)
    )
