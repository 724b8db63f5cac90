"""Link-analysis operators: fixed-point iteration over an edge relation.

PageRank (Brin & Page 1998) re-expressed as the standard Spark shape:
each iteration is one join of the edge relation against the current
rank relation plus one aggregation on the destination key — the same
loop GraphX's Pregel runs, declared with DataFrames so Catalyst/AQE
pick the physical strategy per iteration.

The rank recurrence here is deliberately INTEGER-EXACT:

    r_0(v)     = 1_000_000
    r_{t+1}(v) = 150_000 + sum over in-edges (u, v) of
                 (85 * r_t(u)) div (100 * outdeg(u))

i.e. damping 0.85 with rank mass scaled by 1e6 and every contribution
truncated to an integer. Integer sums are associative and
order-independent, so the result is bit-identical across engines and
partitionings — the float formulation would drift under Spark's
non-deterministic aggregation order. (The reference has no graph
surface; this is part of the engine's large-scale curation toolkit —
link-graph authority scores are a standard web-corpus quality signal.)

100-TB notes:
- per iteration: one shuffle of the edge relation keyed by src (join
  against ranks) and one shuffle of the contribution stream keyed by
  dst (partial-agg'd map-side). The edge relation never grows; ranks
  is one row per node.
- pre-partitioning edges by src and persisting lets every iteration
  reuse the layout (no re-shuffle of the static side); on a real
  cluster, bucketing the edge table by src makes the join exchange-free.
- convergence at scale is a driver-side loop on a 1-row delta agg
  (same probe pattern as kmeans_fit / dedup_components); fixed
  iteration counts (as gated here) need no probe at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_SCALE = 1_000_000
BASE = 150_000  # (1 - 0.85) * RANK_SCALE
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(edges: DataFrame, iters: int = 2) -> DataFrame:
    """Integer-exact PageRank over a directed edge relation (src, dst).

    Every node must have outdeg >= 1 (feed undirected graphs as
    bidirectional edge pairs, which guarantees it); dangling-node mass
    is otherwise dropped, matching the truncated-contribution model.
    Returns (node, rank) with rank scaled by RANK_SCALE.
    """
    # the edge relation is referenced by every iteration's join (and
    # deg twice more) — persist so one action computes the upstream
    # plan (often itself a join, as in g_pagerank) exactly once; on a
    # cluster the same role is played by a bucketed edge table
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(RANK_SCALE).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({DAMP_NUM} * rank) div ({DAMP_DEN} * outdeg)"
                ).alias("c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(BASE) + F.sum("c")).cast("long").alias("rank")
        )
    return ranks


def pagerank_oracle_cte(edges_sql: str, iters: int = 2) -> str:
    """DuckDB CTE chain computing the identical integer recurrence.

    `edges_sql` must select (src, dst). Returns SQL exposing r{iters}
    as relation `ranks(node, rank)`; caller appends the final SELECT.
    """
    parts = [
        f"edges AS ({edges_sql})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT src AS node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for t in range(iters):
        parts.append(
            f"""r{t + 1} AS (
        SELECT e.dst AS node,
               CAST({BASE} + sum(({DAMP_NUM} * r.rank)
                    // ({DAMP_DEN} * d.outdeg)) AS BIGINT) AS rank
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN r{t} r ON e.src = r.node
        GROUP BY e.dst)"""
        )
    parts.append(f"ranks AS (SELECT node, rank FROM r{iters})")
    return "WITH " + ",\n    ".join(parts)
