"""KMV (k-minimum-values / bottom-k) distinct-value sketch.

Bar-Yossef et al. 2002; Beyer et al. 2007 ("On synopses for
distinct-value estimation under multiset operations"). A KMV sketch of
a set S under a uniform hash h: [*] -> [0, M) is the k smallest
DISTINCT hash values of S. It supports:

- distinct-count estimation:  D(S) ~= (k-1) * M / U_k   (U_k = k-th
  minimum), EXACT |sketch| when the sketch never filled (n < k);
- UNION:      bottom-k of the merged sketches is the sketch of A u B;
- INTERSECTION: rho = |{bottom-k(A u B)} n A n B| / k_used estimates
  the Jaccard against the union, so |A n B| ~= rho * D(A u B).

This is the set-operation complement to the count-min sketch
(`operators/sketch.py`, point frequencies) and HLL (`e_hll`,
distinct-only: KMV adds intersection and any boolean combination).

Reference parity: the reference logs exact per-batch document counts
in its upsert path (mongodb_handler.py:141-195 _process_request) and
tracks per-source freshness rows (mongodb_handler.py:212-307); KMV is
the sublinear counterpart for cross-shard vocabulary overlap at sizes
where exact distinct joins are a full shuffle of the corpus.

100-TB notes:
- `bottom_k` compiles to distinct + orderBy(h).limit(k) =
  HashAggregate + TakeOrderedAndProject: per-partition k-heaps after a
  map-side-combined distinct — never a global sort;
- a sketch is <= k rows NO MATTER the input size; merge = union +
  re-bottom-k, so per-shard / per-day sketches roll up without
  touching raw data (the additive-counter property cms_merge has);
- every estimator below is exact-integer until one final
  correctly-rounded double division — portable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_SPACE = 1 << 60  # the engine's portable 60-bit md5-prefix hash range


def bottom_k(hashes: DataFrame, k: int, col: str = "h") -> DataFrame:
    """Bottom-k distinct hash values: the KMV sketch relation (<= k rows).

    distinct() partial-aggregates map-side; orderBy+limit is
    TakeOrderedAndProject (per-partition heaps, driver merge of k)."""
    return hashes.select(col).distinct().orderBy(col).limit(k)


def per_group_bottom_k(
    dist: DataFrame, group_col: str, k: int, col: str = "h"
) -> DataFrame:
    """Per-group KMV sketches in ONE pass: row_number within each group
    over hash order, kept <= k. The input must already be distinct on
    (group, hash) so ranks are strict.

    Scale: the window sorts within each group's hash partition — the
    standard per-group top-k shape; output is |groups| x k rows. For a
    handful of groups `bottom_k` per group (TakeOrderedAndProject) is
    cheaper; this form wins when |groups| is large enough that one
    shuffled pass beats |groups| jobs."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(group_col).orderBy(col)
    return (
        dist.select(group_col, col, F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def merge_flags(sk_a: DataFrame, sk_b: DataFrame, col: str = "h") -> DataFrame:
    """Union two sketches keeping side-membership flags (<= 2k rows)."""
    a = sk_a.select(col, F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b = sk_b.select(col, F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    return (
        a.unionByName(b)
        .groupBy(col)
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )


def union_intersect_estimate(
    sk_a: DataFrame, sk_b: DataFrame, k: int, col: str = "h"
) -> DataFrame:
    """One-row estimate relation from two same-k sketches.

    Columns: k, n_seen (union-sketch fill, <= k), u_k (k_used-th
    minimum), n_both (union-sketch members present in BOTH sides),
    est_union, est_inter (doubles). When the union sketch never filled
    (n_seen < k) the union estimate IS n_seen — exact by construction —
    and the intersection ratio n_both/n_seen is likewise exact."""
    bottom = merge_flags(sk_a, sk_b, col).orderBy(col).limit(k)
    est = bottom.agg(
        F.count("*").alias("n_seen"),
        F.max(col).alias("u_k"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("long")
        .alias("n_both"),
    )
    est_union = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("u_k").cast("double")
    )
    # empty union sketch (both inputs empty): everything is exactly 0,
    # never NULL — the empty-slice totality contract
    est_inter = F.when(F.col("n_seen") == 0, F.lit(0.0)).otherwise(
        (F.col("n_both").cast("double") / F.col("n_seen").cast("double"))
        * est_union
    )
    return est.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_seen").cast("long").alias("n_seen"),
        F.col("u_k").cast("long").alias("u_k"),
        "n_both",
        est_union.alias("est_union"),
        est_inter.alias("est_inter"),
    )
