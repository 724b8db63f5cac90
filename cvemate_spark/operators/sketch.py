"""Count-min sketch as a distributed aggregation.

The classic streaming-summary structure (Cormode & Muthukrishnan 2005)
re-expressed as a Spark aggregation: a sketch is a tiny (depth x width)
relation of cell counts, built with ONE map-side-combinable groupBy
over the token stream. Estimation is a broadcast join of the probe
terms against the bounded sketch relation. Both directions stay inside
whole-stage codegen — the hash is the engine's portable 60-bit
md5-prefix hash, so a DuckDB oracle can rebuild the identical sketch
(see queries/curation_ops.py::e_cms).

Reference parity: the reference keeps exact per-key counters in its
store (handlers aggregate per CVE id); the sketch is the sublinear
counterpart this engine adds for 100-TB cardinalities where an exact
per-term map no longer fits anywhere.

100-TB notes:
- the sketch relation is depth*width rows NO MATTER the input size —
  the shuffle after the partial agg moves at most
  depth*width*partitions rows, and the broadcast at estimate time is
  bounded by construction (never a per-doc relation);
- merging shards is a union + re-sum (counters are additive), so
  per-day / per-source sketches roll up without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEPTH = 4
WIDTH = 256


def _bucket_expr_spark(term: str, j: str, width: int) -> str:
    """Row-j bucket for a term: portable md5-prefix hash of 'j:term'."""
    return (
        f"cast(conv(substring(md5(concat(cast({j} as string), ':', {term})), 1, 15),"
        f" 16, 10) as bigint) % {width}"
    )


def _bucket_expr_duck(term: str, j: str, width: int) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({j} AS VARCHAR) || ':' || {term}), 1, 15))"
        f" AS BIGINT) % {width}"
    )


def cms_build(
    tokens: DataFrame, col: str = "term", depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Build a (j, bucket, cnt) sketch from a one-column token stream.

    Each occurrence lands in `depth` cells; the groupBy partial-aggs
    map-side, so the shuffle carries at most depth*width rows per
    input partition regardless of token volume.
    """
    cell = F.expr(
        f"transform(sequence(0, {depth - 1}), j -> named_struct("
        f"'j', j, 'bucket', {_bucket_expr_spark(col, 'j', width)}))"
    )
    return (
        tokens.select(F.explode(cell).alias("c"))
        .select(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "term",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-estimate counts for probe terms: min over the d cells.

    The sketch is depth*width rows by construction — the ONE forced
    broadcast in this module is structurally bounded, never data-sized.
    """
    probe_cells = probes.select(
        col,
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr_spark(col, "j", width)))
    return (
        probe_cells.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_build_grouped(
    tokens: DataFrame,
    group_col: str,
    col: str = "term",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Per-group (j, bucket, cnt) sketches in one pass — the kmv
    `per_group_bottom_k` counterpart. Output is |groups| x depth x width
    rows max; the groupBy partial-aggs map-side exactly like cms_build.
    """
    cell = F.expr(
        f"transform(sequence(0, {depth - 1}), j -> named_struct("
        f"'j', j, 'bucket', {_bucket_expr_spark(col, 'j', width)}))"
    )
    return (
        tokens.select(group_col, F.explode(cell).alias("c"))
        .select(group_col, F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .groupBy(group_col, "j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge_grouped(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Merge per-group sketches: counters ADD, so union + re-sum is
    EXACTLY the sketch of the concatenated streams — the law that makes
    incremental (per-micro-batch) maintenance lossless."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
