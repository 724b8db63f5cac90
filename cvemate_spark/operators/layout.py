"""Data-layout operators: z-order clustering + min/max manifest pruning.

The reference relies on its store's primary-key index for point reads
(SNK-4; collections keyed by CVE id). At 100 TB on object storage the
Spark-native equivalent is LAYOUT: cluster the data so each file's
min/max statistics cover a tight box of the key space, then prune
whole files from a manifest before the scan starts — the design Delta
OPTIMIZE ZORDER / Iceberg sort orders implement, scaled down to plain
parquet directories here.

The z-value (Morton code) interleaves the bits of the quantized
dimensions, so files that are contiguous in z cover small axis-aligned
boxes in BOTH dimensions at once — a single-column sort can only do
one. Everything is built from shiftleft/shiftright/& inside
whole-stage codegen; the identical arithmetic exists as a DuckDB SQL
fragment so the z-key computation is oracle-gated (e_zorder).

100-TB notes:
- the layout write is one repartitionByRange on the z-key (a single
  shuffle at write time, amortized over every later read);
- the manifest is one row per FILE (min/max per dimension) — pruning
  reads the manifest, not the data, exactly like Iceberg's
  manifest-file scan planning;
- pruning composes with parquet row-group stats: skipped files never
  open, surviving files still row-group-prune inside the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def zorder_expr_spark(xcol: str, ycol: str, bits: int = 8) -> str:
    """Morton interleave of two quantized-to-`bits` BIGINT expressions."""
    parts = [
        f"(shiftleft(shiftright({xcol}, {i}) & 1, {2 * i}) | "
        f"shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1}))"
        for i in range(bits)
    ]
    return " | ".join(parts)


def zorder_expr_duck(xcol: str, ycol: str, bits: int = 8) -> str:
    """The identical interleave as DuckDB SQL (verified value-identical)."""
    parts = [
        f"(((({xcol}) >> {i}) & 1) << {2 * i}) | (((({ycol}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return " | ".join(f"({p})" for p in parts)


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, n_files: int, bits: int = 8
) -> None:
    """Cluster `df` by the z-value of (xcol, ycol) into ~n_files files.

    repartitionByRange samples the z distribution, so files hold
    contiguous z-ranges (= tight 2-D boxes); the within-partition sort
    additionally tightens parquet row-group stats inside each file.
    """
    z = F.expr(zorder_expr_spark(xcol, ycol, bits)).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max manifest: one row per parquet file.

    One aggregation over the table builds it; at scale this is written
    once per layout job and consulted by every query after.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def prune_files(
    manifest: DataFrame, bounds: dict[str, tuple[float, float]]
) -> list[str]:
    """Files whose [min,max] box intersects every queried bound.

    Driver-side by design: the manifest is one row per file (a few
    thousand rows per 100-TB table), the canonical scan-planning
    collect — the same shape as Iceberg manifest evaluation.
    """
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    return [r["_file"] for r in manifest.filter(cond).select("_file").collect()]


def read_pruned(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    bounds: dict[str, tuple[float, float]],
) -> DataFrame:
    """Manifest-pruned scan + the residual row filter.

    Equivalent to `read(path).filter(...)` but opens only intersecting
    files. Returns an empty-but-typed frame when nothing survives.
    """
    files = prune_files(manifest, bounds)
    base = spark.read.parquet(*files) if files else spark.read.parquet(path).limit(0)
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & F.col(c).between(lo, hi)
    return base.filter(cond)


def compact_files(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Small-file compaction: rewrite a directory into ceil(bytes/target)
    files when it is over-fragmented. Small files are the classic
    object-store killer (per-file open cost dominates the scan); the
    rewrite uses coalesce — NO shuffle, each output task concatenates
    input splits — and lands via the versioned-snapshot sink so readers
    never see a partial directory. No-op (returns unchanged stats) when
    the layout is already within budget."""
    from .merge import write_versioned

    parts = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    total = sum(os.path.getsize(p) for p in parts)
    want = max(1, -(-total // target_bytes))
    if want >= len(parts):
        return {"files": len(parts), "bytes": total, "compacted": False}
    df = spark.read.parquet(path).coalesce(want)
    version = write_versioned(df, path + ".compacted")
    return {
        "files": len(parts),
        "bytes": total,
        "compacted": True,
        "out_files": want,
        "version": version,
    }
