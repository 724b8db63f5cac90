"""The CveMate pipeline, Spark-first: normalize → merge → score.

Replaces the reference's job loop (`main.py:64-89`, sequential source
handlers + a threaded write queue) with a chain of keyed upsert-merges
into one wide `cve` table — each source contributes its struct column,
OP-MERGE (operators/merge.py) provides the
$set/$setOnInsert/last-writer-wins semantics, and the priority pass
(`handlers/prioritizer_handler.py`) collapses to one withColumn.

On a cluster the `cve` table is written hash-partitioned by `id`
(write_cve_table) so each nightly merge shuffles only the incoming
batch, not the 300k-row (or 300M-row) target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .functions.scoring import score_cve_table
from .operators.merge import merge_upsert


def build_cve_table(
    source_batches: list[DataFrame],
    now=None,
) -> DataFrame:
    """Fold per-source {id, <src>} batches into the wide cve table.

    Disjoint-source batches commute (each owns its column), so the
    fold order only matters within one source (last writer wins) —
    the convergence law of SURVEY §5.4.
    """
    target: DataFrame | None = None
    for batch in source_batches:
        target = merge_upsert(target, batch, key="id", now=now)
    if target is None:
        raise ValueError("no source batches")
    return target


def score(cve: DataFrame) -> DataFrame:
    """Priority pass: one column overwrite, no cursor loop (§2.9)."""
    return score_cve_table(cve)


def write_cve_table(cve: DataFrame, path: str, n_buckets: int = 32) -> None:
    """Persist the wide table hash-partitioned by id.

    repartition(id) co-locates future MERGE shuffles; with a metastore
    this would be `bucketBy(n, 'id').sortBy('id')` so the merge join
    needs no shuffle at all.
    """
    cve.repartition(n_buckets, "id").write.mode("overwrite").parquet(path)
