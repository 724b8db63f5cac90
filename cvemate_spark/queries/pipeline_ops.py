"""The full CveMate pipeline (normalize → OP-MERGE fold → OP-SCORE)
as one gated query.

The unit tests prove the merge laws on fixtures; this query proves the
composed pipeline against the DuckDB oracle: three source batches
shaped like the reference's feeds (nvd with the nested CVSS metric
array, epss with string scores, kev presence-only) are derived from
the driver tables, folded through `merge_upsert` — with the epss batch
applied TWICE, so the oracle match also witnesses idempotence — and
scored with the CVSS-coalesce + priority CASE ladder
(prioritizer_handler.py:22-48). The oracle is the relational rewrite:
left joins + the same CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..pipeline import build_cve_table, score
from ..operators.merge import merge_upsert
from ..tables import load_table
from .base import Registry

REG = Registry()

_METRIC_T = "array<struct<cvssData:struct<baseScore:double>>>"


def _nvd_batch(orders: DataFrame) -> DataFrame:
    """{id, nvd} with the reference's metric nesting: baseScore derives
    from the key so the oracle can rebuild it ((k % 101) / 10 ∈ [0,10])."""
    base = (F.col("o_orderkey") % 101) / F.lit(10.0)
    metrics = F.struct(
        F.array(
            F.struct(F.struct(base.alias("baseScore")).alias("cvssData"))
        ).cast(_METRIC_T).alias("cvssMetricV31"),
        F.lit(None).cast(_METRIC_T).alias("cvssMetricV30"),
        F.lit(None).cast(_METRIC_T).alias("cvssMetricV2"),
    )
    return orders.select(
        F.concat(F.lit("CVE-2020-"), F.col("o_orderkey")).alias("id"),
        F.struct(metrics.alias("metrics")).alias("nvd"),
    )


def _epss_batch(lineitem: DataFrame) -> DataFrame:
    """{id, epss} with STRING scores (cast-at-use, SURVEY §1.2), score
    derived from the per-order lineitem count."""
    agg = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    score_str = F.concat(
        F.lit("0."), F.lpad(((F.col("n_items") * 7) % 100).cast("string"), 2, "0")
    )
    return agg.select(
        F.concat(F.lit("CVE-2020-"), F.col("l_orderkey")).alias("id"),
        F.struct(score_str.alias("epss_score")).alias("epss"),
    )


def _kev_batch(orders: DataFrame) -> DataFrame:
    """{id, kev}: every 13th order is 'known exploited'."""
    return orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.concat(F.lit("CVE-2020-"), F.col("o_orderkey")).alias("id"),
        F.struct(F.lit("2026-03-01").alias("dateAdded")).alias("kev"),
    )


@REG.add(
    "cve_pipeline",
    """
    WITH nvd AS (
        SELECT 'CVE-2020-' || CAST(o_orderkey AS VARCHAR) AS id,
               (o_orderkey % 101) / 10.0 AS base
        FROM orders
    ),
    epss AS (
        SELECT 'CVE-2020-' || CAST(l_orderkey AS VARCHAR) AS id,
               CAST('0.' || lpad(CAST((count(*) * 7) % 100 AS VARCHAR), 2, '0')
                    AS DOUBLE) AS epss
        FROM lineitem GROUP BY l_orderkey
    ),
    kev AS (
        SELECT 'CVE-2020-' || CAST(o_orderkey AS VARCHAR) AS id
        FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT priority, CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT CASE WHEN k.id IS NOT NULL THEN 1
                    WHEN n.base >= 6.0 AND coalesce(e.epss, 0.0) >= 0.2 THEN 1
                    WHEN n.base >= 6.0 THEN 2
                    WHEN coalesce(e.epss, 0.0) >= 0.2 THEN 3
                    ELSE 4 END AS priority
        FROM nvd n
        LEFT JOIN epss e ON n.id = e.id
        LEFT JOIN kev k ON n.id = k.id
    )
    GROUP BY priority
    ORDER BY priority, cnt
    """,
    doc="End-to-end CveMate pipeline: per-source batches folded through "
    "OP-MERGE (epss applied twice — idempotence witnessed by the oracle "
    "match), scored by the CVSS-coalesce + CASE ladder (OP-SCORE), "
    "priority histogram out. One shuffle per merge, all on `id`.",
)
def cve_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    epss = _epss_batch(lineitem)
    cve = build_cve_table([_nvd_batch(orders), epss, _kev_batch(orders)])
    cve = merge_upsert(cve, epss, key="id")  # idempotent re-apply
    return (
        score(cve)
        .groupBy("priority")
        .agg(F.count("*").alias("cnt"))
        .orderBy("priority", "cnt")
    )


@REG.add(
    "cve_pipeline_1shuffle",
    REG.specs["cve_pipeline"].oracle,
    doc="Same pipeline as cve_pipeline, built with merge_many — the "
    "single-shuffle multi-source merge (tag + union + groupBy(id)) "
    "instead of one full-outer join per source. Identical result, "
    "k-fold fewer exchanges; the shape for the nightly all-sources run.",
)
def cve_pipeline_1shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_many

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cve = merge_many(
        {
            "nvd": _nvd_batch(orders),
            "epss": _epss_batch(lineitem),
            "kev": _kev_batch(orders),
        }
    )
    return (
        score(cve)
        .groupBy("priority")
        .agg(F.count("*").alias("cnt"))
        .orderBy("priority", "cnt")
    )
