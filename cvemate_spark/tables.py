"""Loaders for the driver test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
/root/testdata/sf{0.001,0.01,0.1}/.

The `events` table stores parquet TIMESTAMP(NANOS) which Spark's
parquet reader rejects; we read it with
`spark.sql.legacy.parquet.nanosAsLong` and convert the long back to a
microsecond TimestampType via `timestamp_micros(ns div 1000)` —
truncation, which matches DuckDB's nanos→micros behavior exactly
(verified against `epoch_ns` on the driver parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _ensure_session_confs(spark: SparkSession) -> None:
    """Set runtime SQL confs the engine depends on.

    These are dynamic SQL confs, safe to set on a session the driver
    created. UTC keeps timestamp formatting aligned with the
    (UTC-naive) DuckDB oracle; nanosAsLong makes the events parquet
    readable at all.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        # a plain session defaults to 200 shuffle partitions — far too
        # many tasks for the test scales; AQE coalesces but task setup
        # still dominates. Runtime-settable, so safe on any session.
        ("spark.sql.shuffle.partitions", "32"),
        # join strategy (guide §3.1, r13): allow shuffled-hash instead
        # of sort-merge when the size guards say a partition's build
        # side fits; AQE's 64 MB local-map threshold keeps the runtime
        # rewrite equally size-guarded. Oversized partitions still plan
        # sort-merge, so the 100 TB shape is unchanged. Same settings
        # as the tuned factory (session.py) so plan shape does not
        # depend on which session built the frame.
        ("spark.sql.join.preferSortMergeJoin", "false"),
        (
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        ),
        # let AQE re-partition when materializing a persisted plan
        # (guide §2.2 "let AQE coalesce"; off by default). Without it
        # every cached relation materializes at the raw shuffle
        # partition count — 32 one-row Python tasks for semdedup's
        # 40-cell diag cache. At scale the same rule coalesces to the
        # advisory byte target, the intended shape. Paired A/B (r14):
        # emb_neardup_semdedup 1.50->1.39 s min, dedup_minhash a wash.
        (
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        ),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session; proceed with its value


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # The generator has shipped the ts column as TIMESTAMP(NANOS)
        # (unreadable without nanosAsLong -> arrives as a long) and as
        # TIMESTAMP(MICROS) with isAdjustedToUTC=false (arrives as
        # TIMESTAMP_NTZ). Normalize both to session-zone TimestampType
        # (session is pinned to UTC, so the NTZ cast is value-exact and
        # matches the naive-timestamp DuckDB oracle).
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (for spark.sql)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables

