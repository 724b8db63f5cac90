"""SparkSession factory.

Local-mode settings that still reflect the cluster design:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally (on a real cluster this is
  set to ~2-3x total executor cores, or left to AQE's coalescing)
- UTC session timezone so timestamp semantics match the DuckDB oracle
- `nanosAsLong` because the driver's `events` table stores parquet
  TIMESTAMP(NANOS) which Spark's vectorized reader refuses; the loader
  in tables.py converts the long back to a microsecond timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "cvemate_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    from .config import env_conf_overrides

    cpus = str(cpus or DEFAULT_CPUS)
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Join strategy (guide §3.1): let the planner pick shuffled-hash
        # over sort-merge when a side's per-partition build fits memory,
        # and let AQE rewrite SMJ->SHJ at runtime when every post-shuffle
        # partition is under 64 MB. Both are size-GUARDED: at 100 TB the
        # per-partition sides exceed the thresholds and the plan stays
        # sort-merge (spill-safe); at small/medium per-partition sizes
        # the two sort legs an SMJ pays are pure overhead. Measured on
        # the fold pipeline (4 keyed merges): warm 2.09s -> 1.74s, plan
        # 6 SortMergeJoin -> 6 ShuffledHashJoin, exchange count equal.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        # let AQE re-partition cached-plan materialization (guide
        # §2.2): a persisted relation otherwise materializes at the
        # raw shuffle partition count even when AQE would coalesce it
        # (measured: 32 one-row Python tasks for a 40-cell cache).
        # Mirrored in tables._ensure_session_confs.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # file-listing jobs get ONE task per path by default (capped at
        # 10000): planning a 4096-generation versioned table spent
        # 5.9 s of its 6.9 s in that listing job's task overhead
        # (MANIFESTBENCH_4096 plan_s). Bounding the listing parallelism
        # to ~2x cores turns it into 64 fat tasks — 0.85 s for the same
        # plan — and on a real cluster a bounded task count is equally
        # right (10000 tiny listing tasks is pure scheduler overhead).
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.parallelism",
            "64",
        )
    )
    # precedence: explicit extra_conf argument > env override > default
    # (the reference's os.getenv(NAME, ini_default) chain,
    # config_handler.py:27-37, applied to session confs)
    for k, v in env_conf_overrides().items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
