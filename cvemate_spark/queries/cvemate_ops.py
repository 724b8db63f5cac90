"""Q19-Q23, Q27, Q28: the CveMate capability queries (SURVEY §2.12).

Scoring ladder, keep-latest dedup, watermark windows, incremental
predicate, map unnest, sessionization, grouped-map normalize.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions.scoring import priority_column
from ..tables import load_table
from .base import Registry, TS_FMT_DUCK, TS_FMT_SPARK

REG = Registry()


# ---------------------------------------------------------------- Q19
@REG.add(
    "q19",
    """
    SELECT priority, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT CASE
            WHEN event_type = 'error' THEN 1
            WHEN value >= 100 AND CAST(props->>'$.k' AS INTEGER) >= 50 THEN 1
            WHEN value >= 100 THEN 2
            WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 3
            ELSE 4 END AS priority
        FROM events
    ) GROUP BY priority ORDER BY priority, cnt
    """,
    doc="OP-SCORE: the priority ladder of prioritizer_handler.py:40-48 as one "
    "CASE column — (value, k, event_type='error') standing in for (cvss, epss, kev).",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.withColumn(
        "priority",
        priority_column(
            kev=F.col("event_type") == "error",
            base_score=F.col("value"),
            epss_score=F.get_json_object("props", "$.k").cast("int"),
            base_threshold=100,
            epss_threshold=50,
        ),
    )
    return (
        scored.groupBy("priority")
        .agg(F.count("*").alias("cnt"))
        .orderBy("priority", "cnt")
    )


# ---------------------------------------------------------------- Q20
@REG.add(
    "q20",
    f"""
    SELECT user_id, event_type, event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type, event_id, ts
    """,
    doc="Keep-latest dedup (OP-DEDUP): dropDuplicates with an explicit ordering.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        )
        .orderBy("user_id", "event_type", "event_id", "ts")
    )


# ---------------------------------------------------------------- Q21
@REG.add(
    "q21",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
    GROUP BY hour
    ORDER BY hour, cnt
    """,
    doc="Watermark window (OP-FILT-4/ST-2): last-24h predicate off max(ts), "
    "hourly histogram. The scalar max is broadcast, not collected.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), TS_FMT_SPARK).alias("hour"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("hour", "cnt")
    )


# ---------------------------------------------------------------- Q22
@REG.add(
    "q22",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE ts > (SELECT max(ts) FROM events
                WHERE event_id * 2 < (SELECT count(*) FROM events))
    GROUP BY event_type
    ORDER BY event_type, cnt
    """,
    doc="ST-2 batch-incremental: watermark = max(ts) of the first half of the "
    "stream; 'new' rows are those past the watermark.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = ev.agg(F.count("*").alias("n"))
    wm = (
        ev.crossJoin(F.broadcast(n))
        .filter(F.col("event_id") * 2 < F.col("n"))
        .agg(F.max("ts").alias("wm"))
    )
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "cnt")
    )


# ---------------------------------------------------------------- Q23
@REG.add(
    "q23",
    """
    SELECT key, CAST(SUM(CAST(props->>key AS INTEGER)) AS BIGINT) AS total
    FROM (SELECT props, unnest(json_keys(props)) AS key
          FROM events WHERE props IS NOT NULL)
    GROUP BY key
    ORDER BY key, total
    """,
    doc="Map unnest (OP-EXPL-3): from_json to map<string,int> + explode, the "
    "Debian/Metasploit dict-of-dicts pattern (debian_handler.py:60-71).",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "value")
    )
    return (
        parsed.groupBy("key")
        .agg(F.sum("value").alias("total"))
        .orderBy("key", "total")
    )


# ---------------------------------------------------------------- Q27
@REG.add(
    "q27",
    """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (
        SELECT user_id,
               SUM(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL THEN 0
                        WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                        THEN 1 ELSE 0 END AS gap_flag
            FROM events
        )
    )
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id, cnt
    """,
    doc="Sessionization: lag-gap flag + running sum = session id (batch analog "
    "of session_window; 30-minute gap).",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull(), 0)
        .when(gap_us > 1_800_000_000, 1)
        .otherwise(0)
        .alias("gap_flag"),
    )
    sess = flagged.select(
        "user_id",
        F.sum("gap_flag")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy("user_id", "session_id", "cnt")
    )


# ---------------------------------------------------------------- Q28
@REG.add(
    "q28",
    """
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    ORDER BY event_id, event_type, z
    """,
    doc="Grouped-map Pandas UDF (applyInPandas): per-event_type z-score "
    "normalize; the reference's arbitrary-python-per-group shape (§2.11).",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].sum() / len(pdf)  # plain sequential-ish mean
        var = ((pdf["value"] - mean) ** 2).sum() / (len(pdf) - 1) if len(pdf) > 1 else float("nan")
        std = var**0.5
        z = ((pdf["value"] - mean) / std).round(4)
        out = pdf[["event_id", "event_type"]].copy()
        out["z"] = z
        return out

    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, schema="event_id long, event_type string, z double")
        .orderBy("event_id", "event_type", "z")
    )
