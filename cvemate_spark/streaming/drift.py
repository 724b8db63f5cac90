"""S13: continuous distribution-drift monitoring over the event stream.

The streaming face of the batch drift pair (`queries/stats_ops.py`):
per event-time window, histogram the `value` column into a BOUNDED
equi-width bin relation via the standard watermark + window groupBy,
then score each window's distribution against a STATIC reference
histogram (the whole batch table) with the exact-integer two-sample
KS statistic.

This is the data-quality watchdog a 100-TB ingest runs continuously:
"did this hour's payload distribution drift from the corpus?" — the
same question model-serving monitors ask of feature streams.

Streaming shape (the part that holds state):
- watermark + tumbling window + groupBy(win, bin) — state is
  |windows_in_flight| x nbins rows, BOUNDED by construction, evicted
  by the watermark in append mode (the hermetic availableNow test run
  uses complete mode so the tail windows emit too, the s1 pattern);
- the reference histogram is <= nbins rows, computed ONCE from the
  static batch side (at scale: a day-old snapshot relation).

Scoring shape (bounded, post-sink): windows x nbins CDF comparison —
every bin observed in any window is in the reference by construction
(window data is a subset of the corpus), so evaluating the KS sup at
the reference bin boundaries is exact. Integer cross-multiplication
(cum_w * n_ref - cum_ref * n_w) keeps the statistic exact until one
final double division; sf-independent and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from .jobs import _events_stream, _run_to_memory

DRIFT_BIN_W = 16
DRIFT_NBINS = 32


def _bin_col(col: str) -> F.Column:
    return F.least(
        F.floor(F.col(col) / DRIFT_BIN_W).cast("long"),
        F.lit(DRIFT_NBINS - 1).cast("long"),
    )


def windowed_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day windowed KS drift of `value` vs the full-corpus reference.

    Returns (win_start, n_win, n_ref, ks_u, ks) — one row per event-time
    day, ks in [0, 1] exact-integer until the final division.
    """
    ev = _events_stream(spark, sf_dir)
    hist = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), _bin_col("value").alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )
    _run_to_memory(hist, "s13_sink")
    win_hist = spark.table("s13_sink").select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "bin",
        "cnt",
    )

    ref = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(_bin_col("value").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("ref_cnt"))
    )

    # Evaluate both CDFs at every reference bin boundary per window:
    # windows x ref-bins spine (bounded: |days| x 32), window counts
    # grafted on with zero-fill.
    wins = win_hist.select("win_start").distinct()
    spine = wins.crossJoin(F.broadcast(ref))
    joined = spine.join(win_hist, ["win_start", "bin"], "left").select(
        "win_start", "bin", "ref_cnt", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    cum_w = (
        W.partitionBy("win_start")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    all_w = W.partitionBy("win_start")
    cum = joined.select(
        "win_start", "bin",
        F.sum("cnt").over(cum_w).alias("cum_w"),
        F.sum("ref_cnt").over(cum_w).alias("cum_ref"),
        F.sum("cnt").over(all_w).alias("n_win"),
        F.sum("ref_cnt").over(all_w).alias("n_ref"),
    )
    diff_u = F.abs(
        F.col("cum_w") * F.col("n_ref") - F.col("cum_ref") * F.col("n_win")
    )
    return (
        cum.groupBy("win_start")
        .agg(
            F.max("n_win").cast("long").alias("n_win"),
            F.max("n_ref").cast("long").alias("n_ref"),
            F.max(diff_u).cast("long").alias("ks_u"),
            (
                F.max(diff_u).cast("double")
                / (F.max("n_win") * F.max("n_ref"))
            ).alias("ks"),
        )
    )
