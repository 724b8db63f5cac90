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


# ------------------------------------------------------------- S14
# Incremental KMV sketch maintenance as streaming state: the sketch
# family (operators/kmv.py) meeting the foreachBatch-MERGE shape (S3).
# Per event-time day, the distinct-user sketch is maintained across
# micro-batches by union + re-bottom-k — the KMV merge law makes the
# incremental result EXACTLY the batch sketch, so the estimate needs
# no replay and the state is |windows| x k rows forever. This is how
# a 100-TB ingest keeps "distinct users per day" queryable without a
# distinct shuffle over history: the state table IS the answer.
SKETCH_K = 64


def _chunked_landing(spark: SparkSession, sf_dir: str, n_chunks: int = 2) -> str:
    """Shared S3-style chunked event landing — the single producer
    lives in streaming/jobs.py (replay_merge consumes the same cache
    dir, so layout and key can never diverge)."""
    from .jobs import _chunked_landing as _producer

    return _producer(spark, sf_dir, n_chunks=n_chunks)


def incremental_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user KMV estimates from incrementally merged
    micro-batch sketches (2-chunk out-of-order replay, the S3 landing),
    with the exact distinct count riding along for self-validation.
    """
    import os
    import shutil

    from ..functions.text import spark_str_hash
    from ..operators.kmv import HASH_SPACE, per_group_bottom_k
    from ..operators.merge import write_atomic
    from .jobs import EVENTS_SCHEMA, SCRATCH, _ensure_session_confs, _stage_events

    _ensure_session_confs(spark)
    stage = _stage_events(sf_dir)
    in_dir = _chunked_landing(spark, sf_dir, n_chunks=2)

    run_dir = f"{SCRATCH}/s14_{os.getpid()}"
    state, ckpt = f"{run_dir}/state", f"{run_dir}/ckpt"
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir)

    h_expr = F.expr(spark_str_hash("concat('u:', cast(user_id as string))"))

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        ss = batch.sparkSession
        fresh = (
            batch.select(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")
                .alias("win_start"),
                h_expr.alias("h"),
            )
            .distinct()
        )
        try:
            current = ss.read.parquet(state)
        except Exception:
            current = fresh.limit(0)
        # KMV merge law: union + re-bottom-k == sketch of the union
        merged = per_group_bottom_k(
            current.unionByName(fresh).distinct(), "win_start", SKETCH_K
        )
        write_atomic(merged, state)

    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sk = spark.read.parquet(state)
    est = sk.groupBy("win_start").agg(
        F.count("*").alias("n_seen"), F.max("h").alias("u_k")
    )
    est_users = F.when(
        F.col("n_seen") < SKETCH_K, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(float(SKETCH_K - 1))
        * F.lit(float(HASH_SPACE))
        / F.col("u_k").cast("double")
    )
    exact = (
        spark.read.parquet(stage)
        .select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("win_start"),
            "user_id",
        )
        .groupBy("win_start")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_users"))
    )
    return (
        est.join(exact, "win_start")
        .select(
            "win_start",
            F.col("n_seen").cast("long").alias("n_seen"),
            F.col("u_k").cast("long").alias("u_k"),
            est_users.alias("est_users"),
            "exact_users",
        )
    )


# ------------------------------------------------------------- S15
# Incremental COUNT-MIN maintenance as streaming state: the frequency
# complement of S14 (distinct counts). Per event-time day, the CMS of
# the event_type stream is maintained across out-of-order micro-batches
# by union + counter re-sum in a foreachBatch MERGE. Counters are
# ADDITIVE, so the incremental state is EXACTLY the batch sketch —
# the oracle rebuilds it directly and the hash gate proves the
# streaming fold changes nothing. State is |windows| x depth x width
# rows forever: per-day term frequencies stay point-queryable with no
# replay and no per-term state, at ANY stream volume.
CMS_DEPTH = 4
CMS_WIDTH = 64


def incremental_cms_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event_type frequency estimates served from incrementally
    merged micro-batch count-min sketches, exact counts riding along."""
    import os
    import shutil

    from ..operators.merge import write_atomic
    from ..operators.sketch import cms_build_grouped, cms_merge_grouped
    from .jobs import EVENTS_SCHEMA, SCRATCH, _ensure_session_confs, _stage_events

    _ensure_session_confs(spark)
    stage = _stage_events(sf_dir)
    in_dir = _chunked_landing(spark, sf_dir, n_chunks=2)

    run_dir = f"{SCRATCH}/s15_{os.getpid()}"
    state, ckpt = f"{run_dir}/state", f"{run_dir}/ckpt"
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir)

    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        ss = batch.sparkSession
        fresh = cms_build_grouped(
            batch.select(day.alias("win_start"), F.col("event_type").alias("term")),
            "win_start",
            depth=CMS_DEPTH,
            width=CMS_WIDTH,
        )
        try:
            current = ss.read.parquet(state)
        except Exception:
            current = fresh.limit(0)
        # CMS merge law: counters add, so incremental == batch sketch
        write_atomic(cms_merge_grouped(current, fresh, "win_start"), state)

    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sk = spark.read.parquet(state)
    ev = spark.read.parquet(stage)
    exact = (
        ev.select(day.alias("win_start"), F.col("event_type").alias("term"))
        .groupBy("win_start", "term")
        .agg(F.count("*").cast("long").alias("true_cnt"))
    )
    # probe every (day, term) actually present — bounded: |days| x |types|
    from ..operators.sketch import _bucket_expr_spark

    probe = exact.select(
        "win_start", "term",
        F.explode(F.expr(f"sequence(0, {CMS_DEPTH - 1})")).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr_spark("term", "j", CMS_WIDTH)))
    est = (
        probe.join(F.broadcast(sk), ["win_start", "j", "bucket"])
        .groupBy("win_start", "term")
        .agg(F.min("cnt").cast("long").alias("est"))
    )
    return exact.join(est, ["win_start", "term"]).select(
        "win_start",
        "term",
        "true_cnt",
        "est",
        (F.col("est") - F.col("true_cnt")).cast("long").alias("overcount"),
    )


# ------------------------------------------------------------- S16
# Incremental HISTOGRAM maintenance as streaming state — the
# distribution member of the sketch-state trio (S14 distinct counts,
# S15 point frequencies, S16 quantiles). Per event-time day the
# bounded 32-bin histogram of `value` is merged across out-of-order
# micro-batches by union + counter re-sum (bin counters are ADDITIVE,
# so incremental == batch exactly); binned quantiles are then served
# from the state alone: rank ceil(p*n) located in the unique bin with
# cum_prev < rank <= cum (the e_quantile_2pass bin trick, here on
# state that already IS the histogram — no second data pass exists or
# is needed). State is |windows| x 32 rows forever.


def incremental_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day binned p50/p95 of `value`, served from incrementally
    merged micro-batch histograms (2-chunk out-of-order replay)."""
    import os
    import shutil

    from ..operators.merge import write_atomic
    from .jobs import EVENTS_SCHEMA, SCRATCH, _ensure_session_confs

    _ensure_session_confs(spark)
    in_dir = _chunked_landing(spark, sf_dir, n_chunks=2)

    run_dir = f"{SCRATCH}/s16_{os.getpid()}"
    state, ckpt = f"{run_dir}/state", f"{run_dir}/ckpt"
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir)

    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        ss = batch.sparkSession
        fresh = (
            batch.select(day.alias("win_start"), _bin_col("value").alias("bin"))
            .groupBy("win_start", "bin")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        try:
            current = ss.read.parquet(state)
        except Exception:
            current = fresh.limit(0)
        # additive law: union + re-sum == the batch histogram
        merged = (
            current.unionByName(fresh)
            .groupBy("win_start", "bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        write_atomic(merged, state)

    q = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sk = spark.read.parquet(state)
    cum_w = (
        W.partitionBy("win_start")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    all_w = W.partitionBy("win_start")
    cum = sk.select(
        "win_start", "bin",
        (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(all_w).alias("n"),
    )
    targets = spark.createDataFrame(
        [("p50", 1, 2), ("p95", 19, 20)], "q string, num int, den int"
    )
    tq = cum.join(F.broadcast(targets)).select(
        "win_start", "q", "bin", "cum_prev", "cum", "n",
        F.expr("(n * num + den - 1) DIV den").alias("rank"),
    )
    return (
        tq.filter(
            (F.col("cum_prev") < F.col("rank")) & (F.col("rank") <= F.col("cum"))
        )
        .select(
            "win_start",
            "q",
            F.col("n").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
            F.col("bin").cast("long").alias("bin"),
            (F.col("bin") * DRIFT_BIN_W).cast("long").alias("lo"),
        )
    )
