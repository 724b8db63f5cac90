"""Streaming equivalence tests (SURVEY §5.5): availableNow ≡ batch rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from cvemate_spark.queries import REGISTRY
from cvemate_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_s1_tumbling_equals_batch(spark):
    stream = jobs.tumbling_counts(spark, SF)
    # batch rewrite: date_trunc('hour') counts
    from cvemate_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    expect = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
    )
    assert _rows(stream) == _rows(expect)


def test_s3_replay_order_invariant(spark):
    """3-chunk replay == 2-chunk replay == batch Q20 (commutative merge)."""
    two = _rows(jobs.replay_merge(spark, SF, n_chunks=2))
    three = _rows(jobs.replay_merge(spark, SF, n_chunks=3))
    batch = _rows(REGISTRY.specs["q20"].builder(spark, SF))
    assert two == three == batch


def test_s6_stream_dedup_equals_distinct(spark):
    got = _rows(jobs.stream_dedup(spark, SF))
    from cvemate_spark.tables import load_table

    expect = _rows(
        load_table(spark, SF, "events").select("user_id", "event_type").distinct()
    )
    assert got == expect


def test_dedup_within_watermark_bounded_state(spark):
    """The production streaming-dedup form: dropDuplicatesWithinWatermark
    holds each key only until the watermark passes its event time. With
    a delay horizon covering the whole input, no state is evicted
    mid-run, so the emitted key set still equals batch DISTINCT — while
    the operator's state bound is the late-data horizon, not the key
    cardinality (the property that makes it the 100 TB form)."""
    ev = jobs._events_stream(spark, SF)
    dd = ev.withWatermark("ts", "365 days").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        dd.select("user_id", "event_type")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("s6_wm_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("s6_wm_sink").distinct().collect())
    from cvemate_spark.tables import load_table

    expect = _rows(
        load_table(spark, SF, "events").select("user_id", "event_type").distinct()
    )
    assert got == expect


def test_streaming_state_on_rocksdb_provider(spark):
    """The 100 TB state backend: the same tumbling aggregation runs on
    the RocksDB state store provider (state spills to local disk,
    bounded executor memory — the production choice for large keyed
    state) and produces the identical result. The provider class is a
    per-session SQL conf, so an isolated newSession() (shared context,
    own conf/catalog) carries it without touching the fixture session
    — calling stop() on a second getOrCreate() session would kill the
    shared SparkContext for every later test."""
    s = spark.newSession()
    s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    got = _rows(jobs.tumbling_counts(s, SF))
    from cvemate_spark.tables import load_table

    ev = load_table(s, SF, "events")
    expect = _rows(
        ev.groupBy(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("win_start"),
            "event_type",
        ).agg(F.count("*").alias("cnt"))
    )
    assert got == expect


def test_protobuf_bridge_pb2_roundtrip():
    """The repo-root google/ bridge (pure-Python protobuf 6.32 under
    6.33 gencode) must serialize/parse PySpark's StateMessage protos
    exactly — the compatibility claim the version-gate softening in
    google/__init__.py rests on."""
    import pytest

    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as m
    except ImportError:
        pytest.skip("no protobuf runtime and no bridgeable SDK copy")
    req = m.StateRequest(version=7)
    req.stateVariableRequest.valueStateCall.stateName = "agg"
    req.stateVariableRequest.valueStateCall.valueStateUpdate.value = b"\x01\x02"
    parsed = m.StateRequest()
    parsed.ParseFromString(req.SerializeToString())
    assert parsed.version == 7
    assert parsed.stateVariableRequest.valueStateCall.stateName == "agg"
    assert (
        parsed.stateVariableRequest.valueStateCall.valueStateUpdate.value
        == b"\x01\x02"
    )
    from google.protobuf.internal import api_implementation

    assert api_implementation.Type() == "python"  # the SDK runtime, C-free


def test_protobuf_bridge_defers_to_real_installs():
    """VERDICT r5 item 8 (environment probe, committed): the repo-root
    google/ bridge exists only because this container has no protobuf
    pip package. Two laws: (a) when NO real install exists — the
    probed state this round: `pip show protobuf` -> not found, no
    site-packages google/protobuf — the bridge resolves to the SDK
    runtime; (b) if a real install ever appears, it must WIN (its dirs
    precede the SDK on the bridge's __path__ and the version-gate
    softening disengages) — and the bridge directory should then be
    deleted per its own docstring."""
    import glob
    import os
    import sys

    real = [
        h
        for p in sys.path
        if "site-packages" in p or "dist-packages" in p
        for h in glob.glob(os.path.join(p, "google", "protobuf"))
    ]
    try:
        import google.protobuf as pb
    except ImportError:
        assert not real, "real protobuf present but not importable"
        return  # no runtime anywhere: TWS fails closed, tested elsewhere
    if real:
        assert any(
            pb.__file__.startswith(os.path.dirname(r)) for r in real
        ), f"real install exists at {real} but bridge shadowed it: {pb.__file__}"
    else:
        assert "google-cloud-sdk" in pb.__file__  # the bridged SDK runtime


def test_tws_running_agg_gate_or_law(spark):
    """Spark 4 stateful-processor surface (transformWithStateInPandas):
    where a protobuf runtime exists — including via the repo-root
    google/ bridge onto the machine's SDK-bundled 6.32 runtime — the
    drained per-user state must equal the batch aggregate (count +
    micro-unit value sum). Only on a machine with NO runtime at all may
    the operator fail closed, and then with the explicit environment-
    gate error, never a deep stream crash."""
    from pyspark.sql import functions as F

    from cvemate_spark.streaming import jobs
    from cvemate_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    try:
        got = {
            r["user_id"]: (r["cnt"], r["micros"])
            for r in jobs.tws_running_agg(spark, sf).collect()
        }
    except NotImplementedError as e:
        assert "protobuf" in str(e)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return  # genuinely no runtime: fail-closed branch is correct
        raise AssertionError(
            "protobuf runtime importable but tws_running_agg failed closed"
        ) from e
    want = {
        r["user_id"]: (r["cnt"], r["micros"])
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")).alias(
                "micros"
            ),
        )
        .collect()
    }
    assert got == want


def test_checkpoint_recovery_processes_only_new_files(spark, tmp_path):
    """The S11 recovery law, with the phase telemetry asserted: after
    the restart, the offset log must admit ONLY the files that landed
    while the query was down (no reprocessing of phase 1 — that would
    double-count in complete mode with fresh state, or waste a full
    re-read with restored state), and the resumed aggregation must
    equal the batch aggregate over everything."""
    from pyspark.sql import functions as F

    from cvemate_spark.streaming import jobs
    from cvemate_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    prog: list[dict] = []
    got = {
        r["event_type"]: r["cnt"]
        for r in jobs.checkpoint_resume_counts(
            spark, sf, workdir=str(tmp_path / "resume"), collect_progress=prog
        ).collect()
    }
    total = load_table(spark, sf, "events").count()
    assert [p["phase"] for p in prog] == [1, 2]
    assert prog[0]["rows"] == total // 2
    assert prog[1]["rows"] == total - total // 2  # ONLY the new files
    want = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want
