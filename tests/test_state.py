"""Watermark/CDC state tests (ST-2/ST-5)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Row

from cvemate_spark.streaming.state import (
    StatusStore,
    incremental_filter,
    reload_or_delta,
    watermark_window,
)

NOW = datetime(2024, 1, 10, tzinfo=timezone.utc)


def test_reload_or_delta_decision():
    """ST-4 (cveorg_handler.py:119-156): full re-init when the
    watermark predates the oldest delta entry, delta otherwise; full on
    first run or an empty delta log."""
    older, oldest, newer = (
        NOW - timedelta(days=5),
        NOW - timedelta(days=3),
        NOW - timedelta(days=1),
    )
    fetch_times = [newer, oldest]  # unordered, min() must find oldest
    assert reload_or_delta(older, fetch_times) == "full"  # gap: log too short
    assert reload_or_delta(NOW - timedelta(days=2), fetch_times) == "delta"
    assert reload_or_delta(oldest, fetch_times) == "delta"  # boundary: covered
    assert reload_or_delta(None, fetch_times) == "full"  # first run
    assert reload_or_delta(newer, []) == "full"  # empty log proves nothing


def test_status_store_roundtrip(tmp_path):
    path = str(tmp_path / "update_status.json")
    store = StatusStore(path)
    assert store.last_update_time("nvd") is None
    store.update_status("nvd", now=NOW)
    store.update_source_status("kev", "2024-01-01T12:00:00Z")
    # reopen: persisted
    store2 = StatusStore(path)
    assert store2.last_update_time("nvd") == NOW
    assert store2.should_refresh("kev", "2024-01-02T00:00:00Z")
    assert not store2.should_refresh("kev", "2024-01-01T12:00:00Z")


def test_watermark_window_fallback_and_stored(tmp_path):
    store = StatusStore(str(tmp_path / "s.json"))
    start, end = watermark_window(store, "nvd", NOW)
    assert start == NOW - timedelta(hours=24)  # nvd_handler.py:143-147 default
    store.update_status("nvd", now=NOW - timedelta(hours=6))
    start2, _ = watermark_window(store, "nvd", NOW)
    assert start2 == NOW - timedelta(hours=6)


def test_incremental_filter_pushdown(spark):
    df = spark.createDataFrame(
        [Row(id=i, ts=datetime(2024, 1, 9, tzinfo=timezone.utc) + timedelta(hours=i)) for i in range(48)]
    )
    start, end = NOW - timedelta(hours=12), NOW + timedelta(hours=48)
    got = incremental_filter(df, "ts", start, end)
    assert got.count() == 35  # strictly-after start, like fetch_time > last_update
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
