"""Fold-policy binding laws (round-11 ADVICE items): a recorded
keep-latest (`mor_fold`) policy must bind EVERY merge surface, not
just the MOR leg, and each manifest records the policy its version was
written under so time travel folds correctly across policy changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from cvemate_spark.operators.merge import keep_latest_merge
from cvemate_spark.operators import merge_versioned as mv

FOLD = {
    "keys": ["user_id", "event_type"],
    "order_by": [["ts", "desc"], ["event_id", "desc"]],
}


def _ev(uid, etype, ts, eid):
    return Row(user_id=uid, event_type=etype, ts=ts, event_id=eid)


def _rows(spark, path, version=None):
    return {
        (r["user_id"], r["event_type"]): r["event_id"]
        for r in mv.read_bucket_table_versioned(
            spark, path, version=version
        ).collect()
    }


def test_cow_merge_honors_recorded_fold_policy(spark, tmp_path):
    """The DEFAULT CoW merge on a fold-policy table must apply
    keep-latest semantics: a composite-key target (several rows per
    bucket key) would otherwise fan out in merge_upsert's full-outer
    join and commit a corrupted result silently — the round-10
    advisory's exact scenario."""
    path = str(tmp_path / "cowfold")
    mv.init_bucket_table_versioned(
        path, key="user_id", n_buckets=2, mor_fold=FOLD
    )
    base = spark.createDataFrame([
        _ev(1, "click", "2024-01-05", 50),
        _ev(1, "buy", "2024-01-03", 30),
        _ev(2, "view", "2024-01-02", 20),
    ])
    mv.merge_scoped_versioned(spark, path, base)
    # an update for ONE of user 1's composite rows, plus an out-of-
    # order older event that must LOSE to the standing newer row
    batch = spark.createDataFrame([
        _ev(1, "buy", "2024-01-07", 70),
        _ev(1, "click", "2024-01-01", 10),
    ])
    mv.merge_scoped_versioned(spark, path, batch)
    assert _rows(spark, path) == {
        (1, "click"): 50,  # older event lost
        (1, "buy"): 70,    # newer event won
        (2, "view"): 20,   # untouched
    }
    # and the CoW path composes with the MOR path (same comparator)
    mv.merge_scoped_versioned_mor(
        spark, path, spark.createDataFrame([_ev(1, "click", "2024-01-09", 90)])
    )
    assert _rows(spark, path)[(1, "click")] == 90


def test_cow_matches_mor_twin_under_default_merge(spark, tmp_path):
    """Master law: default CoW merges and MOR merges on fold twins
    converge to the same content at every version."""
    p_cow = str(tmp_path / "tc")
    p_mor = str(tmp_path / "tm")
    for p in (p_cow, p_mor):
        mv.init_bucket_table_versioned(
            p, key="user_id", n_buckets=2, mor_fold=FOLD
        )
    chunks = [
        [_ev(1, "click", "2024-01-05", 50), _ev(2, "view", "2024-01-02", 20)],
        [_ev(1, "click", "2024-01-01", 10), _ev(1, "buy", "2024-01-03", 30)],
        [_ev(2, "view", "2024-01-08", 80)],
    ]
    for chunk in chunks:
        b = spark.createDataFrame(chunk)
        mv.merge_scoped_versioned(spark, p_cow, b)
        mv.merge_scoped_versioned_mor(spark, p_mor, b)
    for v in (2, 3, 4):
        assert _rows(spark, p_cow, v) == _rows(spark, p_mor, v), v


def test_deleted_col_on_fold_table_raises(spark, tmp_path):
    """Tombstone deletes key on the bucket key alone — on a
    composite-key fold table that would delete whole groups, so the
    leg refuses loudly (merge_deletes_dv / custom merger are the
    supported delete paths)."""
    path = str(tmp_path / "delfold")
    mv.init_bucket_table_versioned(
        path, key="user_id", n_buckets=2, mor_fold=FOLD
    )
    mv.merge_scoped_versioned(
        spark, path, spark.createDataFrame([_ev(1, "click", "2024-01-05", 50)])
    )
    batch = spark.createDataFrame(
        [Row(user_id=1, event_type="click", ts="2024-01-06",
             event_id=60, deleted=True)]
    )
    with pytest.raises(ValueError, match="mor_fold"):
        mv.merge_scoped_versioned(spark, path, batch, deleted_col="deleted")
    # a custom merger stays available
    mv.merge_scoped_versioned(
        spark, path,
        spark.createDataFrame([_ev(1, "click", "2024-01-06", 60)]),
        merger=lambda cur, b: keep_latest_merge(
            cur, b, keys=["user_id", "event_type"],
            order_by=[F.desc("ts"), F.desc("event_id")],
        ),
    )
    assert _rows(spark, path)[(1, "click")] == 60


def test_time_travel_folds_under_the_written_policy(spark, tmp_path):
    """A reload may change the fold policy; pre-change versions must
    fold under the policy they were WRITTEN with (recorded per
    manifest), not the mutable meta — the round-10 advisory's
    time-travel hazard."""
    path = str(tmp_path / "ttfold")
    mv.init_bucket_table_versioned(
        path, key="user_id", n_buckets=2, mor_fold=FOLD
    )
    mv.merge_scoped_versioned_mor(
        spark, path, spark.createDataFrame([_ev(1, "click", "2024-01-01", 10)])
    )
    mv.merge_scoped_versioned_mor(
        spark, path, spark.createDataFrame([_ev(1, "click", "2024-01-05", 50)])
    )
    v_old = mv.latest_version(path)
    assert _rows(spark, path, v_old) == {(1, "click"): 50}  # desc: newest

    # reload under the OPPOSITE policy (keep-EARLIEST)
    fold_asc = {
        "keys": ["user_id", "event_type"],
        "order_by": [["ts", "asc"], ["event_id", "asc"]],
    }
    snap = mv.read_bucket_table_versioned(spark, path)
    mv.write_bucket_table_versioned(
        snap, path, key="user_id", n_buckets=2, mor_fold=fold_asc
    )
    mv.merge_scoped_versioned_mor(
        spark, path, spark.createDataFrame([_ev(1, "click", "2024-01-03", 30)])
    )
    # latest folds under the NEW policy: earliest ts wins
    assert _rows(spark, path) == {(1, "click"): 30}
    # the pre-reload version still folds under the OLD (desc) policy
    assert _rows(spark, path, v_old) == {(1, "click"): 50}


def test_fold_leveling_accepts_column_subset_batch(spark, tmp_path):
    """A column-subset batch that lands fine as a delta must also
    survive the max_depth LEVELING fold (keep_latest_merge null-pads
    instead of throwing) — the late-and-surprising failure the
    round-10 advisory flagged."""
    path = str(tmp_path / "lvl")
    mv.init_bucket_table_versioned(
        path, key="user_id", n_buckets=1, mor_fold=FOLD
    )
    full_row = spark.createDataFrame(
        [Row(user_id=1, event_type="click", ts="2024-01-01",
             event_id=10, extra="payload")]
    )
    mv.merge_scoped_versioned_mor(spark, path, full_row, max_depth=1)
    subset = spark.createDataFrame([_ev(1, "click", "2024-01-05", 50)])
    # depth is at the cap: this batch LEVELS the bucket
    res = mv.merge_scoped_versioned_mor(spark, path, subset, max_depth=1)
    assert res["leveled_buckets"] >= 0  # reached here without raising
    rows = {
        (r["user_id"], r["event_type"]): (r["event_id"], r["extra"])
        for r in mv.read_bucket_table_versioned(spark, path).collect()
    }
    # keep-latest: the newer (subset) row wins whole-row; extra is null
    assert rows == {(1, "click"): (50, None)}
