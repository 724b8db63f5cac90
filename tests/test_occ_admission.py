"""Laws for OCC commit-intent ADMISSION (merge_versioned._post_intent /
_await_intent_turn; VERDICT r12 item 2): fully-overlapping CoW writers
serialize at admission instead of burning doomed work phases, while
disjoint writers are never delayed; intents are advisory (TTL-bounded,
OCC validation stays the correctness authority) so a stale intent from
a crashed writer is reclaimed, never a wedge."""

from __future__ import annotations

import glob
import os
import threading
import time
import uuid

from cvemate_spark.operators import merge_versioned as mv
from cvemate_spark.operators.merge import bucket_of_value, merge_upsert

T0 = "2024-01-01 00:00:00"
N_BUCKETS = 8


def _mk_table(spark, tmp_path, n=120):
    path = str(tmp_path / "occ_adm")
    base = merge_upsert(
        None,
        spark.range(0, n).selectExpr(
            "id", "cast(id as double) as val"
        ),
        key="id",
        now=T0,
    )
    mv.write_bucket_table_versioned(
        base, path, key="id", n_buckets=N_BUCKETS
    )
    return path


def _batch(spark, keys, val):
    return spark.createDataFrame(
        [(int(k), float(val)) for k in keys], "id long, val double"
    )


def _keys_in_bucket(spark, bucket, n=120, want=3):
    out = [k for k in range(n) if bucket_of_value(spark, k, N_BUCKETS) == bucket]
    return out[:want]


def test_intent_blocks_conflicting_writer_until_cleared(spark, tmp_path):
    """A live earlier intent on an overlapping bucket HOLDS a writer at
    admission; releasing it lets the merge through on its first (and
    only) attempt."""
    path = _mk_table(spark, tmp_path)
    ks = _keys_in_bucket(spark, 3)
    fake = mv._post_intent(path, [3])
    done = {}

    def run():
        done["res"] = mv.merge_scoped_versioned_occ(
            spark, path, _batch(spark, ks, 900.0), now=T0
        )

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=1.0)
    assert t.is_alive(), "writer must wait while the intent is live"
    os.unlink(fake)
    t.join(timeout=60)
    assert not t.is_alive()
    assert done["res"]["attempts"] == 1
    rows = {
        r["id"]: r["val"]
        for r in mv.read_bucket_table_versioned(spark, path).collect()
    }
    assert all(rows[k] == 900.0 for k in ks)


def test_intent_never_delays_disjoint_writer(spark, tmp_path):
    """An intent on bucket 3 does not hold a writer touching only other
    buckets — disjoint concurrency is preserved."""
    path = _mk_table(spark, tmp_path)
    other = _keys_in_bucket(spark, 5)
    fake = mv._post_intent(path, [3])
    try:
        res = mv.merge_scoped_versioned_occ(
            spark, path, _batch(spark, other, 901.0), now=T0
        )
        assert res["attempts"] == 1
    finally:
        os.unlink(fake)


def test_stale_intent_reclaimed_not_a_wedge(spark, tmp_path):
    """An intent older than the TTL (crashed writer) neither blocks nor
    survives: the next waiter ignores and unlinks it."""
    path = _mk_table(spark, tmp_path)
    d = os.path.join(path, mv.OCC_INTENT_DIR)
    os.makedirs(d, exist_ok=True)
    old_ns = time.time_ns() - int(2 * mv.OCC_INTENT_TTL_S * 1e9)
    stale = os.path.join(
        d, f"intent-{old_ns:020d}-{uuid.uuid4().hex}.json"
    )
    with open(stale, "w") as f:
        f.write('{"buckets": [3]}')
    mine = mv._post_intent(path, [3])
    try:
        waited = mv._await_intent_turn(path, mine, [3])
        assert waited is False
        assert not os.path.exists(stale)
    finally:
        os.unlink(mine)


def test_admission_serializes_full_overlap_zero_waste(spark, tmp_path):
    """The cow_overlap economics law: two writers on the SAME bucket
    (key-disjoint), no test hook -> admission is on by default, the
    later writer waits, both land in one attempt each, and no orphan
    generations exist (zero wasted work phases)."""
    path = _mk_table(spark, tmp_path)
    ks = _keys_in_bucket(spark, 3, want=6)
    a, b = ks[:3], ks[3:]
    results = []

    def run(keys, val):
        results.append(
            mv.merge_scoped_versioned_occ(
                spark, path, _batch(spark, keys, val), now=T0
            )
        )

    t1 = threading.Thread(target=run, args=(a, 910.0))
    t2 = threading.Thread(target=run, args=(b, 920.0))
    t1.start()
    time.sleep(0.3)  # deterministic admission order
    t2.start()
    t1.join()
    t2.join()
    assert len(results) == 2
    assert sum(r["attempts"] for r in results) == 2
    assert mv.latest_version(path) == 3
    rows = {
        r["id"]: r["val"]
        for r in mv.read_bucket_table_versioned(spark, path).collect()
    }
    assert all(rows[k] == 910.0 for k in a)
    assert all(rows[k] == 920.0 for k in b)
    # zero wasted work: every generation written is referenced
    referenced = set()
    for v in (1, 2, 3):
        full = mv._load_manifest_full(path, v)
        for i, g in full["buckets"].items():
            referenced.add(mv._gen_data_path(path, i, g))
    on_disk = set(glob.glob(f"{path}/bucket=*/g-*"))
    assert on_disk <= referenced
    # intents are cleaned up after commit
    assert glob.glob(f"{path}/{mv.OCC_INTENT_DIR}/intent-*") == []
