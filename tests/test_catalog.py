"""Laws for cross-table transactional snapshots (operators/catalog.py):
a catalog version pins every member table's version, so readers get a
CONSISTENT joint snapshot — never table A post-batch with table B
pre-batch — and the joint state time-travels as a unit.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import Row, functions as F

from cvemate_spark.operators.catalog import (
    catalog_init,
    catalog_latest,
    catalog_read,
    catalog_referenced_versions,
    catalog_txn,
)
from cvemate_spark.operators.merge_versioned import (
    latest_version,
    merge_scoped_versioned,
    write_bucket_table_versioned,
)

T0 = "2024-01-01 00:00:00"
T1 = "2024-01-02 00:00:00"


def _mk_tables(spark, tmp_path):
    head = spark.createDataFrame(
        [Row(id=i, price=float(i)) for i in range(30)]
    )
    stat = spark.createDataFrame(
        [Row(id=i, status="O") for i in range(30)]
    )
    hp, sp = str(tmp_path / "head"), str(tmp_path / "stat")
    write_bucket_table_versioned(head, hp, key="id", n_buckets=4)
    write_bucket_table_versioned(stat, sp, key="id", n_buckets=4)
    return hp, sp


def test_txn_joint_snapshot_and_time_travel(spark, tmp_path):
    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    # catalog v2: register both tables at their current versions
    r = catalog_txn(spark, cat, {"head": hp, "stat": sp})
    assert r == {"catalog_version": 2, "tables": {"head": 1, "stat": 1}}

    # catalog v3: ONE transaction updates BOTH tables
    batch_h = spark.createDataFrame([Row(id=3, price=999.0)])
    batch_s = spark.createDataFrame([Row(id=3, status="X")])
    r = catalog_txn(
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(sk, p, batch_h),
            "stat": lambda sk, p: merge_scoped_versioned(sk, p, batch_s),
        },
    )
    assert r["tables"] == {"head": 2, "stat": 2}

    def joint(v):
        h = catalog_read(spark, cat, "head", version=v)
        s = catalog_read(spark, cat, "stat", version=v)
        j = h.join(s, "id").filter(F.col("id") == 3).collect()[0]
        return (j["price"], j["status"])

    assert joint(None) == (999.0, "X")   # latest: both post
    assert joint(2) == (3.0, "O")        # catalog time travel: both pre
    assert joint(3) == (999.0, "X")
    with pytest.raises(ValueError, match="not committed"):
        catalog_read(spark, cat, "head", version=9)
    with pytest.raises(KeyError):
        catalog_read(spark, cat, "nope")


def test_crash_mid_txn_leaves_catalog_consistent(spark, tmp_path):
    """The core law: a transaction dying AFTER one member committed but
    before the catalog publish must be invisible to catalog readers —
    the member table advanced, but no catalog manifest references the
    new version, so every joint read stays pre-transaction."""
    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})

    batch_h = spark.createDataFrame([Row(id=5, price=555.0)])

    def boom(sk, p):
        raise RuntimeError("simulated crash after head committed")

    with pytest.raises(RuntimeError, match="simulated crash"):
        catalog_txn(
            spark, cat, {"head": hp, "stat": sp},
            actions={
                "head": lambda sk, p: merge_scoped_versioned(sk, p, batch_h),
                "stat": boom,
            },
        )
    # the head TABLE advanced (its own commit was atomic and real)...
    assert latest_version(hp) == 2
    # ...but the CATALOG still serves the consistent old pair
    assert catalog_latest(cat) == 2
    h = catalog_read(spark, cat, "head")
    assert h.filter(F.col("id") == 5).collect()[0]["price"] == 5.0
    # the orphaned table version is not referenced by any manifest
    assert catalog_referenced_versions(cat)[hp] == {1}

    # the next transaction proceeds and re-pins everything current
    r = catalog_txn(spark, cat, {"head": hp, "stat": sp})
    assert r["tables"] == {"head": 2, "stat": 1}
    h = catalog_read(spark, cat, "head")
    assert h.filter(F.col("id") == 5).collect()[0]["price"] == 555.0


def test_vacuum_respects_catalog_pins(spark, tmp_path):
    """The retention contract as code: vacuuming member tables through
    the catalog pins every table version a surviving catalog manifest
    references, so joint time travel over the retained catalog history
    keeps working; vacuum_catalog shrinks the horizon first."""
    from cvemate_spark.operators.catalog import (
        vacuum_catalog, vacuum_catalog_members,
    )

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2 -> (1,1)
    for i in range(3):  # cat v3..v5 -> head versions 2..4
        batch = spark.createDataFrame([Row(id=1, price=100.0 + i)])
        catalog_txn(
            spark, cat, {"head": hp, "stat": sp},
            actions={
                "head": lambda sk, p, b=batch: merge_scoped_versioned(
                    sk, p, b
                )
            },
        )

    # keep the last 3 catalog versions (v3..v5 -> head 2,3,4; stat 1)
    vacuum_catalog(cat, keep=3)
    # aggressive member vacuum (keep=1) still pins what the catalog needs
    out = vacuum_catalog_members(cat, keep=1)
    assert hp in out and sp in out
    # every surviving catalog version still serves a consistent pair
    for v in (3, 4, 5):
        h = catalog_read(spark, cat, "head", version=v)
        s = catalog_read(spark, cat, "stat", version=v)
        assert h.count() == 30 and s.count() == 30
        assert (
            h.filter(F.col("id") == 1).collect()[0]["price"]
            == 100.0 + (v - 3)
        )
    # the catalog-unreferenced head version 1 was reclaimable
    from cvemate_spark.operators.merge_versioned import _list_versions

    assert 1 not in _list_versions(hp)
    # stat version 1 IS still referenced (pinned through keep=1)
    assert 1 in _list_versions(sp)


def test_concurrent_txns_serialize(spark, tmp_path):
    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})
    results, errs = [], []

    def run(i):
        batch = spark.createDataFrame([Row(id=10 + i, price=1000.0 + i)])
        try:
            results.append(
                catalog_txn(
                    spark, cat, {"head": hp},
                    actions={
                        "head": lambda sk, p: merge_scoped_versioned(
                            sk, p, batch
                        )
                    },
                )
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert sorted(r["catalog_version"] for r in results) == [3, 4]
    h = catalog_read(spark, cat, "head")
    got = {
        r["id"]: r["price"]
        for r in h.filter(F.col("id").isin(10, 11)).collect()
    }
    assert got == {10: 1000.0, 11: 1001.0}  # both txns' batches landed


def test_phantom_catalog_manifest_purged_before_publish(spark, tmp_path):
    """Round-10 advice: a transaction that died between its c-N write
    and the pointer replace leaves c-N on disk; once a later commit
    advances the pointer past N, that never-published manifest must
    NOT become readable 'committed' history (catalog_read accepts any
    v <= the pointer). _cat_commit now purges phantoms under _CATLOCK
    before publishing — same rule as the table layer's commit."""
    import json
    import os

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2
    assert catalog_latest(cat) == 2

    # simulate the dead transaction's leftovers: phantom manifests at
    # v3 (the number the next commit will take) and v4, pinning a
    # bogus never-published snapshot
    for ph in (3, 4):
        with open(os.path.join(cat, f"c-{ph}.json"), "w") as f:
            json.dump(
                {"v": ph, "tables": {"head": {"path": hp, "version": 999}}},
                f,
            )

    batch = spark.createDataFrame([Row(id=7, price=777.0)])
    r = catalog_txn(
        spark, cat, {"head": hp, "stat": sp},
        actions={"head": lambda sk, p: merge_scoped_versioned(sk, p, batch)},
    )
    # the new commit takes v3 (pointer + 1, phantoms don't open gaps)
    assert r["catalog_version"] == 3 and catalog_latest(cat) == 3
    # v3 serves the REAL transaction, not the phantom's bogus pin
    h = catalog_read(spark, cat, "head", version=3)
    assert h.filter(F.col("id") == 7).collect()[0]["price"] == 777.0
    # the v4 phantom is gone: nothing beyond the pointer survives
    assert not os.path.exists(os.path.join(cat, "c-4.json"))
    # and no manifest pins the bogus version 999 anywhere
    assert 999 not in {
        v
        for pins in catalog_referenced_versions(cat).values()
        for v in pins
    }


def test_txn_pins_action_returned_version_not_latest(spark, tmp_path):
    """Round-10 advice: the pin must be the version the action itself
    committed (merge_scoped_versioned returns it), not latest_version
    read afterwards — an out-of-band merge landing between the action
    and the pin must NOT be published as part of the transaction's
    snapshot. Emulated by an action that commits its own merge (v2),
    then an out-of-band merge (v3) lands before the pin is taken."""
    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2 -> (1,1)

    txn_batch = spark.createDataFrame([Row(id=2, price=222.0)])
    oob_batch = spark.createDataFrame([Row(id=2, price=666.0)])

    def action(sk, p):
        mine = merge_scoped_versioned(sk, p, txn_batch)  # head v2
        # an out-of-band merger (not part of any catalog txn) lands
        # AFTER the transaction's own commit but BEFORE the pin
        merge_scoped_versioned(sk, p, oob_batch)  # head v3
        return mine  # the dict carries {"version": 2}

    r = catalog_txn(
        spark, cat, {"head": hp, "stat": sp}, actions={"head": action}
    )
    # pinned at the action's OWN commit, not the out-of-band v3
    assert r["tables"]["head"] == 2
    assert latest_version(hp) == 3
    h = catalog_read(spark, cat, "head")
    assert h.filter(F.col("id") == 2).collect()[0]["price"] == 222.0


def test_catalog_change_feed_joint_apply_law(spark, tmp_path):
    """catalog_change_feed (round-10): per-table key-level feeds whose
    spans all come from ONE pair of catalog manifests. Laws: (a) the
    joint apply — old catalog snapshot + feeds == new catalog
    snapshot, for EVERY member at once; (b) an up-to-date consumer
    gets None for every table (manifest arithmetic only); (c) a table
    newly registered between the versions arrives as a full insert
    feed."""
    from cvemate_spark.operators.catalog import catalog_change_feed
    from cvemate_spark.operators.merge_versioned import apply_change_feed

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2

    batch_h = spark.createDataFrame([Row(id=3, price=999.0)])
    batch_s = spark.createDataFrame(
        [Row(id=3, status="X"), Row(id=99, status="N")]
    )
    catalog_txn(  # cat v3: one txn moves BOTH tables
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(sk, p, batch_h),
            "stat": lambda sk, p: merge_scoped_versioned(sk, p, batch_s),
        },
    )
    feeds = catalog_change_feed(spark, cat, 2, 3)
    assert set(feeds) == {"head", "stat"}
    for name in ("head", "stat"):
        old = catalog_read(spark, cat, name, version=2)
        new = catalog_read(spark, cat, name, version=3)
        applied = apply_change_feed(old, feeds[name], "id")
        cols = sorted(new.columns)
        assert (
            applied.select(*cols).exceptAll(new.select(*cols)).count() == 0
            and new.select(*cols).exceptAll(applied.select(*cols)).count()
            == 0
        ), name

    # (b) up-to-date: every feed is None
    assert all(
        f is None for f in catalog_change_feed(spark, cat, 3, 3).values()
    )

    # (c) a table registered between the versions -> full insert feed
    extra = spark.createDataFrame([Row(id=1, note="n1"), Row(id=2, note="n2")])
    ep = str(tmp_path / "extra")
    from cvemate_spark.operators.merge_versioned import (
        write_bucket_table_versioned as _wv,
    )

    _wv(extra, ep, key="id", n_buckets=2)
    catalog_txn(spark, cat, {"head": hp, "stat": sp, "extra": ep})  # v4
    feeds = catalog_change_feed(spark, cat, 3, 4)
    assert feeds["head"] is None and feeds["stat"] is None
    rows = feeds["extra"].collect()
    assert {r["change"] for r in rows} == {"insert"} and len(rows) == 2


def test_catalog_replica_crash_lands_on_joint_snapshot(spark, tmp_path):
    """The round-10 replica law: the two-table consumer's pointer
    publish makes its replicas a JOINT snapshot — a crash after all
    data is written but before the pointer lands leaves readers on
    the complete OLD pair (never head at v+1 with stat at v), and the
    restarted poll converges exactly. The applied version lives IN
    the pointer, so the A-B-A redelivery hazard is structurally
    absent."""
    from cvemate_spark.operators.catalog import (
        read_catalog_replica, replicate_catalog,
    )

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    rep = str(tmp_path / "rep")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2

    r = replicate_catalog(spark, cat, rep)  # bootstrap at v2
    assert r["advanced"] and r["applied_version"] == 2

    def joint():
        h = read_catalog_replica(spark, rep, "head")
        s = read_catalog_replica(spark, rep, "stat")
        j = h.join(s, "id").filter(F.col("id") == 3).collect()[0]
        return (j["price"], j["status"])

    assert joint() == (3.0, "O")

    batch_h = spark.createDataFrame([Row(id=3, price=999.0)])
    batch_s = spark.createDataFrame([Row(id=3, status="X")])
    catalog_txn(  # cat v3 moves both
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(sk, p, batch_h),
            "stat": lambda sk, p: merge_scoped_versioned(sk, p, batch_s),
        },
    )
    # the worst crash: all new replica dirs written, pointer untouched
    r = replicate_catalog(spark, cat, rep, crash_before_publish=True)
    assert not r["advanced"]
    assert joint() == (3.0, "O")  # still the complete OLD pair

    # restart: converges to the complete NEW pair
    r = replicate_catalog(spark, cat, rep)
    assert r["advanced"] and r["applied_version"] == 3
    assert joint() == (999.0, "X")

    # revert head (A-B-A across a crash span) + advance stat; the
    # pointer-held applied version makes the revert visible
    batch_h2 = spark.createDataFrame([Row(id=3, price=3.0)])
    batch_s2 = spark.createDataFrame([Row(id=3, status="O")])
    catalog_txn(
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(sk, p, batch_h2),
            "stat": lambda sk, p: merge_scoped_versioned(sk, p, batch_s2),
        },
    )
    replicate_catalog(spark, cat, rep, crash_before_publish=True)
    r = replicate_catalog(spark, cat, rep)
    assert r["applied_version"] == 4
    assert joint() == (3.0, "O")
    # replicas equal the catalog snapshot EXACTLY, table by table
    for name in ("head", "stat"):
        want = catalog_read(spark, cat, name)
        got = read_catalog_replica(spark, rep, name)
        cols = sorted(want.columns)
        assert (
            got.select(*cols).exceptAll(want.select(*cols)).count() == 0
            and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
        ), name
    # an up-to-date poll is a no-op (no dirs churned)
    import os

    before = sorted(os.listdir(rep))
    r = replicate_catalog(spark, cat, rep)
    assert not r["advanced"]
    assert sorted(os.listdir(rep)) == before


def test_catalog_feed_table_rebound_to_new_path(spark, tmp_path):
    """Review-caught defect (round 10): a catalog NAME re-bound to a
    DIFFERENT table path between two versions has no single-table
    change_feed span (the old version number belongs to the old
    path's history). The feed must be the full-snapshot diff — it
    carries DELETES for rows only the old binding held and the new
    binding's extra columns — and the replica consumer must land
    exactly on the new binding's content."""
    import os

    from cvemate_spark.operators.catalog import (
        catalog_change_feed, read_catalog_replica, replicate_catalog,
    )
    from cvemate_spark.operators.merge_versioned import (
        apply_change_feed,
        write_bucket_table_versioned as _wv,
    )

    old_t = spark.createDataFrame(
        [Row(id=i, v=f"old{i}") for i in range(8)]
    )
    new_t = spark.createDataFrame(
        [Row(id=i, v=f"new{i}", extra=float(i)) for i in range(4, 12)]
    )
    op, np_ = str(tmp_path / "told"), str(tmp_path / "tnew")
    _wv(old_t, op, key="id", n_buckets=2)
    _wv(new_t, np_, key="id", n_buckets=2)
    cat = str(tmp_path / "cat")
    rep = str(tmp_path / "rep")
    catalog_init(cat)
    catalog_txn(spark, cat, {"t": op})      # cat v2: name -> old path
    replicate_catalog(spark, cat, rep)      # replica holds old content
    catalog_txn(spark, cat, {"t": np_})     # cat v3: name REBOUND

    feeds = catalog_change_feed(spark, cat, 2, 3)
    rows = {r["id"]: (r["change"], r["v"]) for r in feeds["t"].collect()}
    # rows only the old binding held are DELETES; shared ids update;
    # new-only ids insert
    assert all(rows[i][0] == "delete" for i in range(4))
    assert all(rows[i][0] == "update" for i in range(4, 8))
    assert all(rows[i][0] == "insert" for i in range(8, 12))
    # the new-binding-only column survives into the feed payload
    extras = {r["id"]: r["extra"] for r in feeds["t"].collect()}
    assert extras[11] == 11.0

    # apply law across the rebind: old snapshot + feed == new snapshot
    applied = apply_change_feed(
        spark.read.parquet(
            os.path.join(
                rep,
                __import__("json").load(
                    open(os.path.join(rep, "_REPLICA_STATE.json"))
                )["dirs"]["t"],
            )
        ),
        feeds["t"],
        "id",
    )
    got = {r["id"]: (r["v"], r["extra"]) for r in applied.collect()}
    want = {r.id: (r.v, r.extra) for r in new_t.collect()}
    assert got == want

    # and the consumer end-to-end
    r = replicate_catalog(spark, cat, rep)
    assert r["advanced"]
    rep_rows = {
        r2["id"]: (r2["v"], r2["extra"])
        for r2 in read_catalog_replica(spark, rep, "t").collect()
    }
    assert rep_rows == want


def test_catalog_feed_vacuumed_span_fails_loudly(spark, tmp_path):
    """A consumer whose applied catalog version has been vacuumed must
    get an ACTIONABLE error (re-bootstrap or extend retention), never
    a bare FileNotFoundError — and never a silent wrong feed."""
    from cvemate_spark.operators.catalog import (
        catalog_change_feed, vacuum_catalog,
    )

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # v2
    for i in range(3):  # v3..v5
        b = spark.createDataFrame([Row(id=1, price=50.0 + i)])
        catalog_txn(
            spark, cat, {"head": hp, "stat": sp},
            actions={
                "head": lambda sk, p, b=b: merge_scoped_versioned(sk, p, b)
            },
        )
    vacuum_catalog(cat, keep=2)  # v2/v3 gone
    with pytest.raises(ValueError, match="no longer retained"):
        catalog_change_feed(spark, cat, 2, 5)


def test_catalog_txn_pins_mor_action_version(spark, tmp_path):
    """A MOR merge as a catalog transaction action: the txn pins the
    version the action RETURNS (merge_scoped_versioned_mor returns its
    dict like the CoW path), and catalog_read at that catalog version
    serves the joint snapshot with the delta chain folded."""
    from pyspark.sql import Row

    from cvemate_spark.operators.catalog import (
        catalog_init, catalog_read, catalog_txn,
    )
    from cvemate_spark.operators.merge import merge_upsert
    from cvemate_spark.operators.merge_versioned import (
        merge_scoped_versioned_mor,
        write_bucket_table_versioned,
    )

    cat = str(tmp_path / "cat")
    catalog_init(cat)
    tpath = str(tmp_path / "t1")
    base = spark.createDataFrame([Row(id=f"k{i}", v=i) for i in range(10)])
    write_bucket_table_versioned(
        merge_upsert(None, base, now="2024-01-01 00:00:00"),
        tpath, key="id", n_buckets=2,
    )

    def action(sk, p):
        return merge_scoped_versioned_mor(
            sk, p,
            sk.createDataFrame([Row(id="k1", v=999), Row(id="k99", v=1)]),
            now="2024-01-02 00:00:00",
        )

    out = catalog_txn(
        spark, cat, members={"t1": tpath}, actions={"t1": action}
    )
    assert out["tables"]["t1"] == 2
    snap = catalog_read(
        spark, cat, "t1", version=out["catalog_version"]
    )
    m = {r["id"]: r["v"] for r in snap.collect()}
    assert m["k1"] == 999 and m["k99"] == 1 and len(m) == 11


# --------------------------------------------- round-11: catalog OCC
def test_catalog_occ_disjoint_txns_overlap_and_both_land(spark, tmp_path):
    """VERDICT r10 item 5: two transactions over DISJOINT member sets
    run their work phases concurrently (real two threads, barrier in
    the publish seam) and both land — the loser rebases, upserting its
    members into the winner's table set, so neither unregisters the
    other. The final joint snapshot carries both merges."""
    from cvemate_spark.operators.catalog import catalog_txn_occ

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "catocc")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})
    barrier = threading.Barrier(2)
    results: dict[str, dict] = {}
    errs: list[Exception] = []

    def act_head(s, p):
        return merge_scoped_versioned(
            s, p, spark.createDataFrame([Row(id=1, price=111.0)]), now=T1
        )

    def act_stat(s, p):
        return merge_scoped_versioned(
            s, p, spark.createDataFrame([Row(id=2, status="X")]), now=T1
        )

    def run(tag, members, actions):
        try:
            results[tag] = catalog_txn_occ(
                spark, cat, members, actions,
                pre_publish_hook=barrier.wait,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(
        target=run, args=("A", {"head": hp}, {"head": act_head})
    )
    t2 = threading.Thread(
        target=run, args=("B", {"stat": sp}, {"stat": act_stat})
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert sorted(r["catalog_version"] for r in results.values()) == [3, 4]
    assert sorted(r["rebased"] for r in results.values()) == [False, True]
    # the final snapshot holds BOTH tables at their post-merge versions
    final = catalog_latest(cat)
    head = {r["id"]: r["price"] for r in catalog_read(
        spark, cat, "head", version=final).collect()}
    stat = {r["id"]: r["status"] for r in catalog_read(
        spark, cat, "stat", version=final).collect()}
    assert head[1] == 111.0 and stat[2] == "X"


def test_catalog_occ_contended_member_pins_newest(spark, tmp_path):
    """Two OCC transactions acting on the SAME member: the member's
    own lock serializes the merges (linear history), so the loser's
    rebase pins the NEWEST version — which contains both effects —
    never rolling the winner's pin back."""
    from cvemate_spark.operators.catalog import catalog_txn_occ

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "catocc2")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp})
    calls = []

    def winner_inside_window():
        if not calls:
            calls.append(1)
            catalog_txn_occ(
                spark, cat, {"head": hp},
                {"head": lambda s, p: merge_scoped_versioned(
                    s, p, spark.createDataFrame([Row(id=5, price=555.0)]),
                    now=T1,
                )},
            )

    res = catalog_txn_occ(
        spark, cat, {"head": hp},
        {"head": lambda s, p: merge_scoped_versioned(
            s, p, spark.createDataFrame([Row(id=6, price=666.0)]), now=T1,
        )},
        pre_publish_hook=winner_inside_window,
    )
    assert res["rebased"] is True
    # the published pin is the newest linear version: both rows live
    head = {r["id"]: r["price"] for r in catalog_read(
        spark, cat, "head").collect()}
    assert head[5] == 555.0 and head[6] == 666.0
    # and the pin never regressed below the winner's
    assert res["tables"]["head"] == latest_version(hp)


def test_catalog_occ_rebind_race_raises(spark, tmp_path):
    """A member name re-bound to a DIFFERENT path by a concurrent
    transaction is the hard conflict: version pins across paths are
    incomparable, so the loser raises CatalogConflict and the catalog
    keeps the winner's binding untouched."""
    from cvemate_spark.operators.catalog import (
        CatalogConflict,
        catalog_txn_occ,
    )

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "catocc3")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp})

    def rebind_inside_window():
        catalog_txn(spark, cat, {"head": sp})  # re-bind name -> other path

    with pytest.raises(CatalogConflict):
        catalog_txn_occ(
            spark, cat, {"head": hp},
            {"head": lambda s, p: merge_scoped_versioned(
                s, p, spark.createDataFrame([Row(id=9, price=9.0)]), now=T1,
            )},
            pre_publish_hook=rebind_inside_window,
        )
    # winner's binding stands; the loser's member commit is valid
    # (unreferenced) table-level history
    m = catalog_read(spark, cat, "head").columns
    assert "status" in m  # the catalog serves the re-bound table


def test_catalog_occ_uncontended_upserts_not_replaces(spark, tmp_path):
    """ADVICE r11 (high): the UNCONTENDED OCC fast path must upsert
    its members into the current catalog table set, exactly like the
    rebase branch — an OCC txn over a subset must never unregister the
    other registered tables (the repro: catalog {head, stat}, occ txn
    on head alone -> stat had vanished; catalog_read(stat) raised)."""
    from cvemate_spark.operators.catalog import catalog_txn_occ

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "catocc4")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})

    out = catalog_txn_occ(
        spark, cat, {"head": hp},
        {"head": lambda s, p: merge_scoped_versioned(
            s, p, spark.createDataFrame([Row(id=7, price=77.0)]), now=T1,
        )},
    )
    assert out["rebased"] is False
    # BOTH tables remain registered at the new catalog version
    assert set(out["tables"]) == {"head", "stat"}
    st = catalog_read(spark, cat, "stat")  # must not raise
    assert st.count() == 30
    hd = {r["id"]: r["price"] for r in
          catalog_read(spark, cat, "head").collect()}
    assert hd[7] == 77.0


def test_catalog_occ_uncontended_intentional_rebind(spark, tmp_path):
    """An UNCONTENDED occ txn may intentionally re-point a name at a
    different table path (the serial txn allows it; no race means no
    incomparability) — the new binding wins even though its version
    number is lower than the old path's pin."""
    from cvemate_spark.operators.catalog import catalog_txn_occ

    hp, sp = _mk_tables(spark, tmp_path)
    cat = str(tmp_path / "catocc5")
    catalog_init(cat)
    # advance head's version so the old pin outnumbers the new path's
    merge_scoped_versioned(
        spark, hp, spark.createDataFrame([Row(id=1, price=2.0)]), now=T0
    )
    catalog_txn(spark, cat, {"t": hp})
    out = catalog_txn_occ(spark, cat, {"t": sp})
    assert out["rebased"] is False
    assert "status" in catalog_read(spark, cat, "t").columns
