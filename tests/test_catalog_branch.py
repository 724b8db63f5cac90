"""Laws for write-audit-publish branches and tags
(operators/catalog.py): a branch stages table commits behind its own
manifest sequence — metadata-only fork, zero data copies — main
readers never see ANY staged version until publish, and publish is one
atomic pointer advance making ALL of them visible jointly. Tags pin a
committed joint snapshot under an immutable name that vacuums must
honor. The reference has no staging layer (handlers bulk_write
straight into serving collections, mongodb_handler.py); this is the
engine-level fix.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from cvemate_spark.operators.catalog import (
    CatalogConflict,
    branch_txn,
    catalog_branch,
    catalog_init,
    catalog_latest,
    catalog_read,
    catalog_referenced_versions,
    catalog_tag,
    catalog_tag_version,
    catalog_txn,
    drop_branch,
    drop_tag,
    list_branches,
    list_tags,
    publish_branch,
    read_branch,
    vacuum_catalog,
    vacuum_catalog_members,
)
from cvemate_spark.operators.merge_versioned import (
    latest_version,
    merge_scoped_versioned,
    write_bucket_table_versioned,
)


def _mk_cat(spark, tmp_path, n=30):
    head = spark.createDataFrame(
        [Row(id=i, price=float(i)) for i in range(n)]
    )
    stat = spark.createDataFrame(
        [Row(id=i, status="O") for i in range(n)]
    )
    hp, sp = str(tmp_path / "head"), str(tmp_path / "stat")
    write_bucket_table_versioned(head, hp, key="id", n_buckets=4)
    write_bucket_table_versioned(stat, sp, key="id", n_buckets=4)
    cat = str(tmp_path / "cat")
    catalog_init(cat)
    catalog_txn(spark, cat, {"head": hp, "stat": sp})  # cat v2
    return cat, hp, sp


def _prices(spark, cat, **kw):
    return {
        r["id"]: r["price"]
        for r in catalog_read(spark, cat, "head", **kw).collect()
    }


def test_staging_is_isolated_and_publish_is_atomic(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path)
    main_before = catalog_latest(cat)
    catalog_branch(cat, "audit")
    assert list_branches(cat) == ["audit"]

    # stage TWO commits on the branch
    b1 = spark.createDataFrame([Row(id=3, price=999.0)])
    b2 = spark.createDataFrame([Row(id=7, price=777.0)])
    r1 = branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(sk, p, b1)},
    )
    r2 = branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(sk, p, b2)},
    )
    assert r2["tables"]["head"] == r1["tables"]["head"] + 1
    # table-level history carries the staged versions...
    assert latest_version(hp) == r2["tables"]["head"]
    # ...but MAIN still reads the pre-branch snapshot (pointer and pins
    # both untouched), while the BRANCH read sees the staged state
    assert catalog_latest(cat) == main_before
    assert _prices(spark, cat)[3] == 3.0
    staged = {
        r["id"]: r["price"]
        for r in read_branch(spark, cat, "audit", "head").collect()
    }
    assert (staged[3], staged[7]) == (999.0, 777.0)

    # audit passed -> publish: ONE pointer advance, both staged
    # commits visible jointly, fast-forward (main never moved)
    pub = publish_branch(spark, cat, "audit")
    assert pub["fast_forward"] is True
    assert catalog_latest(cat) == main_before + 1
    after = _prices(spark, cat)
    assert (after[3], after[7]) == (999.0, 777.0)
    # the carried read-only member kept its fork pin
    assert pub["tables"]["stat"] == 1
    assert list_branches(cat) == []  # consumed by default


def test_branch_carry_ignores_concurrent_main_commit(spark, tmp_path):
    """Non-acted branch members carry the FORK pins: a main commit
    landing mid-stage must not leak into the staged snapshot."""
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    # main advances `stat` AFTER the fork
    catalog_txn(
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "stat": lambda sk, p: merge_scoped_versioned(
                sk, p, spark.createDataFrame([Row(id=5, status="M")])
            )
        },
    )
    # branch stages on `head` only; its `stat` pin must stay at fork
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=1, price=-1.0)])
        )},
    )
    st = {
        r["id"]: r["status"]
        for r in read_branch(spark, cat, "audit", "stat").collect()
    }
    assert st[5] == "O"  # main's concurrent commit did NOT leak in


def test_publish_rebases_over_disjoint_main_commits(spark, tmp_path):
    """While a branch is live, main-side transactions use the
    upsert-style `catalog_txn_occ` pinning only what they act on (the
    branch-ownership discipline: the serial `catalog_txn`'s no-action
    refresh deliberately re-pins read-only members at latest, which
    would re-pin staged versions). Staged data stays invisible to main
    through the concurrent commit; publish rebases and both effects
    land jointly."""
    from cvemate_spark.operators.catalog import catalog_txn_occ

    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    # main commits to the OTHER table while the branch is staged
    catalog_txn_occ(
        spark, cat, {"stat": sp},
        actions={
            "stat": lambda sk, p: merge_scoped_versioned(
                sk, p, spark.createDataFrame([Row(id=5, status="M")])
            )
        },
    )
    # mid-stage isolation holds through main's concurrent commit
    assert _prices(spark, cat)[3] == 3.0
    pub = publish_branch(spark, cat, "audit")
    assert pub["fast_forward"] is False
    # BOTH effects present in the published joint snapshot
    assert _prices(spark, cat)[3] == 999.0
    st = {
        r["id"]: r["status"]
        for r in catalog_read(spark, cat, "stat").collect()
    }
    assert st[5] == "M"


def test_publish_same_table_takes_linear_successor(spark, tmp_path):
    """Both sides advanced the SAME binding: member history is linear
    (the table's own lock ordered the commits), so the higher pin
    contains both effects."""
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    # main then commits to head TOO — on top of the staged version
    # (linear table history: version 3 contains the staged change).
    # Writing to a branch-owned table from main forfeits staging
    # invisibility for THAT table, by documented contract; the publish
    # still converges deterministically to the linear successor.
    from cvemate_spark.operators.catalog import catalog_txn_occ

    catalog_txn_occ(
        spark, cat, {"head": hp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(
                sk, p, spark.createDataFrame([Row(id=4, price=444.0)])
            )
        },
    )
    pub = publish_branch(spark, cat, "audit")
    assert pub["tables"]["head"] == latest_version(hp)
    after = _prices(spark, cat)
    assert (after[3], after[4]) == (999.0, 444.0)


def test_publish_conflict_on_rebind_leaves_main_and_branch_intact(
    spark, tmp_path
):
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    # main re-binds `head` to a DIFFERENT path: pins incomparable
    hp2 = str(tmp_path / "head2")
    write_bucket_table_versioned(
        spark.createDataFrame([Row(id=0, price=0.0)]),
        hp2, key="id", n_buckets=4,
    )
    catalog_txn(spark, cat, {"head": hp2, "stat": sp})
    main_v = catalog_latest(cat)
    with pytest.raises(CatalogConflict):
        publish_branch(spark, cat, "audit")
    assert catalog_latest(cat) == main_v  # main untouched
    assert list_branches(cat) == ["audit"]  # branch kept for inspection
    drop_branch(cat, "audit")
    assert list_branches(cat) == []


def test_abandoned_branch_versions_are_unreferenced(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    staged_v = latest_version(hp)
    # while the branch lives, the staged version IS referenced — the
    # vacuum contract protects the audit read
    assert staged_v in catalog_referenced_versions(cat)[hp]
    drop_branch(cat, "audit")
    assert staged_v not in catalog_referenced_versions(cat).get(hp, set())
    # main never saw it
    assert _prices(spark, cat)[3] == 3.0


def test_staged_versions_survive_member_vacuum(spark, tmp_path):
    """vacuum_catalog_members honors branch pins: reclaiming a staged
    version would corrupt the branch before its audit ran. The branch
    stages a chain of commits; a member vacuum at keep=1 runs with the
    branch's pins in force — the audit read stays exact and main stays
    on its pre-branch snapshot."""
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")
    for i, (k, p_) in enumerate([(3, 999.0), (7, 777.0), (9, 111.0)]):
        branch_txn(
            spark, cat, "audit",
            {"head": lambda sk, p, b=spark.createDataFrame(
                [Row(id=k, price=p_)]
            ): merge_scoped_versioned(sk, p, b)},
        )
    staged_head = latest_version(hp)
    refs = catalog_referenced_versions(cat)[hp]
    assert staged_head in refs and 1 in refs  # branch + main pins both
    vacuum_catalog(cat, keep=1)
    vacuum_catalog_members(cat, keep=1)
    staged = {
        r["id"]: r["price"]
        for r in read_branch(spark, cat, "audit", "head").collect()
    }
    assert (staged[3], staged[7], staged[9]) == (999.0, 777.0, 111.0)
    assert _prices(spark, cat)[3] == 3.0  # main untouched post-vacuum


def test_keep_republish_continues_staging(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "nightly")
    branch_txn(
        spark, cat, "nightly",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    pub1 = publish_branch(spark, cat, "nightly", keep=True)
    assert list_branches(cat) == ["nightly"]  # re-forked at the publish
    branch_txn(
        spark, cat, "nightly",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=4, price=444.0)])
        )},
    )
    pub2 = publish_branch(spark, cat, "nightly")
    assert pub2["fast_forward"] is True
    assert pub2["catalog_version"] == pub1["catalog_version"] + 1
    after = _prices(spark, cat)
    assert (after[3], after[4]) == (999.0, 444.0)


def test_tag_pins_snapshot_through_vacuum(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path)
    tagged_v = catalog_latest(cat)
    catalog_tag(cat, "release-1")
    assert catalog_tag_version(cat, "release-1") == tagged_v
    assert list_tags(cat) == {"release-1": tagged_v}
    with pytest.raises(ValueError):
        catalog_tag(cat, "release-1")  # immutable: no silent re-tag
    # bury the tagged version under newer commits, then vacuum hard
    for i in range(4):
        catalog_txn(
            spark, cat, {"head": hp, "stat": sp},
            actions={
                "head": lambda sk, p: merge_scoped_versioned(
                    sk, p,
                    spark.createDataFrame([Row(id=i, price=-1.0)]),
                )
            },
        )
    r = vacuum_catalog(cat, keep=1)
    assert tagged_v not in r["removed_versions"]
    vacuum_catalog_members(cat, keep=1)
    # the tagged joint snapshot reads exactly as on release day
    pinned = _prices(spark, cat, tag="release-1")
    assert pinned[0] == 0.0
    assert _prices(spark, cat)[0] == -1.0  # latest moved on
    drop_tag(cat, "release-1")
    with pytest.raises(KeyError):
        catalog_tag_version(cat, "release-1")
    assert vacuum_catalog(cat, keep=1)["removed_versions"]  # now free


def test_ref_name_validation(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path, n=4)
    for bad in ("../evil", "a/b", "", ".hidden", "a b"):
        with pytest.raises(ValueError):
            catalog_branch(cat, bad)
        with pytest.raises(ValueError):
            catalog_tag(cat, bad)


def test_branch_registers_new_member_read_only(spark, tmp_path):
    cat, hp, sp = _mk_cat(spark, tmp_path, n=4)
    xp = str(tmp_path / "extra")
    write_bucket_table_versioned(
        spark.createDataFrame([Row(id=0, price=5.0)]),
        xp, key="id", n_buckets=2,
    )
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        actions={"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=1, price=-9.0)])
        )},
        members={"extra": xp},
    )
    pub = publish_branch(spark, cat, "audit")
    assert pub["tables"]["extra"] == 1
    got = {
        r["id"]: r["price"]
        for r in catalog_read(spark, cat, "extra").collect()
    }
    assert got == {0: 5.0}


def test_two_branches_disjoint_publish_in_sequence(spark, tmp_path):
    """Two branches staging DISJOINT tables: the first publish
    fast-forwards, the second rebases over it — both staged effects
    land, nothing is lost, and the loser never needed a retry of its
    member work (publish is manifest arithmetic)."""
    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "feeds-a")
    catalog_branch(cat, "feeds-b")
    branch_txn(
        spark, cat, "feeds-a",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    branch_txn(
        spark, cat, "feeds-b",
        {"stat": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=5, status="M")])
        )},
    )
    pub_a = publish_branch(spark, cat, "feeds-a")
    pub_b = publish_branch(spark, cat, "feeds-b")
    assert pub_a["fast_forward"] is True
    assert pub_b["fast_forward"] is False  # rebased over a's publish
    assert pub_b["catalog_version"] == pub_a["catalog_version"] + 1
    assert _prices(spark, cat)[3] == 999.0
    st = {
        r["id"]: r["status"]
        for r in catalog_read(spark, cat, "stat").collect()
    }
    assert st[5] == "M"


def test_change_feed_on_branch_root_equals_staged_diff(spark, tmp_path):
    """A branch IS a catalog: catalog_change_feed over the branch's
    own manifest sequence yields exactly the staged delta — the audit
    query a WAP pipeline runs ('what does this batch change?') without
    ever touching main."""
    from cvemate_spark.operators.catalog import (
        branch_root,
        catalog_change_feed,
    )

    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "audit")

    def _pure_upsert(cur, b):
        # keep the (id, price) schema byte-stable: the default merger
        # stamps created_at/updated_at, which would turn every row of
        # a rewritten bucket into a value diff
        if cur is None:
            return b
        return cur.join(b, "id", "left_anti").unionByName(b)

    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p,
            spark.createDataFrame(
                [Row(id=3, price=999.0), Row(id=77, price=77.0)]
            ),
            merger=_pure_upsert,
        )},
    )
    broot = branch_root(cat, "audit")
    feeds = catalog_change_feed(spark, broot, 1)
    assert feeds["stat"] is None  # untouched member: no data read
    rows = {
        r["id"]: (r["change"], r["price"])
        for r in feeds["head"].collect()
    }
    assert rows == {3: ("update", 999.0), 77: ("insert", 77.0)}


def test_register_catalog_views_snapshot_consistent_sql(spark, tmp_path):
    """SQL surface: views registered from ONE catalog snapshot join
    consistently; two prefixed registrations put a release and the
    current state side-by-side for plain-SQL diffing; branch roots
    register the same way (SQL audits)."""
    from cvemate_spark.operators.catalog import (
        branch_root,
        register_catalog_views,
    )

    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_tag(cat, "rel")
    catalog_txn(
        spark, cat, {"head": hp, "stat": sp},
        actions={
            "head": lambda sk, p: merge_scoped_versioned(
                sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
            )
        },
    )
    r_new = register_catalog_views(spark, cat, prefix="cur_")
    r_old = register_catalog_views(spark, cat, tag="rel", prefix="rel_")
    assert r_old["catalog_version"] < r_new["catalog_version"]
    assert r_new["views"] == ["cur_head", "cur_stat"]
    # release-diff in plain SQL across the two joint snapshots
    diff = spark.sql(
        "SELECT c.id, r.price AS old_price, c.price AS new_price "
        "FROM cur_head c JOIN rel_head r ON c.id = r.id "
        "WHERE c.price <> r.price"
    ).collect()
    assert [(d["id"], d["old_price"], d["new_price"]) for d in diff] == [
        (3, 3.0, 999.0)
    ]
    # joins inside one registration resolve through one manifest
    n = spark.sql(
        "SELECT count(*) AS n FROM cur_head h JOIN cur_stat s ON h.id = s.id"
    ).collect()[0]["n"]
    assert n == 30
    # branch roots register too: the SQL audit surface
    catalog_branch(cat, "audit")
    branch_txn(
        spark, cat, "audit",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=7, price=-7.0)])
        )},
    )
    register_catalog_views(
        spark, branch_root(cat, "audit"), prefix="stage_"
    )
    staged = spark.sql(
        "SELECT price FROM stage_head WHERE id = 7"
    ).collect()[0]["price"]
    assert staged == -7.0
    # main's registration is a snapshot: re-reading cur_head is
    # unaffected by the staging that happened after it was registered
    cur7 = spark.sql(
        "SELECT price FROM cur_head WHERE id = 7"
    ).collect()[0]["price"]
    assert cur7 == 7.0


def test_mor_deltas_stage_on_branch_and_publish_folds(spark, tmp_path):
    """Composition: MERGE-ON-READ deltas staged on a branch. Each
    staged MOR commit is delta-append-only (no bucket rewrite) and
    pinned only by the branch; main folds nothing until publish, then
    one pointer advance exposes the whole delta chain, folded under
    the recorded policy. Compaction staged on the SAME branch keeps
    the fold result identical."""
    from pyspark.sql import functions as F

    from cvemate_spark.operators.catalog import (
        branch_txn, catalog_branch, catalog_init, catalog_read,
        catalog_txn, publish_branch, read_branch,
    )
    from cvemate_spark.operators.merge import merge_upsert
    from cvemate_spark.operators.merge_versioned import (
        compact_versioned,
        merge_scoped_versioned_mor,
        write_bucket_table_versioned,
    )

    cat = str(tmp_path / "cat")
    catalog_init(cat)
    tpath = str(tmp_path / "t1")
    base = spark.createDataFrame(
        [Row(id=f"k{i}", v=i) for i in range(10)]
    )
    write_bucket_table_versioned(
        merge_upsert(None, base, key="id", now="2024-01-01 00:00:00"),
        tpath, key="id", n_buckets=2,
    )
    catalog_txn(spark, cat, {"t1": tpath})
    catalog_branch(cat, "mor-stage")
    for batch in (
        [Row(id="k1", v=100)],
        [Row(id="k1", v=999), Row(id="k99", v=1)],
    ):
        branch_txn(
            spark, cat, "mor-stage",
            {"t1": lambda sk, p, b=batch: merge_scoped_versioned_mor(
                sk, p, sk.createDataFrame(b), now="2024-01-02 00:00:00"
            )},
        )
    # branch read folds the staged chain; main still serves the base
    staged = {
        r["id"]: r["v"]
        for r in read_branch(spark, cat, "mor-stage", "t1").collect()
    }
    assert staged["k1"] == 999 and staged["k99"] == 1
    main = {
        r["id"]: r["v"] for r in catalog_read(spark, cat, "t1").collect()
    }
    assert main["k1"] == 1 and "k99" not in main
    # compaction staged on the same branch: fold result unchanged
    branch_txn(
        spark, cat, "mor-stage",
        {"t1": lambda sk, p: compact_versioned(sk, p)},
    )
    staged2 = {
        r["id"]: r["v"]
        for r in read_branch(spark, cat, "mor-stage", "t1").collect()
    }
    assert staged2 == staged
    pub = publish_branch(spark, cat, "mor-stage")
    assert pub["fast_forward"] is True
    after = {
        r["id"]: r["v"] for r in catalog_read(spark, cat, "t1").collect()
    }
    assert after == staged


def test_rebucket_and_evolve_stage_on_branch(spark, tmp_path):
    """Ops-behind-WAP: a LAYOUT migration (rebucket) and a SCHEMA
    evolution (new column) stage on a branch like any other commit —
    main keeps serving the old layout/schema until the one-pointer
    publish. The production shape for migrating a live table: rebucket
    on the branch, validate plans against the branch read, publish."""
    from cvemate_spark.operators.catalog import (
        branch_txn, catalog_branch, catalog_init, catalog_read,
        catalog_txn, publish_branch, read_branch,
    )
    from cvemate_spark.operators.merge import merge_upsert
    from cvemate_spark.operators.merge_versioned import (
        rebucket_versioned,
        table_schema,
        write_bucket_table_versioned,
    )

    cat = str(tmp_path / "cat")
    catalog_init(cat)
    tpath = str(tmp_path / "t1")
    base = spark.createDataFrame(
        [Row(id=f"k{i}", v=i) for i in range(40)]
    )
    write_bucket_table_versioned(
        merge_upsert(None, base, key="id", now="2024-01-01 00:00:00"),
        tpath, key="id", n_buckets=4,
    )
    catalog_txn(spark, cat, {"t1": tpath})
    catalog_branch(cat, "migrate")
    branch_txn(
        spark, cat, "migrate",
        {"t1": lambda sk, p: rebucket_versioned(sk, p, 16)},
    )
    branch_txn(  # schema evolution: a new column arrives post-rebucket
        spark, cat, "migrate",
        {"t1": lambda sk, p: merge_scoped_versioned(
            sk, p,
            spark.createDataFrame([Row(id="k1", extra=1.5)]),
            now="2024-01-02 00:00:00",
        )},
    )
    staged = read_branch(spark, cat, "migrate", "t1")
    assert "extra" in staged.columns
    assert staged.count() == 40
    # main: old layout, old schema, old data — migration invisible
    main_df = catalog_read(spark, cat, "t1")
    assert "extra" not in main_df.columns
    assert main_df.count() == 40
    pub = publish_branch(spark, cat, "migrate")
    assert pub["fast_forward"] is True
    after = catalog_read(spark, cat, "t1")
    assert "extra" in after.columns
    got = {
        r["id"]: r["extra"]
        for r in after.filter("extra is not null").collect()
    }
    assert got == {"k1": 1.5}


def test_concurrent_publishes_serialize_under_catlock(spark, tmp_path):
    """Two threads publishing two disjoint branches at once: _CATLOCK
    serializes the pointer arithmetic, exactly one fast-forwards, the
    other rebases, and both staged effects land — no lost update, no
    torn manifest."""
    import threading

    cat, hp, sp = _mk_cat(spark, tmp_path)
    catalog_branch(cat, "a")
    catalog_branch(cat, "b")
    branch_txn(
        spark, cat, "a",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    branch_txn(
        spark, cat, "b",
        {"stat": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=5, status="M")])
        )},
    )
    results: dict[str, dict] = {}
    errs: list[Exception] = []

    def pub(name):
        try:
            results[name] = publish_branch(spark, cat, name)
        except Exception as e:  # pragma: no cover - failure diagnostics
            errs.append(e)

    ts = [threading.Thread(target=pub, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert sorted(
        r["catalog_version"] for r in results.values()
    ) == [3, 4]
    assert [r["fast_forward"] for r in results.values()].count(True) == 1
    assert _prices(spark, cat)[3] == 999.0
    st = {
        r["id"]: r["status"]
        for r in catalog_read(spark, cat, "stat").collect()
    }
    assert st[5] == "M"


def test_publish_of_unchanged_branch_is_noop(spark, tmp_path):
    """Publishing a branch that staged nothing (or whose pins already
    landed in main) mints NO redundant catalog version: the pointer
    stays put, the result says noop, and the branch is consumed."""
    cat, hp, sp = _mk_cat(spark, tmp_path)
    v0 = catalog_latest(cat)
    catalog_branch(cat, "empty")
    pub = publish_branch(spark, cat, "empty")
    assert pub["noop"] is True
    assert pub["catalog_version"] == v0
    assert catalog_latest(cat) == v0
    assert list_branches(cat) == []
    # a branch that DID stage something still publishes normally
    catalog_branch(cat, "real")
    branch_txn(
        spark, cat, "real",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    pub2 = publish_branch(spark, cat, "real")
    assert pub2["noop"] is False
    assert catalog_latest(cat) == v0 + 1


def test_audit_and_publish_gates_on_sql_checks(spark, tmp_path):
    """The WAP gate as one call: declarative SQL checks (queries for
    counterexamples) run against the branch head; a failing check
    refuses the publish with samples, main untouched; passing checks
    publish."""
    from cvemate_spark.operators.catalog import (
        AuditFailed,
        audit_and_publish,
    )

    cat, hp, sp = _mk_cat(spark, tmp_path)
    v0 = catalog_latest(cat)
    catalog_branch(cat, "nightly")
    branch_txn(
        spark, cat, "nightly",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p,
            spark.createDataFrame(
                [Row(id=3, price=-999.0), Row(id=7, price=777.0)]
            ),
        )},
    )
    checks = {
        "no_negative_prices": "SELECT id, price FROM head WHERE price < 0",
        "row_count_stable": (
            "SELECT count(*) AS n FROM head HAVING count(*) <> 30"
        ),
    }
    with pytest.raises(AuditFailed) as ei:
        audit_and_publish(spark, cat, "nightly", checks)
    assert ei.value.violations == {"no_negative_prices": 1}
    assert ei.value.samples["no_negative_prices"][0]["id"] == 3
    assert catalog_latest(cat) == v0  # main untouched
    assert list_branches(cat) == ["nightly"]  # kept for inspection

    # fix the bad row on the branch, re-audit: publish goes through
    branch_txn(
        spark, cat, "nightly",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    pub = audit_and_publish(spark, cat, "nightly", checks)
    assert pub["checks_passed"] == [
        "no_negative_prices", "row_count_stable",
    ]
    assert catalog_latest(cat) == v0 + 1
    after = _prices(spark, cat)
    assert (after[3], after[7]) == (999.0, 777.0)

    # unattended setting: drop_on_fail consumes the bad branch
    catalog_branch(cat, "bad")
    branch_txn(
        spark, cat, "bad",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=9, price=-1.0)])
        )},
    )
    with pytest.raises(AuditFailed):
        audit_and_publish(
            spark, cat, "bad", checks, drop_on_fail=True
        )
    assert list_branches(cat) == []
    assert _prices(spark, cat)[9] == 9.0  # staged batch never exposed


def test_double_publish_of_one_branch_raises_not_republishes(
    spark, tmp_path
):
    """Two publishers of the SAME branch (sequential or threaded): the
    first consumes it, the second fails loudly — never a duplicate
    catalog version, never a crash on the missing branch dir."""
    import threading

    cat, hp, sp = _mk_cat(spark, tmp_path)
    v0 = catalog_latest(cat)
    catalog_branch(cat, "once")
    branch_txn(
        spark, cat, "once",
        {"head": lambda sk, p: merge_scoped_versioned(
            sk, p, spark.createDataFrame([Row(id=3, price=999.0)])
        )},
    )
    oks: list[dict] = []
    errs: list[Exception] = []

    def pub():
        try:
            oks.append(publish_branch(spark, cat, "once"))
        except KeyError as e:
            errs.append(e)

    ts = [threading.Thread(target=pub) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(oks) == 1 and len(errs) == 1, (oks, errs)
    assert catalog_latest(cat) == v0 + 1  # exactly one new version
    # and the sequential double-publish is the same loud failure
    with pytest.raises(KeyError):
        publish_branch(spark, cat, "once")
