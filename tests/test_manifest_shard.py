"""Laws for the SHARDED (format-2) manifest layout (VERDICT r10
item 1): per-bucket-range shard files + a small root with rollup
bounds — the Iceberg manifest-list / Delta-checkpoint shape that makes
commit bytes ∝ touched shards and point-lookup plan cost O(1) in table
width.

The master law is the TWIN: every write surface (load, CoW merge, MOR
merge, DV delete, compact, alter, optimize) applied to a sharded table
and a monolithic twin must yield identical logical manifests and
identical content at every version — this is the tripwire for the
_write_manifest_shards caller contract (`changed` must name every
bucket whose entry moved; a missed bucket would carry a stale shard).
"""

from __future__ import annotations

import glob
import json
import os

from cvemate_spark.operators import merge_versioned as mv
from cvemate_spark.operators.merge import merge_upsert

T0 = "2024-01-01 00:00:00"


def _base(spark, n=200):
    return spark.range(0, n).selectExpr(
        "id",
        "cast(id * 2.0 as double) as val",
        "concat('s', id % 7) as tag",
    )


def _norm_manifest(path):
    """Manifest structure with generation names (uuids) erased —
    equal iff the two tables reference the same logical state."""
    full = mv._load_manifest_full(path, mv.latest_version(path))
    return {
        "n_buckets": full["n_buckets"],
        "bucket_ids": sorted(full["buckets"]),
        "delta_depths": {
            k: len(v) for k, v in (full.get("deltas") or {}).items()
        },
        "dv": {
            k: sorted(mv._dv_ref(e)[1] for e in v)
            for k, v in (full.get("dv") or {}).items()
        },
        "stats_rows": {
            k: v["rows"] for k, v in (full.get("stats") or {}).items()
        },
        "schema_cols": [
            f["name"] for f in (full.get("schema") or {"fields": []})["fields"]
        ],
    }


def _content(spark, path, version=None):
    df = mv.read_bucket_table_versioned(spark, path, version=version)
    cols = [c for c in df.columns if c not in ("created_at", "updated_at")]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_sharded_monolithic_twin_equivalence(spark, tmp_path):
    """All write surfaces, applied identically to a sharded table and
    a monolithic twin, commit the same logical manifest and the same
    content — including time travel to every retained version."""
    pm = str(tmp_path / "mono")
    ps = str(tmp_path / "shard")
    base = merge_upsert(None, _base(spark), key="id", now=T0)
    mv.write_bucket_table_versioned(base, pm, key="id", n_buckets=16)
    mv.write_bucket_table_versioned(
        base, ps, key="id", n_buckets=16, manifest_shard_size=4
    )
    assert mv._load_root(ps, 1).get("format") == 2
    assert mv._load_root(pm, 1).get("format") != 2

    upd = spark.createDataFrame(
        [(3, 99.0, "sX"), (250, 1.0, "new")],
        "id long, val double, tag string",
    )
    mo = spark.createDataFrame(
        [(5, 55.0, "sY"), (300, 2.0, "m")],
        "id long, val double, tag string",
    )
    dk = spark.createDataFrame([(7,), (300,)], "id long")
    steps = [
        ("merge", lambda p: mv.merge_scoped_versioned(spark, p, upd, now=T0)),
        ("mor", lambda p: mv.merge_scoped_versioned_mor(spark, p, mo, now=T0)),
        ("delete-dv", lambda p: mv.merge_deletes_dv(spark, p, dk)),
        ("compact", lambda p: mv.compact_versioned(spark, p)),
        ("alter", lambda p: mv.alter_bucket_table_versioned(
            p, rename={"tag": "label"}
        )),
        ("optimize", lambda p: mv.optimize_versioned(
            spark, p, cluster_by=["val"]
        )),
    ]
    for name, op in steps:
        op(pm)
        op(ps)
        assert _norm_manifest(pm) == _norm_manifest(ps), name
        assert _content(spark, pm) == _content(spark, ps), name
    for v in range(1, mv.latest_version(pm) + 1):
        assert _content(spark, pm, v) == _content(spark, ps, v), v


def test_shard_migration_is_content_neutral_both_ways(spark, tmp_path):
    """shard_manifest_versioned commits metadata only: content is
    byte-identical across the boundary in both directions, old
    versions stay readable under their own format, and later commits
    inherit the recorded policy."""
    path = str(tmp_path / "mig")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=16,
    )
    gens_before = sorted(glob.glob(f"{path}/bucket=*/g-*"))
    before = _content(spark, path)
    res = mv.shard_manifest_versioned(path, shard_size=4)
    assert mv._load_root(path, res["version"]).get("format") == 2
    assert res["shards"] == 4
    assert sorted(glob.glob(f"{path}/bucket=*/g-*")) == gens_before
    assert _content(spark, path) == before
    assert _content(spark, path, version=1) == before  # pre-migration

    # later commits are sharded (policy recorded in meta)
    upd = spark.createDataFrame(
        [(3, -1.0, "x")], "id long, val double, tag string"
    )
    r = mv.merge_scoped_versioned(spark, path, upd, now=T0)
    assert mv._load_root(path, r["version"]).get("format") == 2

    back = mv.shard_manifest_versioned(path, shard_size=0)
    assert mv._load_root(path, back["version"]).get("format") != 2
    assert {t[0] for t in _content(spark, path)} == {
        t[0] for t in before
    }


def test_commit_reuses_unchanged_shard_files(spark, tmp_path):
    """A merge touching K buckets rewrites only the shards those
    buckets live in — the other shard entries carry the SAME
    content-addressed file reference (commit bytes ∝ batch, the
    format-2 economics)."""
    path = str(tmp_path / "reuse")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=32, manifest_shard_size=4,
    )
    r0 = mv._load_root(path, 1)
    one = spark.createDataFrame(
        [(3, -5.0, "z")], "id long, val double, tag string"
    )
    res = mv.merge_scoped_versioned(spark, path, one, now=T0)
    r1 = mv._load_root(path, res["version"])
    same = [
        s for s in r0["shards"]
        if r1["shards"].get(s, {}).get("f") == r0["shards"][s]["f"]
    ]
    changed = [s for s in r1["shards"] if s not in same]
    # a 1-row batch touches 1 bucket -> exactly 1 of 8 shards rewrites
    assert len(changed) == 1 and len(same) == len(r0["shards"]) - 1


def test_shard_rollup_prunes_without_loading(spark, tmp_path):
    """Root-level rollup bounds skip whole shards for a bounded
    predicate WITHOUT loading their shard files — and the pruned scan
    stays exact (≡ the residual filter on a full read). One merged
    bucket holds the only out-of-band value; every other shard's
    rollup excludes it at the root."""
    path = str(tmp_path / "roll")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=32, manifest_shard_size=4,
    )
    one = spark.createDataFrame(
        [(3, -5.0, "z")], "id long, val double, tag string"
    )
    mv.merge_scoped_versioned(spark, path, one, now=T0)
    plan = mv.prune_generations(path, "val", lo=-10.0, hi=-1.0)
    assert len(plan["read"]) == 1  # only the merged bucket survives
    # the returned manifest is PARTIAL: excluded shards never loaded,
    # so it holds at most the one covering shard's buckets
    assert set(plan["read"]) <= set(plan["manifest"]["buckets"])
    assert len(plan["manifest"]["buckets"]) <= 4
    assert len(plan["skipped"]) == 31
    got = sorted(
        r["id"]
        for r in mv.scan_versioned(
            spark, path, "val", lo=-10.0, hi=-1.0
        ).collect()
    )
    assert got == [3]
    # unbounded predicates never skip (nulls / full-scan semantics)
    plan2 = mv.prune_generations(path, "val")
    assert plan2["skipped"] == []


def test_point_lookup_loads_one_shard(spark, tmp_path):
    """_load_manifest_slice materializes only the covering shard —
    the O(1)-in-width point-lookup loader."""
    path = str(tmp_path / "pl")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=32, manifest_shard_size=4,
    )
    full = mv._load_manifest_full(path, 1)
    some_bucket = int(sorted(full["buckets"], key=int)[5])
    part = mv._load_manifest_slice(path, 1, [some_bucket])
    assert str(some_bucket) in part["buckets"]
    want = {i for i in map(int, full["buckets"]) if i // 4 == some_bucket // 4}
    assert set(map(int, part["buckets"])) == want
    # and the public lookup returns the same rows as on a full read
    r = mv.read_bucket_for_key_versioned(spark, path, 7)
    assert [x["id"] for x in r.collect()] == [7]


def test_vacuum_reclaims_unreferenced_shard_files(spark, tmp_path):
    """Displaced versions' shard files are storage like superseded
    generations: vacuum removes the ones no surviving root references
    (grace-aged), never one a retained version still needs."""
    path = str(tmp_path / "vac")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=16, manifest_shard_size=4,
    )
    for k in (1, 2, 3):
        upd = spark.createDataFrame(
            [(k, float(k), "u")], "id long, val double, tag string"
        )
        mv.merge_scoped_versioned(spark, path, upd, now=T0)
    before = set(glob.glob(f"{path}/{mv.MANIFEST_DIR}/ms-*.json"))
    keep_content = _content(spark, path)
    mv.vacuum_bucket_versions(path, keep=1)
    after = set(glob.glob(f"{path}/{mv.MANIFEST_DIR}/ms-*.json"))
    assert after < before  # something reclaimed
    # every shard the surviving root references is still present
    root = mv._load_root(path, mv.latest_version(path))
    for e in root["shards"].values():
        assert os.path.exists(f"{path}/{mv.MANIFEST_DIR}/{e['f']}")
    assert _content(spark, path) == keep_content
    # grace: a fresh orphan shard survives a graceful vacuum
    orphan = f"{path}/{mv.MANIFEST_DIR}/ms-orphan.json"
    with open(orphan, "w") as f:
        json.dump({"buckets": {}}, f)
    mv.vacuum_bucket_versions(path, keep=1, grace_seconds=3600)
    assert os.path.exists(orphan)
    mv.vacuum_bucket_versions(path, keep=1)
    assert not os.path.exists(orphan)


def test_auto_shard_threshold(spark, tmp_path):
    """Tables at or above AUTO_SHARD_MIN_BUCKETS shard by default;
    narrower tables stay monolithic unless opted in."""
    wide = str(tmp_path / "wide")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark, 400), key="id", now=T0),
        wide, key="id", n_buckets=mv.AUTO_SHARD_MIN_BUCKETS,
    )
    assert mv._load_root(wide, 1).get("format") == 2
    narrow = str(tmp_path / "narrow")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark, 50), key="id", now=T0),
        narrow, key="id", n_buckets=8,
    )
    assert mv._load_root(narrow, 1).get("format") != 2


def test_change_feed_and_diff_match_monolithic_twin(spark, tmp_path):
    """The O(changed) fast paths (root shard-ref diff in
    changed_buckets_between, slice loads in change_feed /
    read_changed_between) return exactly the monolithic twin's
    answers — including across a MOR delta commit and a DV delete,
    whose changes live in shard content, not the buckets map."""
    pm = str(tmp_path / "fm")
    ps = str(tmp_path / "fs")
    base = merge_upsert(None, _base(spark), key="id", now=T0)
    mv.write_bucket_table_versioned(base, pm, key="id", n_buckets=16)
    mv.write_bucket_table_versioned(
        base, ps, key="id", n_buckets=16, manifest_shard_size=4
    )
    upd = spark.createDataFrame(
        [(3, 99.0, "sX")], "id long, val double, tag string"
    )
    mo = spark.createDataFrame(
        [(5, 55.0, "sY")], "id long, val double, tag string"
    )
    dk = spark.createDataFrame([(7,)], "id long")
    for p in (pm, ps):
        mv.merge_scoped_versioned(spark, p, upd, now=T0)       # v2
        mv.merge_scoped_versioned_mor(spark, p, mo, now=T0)    # v3
        mv.merge_deletes_dv(spark, p, dk)                      # v4
    for lo, hi in [(1, 4), (1, 2), (2, 3), (3, 4)]:
        assert mv.changed_buckets_between(pm, lo, hi) == \
            mv.changed_buckets_between(ps, lo, hi), (lo, hi)
    for since in (1, 2, 3):
        fm = mv.change_feed(spark, pm, since)
        fs = mv.change_feed(spark, ps, since)
        rm = sorted(
            (r["id"], r["change"]) for r in fm.collect()
        ) if fm is not None else None
        rs = sorted(
            (r["id"], r["change"]) for r in fs.collect()
        ) if fs is not None else None
        assert rm == rs, since
        cm = mv.read_changed_between(spark, pm, since)
        cs = mv.read_changed_between(spark, ps, since)
        assert sorted(r["id"] for r in cm.collect()) == \
            sorted(r["id"] for r in cs.collect()), since
    # up-to-date consumer: no shard loads, no read, None
    v = mv.latest_version(ps)
    assert mv.change_feed(spark, ps, v) is None
    assert mv.changed_buckets_between(ps, v, v) == []


def test_multi_predicate_prune_on_partial_manifests(spark, tmp_path):
    """prune_generations_multi intersects per-column plans whose
    PARTIAL manifests may have loaded different shard sets; the
    composed scan must still be exact (≡ residual filters on the full
    read)."""
    path = str(tmp_path / "multi")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        path, key="id", n_buckets=32, manifest_shard_size=4,
    )
    one = spark.createDataFrame(
        [(3, -5.0, "z"), (9, -7.0, "z")],
        "id long, val double, tag string",
    )
    mv.merge_scoped_versioned(spark, path, one, now=T0)
    preds = [("val", -10.0, -1.0), ("id", 0, 5)]
    got = sorted(
        r["id"]
        for r in mv.scan_versioned_multi(spark, path, preds).collect()
    )
    assert got == [3]
    full = mv.read_bucket_table_versioned(spark, path)
    want = sorted(
        r["id"]
        for r in full.filter(
            (full.val >= -10.0) & (full.val <= -1.0)
            & (full.id >= 0) & (full.id <= 5)
        ).collect()
    )
    assert got == want


def test_shard_edges_empty_rebucket_and_rich_payload(spark, tmp_path):
    """Edge interleavings: (a) migrating an EMPTY init yields a
    zero-shard format-2 root and the first merge + bootstrap feed work;
    (b) rebucketing a sharded table rebuilds shards under the new
    layout (and the cross-layout feed stays content-neutral);
    (c) migrating a table carrying live MOR deltas AND DV refs keeps
    both in the shard payload — reads identical across the boundary."""
    # (a) empty init
    p1 = str(tmp_path / "t1")
    mv.init_bucket_table_versioned(p1, key="id", n_buckets=8)
    r = mv.shard_manifest_versioned(p1, shard_size=2)
    assert mv._load_root(p1, r["version"]).get("format") == 2
    assert r["shards"] == 0
    b = spark.createDataFrame([(1, "x")], "id long, v string")
    mv.merge_scoped_versioned(spark, p1, b, now=T0)
    feed = mv.change_feed(spark, p1, 1)
    assert sorted(x["change"] for x in feed.collect()) == ["insert"]

    # (b) rebucket a sharded table
    p2 = str(tmp_path / "t2")
    df = spark.range(0, 100).selectExpr("id", "cast(id as double) as val")
    mv.write_bucket_table_versioned(
        merge_upsert(None, df, key="id", now=T0),
        p2, key="id", n_buckets=16, manifest_shard_size=4,
    )
    mv.rebucket_versioned(spark, p2, 32)
    root = mv._load_root(p2, mv.latest_version(p2))
    assert root["n_buckets"] == 32 and root.get("format") == 2
    assert mv.read_bucket_table_versioned(spark, p2).count() == 100
    f2 = mv.change_feed(spark, p2, 1)
    assert f2 is None or f2.count() == 0  # rebucket is content-neutral
    assert [
        x["id"] for x in mv.read_bucket_for_key_versioned(
            spark, p2, 7
        ).collect()
    ] == [7]

    # (c) migrate with live deltas + DVs
    p3 = str(tmp_path / "t3")
    mv.write_bucket_table_versioned(
        merge_upsert(None, df, key="id", now=T0), p3, key="id",
        n_buckets=16,
    )
    mv.merge_scoped_versioned_mor(
        spark, p3,
        spark.createDataFrame([(5, 55.0)], "id long, val double"),
        now=T0,
    )
    mv.merge_deletes_dv(spark, p3, spark.createDataFrame([(7,)], "id long"))
    before = sorted(
        tuple(x) for x in mv.read_bucket_table_versioned(spark, p3)
        .select("id", "val").collect()
    )
    mv.shard_manifest_versioned(p3, shard_size=4)
    after = sorted(
        tuple(x) for x in mv.read_bucket_table_versioned(spark, p3)
        .select("id", "val").collect()
    )
    assert before == after and (5, 55.0) in after
    assert all(t[0] != 7 for t in after)
    full = mv._load_manifest_full(p3, mv.latest_version(p3))
    assert full.get("deltas") and full.get("dv")


def test_shard_cache_eviction_is_thread_safe(spark, tmp_path):
    """ADVICE r11 (low): two concurrent writer threads (a supported
    pattern — catalog OCC runs member actions on real threads) could
    race the FIFO eviction, both pick the same first key, and the
    second pop raised KeyError mid-commit. Hammer _load_shard from
    many threads with the cache capped at 1 so every load evicts; no
    thread may see an exception, and every payload must be correct."""
    import threading

    p = str(tmp_path / "cachetbl")
    mv.write_bucket_table_versioned(
        _base(spark), p, key="id", n_buckets=16, manifest_shard_size=2
    )
    root = mv._load_root(p, 1)
    fnames = [e["f"] for e in root["shards"].values()]
    assert len(fnames) >= 4

    old_cache, old_max = dict(mv._SHARD_CACHE), mv._SHARD_CACHE_MAX
    mv._SHARD_CACHE.clear()
    mv._SHARD_CACHE_MAX = 1
    errs: list[Exception] = []

    def hammer(seed: int) -> None:
        try:
            for i in range(300):
                f = fnames[(seed + i) % len(fnames)]
                sub = mv._load_shard(p, f)
                assert "buckets" in sub
        except Exception as e:  # pragma: no cover
            errs.append(e)

    try:
        threads = [
            threading.Thread(target=hammer, args=(s,)) for s in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        mv._SHARD_CACHE_MAX = old_max
        mv._SHARD_CACHE.clear()
        mv._SHARD_CACHE.update(old_cache)
    assert errs == []


# ------------------------------------------- round-12: root delta-chain
def _commit_burst(spark, p, n, start=300, tagcol="tag"):
    for j in range(n):
        up = spark.createDataFrame(
            [(start + j, float(j), "d")],
            f"id long, val double, {tagcol} string",
        )
        mv.merge_scoped_versioned(spark, p, up, now=T0)


def test_root_delta_chain_content_neutral_twin(spark, tmp_path):
    """Content-neutrality law for the root chain (VERDICT r11 item 1):
    a table whose roots are delta-encoded resolves, at EVERY version,
    to the same logical manifest and content as a twin forced to write
    full checkpoint roots each commit — across merge, MOR, DV-delete,
    alter and compact surfaces."""
    pf = str(tmp_path / "fullroots")
    pd_ = str(tmp_path / "deltaroots")
    base = merge_upsert(None, _base(spark), key="id", now=T0)
    mv.write_bucket_table_versioned(
        base, pf, key="id", n_buckets=16, manifest_shard_size=4,
        root_checkpoint_every=1,
    )
    mv.write_bucket_table_versioned(
        base, pd_, key="id", n_buckets=16, manifest_shard_size=4,
        root_checkpoint_every=8,
    )
    mo = spark.createDataFrame(
        [(5, 55.0, "sY"), (300, 2.0, "m")],
        "id long, val double, tag string",
    )
    dk = spark.createDataFrame([(7,), (300,)], "id long")
    steps = [
        lambda p: _commit_burst(spark, p, 6),
        lambda p: mv.merge_scoped_versioned_mor(spark, p, mo, now=T0),
        lambda p: mv.merge_deletes_dv(spark, p, dk),
        lambda p: mv.alter_bucket_table_versioned(p, rename={"tag": "label"}),
        lambda p: mv.compact_versioned(spark, p),
        lambda p: _commit_burst(spark, p, 4, start=400, tagcol="label"),
    ]
    for op in steps:
        op(pf)
        op(pd_)
    # the delta table must actually HAVE delta roots (else the law is
    # vacuous) and full roots exactly at the checkpoint cadence
    raws = {
        v: mv._load_root_raw(pd_, v)
        for v in range(1, mv.latest_version(pd_) + 1)
    }
    assert any("root_base" in r for r in raws.values())
    for v, r in raws.items():
        if v % 8 == 0:
            assert "root_base" not in r, f"v{v} must be a checkpoint"
        if "root_base" in r:
            assert r["root_base"] == v - 1
    assert all("root_base" not in mv._load_root_raw(pf, v)
               for v in range(1, mv.latest_version(pf) + 1))
    assert mv.latest_version(pf) == mv.latest_version(pd_)
    for v in range(1, mv.latest_version(pf) + 1):
        assert _norm_manifest_at(pf, v) == _norm_manifest_at(pd_, v), v
        assert _content(spark, pf, v) == _content(spark, pd_, v), v
    # a delta root is an order of magnitude smaller than a checkpoint
    dsz = [os.path.getsize(mv._manifest_path(pd_, v))
           for v, r in raws.items() if "root_base" in r]
    csz = [os.path.getsize(mv._manifest_path(pd_, v))
           for v, r in raws.items() if "root_base" not in r and v > 1]
    assert dsz and csz and max(dsz) < min(csz)


def _norm_manifest_at(path, v):
    full = mv._load_manifest_full(path, v)
    return {
        "n_buckets": full["n_buckets"],
        "bucket_ids": sorted(full["buckets"]),
        "delta_depths": {
            k: len(x) for k, x in (full.get("deltas") or {}).items()
        },
        "stats_rows": {
            k: x["rows"] for k, x in (full.get("stats") or {}).items()
        },
        "schema_cols": [
            f["name"] for f in (full.get("schema") or {"fields": []})["fields"]
        ],
    }


def test_vacuum_materializes_surviving_delta_roots(spark, tmp_path):
    """Vacuum reclaiming a delta root's chain base must first rewrite
    the survivor as a self-contained checkpoint — a PINNED delta
    version (the catalog contract) stays readable with identical
    content after every version under it is gone."""
    p = str(tmp_path / "vacchain")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        p, key="id", n_buckets=16, manifest_shard_size=4,
        root_checkpoint_every=100,  # no natural checkpoint in range
    )
    _commit_burst(spark, p, 10)
    pin_v = 7
    assert "root_base" in mv._load_root_raw(p, pin_v)
    want_root = mv._load_root(p, pin_v)
    want_rows = _content(spark, p, pin_v)
    out = mv.vacuum_bucket_versions(p, keep=2, pin={pin_v})
    removed = set(out["removed_versions"])
    assert pin_v not in removed and (pin_v - 1) in removed
    raw_after = mv._load_root_raw(p, pin_v)
    assert "root_base" not in raw_after and "shards" in raw_after
    assert mv._load_root(p, pin_v)["shards"] == want_root["shards"]
    assert _content(spark, p, pin_v) == want_rows
    # the newest surviving versions read fine too
    assert _content(spark, p) == _content(spark, p, mv.latest_version(p))


def test_change_feed_and_occ_across_delta_roots(spark, tmp_path):
    """changed_buckets_between and the shard slice-loaders operate on
    RESOLVED roots: a span whose endpoints are both delta roots (no
    checkpoint between) must yield exactly the buckets the commits in
    the span touched."""
    p = str(tmp_path / "feedchain")
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark), key="id", now=T0),
        p, key="id", n_buckets=16, manifest_shard_size=4,
        root_checkpoint_every=100,
    )
    v0 = mv.latest_version(p)
    _commit_burst(spark, p, 4, start=500)
    v1 = mv.latest_version(p)
    from cvemate_spark.operators.merge import bucket_of_value

    want = sorted({
        bucket_of_value(spark, 500 + j, 16) for j in range(4)
    })
    assert mv.changed_buckets_between(p, v0, v1) == want
