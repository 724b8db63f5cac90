"""Laws for PACKED base generations (merge_versioned._write_generations
packed=True): a full-width write lands one flat `_packed/pg-*/` dir
(one file per bucket) so a full scan hands Spark O(1) root paths
instead of O(table width), with scoped rewrites excluded from the
packed portion by a pushed-down bucket filter. The master law is the
packed ≡ classic twin: identical logical content at every version
across every write surface."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row

from cvemate_spark.operators import merge_versioned as mv
from cvemate_spark.operators.merge import bucket_of_value, merge_upsert

T0 = "2024-01-01 00:00:00"


def _base(spark, n=300):
    return spark.range(0, n).selectExpr(
        "id",
        "cast(id * 2.0 as double) as val",
        "concat('s', id % 7) as tag",
    )


def _content(spark, path, version=None):
    df = mv.read_bucket_table_versioned(spark, path, version=version)
    cols = [c for c in df.columns if c not in ("created_at", "updated_at")]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk_twins(spark, tmp_path, **kw):
    pc = str(tmp_path / "classic")
    pp = str(tmp_path / "packed")
    base = merge_upsert(None, _base(spark), key="id", now=T0)
    mv.write_bucket_table_versioned(
        base, pc, key="id", n_buckets=16, packed_base=False, **kw
    )
    mv.write_bucket_table_versioned(
        base, pp, key="id", n_buckets=16, packed_base=True, **kw
    )
    return pc, pp


def test_packed_classic_twin_all_surfaces(spark, tmp_path):
    """Packed and classic twins commit the same logical content at
    every version across merge / MOR / DV-delete / alter / compact /
    rebucket — and the packed twin actually HAS packed entries."""
    pc, pp = _mk_twins(spark, tmp_path)
    m1 = mv._load_manifest_full(pp, 1)["buckets"]
    assert all(g.startswith("@") for g in m1.values())
    # tiny buckets coalesce into range files (the small-table guard
    # against the O(width) per-file read floor); coverage of the
    # pack's files is exactly the committed buckets
    files = glob.glob(f"{pp}/_packed/pg-*/*.parquet")
    assert 1 <= len(files) < len(m1)
    cov = sorted(
        i for f in files for i in mv._pack_file_coverage(f)
    )
    assert cov == sorted(range(16))
    assert not glob.glob(f"{pp}/bucket=*")

    upd = spark.createDataFrame(
        [(3, 99.0, "sX"), (350, 1.0, "new")],
        "id long, val double, tag string",
    )
    mo = spark.createDataFrame(
        [(5, 55.0, "sY"), (400, 2.0, "m")],
        "id long, val double, tag string",
    )
    dk = spark.createDataFrame([(7,), (400,)], "id long")
    steps = [
        ("merge", lambda p: mv.merge_scoped_versioned(spark, p, upd, now=T0)),
        ("mor", lambda p: mv.merge_scoped_versioned_mor(spark, p, mo, now=T0)),
        ("delete-dv", lambda p: mv.merge_deletes_dv(spark, p, dk)),
        ("alter", lambda p: mv.alter_bucket_table_versioned(
            p, rename={"tag": "label"}
        )),
        ("compact", lambda p: mv.compact_versioned(spark, p)),
        ("rebucket", lambda p: mv.rebucket_versioned(spark, p, 8)),
    ]
    for name, op in steps:
        op(pc)
        op(pp)
        assert _content(spark, pc) == _content(spark, pp), name
    for v in range(1, mv.latest_version(pc) + 1):
        assert _content(spark, pc, v) == _content(spark, pp, v), v


def test_packed_scan_passes_one_root_plus_rewrites(spark, tmp_path):
    """The design point: after K scoped rewrites of a packed table,
    the snapshot read plans over (pack dirs + K classic dirs), not
    O(width) paths — asserted structurally via _plan_base_paths."""
    _, pp = _mk_twins(spark, tmp_path)
    for j in range(3):
        upd = spark.createDataFrame(
            [(j, float(j), "z")], "id long, val double, tag string"
        )
        mv.merge_scoped_versioned(spark, pp, upd, now=T0)
    full = mv._load_manifest_full(pp, mv.latest_version(pp))
    ids = sorted(full["buckets"])
    classic, packed, excl = mv._plan_base_paths(pp, full, ids)
    rewritten = {bucket_of_value(spark, j, 16) for j in range(3)}
    assert len(classic) == len(rewritten)
    assert packed == [f"{pp}/_packed/" + mv._pack_name_of(
        next(g for g in full["buckets"].values() if g.startswith("@"))
    )]
    assert sorted(excl) == sorted(rewritten)
    # and the content is right: rewritten rows once, from classic
    rows = {r[0]: r[1] for r in _content(spark, pp)}
    assert rows[0] == 0.0 and rows[1] == 1.0 and rows[2] == 2.0
    assert len(rows) == 300


def test_packed_point_lookup_reads_single_file(spark, tmp_path):
    # strict one-file-per-bucket layout (the production shape: every
    # bucket file >= PACK_TARGET_BYTES) via the explicit knob
    _, pp = _mk_twins(spark, tmp_path, pack_target_bytes=0)
    df = mv.read_bucket_for_key_versioned(spark, pp, 42)
    got = [r for r in df.collect() if r["id"] == 42]
    assert len(got) == 1 and got[0]["val"] == 84.0
    # a pruned slice resolves to per-bucket FILE paths, no filter
    full = mv._load_manifest_full(pp, mv.latest_version(pp))
    bid = bucket_of_value(spark, 42, 16)
    classic, packed, excl = mv._plan_base_paths(pp, full, [str(bid)])
    assert classic == [] and excl == []
    assert packed == [
        f"{pp}/_packed/{full['buckets'][str(bid)][1:]}"
    ]
    assert packed[0].endswith(f"b{bid}.parquet")


def test_packed_vacuum_reclaims_superseded_files(spark, tmp_path):
    """A packed file superseded by a scoped rewrite is reclaimable at
    FILE grain once no surviving manifest references it; the pack dir
    itself survives while any live file remains."""
    _, pp = _mk_twins(spark, tmp_path, pack_target_bytes=0)
    n_files0 = len(glob.glob(f"{pp}/_packed/pg-*/b*.parquet"))
    upd = spark.createDataFrame(
        [(42, 0.5, "v")], "id long, val double, tag string"
    )
    mv.merge_scoped_versioned(spark, pp, upd, now=T0)
    before = _content(spark, pp)
    out = mv.vacuum_bucket_versions(pp, keep=1)
    bid = bucket_of_value(spark, 42, 16)
    gone = [g for g in out["removed_gens"] if g.endswith(f"b{bid}.parquet")]
    assert len(gone) == 1
    assert len(glob.glob(f"{pp}/_packed/pg-*/b*.parquet")) == n_files0 - 1
    assert _content(spark, pp) == before
    # full displacement: a reload supersedes the whole pack
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark, 50), key="id", now=T0),
        pp, key="id", n_buckets=16,
    )
    mv.vacuum_bucket_versions(pp, keep=1)
    packs = glob.glob(f"{pp}/_packed/pg-*")
    assert len(packs) == 1  # only the reload's pack survives
    assert len(_content(spark, pp)) == 50


def test_packed_heavy_supersession_falls_back_to_files(spark, tmp_path):
    """When most of a pack is superseded, the dir+filter read would
    scan mostly-dead bytes — the planner decays to per-file paths for
    the minority of live buckets (and compact re-packs)."""
    _, pp = _mk_twins(spark, tmp_path)
    # rewrite keys covering > half the buckets
    upd = spark.createDataFrame(
        [(j, -1.0, "w") for j in range(120)],
        "id long, val double, tag string",
    )
    mv.merge_scoped_versioned(spark, pp, upd, now=T0)
    full = mv._load_manifest_full(pp, mv.latest_version(pp))
    live_packed = [g for g in full["buckets"].values()
                   if g.startswith("@")]
    if live_packed and len(live_packed) * 2 < 16:
        classic, packed, excl = mv._plan_base_paths(
            pp, full, sorted(full["buckets"])
        )
        assert excl == []
        assert all(p.endswith(".parquet") for p in packed)
    rows = {r[0]: r[1] for r in _content(spark, pp)}
    assert all(rows[j] == -1.0 for j in range(120))
    assert len(rows) == 300
    # compact over every bucket re-packs into a fresh single pack
    res = mv.compact_versioned(
        spark, pp, buckets=sorted(int(i) for i in full["buckets"])
    )
    full2 = mv._load_manifest_full(pp, res["version"])
    assert all(g.startswith("@") for g in full2["buckets"].values())
    pgs = {mv._pack_name_of(g) for g in full2["buckets"].values()}
    assert len(pgs) == 1
    rows2 = {r[0]: r[1] for r in _content(spark, pp)}
    assert rows2 == rows


def test_packed_occ_concurrent_writers_compose(spark, tmp_path):
    """OCC conflict detection is entry-string equality — packed
    entries participate identically: two writers on disjoint buckets
    of a packed table both land."""
    import threading

    _, pp = _mk_twins(spark, tmp_path)
    barrier = threading.Barrier(2)
    errs = []

    def writer(vals):
        try:
            batch = spark.createDataFrame(
                [(v, 1000.0 + v, "occ") for v in vals],
                "id long, val double, tag string",
            )
            mv.merge_scoped_versioned_occ(
                spark, pp, batch, now=T0, pre_commit_hook=barrier.wait,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=([11],)),
          threading.Thread(target=writer, args=([13],))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    rows = {r[0]: r[1] for r in _content(spark, pp)}
    assert rows[11] == 1011.0 and rows[13] == 1013.0


def test_packed_stats_pruned_scan_exact_and_dv_aware(spark, tmp_path):
    """scan_versioned_multi on a PACKED table: packed manifest entries
    resolve to `_packed/pg-*/b<i>.parquet` files whose paths carry no
    `bucket=` segment, so the plan (not path parsing) must supply the
    bucket ids — and those ids must be the right ones, or deletion
    vectors are applied to the wrong buckets. Laws: pruned scan ==
    classic twin == unpruned read, before and after a DV delete, and
    prune_files.read_buckets is exactly the bucket set behind the
    read paths."""
    pc, pp = _mk_twins(spark, tmp_path, pack_target_bytes=0)
    # a scoped rewrite so the packed table is mixed pack + classic
    upd = spark.createDataFrame(
        [(3, 999.0, "sX")], "id long, val double, tag string"
    )
    mv.merge_scoped_versioned(spark, pc, upd, now=T0)
    mv.merge_scoped_versioned(spark, pp, upd, now=T0)

    preds = [("val", 100.0, 400.0)]
    plan = mv.prune_files(pp, preds)
    assert any("/_packed/" in d for d in plan["read"])
    assert len(plan["read_buckets"]) == len(plan["read"])
    # read_buckets must mirror the read paths exactly (packed file
    # basenames are b<i>.parquet; classic dirs carry bucket=<i>)
    derived = set()
    for d in plan["read"]:
        if "/_packed/" in d:
            derived.add(d.rsplit("/", 1)[1][1:].split(".")[0])
        else:
            derived.add(d.split("/")[-2].split("=")[1])
    assert sorted(derived) == plan["read_buckets"]

    def got(path):
        return sorted(
            (r["id"], r["val"])
            for r in mv.scan_versioned_multi(spark, path, preds).collect()
        )

    want = sorted(
        (i, i * 2.0) for i in range(300)
        if i != 3 and 100.0 <= i * 2.0 <= 400.0
    )
    assert got(pp) == want
    assert got(pc) == want

    # DV delete: ids must route to the right packed buckets, or the
    # anti-join silently resurrects/over-deletes
    dk = spark.createDataFrame([(60,), (75,), (90,)], "id long")
    mv.merge_deletes_dv(spark, pc, dk)
    mv.merge_deletes_dv(spark, pp, dk)
    want2 = [t for t in want if t[0] not in (60, 75, 90)]
    assert got(pp) == want2
    assert got(pc) == want2


def test_pack_decay_law_and_auto_repack(spark, tmp_path):
    """Pack-decay economics (VERDICT r12 item 5): scoped merges drift
    buckets out of the pack and plan_paths grows 1:1 with drifted
    buckets; repack_if_decayed is a no-op below REPACK_THRESHOLD,
    and crossing it folds everything back into ONE pack — plan_paths
    back to 1, content-neutral — so full-scan path counts stay
    O(packs + threshold*width) over any history."""
    pc, pp = _mk_twins(spark, tmp_path)
    d0 = mv.pack_decay(pp)
    assert d0["classic_buckets"] == 0
    assert d0["plan_paths"] == 1 and d0["packs"] == 1
    r0 = mv.repack_if_decayed(spark, pp)
    assert r0["repacked"] is False
    assert mv.latest_version(pp) == 1  # no-op committed nothing
    # a classic-layout table is never touched
    rc = mv.repack_if_decayed(spark, pc)
    assert rc["repacked"] is False

    # drift one key at a time until the threshold trips
    before = _content(spark, pp)
    k = 0
    while mv.pack_decay(pp)["decayed_frac"] < mv.REPACK_THRESHOLD:
        upd = spark.createDataFrame(
            [(k, -2.0, "d")], "id long, val double, tag string"
        )
        mv.merge_scoped_versioned(spark, pp, upd, now=T0)
        d = mv.pack_decay(pp)
        # path growth is exactly 1 pack root + drifted classic dirs
        assert d["plan_paths"] == 1 + d["classic_buckets"]
        k += 1
    drifted = mv.pack_decay(pp)["classic_buckets"]
    assert drifted >= mv.REPACK_THRESHOLD * 16

    r1 = mv.repack_if_decayed(spark, pp)
    assert r1["repacked"] is True
    assert r1["buckets_compacted"] == 16
    assert r1["classic_buckets"] == 0 and r1["decayed_frac"] == 0.0
    assert r1["plan_paths"] == 1 and r1["packs"] == 1
    # content-neutral: the repack commit changed no logical rows
    after = {t[0]: t for t in _content(spark, pp)}
    want = {t[0]: t for t in before}
    for kk in range(k):
        want[kk] = (kk, -2.0, "d")
    assert after == want


def test_coalesced_pack_pruned_scan_exact_and_dv_aware(spark, tmp_path):
    """The range-file twin of the stats-pruned scan law: on a
    DEFAULT-coalesced pack (tiny buckets -> r<lo>-<hi> files) the
    pruned scan must dedupe shared files, exclude stale sibling rows
    (classic-superseded buckets), route deletion vectors by the
    plan's bucket ids, and still equal the classic twin exactly."""
    pc, pp = _mk_twins(spark, tmp_path)
    upd = spark.createDataFrame(
        [(3, 999.0, "sX")], "id long, val double, tag string"
    )
    mv.merge_scoped_versioned(spark, pc, upd, now=T0)
    mv.merge_scoped_versioned(spark, pp, upd, now=T0)

    preds = [("val", 100.0, 400.0)]
    plan = mv.prune_files(pp, preds)
    assert plan["packed_paths"], "range files must be in the plan"
    # shared range files are read once; every surviving packed bucket
    # still appears in read_buckets
    assert len(plan["read"]) < len(plan["read_buckets"])
    # the classic-superseded bucket's stale rows are excluded
    b3 = bucket_of_value(spark, 3, 16)
    assert b3 in plan["packed_excl"]

    def got(path):
        return sorted(
            (r["id"], r["val"])
            for r in mv.scan_versioned_multi(spark, path, preds).collect()
        )

    want = sorted(
        (i, i * 2.0) for i in range(300)
        if i != 3 and 100.0 <= i * 2.0 <= 400.0
    )
    assert got(pp) == want == got(pc)

    dk = spark.createDataFrame([(60,), (75,), (90,)], "id long")
    mv.merge_deletes_dv(spark, pc, dk)
    mv.merge_deletes_dv(spark, pp, dk)
    want2 = [t for t in want if t[0] not in (60, 75, 90)]
    assert got(pp) == want2 == got(pc)


def test_pack_groups_economics():
    """_pack_groups pure-function laws: files >= target stand alone as
    b<i>; small files coalesce into contiguous disjoint ranges under
    the byte budget; every bucket lands in exactly one file."""
    sizes = {0: 10, 1: 10, 2: 500, 3: 10, 4: 10, 5: 10, 7: 10}
    groups = mv._pack_groups(
        {i: f"f{i}" for i in sizes}, sizes, target=25
    )
    names = [n for _ids, n in groups]
    assert "b2.parquet" in names  # >= target stands alone
    covered = [i for ids, _n in groups for i in ids]
    assert sorted(covered) == sorted(sizes)  # exactly once each
    for ids, n in groups:
        if len(ids) > 1:
            assert n == f"r{ids[0]}-{ids[-1]}.parquet"
            assert ids == list(range(ids[0], ids[-1] + 1)) or all(
                a < b for a, b in zip(ids, ids[1:])
            )
            assert sum(sizes[i] for i in ids) <= 25
    # coverages of range files are disjoint
    covs = [
        set(mv._pack_file_coverage(n))
        for _ids, n in groups
    ]
    for a in range(len(covs)):
        for b in range(a + 1, len(covs)):
            assert not (covs[a] & covs[b])


def test_vacuum_keeps_referenced_range_files(spark, tmp_path):
    """Regression (round-13 manifestbench crash): a pack holding only
    COALESCED range files is not 'empty' — vacuum must keep referenced
    r-files and the birth record, and still reclaim a range file once
    every bucket it covers has moved on."""
    _, pp = _mk_twins(spark, tmp_path)
    before = _content(spark, pp)
    upd = spark.createDataFrame(
        [(9, -9.0, "v")], "id long, val double, tag string"
    )
    mv.merge_scoped_versioned(spark, pp, upd, now=T0)
    mv.vacuum_bucket_versions(pp, keep=1)
    # the coalesced pack survives: referenced range files + _PACK.json
    rfiles = glob.glob(f"{pp}/_packed/pg-*/r*.parquet")
    assert rfiles, "referenced range files must survive vacuum"
    assert glob.glob(f"{pp}/_packed/pg-*/_PACK.json")
    got = {r[0]: r[1] for r in _content(spark, pp)}
    assert got[9] == -9.0 and len(got) == 300
    # full displacement: a reload supersedes every covered bucket ->
    # the old pack (range files included) is reclaimable
    mv.write_bucket_table_versioned(
        merge_upsert(None, _base(spark, 50), key="id", now=T0),
        pp, key="id", n_buckets=16,
    )
    mv.vacuum_bucket_versions(pp, keep=1)
    packs = glob.glob(f"{pp}/_packed/pg-*")
    assert len(packs) == 1  # only the reload's pack survives
    assert len(_content(spark, pp)) == 50
