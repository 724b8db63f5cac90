"""Cross-table transactional snapshots over versioned bucket tables.

Single-table commits are atomic (`merge_versioned`: one manifest + one
pointer replace), but a pipeline updating orders AND its line items
needs consistency ACROSS tables — a reader joining them mid-update must
never see table A post-batch and table B pre-batch. Per-table logs
(the Delta/Iceberg shape) cannot give this; catalog-level commits
(the Nessie shape) can. The reference hits the same problem one layer
down: its per-collection bulk writes leave `cve` updated while
`cve_kev` still lags until the next handler runs (mongodb_handler.py
bulk_write per collection, no cross-collection transaction).

Layout under `path/`:
    _CATLOCK          flock: transactions serialize
    _LATEST           committed catalog version (pointer FILE)
    c-<n>.json        immutable catalog manifest:
                      {table name -> {path, version}}

A transaction commits its member tables FIRST (each its own atomic
versioned commit), then publishes ONE catalog manifest pinning the new
table versions and replaces the catalog pointer. Readers resolve every
table through a single catalog manifest: a consistent cross-table
snapshot, time-travelable as a unit. A crash after some member commits
but before the catalog publish leaves catalog readers on the old
snapshot — the member tables may carry newer committed versions, but
no catalog reader ever sees a MIX (the versions are simply never
referenced; their generations age out via each table's vacuum).

Vacuum contract: a member table's `vacuum_bucket_versions(keep=N)`
must keep at least as many versions as surviving catalog manifests
reference — the catalog pins versions by NUMBER, it cannot stop a
table-level vacuum from reclaiming them (same contract as external
readers pinning a version). `catalog_referenced_versions` lists what
must survive, for vacuum policies to respect.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .merge_versioned import latest_version, read_bucket_table_versioned


def _cat_manifest(path: str, v: int) -> str:
    return os.path.join(path, f"c-{v}.json")


def _cat_versions(path: str) -> list[int]:
    out = []
    for d in os.listdir(path):
        if d.startswith("c-") and d.endswith(".json") and d[2:-5].isdigit():
            out.append(int(d[2:-5]))
    return sorted(out)


def catalog_latest(path: str) -> int:
    with open(os.path.join(path, "_LATEST")) as f:
        return int(f.read().strip())


def _cat_load(path: str, v: int) -> dict:
    with open(_cat_manifest(path, v)) as f:
        return json.load(f)


def _cat_commit(path: str, v: int, tables: dict) -> None:
    # PHANTOM sweep (mirrors merge_versioned._commit): a transaction
    # that died between its c-N manifest write and the pointer replace
    # left c-N on disk; once our pointer advances past N that manifest
    # would become readable "committed" catalog history pinning a
    # never-published snapshot (catalog_read accepts any v <= the
    # pointer). Callers hold _CATLOCK, and a LIVE transaction writes
    # its manifest and advances the pointer inside that same lock — so
    # any manifest beyond the current pointer seen here belongs to a
    # dead one: purge it before publishing.
    latest_file = os.path.join(path, "_LATEST")
    current = -1
    if os.path.exists(latest_file):
        with open(latest_file) as f:
            current = int(f.read().strip() or -1)
    for ph in _cat_versions(path):
        if ph > current and ph != v:
            os.unlink(_cat_manifest(path, ph))
    tmp = os.path.join(path, f".c-tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"v": v, "tables": tables}, f, indent=0, sort_keys=True)
    os.replace(tmp, _cat_manifest(path, v))
    tmp2 = os.path.join(path, f"_LATEST.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp2, "w") as f:
        f.write(str(v))
    os.replace(tmp2, os.path.join(path, "_LATEST"))
    # supersession markers: vacuum's grace clock must run on time-
    # since-DISPLACED, not manifest creation time (manifests are
    # immutable, so mtime == creation — a snapshot that served reads
    # for an hour would otherwise be reclaimable the instant a new
    # version commits, mid-read)
    for old in _cat_versions(path):
        if old < v:
            marker = os.path.join(path, f"c-{old}.superseded")
            if not os.path.exists(marker):
                with open(marker, "w") as mf:
                    mf.write(str(v))


def catalog_init(path: str) -> int:
    """Create an empty catalog: c-1 with no tables, pointer at 1.
    Ensure-exists on an EXISTING catalog: re-running init must not
    overwrite committed manifests or roll the pointer back — the
    current version is returned untouched."""
    import fcntl

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_CATLOCK"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if os.path.exists(os.path.join(path, "_LATEST")):
                return catalog_latest(path)
            _cat_commit(path, 1, {})
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
    return 1


def catalog_txn(
    spark: SparkSession,
    path: str,
    members: dict[str, str],
    actions: dict | None = None,
) -> dict:
    """One transaction: run each table's `action` (a callable
    `(spark, table_path) -> None` performing that table's own atomic
    commit — a merge, a rebucket, an initial load), then publish ONE
    catalog version pinning every member's now-current table version.

    `members` maps table name -> table path; names absent from
    `actions` are carried into the new catalog version at their
    current committed version (read-only members of the snapshot).
    Transactions serialize on `_CATLOCK`. A crash inside any action,
    or between the member commits and the catalog publish, leaves the
    catalog pointer untouched: catalog readers stay on the previous
    joint snapshot (the member versions already committed become
    unreferenced-by-catalog history).

    Pinning: an action that RETURNS the version it committed — an int,
    or a dict carrying "version" (merge_scoped_versioned,
    rebucket_versioned and write_bucket_table_versioned all do) — gets
    pinned at exactly that version. `latest_version` is the fallback
    for read-only members and version-silent actions only: pinning
    "whatever is latest after the action ran" would let a concurrent
    OUT-OF-BAND merge landing between the action and the pin be
    published as part of this transaction's snapshot (catalog
    transactions serialize against each other on _CATLOCK, but not
    against direct table-level mergers).

    Returns {catalog_version, tables: {name: version}}.
    """
    import fcntl

    lock = open(os.path.join(path, "_CATLOCK"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    try:
        acted: dict[str, int] = {}
        for name, fn in (actions or {}).items():
            if name not in members:
                raise KeyError(f"action for unregistered table {name!r}")
            res = fn(spark, members[name])
            if isinstance(res, bool):
                continue  # a True/False status is not a version
            if isinstance(res, int):
                acted[name] = res
            elif isinstance(res, dict) and isinstance(
                res.get("version"), int
            ):
                acted[name] = res["version"]
        pinned = {
            name: {
                "path": tpath,
                "version": acted.get(name, latest_version(tpath)),
            }
            for name, tpath in members.items()
        }
        # next version off the COMMITTED pointer, not max(manifests):
        # phantom manifests of dead transactions are not history (they
        # are swept inside _cat_commit) and must not open numbering
        # gaps in the readable catalog timeline
        v = catalog_latest(path) + 1
        _cat_commit(path, v, pinned)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()
    return {
        "catalog_version": v,
        "tables": {n: p["version"] for n, p in pinned.items()},
    }


def catalog_read(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> DataFrame:
    """Read one table AT the catalog snapshot: the catalog manifest
    (latest, or a pinned catalog `version` — joint time travel) names
    the exact table version. Two reads under the same catalog version
    are mutually consistent by construction."""
    committed = catalog_latest(path)
    v = committed if version is None else version
    if v > committed:
        raise ValueError(
            f"catalog version {v} of {path} is not committed "
            f"(latest={committed})"
        )
    m = _cat_load(path, v)
    entry = m["tables"].get(name)
    if entry is None:
        raise KeyError(
            f"table {name!r} is not in catalog version {v} of {path}"
        )
    return read_bucket_table_versioned(
        spark, entry["path"], version=entry["version"]
    )


def vacuum_catalog(
    path: str, keep: int = 2, grace_seconds: float = 0.0
) -> dict:
    """Drop catalog manifests older than the newest `keep` (never the
    committed one, never inside their post-SUPERSESSION grace window —
    the clock runs on time-since-displaced via the `.superseded`
    marker, the same retention contract as the table vacuum: a
    snapshot that served reads for an hour is not reclaimable the
    instant a newer one commits). Under `_CATLOCK` so no transaction
    interleaves."""
    import fcntl
    import time

    removed: list[int] = []
    with open(os.path.join(path, "_CATLOCK"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            committed = catalog_latest(path)
            versions = _cat_versions(path)
            now = time.time()
            for v in versions[:-keep] if keep else versions:
                if v == committed:
                    continue
                marker = os.path.join(path, f"c-{v}.superseded")
                if not os.path.exists(marker):
                    continue  # never displaced -> not provably dead
                if now - os.path.getmtime(marker) < grace_seconds:
                    continue
                os.unlink(_cat_manifest(path, v))
                os.unlink(marker)
                removed.append(v)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
    return {"removed_versions": removed}


def vacuum_catalog_members(
    path: str, keep: int = 2, grace_seconds: float = 0.0
) -> dict:
    """The retention contract AS CODE: vacuum every member table while
    PINNING the table versions any surviving catalog manifest still
    references — joint time travel over the retained catalog history
    survives member vacuums by construction, not by operator
    discipline. Run `vacuum_catalog` first to shrink the catalog
    horizon, then this to reclaim member storage behind it."""
    from .merge_versioned import vacuum_bucket_versions

    referenced = catalog_referenced_versions(path)
    out: dict[str, dict] = {}
    for tpath, pins in referenced.items():
        out[tpath] = vacuum_bucket_versions(
            tpath, keep=keep, grace_seconds=grace_seconds, pin=pins
        )
    return out


def catalog_referenced_versions(path: str) -> dict[str, set[int]]:
    """Every (table path -> table versions) any surviving catalog
    manifest still references — the set a member-table vacuum must
    keep alive (the documented vacuum contract)."""
    out: dict[str, set[int]] = {}
    for v in _cat_versions(path):
        for entry in _cat_load(path, v)["tables"].values():
            out.setdefault(entry["path"], set()).add(entry["version"])
    return out
