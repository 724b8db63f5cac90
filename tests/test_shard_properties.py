"""No-Spark property suite for the sharded-manifest machinery
(tests/test_skip_properties.py's sibling): the shard split must
round-trip EXACTLY (losing a bucket's entry is silent data loss at
read time), shard reuse must be byte-stable, and the root rollup must
be SOUND — a rollup that excludes a range implies every generation in
the shard excludes it individually (a wrong shard skip is silent data
loss; reading too much is merely slow).

Runs in milliseconds per example: pure JSON/dict arithmetic, no Spark.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings, strategies as st

from cvemate_spark.operators.merge_versioned import (
    _assemble_shards,
    _shard_rollup,
    _stat_excludes,
    _write_manifest_shards,
)

# --- generators -------------------------------------------------------
num_stat = st.builds(
    lambda lo, hi, n: {"t": "num", "lo": min(lo, hi), "hi": max(lo, hi),
                       "n": n},
    st.integers(-1000, 1000), st.integers(-1000, 1000),
    st.integers(0, 5),
)
null_stat = st.just({"t": "null", "n": 3})
col_stat = st.one_of(num_stat, null_stat)

gen_stats = st.builds(
    lambda rows, nbytes, cols: {
        "rows": rows, "bytes": nbytes, "files": 1, "cols": cols,
    },
    st.integers(0, 500), st.integers(0, 10000),
    st.dictionaries(st.sampled_from(["a", "b", "c"]), col_stat,
                    max_size=3),
)


@st.composite
def manifest_payload(draw):
    n_buckets = draw(st.sampled_from([8, 16, 64]))
    ids = draw(st.lists(
        st.integers(0, n_buckets - 1), unique=True, min_size=0,
        max_size=min(n_buckets, 12),
    ))
    buckets = {str(i): f"g-{i:04x}" for i in ids}
    stats = {
        i: draw(gen_stats)
        for i in buckets
        if draw(st.booleans())
    }
    deltas = {
        i: [{"g": f"g-d{j}", "stats": draw(gen_stats)}
            for j in range(draw(st.integers(1, 2)))]
        for i in buckets
        if draw(st.booleans())
    }
    dv = {
        i: [{"n": "dv-1", "d": 0}]
        for i in buckets
        if draw(st.booleans())
    }
    shard_size = draw(st.sampled_from([2, 4, 8]))
    return n_buckets, shard_size, buckets, stats, dv, deltas


# --- laws -------------------------------------------------------------
@settings(max_examples=150, deadline=None)
@given(manifest_payload())
def test_shard_split_round_trips_exactly(tmp_path_factory, payload):
    n_buckets, shard_size, buckets, stats, dv, deltas = payload
    path = str(tmp_path_factory.mktemp("shards"))
    shards = _write_manifest_shards(
        path, buckets, stats, dv, deltas, n_buckets, shard_size,
        base_full=None, changed=None,
    )
    root = {
        "v": 1, "n_buckets": n_buckets, "format": 2,
        "shard_size": shard_size, "shards": shards,
    }
    full = _assemble_shards(path, root, None)
    assert full["buckets"] == buckets
    assert (full.get("stats") or {}) == stats
    assert (full.get("dv") or {}) == dv
    assert (full.get("deltas") or {}) == deltas
    # ids in the root cover exactly the manifest buckets (explicit
    # list or dense range encoding)
    from cvemate_spark.operators.merge_versioned import _entry_ids

    listed = sorted(
        i for e in shards.values() for i in _entry_ids(e)
    )
    assert listed == sorted(int(i) for i in buckets)
    # slice load: every bucket resolves through its own shard alone
    for i in buckets:
        part = _assemble_shards(
            path, root, {str(int(i) // shard_size)}
        )
        assert part["buckets"][i] == buckets[i]


@settings(max_examples=150, deadline=None)
@given(manifest_payload(), st.integers(-1200, 1200),
       st.integers(-1200, 1200))
def test_shard_rollup_exclusion_is_sound(tmp_path_factory, payload, x, y):
    """If the rollup excludes [lo, hi], EVERY generation's own stats
    exclude it — the wrong-skip-is-data-loss invariant at shard
    grain."""
    n_buckets, shard_size, buckets, stats, dv, deltas = payload
    lo, hi = min(x, y), max(x, y)
    by_shard: dict[int, list[str]] = {}
    for i in buckets:
        by_shard.setdefault(int(i) // shard_size, []).append(i)
    for ids in by_shard.values():
        sub = {
            "buckets": {i: buckets[i] for i in ids},
            "stats": {i: stats[i] for i in ids if i in stats},
            "deltas": {i: deltas[i] for i in ids if i in deltas},
        }
        roll = _shard_rollup(sub)
        for c, entry in roll.items():
            if not _stat_excludes(entry, lo, hi):
                continue
            for i in ids:
                gens = [stats.get(i)] + [
                    d["stats"] for d in deltas.get(i, [])
                ]
                for g in gens:
                    s = (g or {}).get("cols", {}).get(c)
                    assert _stat_excludes(s, lo, hi), (
                        f"shard rollup excluded ({lo},{hi}) on {c!r} "
                        f"but bucket {i}'s generation would match"
                    )


@settings(max_examples=60, deadline=None)
@given(manifest_payload())
def test_unchanged_shards_reuse_the_same_file(tmp_path_factory, payload):
    """Re-splitting identical content with a base reference writes
    ZERO new shard files and returns byte-identical entries — the
    commit-bytes-∝-batch mechanism."""
    n_buckets, shard_size, buckets, stats, dv, deltas = payload
    path = str(tmp_path_factory.mktemp("reuse"))
    shards1 = _write_manifest_shards(
        path, buckets, stats, dv, deltas, n_buckets, shard_size,
        base_full=None, changed=None,
    )
    base_full = {
        "_root": {
            "format": 2, "shard_size": shard_size,
            "n_buckets": n_buckets, "shards": shards1,
        }
    }
    before = set(os.listdir(os.path.join(path, "_manifest"))) if shards1 else set()
    shards2 = _write_manifest_shards(
        path, buckets, stats, dv, deltas, n_buckets, shard_size,
        base_full=base_full, changed=set(),
    )
    after = set(os.listdir(os.path.join(path, "_manifest"))) if shards1 else set()
    assert shards2 == shards1
    assert after == before  # not one new file
    # and content-addressing alone (no base ref) also converges on the
    # same files — a rebuilt-identical shard hashes to the existing one
    shards3 = _write_manifest_shards(
        path, buckets, stats, dv, deltas, n_buckets, shard_size,
        base_full=None, changed=None,
    )
    assert {e["f"] for e in shards3.values()} == {
        e["f"] for e in shards1.values()
    }


def test_rollup_handles_mixed_and_missing_stats():
    """Directed edges: a bucket with no stats kills the whole rollup;
    a column absent from one generation is absent from the rollup;
    mixed tags drop the column; all-null rolls to {'t': 'null'}."""
    g_num = {"rows": 1, "bytes": 1, "files": 1,
             "cols": {"a": {"t": "num", "lo": 0, "hi": 5, "n": 0}}}
    g_str = {"rows": 1, "bytes": 1, "files": 1,
             "cols": {"a": {"t": "str", "lo": "a", "hi": "b", "n": 0}}}
    g_null = {"rows": 1, "bytes": 1, "files": 1,
              "cols": {"a": {"t": "null", "n": 4}}}
    # missing stats on bucket "2" -> no rollup at all
    assert _shard_rollup({
        "buckets": {"1": "g", "2": "g"}, "stats": {"1": g_num},
    }) == {}
    # mixed tags -> column dropped
    assert _shard_rollup({
        "buckets": {"1": "g", "2": "g"},
        "stats": {"1": g_num, "2": g_str},
    }) == {}
    # null is neutral against bounds
    roll = _shard_rollup({
        "buckets": {"1": "g", "2": "g"},
        "stats": {"1": g_num, "2": g_null},
    })
    assert roll == {"a": {"t": "num", "lo": 0, "hi": 5}}
    # all-null -> a null rollup (bounded predicates skip the shard)
    roll = _shard_rollup({
        "buckets": {"1": "g"}, "stats": {"1": g_null},
    })
    assert roll == {"a": {"t": "null"}}
    assert _stat_excludes(roll["a"], 1, 2)
    # a delta generation missing stats also kills the rollup
    assert _shard_rollup({
        "buckets": {"1": "g"}, "stats": {"1": g_num},
        "deltas": {"1": [{"g": "g-d", "stats": None}]},
    }) == {}


def test_shard_files_are_canonical_json():
    """Shard content is serialized sort_keys + compact — the hash is a
    function of CONTENT, never dict order (two writers materializing
    the same logical shard must converge on one file)."""
    path = "/tmp/shard_canon_test"
    os.makedirs(f"{path}/_manifest", exist_ok=True)
    for f in os.listdir(f"{path}/_manifest"):
        os.unlink(f"{path}/_manifest/{f}")
    b1 = {"1": "g-a", "2": "g-b"}
    b2 = {"2": "g-b", "1": "g-a"}  # same content, different order
    s1 = _write_manifest_shards(path, b1, {}, {}, {}, 8, 4, None, None)
    s2 = _write_manifest_shards(path, b2, {}, {}, {}, 8, 4, None, None)
    assert s1 == s2
    files = os.listdir(f"{path}/_manifest")
    assert len(files) == 1
    blob = open(f"{path}/_manifest/{files[0]}").read()
    assert blob == json.dumps(json.loads(blob), sort_keys=True,
                              separators=(",", ":"))
