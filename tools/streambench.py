#!/usr/bin/env python3
"""Streaming state-store benchmark: the same stateful streaming jobs on
the default (HDFS-backed, in-JVM-heap) state store provider vs RocksDB
(state on local disk, bounded executor memory — the provider a 100 TB
deployment runs, because keyed state grows with key cardinality and
must not live on the heap).

Run: python3 tools/streambench.py            # sf dir from $SPARK_GRAFT_SF_DIR
Prints ONE JSON line:
    {"metric": "stream-state-suite", "providers": {"hdfs": {...},
     "rocksdb": {...}}, "rows_per_sec": {...}, "input_rows": N,
     "sf": "..."}

Every job drains the full events table through availableNow, so
throughput is input_rows / elapsed — the number a capacity plan needs
(events/sec a single 32-thread node sustains per stateful shape).
Not part of bench.py's headline suite (BASELINE.md's totals predate it
and stay comparable); results are recorded in STREAMBENCH.json and
discussed in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvemate_spark.queries import REGISTRY
from cvemate_spark.session import get_spark

# the stateful jobs: windowed agg, foreachBatch MERGE replay, session
# windows, arbitrary state, state-store dedup, stream-stream join —
# plus (round 5, VERDICT r4 item 6) the OUTER stream-stream join,
# whose null-emission leg needs the trailing no-data micro-batch the
# inner-only s7 tuning disables, so its cost delta vs s7 is the
# recorded price of that tuning's inner-only scope; and s10_tws (the
# Spark 4 stateful-processor API through the protobuf bridge — it
# forces RocksDB internally, so its hdfs-row measures the same
# provider; kept for the throughput row)
STREAM_SET = [
    "s1_tumbling", "s3_merge_replay", "s4_session", "s5_stateful",
    "s6_dedup", "s7_join", "s9_outer_join", "s10_tws",
]

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in STREAM_SET:
        t0 = time.time()
        # streaming jobs materialize through a memory sink internally;
        # the builder blocks until the stream drains
        REGISTRY.specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # see bench.py rationale
    return timings


def dir_bytes(path: str) -> int:
    total = 0
    for r, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def recovery_curve(root, sf_dir: str) -> list[dict]:
    """S11 kill-and-resume at scaled STATE CARDINALITY, both providers
    (VERDICT r5 item 5): phase-1 drain (first half + checkpoint),
    phase-2 restart (resume state + second half minus one row), and
    phase-3 restart with ONE fresh row — the isolated recovery lag
    (offset-log replay + state restore + a single minimal commit; a
    zero-input restart would never schedule a batch, so state would
    never load), the number a 100-TB operator's failover budget needs.
    State size scales via the aggregation key ``event_id % K``;
    checkpoint state bytes are measured on disk."""
    import shutil

    from cvemate_spark.streaming import jobs

    rows = []
    for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
        for n_keys in (100, 10_000, 100_000):
            s = root.newSession()
            s.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            workdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".scratch",
                f"recbench_{label}_{n_keys}",
            )
            shutil.rmtree(workdir, ignore_errors=True)  # cold-start timing
            timings: list[dict] = []
            out = jobs.checkpoint_resume_counts(
                s,
                sf_dir,
                workdir=workdir,
                key_expr=f"event_id % {n_keys}",
                collect_timings=timings,
                extra_restart=True,
            )
            n_state_rows = out.count()
            state_bytes = dir_bytes(os.path.join(workdir, "checkpoint", "state"))
            row = {
                "provider": label,
                "keys_mod": n_keys,
                "state_rows": n_state_rows,
                "state_bytes": state_bytes,
                "phase1_drain_s": timings[0]["seconds"],
                "phase2_resume_s": timings[1]["seconds"],
                "phase3_recovery_lag_s": timings[2]["seconds"],
            }
            rows.append(row)
            print(row)
            shutil.rmtree(workdir, ignore_errors=True)
    return rows


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    root = get_spark("streambench", cpus=cpus)
    # warm untimed
    REGISTRY.specs["s1_tumbling"].builder(root, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    input_rows = root.read.parquet(f"{sf_dir}/events.parquet").count()

    out: dict[str, dict[str, float]] = {}
    for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
        s = root.newSession()
        s.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        timings = run_suite(s, sf_dir)
        timings["total"] = round(sum(timings.values()), 3)
        out[label] = timings

    # throughput on the default provider: every job drains the whole
    # events table, so events/sec = input_rows / elapsed
    rows_per_sec = {
        name: round(input_rows / out["hdfs"][name], 1)
        for name in STREAM_SET
        if out["hdfs"].get(name)
    }

    recovery = recovery_curve(root, sf_dir)

    print(
        json.dumps(
            {"metric": "stream-state-suite", "unit": "sec", "providers": out,
             "rows_per_sec": rows_per_sec, "input_rows": input_rows,
             "recovery_curve": recovery, "sf": sf_dir}
        )
    )
    root.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
