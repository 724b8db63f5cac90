#!/usr/bin/env python3
"""Skew-robustness benchmark: the headline join/agg shapes on uniform
vs zipf-skewed data, plus a forced shuffle-join probe that verifies
AQE's runtime skew-split actually engages and bounds task imbalance.

Inputs: /root/testdata/sf0.1 (uniform) and .scratch/skew0.1 (generated
by tools/gen_sf.py: orders.o_custkey / events.user_id remapped
log-uniformly — a handful of hot keys carry a large share of rows,
the shape that breaks naive shuffle placement at 100 TB).

Two measurements:

1. SUITE — registry join/agg queries that group or join on the skewed
   keys, timed on both directories (min of N runs). A healthy engine
   shows skewed/uniform ≈ 1: algebraic aggs are immune via map-side
   combine, joins via AQE splitting. A ratio >> 1 flags a shape that
   would stall a 1000-executor stage on one straggler task.

2. PROBE — per-key-stats enrichment join (events ⨝ per-user totals on
   user_id) with broadcast disabled, so the hot key MUST flow through
   a shuffle join. Run with AQE skew-join on vs off; record wall time,
   whether the final adaptive plan shows the skew split, and the
   max/median task-runtime ratio of the join stage from the UI REST
   API. Skew thresholds are scaled to sf0.1 volumes
   (skewedPartitionThresholdInBytes 64 KB vs the 256 MB production
   default) — same trigger arithmetic, small data; the point is to
   prove the MECHANISM engages on this engine's plans, so the
   256 MB-scale behavior at 100 TB is config, not hope.

Prints ONE JSON line; recorded in SKEWBENCH.json, discussed in
SCALE.md. Not part of bench.py's headline suite (BASELINE.md totals
stay comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cvemate_spark.queries import REGISTRY  # noqa: E402
from cvemate_spark.session import get_spark  # noqa: E402
from cvemate_spark.tables import load_table  # noqa: E402

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
# the layout-matched control, NOT the driver's single-file sf0.1: both
# dirs carry the same tables in the same 32-file layout, so the
# skewed/uniform ratio isolates key distribution as the only variable
UNIFORM = os.path.join(_SCRATCH, "ctrl0.1")
SKEWED = os.path.join(_SCRATCH, "skew0.1")

# join/agg shapes keyed on the remapped columns (o_custkey, user_id);
# round 8 adds the user-keyed behavioral analytics: e_path_transitions
# carries THE skew-sensitive shape (a per-user ordering window — one
# hot user serializes into one task), e_cohort_retention a user-keyed
# distinct+join, e_ab_test a map-combinable user agg (the control)
SUITE = [
    "q06", "q07", "q13", "q27", "e_pivot", "e_funnel", "e_salted",
    "e_path_transitions", "e_cohort_retention", "e_ab_test",
]
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))


def _run(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        REGISTRY.specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # see bench.py rationale
    return round(best, 3)


# ---------------------------------------------------------------- REST
def _stages(spark) -> dict[int, dict]:
    """Completed stages with task-runtime quantiles from the UI API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = (
        f"{base}/api/v1/applications/{app}/stages?status=complete"
        "&withSummaries=true&quantiles=0.5,1.0"
    )
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            data = json.load(r)
    except Exception:
        return {}
    return {s["stageId"]: s for s in data}


def _task_imbalance(stages: dict[int, dict], new_ids: set[int]) -> float | None:
    """max/median task runtime over the heaviest new shuffle stage."""
    worst = None
    for sid in new_ids:
        s = stages.get(sid)
        if not s or s.get("numCompleteTasks", 0) < 2:
            continue
        dist = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        if not dist or len(dist) < 2 or dist[0] <= 0:
            continue
        ratio = dist[-1] / dist[0]  # quantiles asked: [0.5, 1.0]
        if worst is None or s["executorRunTime"] > worst[0]:
            worst = (s["executorRunTime"], ratio)
    return round(worst[1], 2) if worst else None


def _probe(spark, split_on: bool) -> dict:
    """Forced shuffle join on the hot key, AQE skew split on/off.

    Three conditions are required for OptimizeSkewedJoin to engage,
    each verified the hard way while building this probe:

    1. Both SMJ children must be PLAIN shuffle stages (optionally under
       Sort) — an aggregate between shuffle and join breaks the rule's
       pattern match, so the per-user dim is MATERIALIZED to parquet
       first rather than computed inline.
    2. The skewed reduce partition can only be split at MAPPER
       granularity, so the fact side must have many input files
       (gen_sf.py writes the skewed facts as 32 files — the cluster
       shape, where a fact table is thousands of row-groups). A
       single-file local table has one mapper and is structurally
       unsplittable: the rule logs "number of skewed partitions: 0"
       regardless of thresholds.
    3. Partition-size thresholds compare against COMPRESSED shuffle
       bytes; a join pruned to an 8-byte key column compresses below
       any sane threshold, so the probe carries an incompressible
       sha2 payload (a stand-in for real fact-row width). Thresholds
       here are 16 KB vs the 256 MB production default — same trigger
       arithmetic, sf0.1-sized bytes.
    """
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": str(split_on).lower(),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        # partition coalescing would re-merge the split partitions
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }.items():
        spark.conf.set(k, v)
    try:
        dim_path = os.path.join(SKEWED, "_probe_user_dim.parquet")
        ev = load_table(spark, SKEWED, "events").select(
            "user_id",
            F.sha2(F.col("event_id").cast("string"), 256).alias("payload"),
        )
        if not os.path.exists(os.path.join(dim_path, "_SUCCESS")):
            load_table(spark, SKEWED, "events").groupBy("user_id").agg(
                F.sum(F.col("value").cast("double")).alias("user_total")
            ).write.mode("overwrite").parquet(dim_path)
        per_user = spark.read.parquet(dim_path)
        joined = ev.join(per_user, "user_id").groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("payload_bytes"),
            F.sum("user_total").alias("chk"),
        )
        before = set(_stages(spark))
        t0 = time.time()
        rows = joined.collect()
        elapsed = round(time.time() - t0, 3)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        after = _stages(spark)
        return {
            "sec": elapsed,
            "rows_joined": int(rows[0]["n"]),
            "skew_split_in_plan": "skew=true" in plan,
            "task_max_over_median": _task_imbalance(
                after, set(after) - before
            ),
        }
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        ):
            spark.conf.unset(k)


def main() -> int:
    if not (os.path.isdir(SKEWED) and os.path.isdir(UNIFORM)):
        print(f"missing {SKEWED} or {UNIFORM}; run tools/gen_sf.py skew",
              file=sys.stderr)
        return 1
    spark = get_spark(
        "skewbench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.enabled": "true"},  # REST task metrics
    )
    # warm untimed
    REGISTRY.specs["q06"].builder(spark, UNIFORM).write.format("noop").mode(
        "overwrite"
    ).save()

    suite: dict[str, dict[str, float]] = {"uniform": {}, "skewed": {}}
    for name in SUITE:
        suite["uniform"][name] = _run(spark, name, UNIFORM)
        suite["skewed"][name] = _run(spark, name, SKEWED)
    ratio = {
        n: round(suite["skewed"][n] / suite["uniform"][n], 2) for n in SUITE
    }

    probe = {
        "split_on": _probe(spark, split_on=True),
        "split_off": _probe(spark, split_on=False),
    }

    print(
        json.dumps(
            {
                "metric": "skew-robustness",
                "unit": "sec",
                "runs": N_RUNS,
                "suite": suite,
                "skew_over_uniform": ratio,
                "probe": probe,
                "uniform_dir": UNIFORM,
                "skewed_dir": SKEWED,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
