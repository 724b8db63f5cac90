#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01": sec, ...}, "queries_median": {...},
     "runs": N, "sf": "..."}

Each query is materialized through the noop sink (full execution, no
driver-side collect). The session mirrors the cluster design: AQE on,
shuffle partitions ~ cores.

Protocol: N full passes over the suite (default 5, override with
$SPARK_GRAFT_BENCH_N), reporting per-query MIN as the headline number
and median alongside. This container's wall clock swings ±20-30% on
zero guest load (BASELINE.md variance note), so a single reading is
noise; min-of-N is the stable estimator of the plan's true cost and
median shows the spread.

Noise self-defense (VERDICT r5 item 2 — the committed BENCH_r05 was
recorded on a loaded machine and read 43% above the same code's
reproducible number, with nothing in the artifact saying so): the
output now records the machine's loadavg and process count at start
and end, and the median/min divergence ratio. When median exceeds min
by more than the documented ±30% band, the harness AUTO-RETRIES up to
two extra passes (min-of-N absorbs transient load if it clears) and,
if the divergence persists, stamps "load_skewed": true into the
artifact itself — a reading that can testify against its own
recording conditions.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cvemate_spark.queries import REGISTRY
from cvemate_spark.session import get_spark

# Headline set: one per operator class (SURVEY §2).
HEADLINE = [
    "q01",   # scan + filter pushdown
    "q05",   # upsert-merge rewrite (full outer join)
    "q06",   # 3-way join + agg (TPC-H Q3 shape)
    "q07",   # broadcast star join
    "q10",   # range/theta self-join
    "q11",   # TPC-H Q1 aggregation
    "q13",   # distinct agg
    "q15",   # window keep-latest
    "q17",   # top-k
    "q19",   # scoring ladder
    "q24",   # text tokenize + top terms
    "q27",   # sessionization
    "e_asof",          # as-of join (union + window)
    # OP-MERGE fold + OP-SCORE (the CveMate core). This is the
    # scale-bearing parquet-derived pipeline that BASELINE.md and
    # BENCH_r01 measured under the name "cve_pipeline"; that name now
    # belongs to the 8-feed landing-file pipeline, whose inputs are
    # LIMIT-capped and therefore not a throughput story at any SF.
    "cve_pipeline_fold",
    "dedup_minhash",   # MinHash LSH pipeline
    "curate_pipeline", # composed curation pass (langid+quality+dedup)
    "dedup_exact",     # hash dedup
    "q26",             # cosine top-k
    "ann_lsh",         # hyperplane-LSH ANN
    # pair similarity search, both routes. `emb_neardup` is the
    # deliberate O(n²) brute-force control (annotated as such in
    # BASELINE.md); it stays in the suite because the bench contract
    # forbids removing a recorded entry. `emb_neardup_semdedup` is the
    # ADDED angular-bound-pruned EXACT route (SemDeDup cells +
    # spherical-triangle-inequality cell-pair pruning) — the
    # scale-safe plan for the same question (VERDICT r12 item 4).
    "emb_neardup",
    "emb_neardup_semdedup",
    "mm_meta",         # Arrow mapInPandas plumbing
    "s1_tumbling",     # structured streaming tumbling agg
    "s3_merge_replay", # foreachBatch keyed MERGE
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", cpus=cpus)

    # warm the JVM fully (codegen, shuffle, parquet reader) with one
    # untimed representative query, then a trivial file-listing action
    REGISTRY.specs["q11"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def load_context() -> dict:
        la1, la5, la15 = os.getloadavg()
        nproc = sum(1 for p in os.listdir("/proc") if p.isdigit())
        return {"loadavg_1m": round(la1, 2), "loadavg_5m": round(la5, 2),
                "nproc": nproc}

    def run_pass(samples: dict[str, list[float]]) -> None:
        for name in HEADLINE:
            spec = REGISTRY.specs[name]
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
            # operators cache intermediates (e.g. shingle relations);
            # drop them so later queries aren't measured under memory
            # pressure
            spark.catalog.clearCache()
            # Spark's ContextCleaner only reclaims shuffle files /
            # broadcast blocks when the driver GCs, and
            # periodicGC.interval defaults to 30 min — far longer than
            # this suite. Without this, freed blocks pile up and the
            # last third of the suite runs 2-3x slower (measured: tail
            # queries 7-9 s vs 3 s). The forced GC sits outside the
            # timed window, so it costs the metric nothing.
            spark.sparkContext._jvm.System.gc()

    ctx_start = load_context()
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "5")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(n_runs):
        run_pass(samples)

    # the documented noise band: median > 1.3x min across the suite
    # means passes ran under materially different machine conditions
    BAND = 1.30
    MAX_EXTRA = 2

    def divergence() -> float:
        tot_min = sum(min(ts) for ts in samples.values())
        tot_med = sum(statistics.median(ts) for ts in samples.values())
        return tot_med / max(tot_min, 1e-9)

    extra_passes = 0
    while divergence() > BAND and extra_passes < MAX_EXTRA:
        extra_passes += 1
        run_pass(samples)  # min-of-N absorbs transient load if it clears

    best = {name: round(min(ts), 3) for name, ts in samples.items()}
    median = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    total = round(sum(best.values()), 3)
    div = round(divergence(), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall clock (min of runs)",
                "value": total,
                "unit": "sec",
                "queries": best,
                "queries_median": median,
                "runs": n_runs + extra_passes,
                "extra_passes_on_divergence": extra_passes,
                "median_over_min": div,
                "load_skewed": div > BAND,
                "load_start": ctx_start,
                "load_end": load_context(),
                "sf": sf_dir,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
