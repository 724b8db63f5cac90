#!/usr/bin/env python3
"""STATSBENCH: measured scaling of the stats_ops monitoring family
(drift / KMV sketch / weighted sampling / RRF fusion / streaming
drift) across one data decade — sf0.1 vs sf1 (10x rows).

Protocol: one warm SparkSession per scale, min of N full passes per
query (count() action), load context recorded. Budget: per-query
scale <= 2x linear (<= 20x at 10x data); the drift/KMV/sampling ops
should sit FAR below it (bounded post-scan work).

Usage: python3 tools/statsbench.py [runs] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "t_drift_ks", "t_drift_psi", "e_kmv_intersect",
    "t_sample_weighted", "retr_rrf", "s13_drift",
    "e_quantile_2pass", "e_quantile_grouped", "t_sample_stratified",
    "s15_cms", "s16_quantile", "e_cohort_retention", "e_path_transitions",
    "e_anomaly_volume", "e_ab_test",
]
SCALES = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scratch/sf1"}

# Second decade (gen_sf.py sf10: 500k docs / 200k vectors / 10M
# events — events added round 8 per VERDICT r7 item 5). Invoked
# as `statsbench.py sf10 [runs]` -> STATSBENCH_sf10.json.
# retr_rrf_ivf appears in the TIMING list only: its Spark side uses
# the Arrow-GEMM cell assignment (feasible at 200k x 4000), but the
# DuckDB ORACLE is the full fold crossJoin (800M cosine evals at
# sf10) — hash evidence for it tops out at sf1; sf10 dense serving
# from the persisted index is measured in IVFBENCH.json.
QUERIES_SF10 = [
    "t_drift_ks", "t_drift_psi", "e_kmv_intersect", "e_kmv_matrix",
    "t_sample_weighted", "retr_rrf", "retr_rrf_ivf", "curate_mix",
    "emb_drift", "e_quantile_grouped", "t_sample_stratified",
    # events-bound behavioral analytics + the sketch-state pair whose
    # decade evidence previously stopped at sf1 (10M events at sf10;
    # e_quantile_2pass stays at decade 1 — it reads lineitem, which
    # sf10 does not ship)
    "e_cohort_retention", "e_path_transitions", "e_anomaly_volume",
    "e_ab_test", "s13_drift", "s14_kmv",
]
SCALES_SF10 = {"sf1": "/root/repo/.scratch/sf1", "sf10": "/root/repo/.scratch/sf10"}


def bench_scale(spark, sf_dir: str, runs: int, queries=None) -> dict[str, float]:
    from cvemate_spark.queries import REGISTRY

    out: dict[str, float] = {}
    for name in queries or QUERIES:
        spec = REGISTRY.specs[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            spec.builder(spark, sf_dir).count()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def bench_kmv_sketch_only(spark, sf_dir: str, runs: int) -> float:
    """The PRODUCTION kmv path: sketch + estimate WITHOUT the exact
    distinct-count ride-along the gated query carries for
    self-validation (the exact legs are full distinct shuffles and
    dominate e_kmv_intersect's wall time by design)."""
    from pyspark.sql import functions as F

    from cvemate_spark.functions.text import spark_str_hash
    from cvemate_spark.operators.kmv import bottom_k, union_intersect_estimate
    from cvemate_spark.queries.stats_ops import KMV_K
    from cvemate_spark.tables import load_table

    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        docs = load_table(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        tri = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
        arr = F.when(F.size(toks) >= 3, tri).otherwise(
            F.array().cast("array<string>")
        )
        sh = docs.select((F.col("doc_id") % 2).alias("side"), F.explode(arr).alias("s"))
        dist = sh.select("side", F.expr(spark_str_hash("s")).alias("h")).distinct()
        sk_a = bottom_k(dist.filter(F.col("side") == 0), KMV_K)
        sk_b = bottom_k(dist.filter(F.col("side") == 1), KMV_K)
        union_intersect_estimate(sk_a, sk_b, KMV_K).count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    second_decade = "sf10" in args
    args = [a for a in args if a != "sf10"]
    runs = int(args[0]) if args else 3
    default_out = "STATSBENCH_sf10.json" if second_decade else "STATSBENCH.json"
    out_path = args[1] if len(args) > 1 else default_out
    queries = QUERIES_SF10 if second_decade else QUERIES
    scale_dirs = SCALES_SF10 if second_decade else SCALES
    lo, hi = (("sf1", "sf10") if second_decade else ("sf0.1", "sf1"))
    from cvemate_spark.session import get_spark

    spark = get_spark()
    results = {
        label: bench_scale(spark, d, runs, queries)
        for label, d in scale_dirs.items()
    }
    for label, d in scale_dirs.items():
        results[label]["kmv_sketch_only"] = bench_kmv_sketch_only(spark, d, runs)
    scales = {
        q: round(results[hi][q] / results[lo][q], 2)
        for q in queries + ["kmv_sketch_only"]
    }
    doc = {
        "metric": f"stats_ops monitoring family across one data decade ({lo} -> {hi})",
        "protocol": f"min of {runs} passes per query, warm session, local[32]",
        "data_ratio": 10,
        "budget": "PASS if per-query scale <= 2x linear (20x)",
        "loadavg_1m": os.getloadavg()[0],
        "sec": results,
        "per_query_scale": dict(sorted(scales.items(), key=lambda kv: -kv[1])),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    bad = {q: s for q, s in scales.items() if s > 20}
    print(json.dumps(doc["per_query_scale"]))
    print("FAIL: " + str(bad) if bad else "all within budget")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
