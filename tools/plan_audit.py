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
  P3  every `BroadcastNestedLoopJoin`'s BUILD side must be BOUNDED by
      construction (VERDICT r8 item 5): the broadcast subtree reduces
      to a limit, a scalar aggregate, a small Range spine, or
      driver-materialized rows (LocalTableScan/RDD — the collected
      centroid/query sets) before any file scan. A BNLJ broadcasting
      an unbounded relation is a deferred cartesian: it "works" at
      test SF and OOMs the build side at 100 TB. Checked by walking
      the JVM physical plan (not the text), subqueries included.
      Sides bounded by DOMAIN rather than structure (key-equality
      query vectors, fixed bin/sketch grids) carry explicit per-query
      allowance pins in P3_DOMAIN_BOUNDED — exceeding a pin, or any
      unpinned query growing one, is the violation.

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


# ---------------------------------------------------------------- P3
# Boundedness of a BNLJ build side, decided on the JVM plan tree.
_BOUNDED_LEAVES = {
    "LocalTableScanExec",   # driver-materialized rows (collected k-
    "RDDScanExec",          #  centroids / query batches / literals)
    "EmptyRelationExec",
    "OneRowRelationExec",
}
_LIMIT_NODES = {
    "GlobalLimitExec", "LocalLimitExec",
    "TakeOrderedAndProjectExec", "CollectLimitExec",
}
_RANGE_SPINE_MAX = 1_000_000  # a generator spine, not a data relation


def _simple_name(node) -> str:
    return node.getClass().getSimpleName()


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _subtree_bounded(node) -> bool:
    """True iff the subtree's row count is bounded by construction —
    it reduces to a limit / scalar aggregate / small Range / driver
    rows before any file scan is reached."""
    name = _simple_name(node)
    if name in _BOUNDED_LEAVES:
        return True
    if name in _LIMIT_NODES:
        return True
    if name == "ReusedExchangeExec":
        # a reused exchange is only as bounded as what it reuses: its
        # first appearance may have been audited under BHJ rules (any
        # size), so "already audited" does NOT imply P3-bounded —
        # resolve the referenced subtree and judge it; unresolvable
        # means NOT bounded, never assumed
        try:
            return _subtree_bounded(node.child())
        except Exception:
            return False
    if name == "RangeExec":
        return int(str(node.numElements())) <= _RANGE_SPINE_MAX
    if "Aggregate" in name:
        try:
            if node.groupingExpressions().size() == 0:
                return True  # scalar aggregate: exactly one row
        except Exception:
            pass  # grouped (or unreadable): bounded iff input bounded
    kids = _children(node)
    if not kids:
        return False  # unrecognized leaf (file scan, stream source, ...)
    return all(_subtree_bounded(k) for k in kids)


def _iter_plans(node):
    """The node and every subquery plan hanging off it (scalar/IN
    subqueries carry their own physical trees)."""
    yield node
    try:
        subs = node.subqueries()
        for i in range(subs.size()):
            yield from _iter_plans(subs.apply(i))
    except Exception:
        pass


def _collect_bnljs(node, out):
    if _simple_name(node) == "AdaptiveSparkPlanExec":
        node = node.initialPlan()
    for plan in _iter_plans(node):
        if _simple_name(plan) == "BroadcastNestedLoopJoinExec":
            out.append(plan)
        for k in _children(plan):
            _collect_bnljs(k, out)


def unbounded_bnlj_count(df) -> int:
    """Number of BroadcastNestedLoopJoins in df's physical plan whose
    BUILD side is NOT bounded by STRUCTURE (limit / scalar aggregate /
    small Range / driver rows). Queries in P3_DOMAIN_BOUNDED carry a
    pinned allowance for sides bounded by domain instead."""
    plan = df._jdf.queryExecution().executedPlan()
    bnljs: list = []
    _collect_bnljs(plan, bnljs)
    bad = 0
    for j in bnljs:
        build_right = "BuildRight" in str(j.buildSide())
        left, right = _children(j)
        build = right if build_right else left
        if not _subtree_bounded(build):
            bad += 1
    return bad


# P3 allowance pins: BNLJ build sides bounded by DOMAIN rather than
# plan structure — the walk cannot see that a key-equality/modulus
# filter selects O(1)/O(k) rows or that a grouped aggregate's key is a
# fixed bin/day grid, so each known case is pinned here WITH its
# justification and exact count. A query growing MORE structurally-
# unbounded BNLJs than its pin (or any new query growing one) trips
# P3 — the allowance never grows silently.
P3_DOMAIN_BOUNDED: dict[str, tuple[int, str]] = {
    # single query vector / bounded query batch: equality or dense-
    # range filter on the unique vec_id key (1 or n_queries rows)
    "q26": (1, "build = the vec_id=0 query vector (unique-key equality)"),
    "emb_drift": (1, "build = vec_id key-range query batch"),
    "retr_rrf": (1, "build = the vec_id=0 query vector"),
    "retr_rrf_ivf": (2, "build = query vector (x2 legs: bm25 + ivf)"),
    # deterministic IVF fixtures: centroid set = vec_id % 50 (the
    # documented k-centroid stand-in; the trained path's centroids are
    # k-means driver rows) + the query-vector side
    "ann_ivf": (3, "build = %50 stand-in centroids (k-bounded) + query vec"),
    # fold-based SemDeDup (the oracle-expressible twin): the %50
    # stand-in centroid relation broadcasts into the assignment
    # crossJoin once per pair leg (a/b). k-bounded at deployment
    # (kmeans_fit driver rows); the GEMM twin emb_semdedup_gemm ships
    # centroids as a LocalTableScan and carries no BNLJ at all.
    # Surfaced in round 13 when per-query cache isolation removed the
    # accidental lineage-substitution masking (see main loop note).
    "emb_semdedup": (2, "build = %50 stand-in centroids x2 (a/b pair legs)"),
    "ann_ivf_batch": (2, "build = stand-in centroids + bounded query batch"),
    "ann_ivf_trained": (2, "build = bounded query batch (x2 serve legs); "
                           "trained centroids are LocalTableScan"),
    # grouped aggregates over FIXED grids: k sketch rows, quantile
    # boundaries (|ps| rows), DRIFT_NBINS-bin histograms
    "e_kmv_matrix": (2, "build = k-row KMV sketch per side (k fixed)"),
    "e_quantile_2pass": (1, "build = |ps| quantile boundary rows"),
    "e_quantile_grouped": (1, "build = |groups|x|ps| boundary rows "
                              "(o_orderstatus: 3-value domain)"),
    "s13_drift": (1, "build = DRIFT_NBINS-bin reference histogram"),
}


def audit_one(spark, spec, sf_dir: str, name: str = "") -> dict:
    t0 = time.time()
    try:
        df = spec.builder(spark, sf_dir)
        plan = explain_string(df)
    except Exception:
        return {"error": traceback.format_exc(limit=3), "sec": round(time.time() - t0, 1)}
    counts = {k: len(re.findall(p, plan)) for k, p in NODE_PATTERNS.items()}
    try:
        structural = unbounded_bnlj_count(df) if counts["bnl_joins"] else 0
    except Exception:
        structural = -1  # a tree-walk failure must surface, not pass
    allowed, why = P3_DOMAIN_BOUNDED.get(name, (0, ""))
    counts["bnlj_domain_pinned"] = allowed
    # the violation count: structurally-unbounded builds BEYOND the
    # pinned domain-bounded allowance (walk failure counts as one)
    counts["unbounded_bnlj"] = (
        1 if structural < 0 else max(structural - allowed, 0)
    )
    counts["sec"] = round(time.time() - t0, 1)
    violations = []
    if counts["batch_eval_python"]:
        violations.append("P1: BatchEvalPython (row-at-a-time Python) in plan")
    if counts["cartesian"]:
        violations.append("P2: CartesianProduct in plan")
    if counts["unbounded_bnlj"]:
        violations.append(
            "P3: BroadcastNestedLoopJoin with an UNBOUNDED build side "
            f"(structural={structural}, pinned_allowance={allowed})"
        )
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
        # audit each query's STANDALONE plan. Without this, a persist()
        # inside an earlier builder leaks into later audits through
        # CacheManager lineage substitution — the round-13 incident:
        # emb_neardup_semdedup's persisted fold-assignment subtree got
        # substituted into emb_semdedup's plan, hiding its real
        # crossJoin until an unrelated change (the GEMM assignment
        # switch) broke the lineage match and the violation surfaced.
        spark.catalog.clearCache()
        res = audit_one(spark, REGISTRY.specs[name], sf_dir, name=name)
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
        "unbounded_bnlj": sum(
            r.get("unbounded_bnlj", 0) for r in out.values()
        ),
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
