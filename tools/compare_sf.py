#!/usr/bin/env python3
"""Scale-linearity audit: compare two bench.py outputs at different
scale factors and flag super-linear queries.

Usage:
    python3 tools/compare_sf.py BASE.json BIG.json DATA_RATIO

BASE/BIG are files holding bench.py's JSON line (or the driver's
wrapped form with a "parsed" key). DATA_RATIO is the data-volume
ratio between them (e.g. 10 for sf0.1 -> sf1).

For each query: scale = t_big / t_base. Verdict per VERDICT.md round-2
item 1: PASS if scale <= 2 * DATA_RATIO (within 2x of linear
extrapolation). In practice most queries should come in well UNDER
DATA_RATIO on a fixed 32-thread box because per-query constant
overheads (job setup, planning, Python<->JVM round trips, small-stage
scheduling) dominate at sf0.1; a scale near or above DATA_RATIO means
the query is genuinely data-bound, and above 2*DATA_RATIO means some
part of the plan degrades with volume (spill, quadratic candidate
growth, broadcast demotion) and needs fixing before it meets 100 TB.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    if "parsed" in raw:
        raw = raw["parsed"]
    return raw


def main() -> int:
    base, big = _load(sys.argv[1]), _load(sys.argv[2])
    ratio = float(sys.argv[3])
    qb, qg = base["queries"], big["queries"]
    rows = []
    for name in qb:
        if name not in qg:
            continue
        scale = qg[name] / qb[name] if qb[name] > 0 else float("inf")
        rows.append((scale, name, qb[name], qg[name]))
    rows.sort(reverse=True)
    print(f"{'query':<20} {'t_base':>8} {'t_big':>8} {'scale':>7}  verdict")
    n_fail = 0
    for scale, name, tb, tg in rows:
        verdict = "PASS" if scale <= 2 * ratio else "SUPER-LINEAR"
        n_fail += verdict != "PASS"
        print(f"{name:<20} {tb:>8.3f} {tg:>8.3f} {scale:>6.2f}x  {verdict}")
    tot_b = sum(qb[n] for _, n, _, _ in rows)
    tot_g = sum(qg[n] for _, n, _, _ in rows)
    print(
        f"{'TOTAL':<20} {tot_b:>8.3f} {tot_g:>8.3f} "
        f"{tot_g / tot_b:>6.2f}x  (data ratio {ratio:g}, budget {2 * ratio:g}x)"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
