#!/usr/bin/env python3
"""Assemble BENCH_sf1.json (the committed scale-stress artifact) from
two bench.py output lines: the sf1 run and the same-code sf0.1 basis.

Usage:
    python3 tools/mk_bench_sf1.py SF1.json SF01.json [OUT.json]

Per-query scale = t_sf1 / t_sf01 (min-of-runs), data ratio 10.
Budget (VERDICT round-2 item 1): PASS if every query <= 2x linear.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    sf1 = json.load(open(sys.argv[1]))
    sf01 = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
    ratio = 10
    scales = {
        q: round(sf1["queries"][q] / sf01["queries"][q], 2)
        for q in sf1["queries"]
        if q in sf01["queries"]
    }
    ordered = dict(sorted(scales.items(), key=lambda kv: -kv[1]))
    worst = next(iter(ordered.items()))
    doc = {
        "metric": "scale-stress: headline suite at sf1 (10x sf0.1) vs same-code sf0.1 basis",
        "protocol": f"min of {sf1.get('runs', '?')} full passes each, quiet machine, local[32]",
        "data_ratio": ratio,
        "budget": "PASS if per-query scale <= 2x linear (20x)",
        "suite_total_sec": {"sf0.1": sf01["value"], "sf1": sf1["value"]},
        "suite_scale": round(sf1["value"] / sf01["value"], 2),
        "worst_query_scale": list(worst),
        "per_query_scale": ordered,
        "sf1": sf1,
        "sf01_basis": sf01,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    bad = {q: s for q, s in scales.items() if s > 2 * ratio}
    print(f"suite scale {doc['suite_scale']}x, worst {worst[0]} {worst[1]}x, "
          f"{'FAIL: ' + str(bad) if bad else 'all within budget'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
