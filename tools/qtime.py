#!/usr/bin/env python3
"""Warm per-query timer: qtime.py <query> [runs] [sf_dir].

Times ONE registered query through the noop sink, `runs` warm passes
after one untimed warmup, printing each pass and the min/median.
Measurement-only tool (guide §1.4): isolates a builder from the suite
so an A/B of a single operator change is not confounded by the other
22 headline queries.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvemate_spark.queries import REGISTRY
from cvemate_spark.session import get_spark


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("qtime", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spec = REGISTRY.specs[name]
    spark.sparkContext.setJobDescription(f"qtime:{name}")
    # untimed warmup (codegen + parquet footer cache)
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    ts = []
    for i in range(runs):
        t0 = time.time()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        ts.append(dt)
        print(f"pass {i}: {dt:.3f}s", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print(
        f"{name}: min={min(ts):.3f} median={statistics.median(ts):.3f} "
        f"runs={runs} loadavg={os.getloadavg()[0]:.1f}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
