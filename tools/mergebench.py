#!/usr/bin/env python3
"""Merge-cost scaling bench: bucket-scoped merge vs whole-table rewrite.

The contract under measurement (VERDICT r7 item 3): with the
bucket-scoped layout, merge cost is bounded by the BATCH footprint
(buckets touched x bucket size), not the TARGET size — the reference's
point-update economics (mongodb_handler.py:141-195) at file
granularity. The old `merge_upsert` + `write_atomic` path rewrites the
whole target directory per merge regardless of batch size.

Usage: python3 tools/mergebench.py [sf_dir] [n_buckets]
Writes MERGEBENCH.json: per-batch-size wall clock + files_rewritten
for the scoped path, plus the whole-rewrite baseline.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SCRATCH = "/root/repo/.scratch/mergebench"
T0 = "2026-01-01 00:00:00"
T1 = "2026-01-02 00:00:00"


def main() -> None:
    from cvemate_spark.operators.merge import (
        merge_scoped, merge_upsert, write_atomic, write_bucket_table,
    )
    from cvemate_spark.session import get_spark

    spark: SparkSession = get_spark()
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
    target_rows = orders.count()
    base = merge_upsert(None, orders, key="o_orderkey", now=T0)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    path = f"{SCRATCH}/bucketed"
    t = time.monotonic()
    write_bucket_table(base, path, key="o_orderkey", n_buckets=N_BUCKETS)
    load_s = time.monotonic() - t

    # batch sizes as modulus filters: ~1/100000 .. ~1/10 of the keys
    results = []
    for mod in (100_000, 10_000, 1_000, 100, 10):
        batch = (
            orders.filter(F.col("o_orderkey") % mod == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
        )
        n_batch = batch.count()
        t = time.monotonic()
        stats = merge_scoped(spark, path, batch, now=T1)
        dt = time.monotonic() - t
        results.append(
            {
                "mode": "scoped",
                "batch_rows": n_batch,
                "batch_frac": n_batch / target_rows,
                "sec": round(dt, 3),
                **stats,
            }
        )
        print(json.dumps(results[-1]))

    # the old economics: full merge + whole-directory swap, once,
    # with the SMALLEST batch — cost should sit near the full-load
    # cost regardless of the batch being ~10 rows
    tiny = (
        orders.filter(F.col("o_orderkey") % 100_000 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    flat = f"{SCRATCH}/flat"
    write_atomic(base, flat)
    import glob

    t = time.monotonic()
    merged = merge_upsert(
        spark.read.parquet(flat), tiny, key="o_orderkey", now=T1
    )
    write_atomic(merged, flat)
    full_dt = time.monotonic() - t
    flat_files = glob.glob(f"{flat}/*.parquet")
    results.append(
        {
            "mode": "write_atomic",
            "batch_rows": tiny.count(),
            "sec": round(full_dt, 3),
            "files_rewritten": len(flat_files),
            "bytes_rewritten": sum(os.path.getsize(f) for f in flat_files),
            "files_total": len(flat_files),
        }
    )
    print(json.dumps(results[-1]))

    out = {
        "sf_dir": SF_DIR,
        "target_rows": target_rows,
        "n_buckets": N_BUCKETS,
        "initial_load_sec": round(load_s, 3),
        "loadavg_1m": os.getloadavg()[0],
        "runs": results,
    }
    with open("/root/repo/MERGEBENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MERGEBENCH.json")
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
