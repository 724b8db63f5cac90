#!/usr/bin/env python3
"""Simulate the external verify driver as closely as possible.

Differences from tools/check.py (the fast local loop): this harness
imports `__spark_entry__` the way the driver does (importlib, repo
root on sys.path), builds a PLAIN SparkSession — NOT the tuned
`cvemate_spark.session.get_spark` factory, so none of our AQE/
shuffle/conf choices can mask a dependency on them (the round-2
`nanosAsLong` gotcha lived exactly in that gap) — runs `entry()` as
the smoke check, then every `queries()[name]` at sf0.01 against its
`oracle_sql()[name]` in DuckDB with the driver's compare (row count,
sorted column names, order-insensitive value hash).

Usage: python3 tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive content hash: columns sorted by name, rows
    sorted by their full string form, floats rounded to 9 dp."""
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype.kind == "f":
            d[c] = d[c].round(9)
    rows = sorted(tuple(str(x) for x in r) for r in d.itertuples(index=False))
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    from pyspark.sql import SparkSession

    # the PLAIN session the driver uses — deliberately none of our confs
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    smoke = entry_mod.entry(spark)
    n = smoke.count()
    assert n >= 0 and smoke.schema.fields, "entry() smoke failed"
    print(f"[smoke] entry(): {n} rows, schema ok")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_ok = n_bad = 0
    for name, builder in queries.items():
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
            if name not in oracles:
                # the real driver's weaker rows-only check for queries
                # with no SQL-expressible oracle (e.g. t_compress/zlib)
                n_ok += 1
                print(f"[OK-ROWS] {name}: rows={len(sdf)} "
                      f"({time.time() - t0:.1f}s, no oracle)")
                continue
            odf = con.execute(oracles[name]).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and value_hash(sdf) == value_hash(odf)
            )
        except Exception as e:  # noqa: BLE001 — a driver row records errs
            print(f"[ERR] {name}: {e}")
            n_bad += 1
            continue
        n_ok += ok
        n_bad += not ok
        tag = "OK" if ok else "MISMATCH"
        print(f"[{tag}] {name}: rows={len(sdf)} ({time.time() - t0:.1f}s)")
    print(f"{n_ok} ok, {n_bad} bad (plain-session driver sim, {sf_dir})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
