"""Physical-plan audit helpers.

The engine treats plan shape as part of its contract (SCALE.md): a
query that silently loses predicate pushdown or flips a broadcast to a
cartesian product still returns right answers at sf0.01 while
regressing catastrophically at 100 TB. These helpers render a
DataFrame's formatted physical plan and assert shape properties;
tests/test_plans.py pins the properties per query.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

# markers for things that must NOT appear in JVM-side hot paths
ROW_PYTHON = ("BatchEvalPython", "PythonUDF")
PATHOLOGICAL_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def analyzed_plan(df: DataFrame) -> str:
    """The analyzed logical plan as a string.

    Broadcast *hints* (`F.broadcast(...)`) survive here as
    `ResolvedHint` nodes, so a test can distinguish a forced broadcast
    (plan-shape commitment at any scale) from one AQE chose at runtime
    because the relation happened to be small."""
    return df._jdf.queryExecution().analyzed().toString()


def assert_jvm_only(plan: str, context: str = "") -> None:
    for marker in ROW_PYTHON:
        assert marker not in plan, f"{context}: row-at-a-time Python ({marker})"


def assert_no_pathological_join(plan: str, context: str = "") -> None:
    for marker in PATHOLOGICAL_JOINS:
        assert marker not in plan, f"{context}: {marker} in plan"


def count_shuffles(plan: str) -> int:
    """Number of exchanges (shuffle boundaries) in the plan."""
    return plan.count("Exchange (")


def has_pushed_filter(plan: str, fragment: str) -> bool:
    """True if `fragment` appears inside a PushedFilters list."""
    return any(
        "PushedFilters:" in line and fragment in line
        for line in plan.splitlines()
    )
