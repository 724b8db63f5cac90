"""Property-based OP-MERGE tests (SURVEY §5.4).

Hypothesis drives randomized batch contents and orderings through the
merge fold and asserts convergence to a reference model — a driver-side
dict-of-dicts applying the reference's UpdateOne semantics
(handlers/mongodb_handler.py:154-175) batch by batch. Spark runs are
slow, so examples are few but each covers many keys/batches.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from cvemate_spark.operators.merge import merge_upsert

SOURCES = ["nvd", "epss", "kev"]
KEYS = [f"CVE-{i}" for i in range(6)]

# one batch: a source name plus {key: payload}
batch_st = st.tuples(
    st.sampled_from(SOURCES),
    st.dictionaries(
        st.sampled_from(KEYS), st.text("abc", min_size=1, max_size=3), min_size=1
    ),
)
batches_st = st.lists(batch_st, min_size=1, max_size=5)


def model_merge(batches: list[tuple[str, dict[str, str]]]) -> dict[str, dict]:
    """Reference model: the upsert loop the reference runs per document."""
    table: dict[str, dict] = {}
    for src, rows in batches:
        for key, payload in rows.items():
            doc = table.setdefault(key, {})
            doc[src] = payload  # $set on the source column only
    return table


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=batches_st)
def test_merge_fold_matches_reference_model(spark, batches):
    target = None
    for i, (src, rows) in enumerate(batches):
        df = spark.createDataFrame([Row(id=k, **{src: v}) for k, v in rows.items()])
        target = merge_upsert(target, df, now=f"2024-01-01 00:00:{i:02d}")
    got = {
        r["id"]: {s: r.asDict().get(s) for s in SOURCES if r.asDict().get(s)}
        for r in target.collect()
    }
    assert got == model_merge(batches)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    batches=batches_st,
    seed=st.integers(0, 1000),
)
def test_disjoint_source_order_convergence(spark, batches, seed):
    """Batches of DIFFERENT sources commute (each owns its column);
    within one source the order stays fixed (last-writer-wins is order-
    sensitive, exactly like the reference)."""
    import random

    by_src: dict[str, list] = {}
    for src, rows in batches:
        by_src.setdefault(src, []).append(rows)

    def fold(src_order):
        target = None
        t = 0
        for src in src_order:
            for rows in by_src[src]:
                df = spark.createDataFrame(
                    [Row(id=k, **{src: v}) for k, v in rows.items()]
                )
                target = merge_upsert(target, df, now=f"2024-01-01 00:00:{t:02d}")
                t += 1
        return {
            r["id"]: tuple(r.asDict().get(s) for s in SOURCES)
            for r in target.collect()
        }

    order_a = sorted(by_src)
    order_b = list(by_src)
    random.Random(seed).shuffle(order_b)
    assert fold(order_a) == fold(order_b)
