"""Property-based dedup/text tests (SURVEY §5.4 style, Phase-4 surface).

Hypothesis drives randomized small corpora through the dedup operators
and asserts the invariants a curation pass relies on, against
driver-side reference models (pure-Python Jaccard / union-find). Spark
runs are slow, so examples are few but each covers many documents.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from cvemate_spark.operators import dedup

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

doc_st = st.lists(st.sampled_from(VOCAB), min_size=3, max_size=12)
corpus_st = st.lists(doc_st, min_size=2, max_size=8)


def ref_shingles(toks: list[str]) -> set[str]:
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def ref_jaccard(a: set[str], b: set[str]) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(corpus)]
    )


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st)
def test_ngram_jaccard_matches_reference_model(spark, corpus):
    """Every reported pair's jaccard equals the set-based reference, and
    no qualifying co-occurring pair is missed (exact variant: no df cap)."""
    got = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            _docs_df(spark, corpus), threshold=0.3
        ).collect()
    }
    sh = [ref_shingles(toks) for toks in corpus]
    expect = {}
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            if sh[i] and sh[j] and sh[i] & sh[j]:
                jac = ref_jaccard(sh[i], sh[j])
                if round(jac, 4) >= 0.3:
                    expect[(i, j)] = round(jac, 4)
    assert set(got) == set(expect)
    for pair, jac in got.items():
        assert abs(jac - expect[pair]) < 1e-9


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st)
def test_components_match_union_find(spark, corpus):
    """dedup_components over ngram pairs == driver-side union-find on
    the same edge set (min-id labeling)."""
    pairs = dedup.ngram_jaccard_pairs(_docs_df(spark, corpus), threshold=0.3)
    edges = [(r["d1"], r["d2"]) for r in pairs.collect()]
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.dedup_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert got == expect


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st, cap=st.integers(min_value=1, max_value=4))
def test_hot_shingle_cap_only_drops_via_hot_shingles(spark, corpus, cap):
    """With a df cap: reported pairs are a subset of the uncapped set,
    and every reported jaccard is a lower bound of the true value
    (intersection loses hot shingles, union keeps them — the documented
    recall trade, directionally pinned)."""
    docs = _docs_df(spark, corpus)
    capped = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0, df_cap=cap).collect()
    }
    sh = [ref_shingles(toks) for toks in corpus]
    for (i, j), jac in capped.items():
        true = ref_jaccard(sh[i], sh[j])
        assert jac <= round(true, 4) + 1e-9
