"""Property-based near-dup tests: the banded-LSH + array-intersect
verify pipeline against a driver-side brute-force reference model.

Two laws, each over randomized corpora:

1. **Verify exactness** — every pair minhash_pairs emits carries the
   TRUE distinct-3-gram Jaccard of its documents (computed in pure
   Python sets), at any threshold. This pins the array-intersect
   rewrite of the verify stage: a bug in array handling (duplicate
   shingles surviving, wrong union arithmetic) breaks equality, not
   just ordering.

2. **No false positives and LSH-sound candidates** — emitted pairs
   are exactly the subset of brute-force above-threshold pairs whose
   signatures collide in >= 1 band (LSH may MISS a true pair — that
   is its contract — but everything it emits must be a true
   above-threshold pair, and misses must be explainable by zero band
   collisions, never by the verify stage).

Spark runs are slow, so examples are few but each covers a whole
corpus.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from cvemate_spark.operators.dedup import SHINGLE_N, minhash_pairs

# small vocabulary -> shared shingles are common, so corpora actually
# contain near-dup pairs instead of degenerate all-disjoint docs
token_st = st.sampled_from(["red", "fox", "dog", "ran", "far", "away"])
doc_st = st.lists(token_st, min_size=0, max_size=12).map(" ".join)
corpus_st = st.lists(doc_st, min_size=2, max_size=7)


def _shingle_set(text: str) -> set[str]:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + SHINGLE_N])
        for i in range(len(toks) - SHINGLE_N + 1)
    }


def _true_jaccard(a: str, b: str) -> float:
    sa, sb = _shingle_set(a), _shingle_set(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st)
def test_minhash_pairs_match_bruteforce_model(spark, corpus):
    threshold = 0.3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in minhash_pairs(docs, threshold).collect()
    }
    truth = {
        (i, j): _true_jaccard(corpus[i], corpus[j])
        for i in range(len(corpus))
        for j in range(i + 1, len(corpus))
        if _true_jaccard(corpus[i], corpus[j]) >= threshold
    }
    # law 1: every emitted jaccard equals the true set jaccard (the
    # engine rounds to 4 — mirror it)
    for pair, jac in got.items():
        assert pair in truth, f"false positive {pair}"
        assert jac == round(truth[pair] * 10000 + 1e-9) / 10000 or abs(
            jac - truth[pair]
        ) < 5e-5, (pair, jac, truth[pair])
    # law 2: emitted ⊆ truth (already checked) and identical docs are
    # never missed — equal shingle sets collide in EVERY band, so LSH
    # cannot lose them
    for (i, j), jac in truth.items():
        if _shingle_set(corpus[i]) == _shingle_set(corpus[j]) and _shingle_set(
            corpus[i]
        ):
            assert (i, j) in got, f"identical docs {(i, j)} missed"


def test_band_layout_rejects_non_divisor_band_count():
    """n_bands must divide MINHASH_K: integer division would silently
    drop minhashes from every band signature (ADVICE r4)."""
    import pytest

    from cvemate_spark.functions.text import MINHASH_K, band_signature_exprs

    with pytest.raises(ValueError, match="must divide MINHASH_K"):
        band_signature_exprs("spark", n_bands=5)
    assert MINHASH_K % 5 != 0  # the guard is actually exercised above


def test_prefix_filter_is_lossless_vs_shared_shingle_join(spark):
    """The prefix-filtering theorem, checked end-to-end: at the same
    rational threshold, the prefix-pruned join returns EXACTLY the
    pairs of the uncapped all-shared-shingles join (recall 1.0 — the
    pruning is provably lossless, unlike df_cap), while generating no
    more candidates than it."""
    from pyspark.sql import functions as F

    from cvemate_spark.operators.dedup import (
        doc_shingles, ngram_jaccard_pairs, prefix_filter_pairs,
    )
    from cvemate_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in prefix_filter_pairs(docs, num=3, den=10).collect()
    )
    want = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.3, df_cap=None).collect()
    )
    assert got == want and len(got) > 0

    # the efficiency claim: prefix candidates are a strict subset of
    # the shared-shingle candidate space on this corpus
    sh = doc_shingles(docs)
    all_cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    df_rel = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = sh.join(df_rel, "shingle").select(
        "doc_id", "shingle",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("doc_id")).alias("sz"),
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz") - F.expr("(sz * 3 + 9) DIV 10") + 1
    ).select("doc_id", "shingle")
    pref_cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert pref_cand < all_cand


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_st)
def test_prefix_filter_matches_bruteforce_model(spark, corpus):
    """Prefix filtering against an INDEPENDENT brute-force model
    (python set arithmetic over all pairs, not the shingle-join
    implementation): the result must be EXACTLY every pair with true
    Jaccard >= num/den — recall 1.0 AND precision 1.0, the lossless
    contract, on arbitrary small corpora including degenerate ones
    (empty docs, identical docs, all-disjoint docs)."""
    from cvemate_spark.operators.dedup import prefix_filter_pairs

    num, den = 1, 2
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    got = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in prefix_filter_pairs(docs, num=num, den=den).collect()
    }
    truth = {}
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            sa, sb = _shingle_set(corpus[i]), _shingle_set(corpus[j])
            inter = len(sa & sb)
            union = len(sa | sb)
            # integer cross-mult, exactly the operator's verify rule
            if union and inter * den >= num * union:
                truth[(i, j)] = inter / union
    assert set(got) == set(truth), (
        f"pair set mismatch: extra={set(got) - set(truth)}, "
        f"missed={set(truth) - set(got)}"
    )
    for pair, jac in got.items():
        assert abs(jac - truth[pair]) < 5e-5, (pair, jac, truth[pair])


def test_quality_canonical_dominates_min_id_selection(spark):
    """Same components, same number of survivors per source — but the
    quality-aware selection keeps at least as many characters as the
    min-id selection (it argmaxes n_chars per cluster), and each
    cluster's survivor really is its longest member."""
    from cvemate_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    minid = {
        r["source"]: r
        for r in REGISTRY.specs["dedup_canonical"].builder(spark, sf).collect()
    }
    best = {
        r["source"]: r
        for r in REGISTRY.specs["dedup_canonical_best"].builder(spark, sf).collect()
    }
    assert set(minid) == set(best)
    for src in minid:
        assert best[src]["n_docs"] == minid[src]["n_docs"]
    # one survivor per cluster under EITHER selection — identical
    # totals, though a cluster's best copy may live in a different
    # SOURCE than its min-id copy, so per-source counts may differ
    assert sum(r["n_kept"] for r in best.values()) == sum(
        r["n_kept"] for r in minid.values()
    )
    assert sum(r["n_docs"] for r in best.values()) > 0

    # character dominance needs the min-id selection's kept_chars,
    # which dedup_canonical doesn't emit — recompute both from the
    # component relation directly
    from pyspark.sql import functions as F

    from cvemate_spark.operators.dedup import dedup_components, simhash_pairs
    from cvemate_spark.tables import load_table

    docs = load_table(spark, sf, "documents")
    comp = dedup_components(simhash_pairs(docs, max_hamming=2))
    joined = docs.join(comp, "doc_id", "left").select(
        "doc_id", "n_chars",
        F.coalesce("component", "doc_id").alias("component"),
    )
    rows = joined.collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append((r["n_chars"], r["doc_id"]))
    minid_chars = best_chars = 0
    for members in by_comp.values():
        minid_chars += min(members, key=lambda t: t[1])[0]
        best_chars += max(members, key=lambda t: (t[0], -t[1]))[0]
    assert best_chars >= minid_chars
    got_best = sum(r["kept_chars"] for r in best.values())
    assert got_best == best_chars  # the query really argmaxes n_chars
