"""The scalable dedup-clustering verifier must be falsifiable: each
law catches the failure mode it exists for (VERDICT r8 item 4 — the
edge-linear replacement for the O(component^2) closure oracle on
derived large corpora is only evidence if it can actually fail)."""

from __future__ import annotations

import pytest

from tools.check import duck_connect
from tools.dedup_laws import PAIR_KW, SCALE_BOUND, check_laws, verify

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture(spark):
    from cvemate_spark.operators import dedup
    from cvemate_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    pairs = dedup.simhash_pairs(docs, **PAIR_KW["dedup_components"])
    labels = dedup.dedup_components(pairs).toPandas()
    con = duck_connect(SF)
    pairs_sql = dedup.simhash_pairs_oracle(**PAIR_KW["dedup_components"])
    return labels, con, pairs_sql


def test_laws_pass_on_true_clustering(fixture):
    labels, con, pairs_sql = fixture
    assert len(labels) > 0 and labels["component"].nunique() > 1
    assert check_laws(con, labels, pairs_sql) == []


def test_law_a_catches_a_split_component(fixture):
    """Relabel one non-root node to itself: its edge now crosses two
    labels — the under-merge failure mode."""
    labels, con, pairs_sql = fixture
    bad = labels.copy()
    victim = bad[bad["doc_id"] != bad["component"]].index[0]
    bad.loc[victim, "component"] = bad.loc[victim, "doc_id"]
    problems = check_laws(con, bad, pairs_sql)
    assert any(p.startswith("LAW A") for p in problems), problems


def test_law_b_catches_a_wrong_root(fixture):
    """Relabel one whole class to its second-smallest member: edges
    stay consistent, but the component id is no longer min(doc_id)."""
    labels, con, pairs_sql = fixture
    bad = labels.copy()
    sizes = bad.groupby("component").size()
    comp = sizes[sizes >= 2].index[0]
    members = sorted(bad.loc[bad["component"] == comp, "doc_id"])
    bad.loc[bad["component"] == comp, "component"] = members[1]
    problems = check_laws(con, bad, pairs_sql)
    assert any(p.startswith("LAW B") for p in problems), problems


def test_law_c_catches_an_over_merge(fixture):
    """Merge two disjoint classes under the smaller root: laws A and B
    still hold (no edge crosses, the root is the min of the union) —
    only the sampled exact closure can see the class is disconnected."""
    labels, con, pairs_sql = fixture
    bad = labels.copy()
    roots = sorted(bad["component"].unique())
    assert len(roots) >= 2
    a, b = roots[0], roots[1]
    bad.loc[bad["component"] == b, "component"] = a
    problems = check_laws(con, bad, pairs_sql)
    assert any(p.startswith("LAW C") for p in problems), problems
    assert not any(p.startswith("LAW A") or p.startswith("LAW B")
                   for p in problems), problems


def test_full_verify_green_for_every_scale_bound_query(spark):
    con = duck_connect(SF)
    for name in sorted(SCALE_BOUND):
        problems, stats = verify(spark, con, name, SF)
        assert problems == [], (name, problems)
        assert stats["labeled_nodes"] > 0


def test_components_converge_beyond_any_linear_cap(spark):
    """The round-9 convergence fix: a 300-long chain (diameter far
    beyond any per-round propagation budget) must still resolve to a
    single component rooted at the min id — pointer jumping makes
    rounds O(log diameter) — and the operator must RAISE rather than
    return unconverged labels if the cap is genuinely exhausted."""
    import pytest

    from cvemate_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], ["d1", "d2"]
    )
    out = dedup_components(pairs).collect()
    assert len(out) == 301
    assert {r["component"] for r in out} == {0}

    # silent truncation is outlawed: an impossible budget raises
    with pytest.raises(RuntimeError, match="no fixpoint"):
        dedup_components(pairs, max_iter=2)
