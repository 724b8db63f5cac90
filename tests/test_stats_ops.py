"""Corpus-statistics surface (stats_ops): drift, KMV sketch, weighted
sampling, RRF fusion — mathematical laws plus the plan-shape pins that
make the ops safe at 100 TB (value correctness is the DuckDB oracle)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cvemate_spark.plans.audit import assert_jvm_only, physical_plan
from cvemate_spark.queries import REGISTRY
from cvemate_spark.queries.stats_ops import KMV_K, KS_NBINS, WRS_K, _per_bin

SF = "/root/testdata/sf0.001"


def run(spark, name):
    return REGISTRY.specs[name].builder(spark, SF)


def test_stats_surface_stays_jvm_side(spark):
    for name in ("t_drift_ks", "t_drift_psi", "e_kmv_intersect",
                 "t_sample_weighted", "retr_rrf"):
        plan = physical_plan(run(spark, name))
        assert_jvm_only(plan, name)
        assert "CartesianProduct" not in plan, name


def test_drift_histogram_is_bounded(spark):
    """The scale contract: everything after the scan is <= KS_NBINS rows."""
    bins = _per_bin(spark, SF).collect()
    assert 0 < len(bins) <= KS_NBINS
    assert all(0 <= r.bin < KS_NBINS for r in bins)


def test_ks_bounds_and_consistency(spark):
    row = run(spark, "t_drift_ks").collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    # D in [0, 1], and the double is exactly the integer ratio
    assert 0.0 <= row.ks <= 1.0
    assert row.ks == row.ks_u / (row.n_a * row.n_b)
    assert 0 <= row.ks_bin < KS_NBINS


def test_ks_identical_slices_is_zero(spark):
    """KS(X, X) = 0: split by a statistic-independent key (doc_id parity)
    over the SAME distribution family still bounds above the planted
    en/non-en drift? No — the sharper law: comparing a slice to itself
    must give exactly 0."""
    per_bin = _per_bin(spark, SF).selectExpr(
        "bin", "a_cnt + b_cnt AS a_cnt", "a_cnt + b_cnt AS b_cnt"
    )
    from pyspark.sql.window import Window as W

    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    all_w = W.partitionBy()
    cum = per_bin.select(
        F.sum("a_cnt").over(cum_w).alias("cum_a"),
        F.sum("b_cnt").over(cum_w).alias("cum_b"),
        F.sum("a_cnt").over(all_w).alias("n_a"),
        F.sum("b_cnt").over(all_w).alias("n_b"),
    )
    mx = cum.agg(
        F.max(F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")))
    ).collect()[0][0]
    assert mx == 0


def test_psi_nonnegative_and_consistent(spark):
    row = run(spark, "t_drift_psi").collect()[0]
    # each PSI term (pA-pB)ln(pA/pB) >= 0, so the quantized sum is too
    assert row.psi_u >= 0
    assert row.psi == row.psi_u / 1e6
    assert row.nbins <= KS_NBINS


def test_kmv_estimates_track_exact(spark):
    """KMV relative error is ~1/sqrt(k-1) (~6% at k=256); assert a loose
    4-sigma envelope so the law is sharp but not flaky, plus the
    structural invariants (sketch fill, estimator identities)."""
    row = run(spark, "e_kmv_intersect").collect()[0]
    assert row.k == KMV_K
    # the trigram shingle space is ~16k distinct at sf0.001: full sketch
    assert row.n_seen == KMV_K
    assert 0 <= row.n_both <= row.n_seen
    exact_union = row.exact_a + row.exact_b - row.exact_inter
    assert exact_union > KMV_K  # the estimator branch is exercised
    sigma = 1.0 / math.sqrt(KMV_K - 1)
    assert abs(row.est_union - exact_union) <= 4 * sigma * exact_union
    # intersection estimate: looser (two estimators compound)
    assert abs(row.est_inter - row.exact_inter) <= max(
        8 * sigma * max(row.exact_inter, 1), 0.05 * exact_union
    )
    # the estimator identities hold exactly as computed
    assert row.est_union == (KMV_K - 1) * float(1 << 60) / float(row.u_k)
    assert row.est_inter == (row.n_both / float(row.n_seen)) * row.est_union


def test_kmv_unfilled_sketch_is_exact(spark):
    """When |A u B| < k the sketch never fills and the 'estimates' must
    be EXACT (n_seen and the exact ratio) — the small-set degeneracy the
    (k-1)/U_k formula gets wrong."""
    from cvemate_spark.operators.kmv import bottom_k, union_intersect_estimate

    a = spark.createDataFrame([(h,) for h in (5, 9, 13, 21)], "h: long")
    b = spark.createDataFrame([(h,) for h in (9, 21, 40)], "h: long")
    row = union_intersect_estimate(bottom_k(a, 16), bottom_k(b, 16), 16).collect()[0]
    assert row.n_seen == 5  # |{5,9,13,21,40}|
    assert row.est_union == 5.0
    assert row.n_both == 2  # {9, 21}
    assert row.est_inter == 2.0


def test_kmv_merge_is_sketch_of_union(spark):
    """Mergeability (the roll-up law): bottom-k of the merged sketches
    equals the sketch built from the unioned raw sets."""
    from cvemate_spark.operators.kmv import bottom_k, merge_flags

    import random

    rnd = random.Random(7)
    xs = [(rnd.randrange(1 << 60),) for _ in range(500)]
    ys = [(rnd.randrange(1 << 60),) for _ in range(500)]
    a = spark.createDataFrame(xs, "h: long")
    b = spark.createDataFrame(ys, "h: long")
    k = 32
    merged = sorted(
        r.h for r in merge_flags(bottom_k(a, k), bottom_k(b, k)).orderBy("h")
        .limit(k).collect()
    )
    direct = sorted(r.h for r in bottom_k(a.unionByName(b), k).collect())
    assert merged == direct


def test_kmv_bottom_k_is_distributed_topk(spark):
    """Both per-side bottom-k legs must compile to TakeOrderedAndProject
    (per-partition k-heaps) — never a global sort."""
    plan = physical_plan(run(spark, "e_kmv_intersect"))
    assert plan.count("TakeOrderedAndProject") >= 2


def test_weighted_sample_is_exact_topk(spark):
    """The A-ES law: the returned sample IS the global top-k by
    ln(u)/w — recompute every key in pandas and compare sets."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars",
        F.expr(
            "cast(conv(substring(md5(concat('ws:', cast(doc_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("h"),
    ).toPandas()
    docs["key"] = (
        (docs["h"] + 1) / float(1 << 60)
    ).map(lambda u: math.floor(math.log(u) * 1e6)) / docs["n_chars"].astype(float)
    expect = set(
        docs.sort_values(["key", "doc_id"], ascending=[False, True])
        .head(WRS_K)["doc_id"]
    )
    got = [r.doc_id for r in run(spark, "t_sample_weighted").collect()]
    assert len(got) == WRS_K
    assert set(got) == expect


def test_weighted_sample_plan_is_scan_plus_topk(spark):
    plan = physical_plan(run(spark, "t_sample_weighted"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle: scan -> top-k only


def test_s13_drift_windows_partition_corpus(spark):
    """Per-day KS rows: windows tile the corpus (sum n_win == n_ref),
    every statistic in [0,1] and exactly the integer ratio."""
    rows = run(spark, "s13_drift").collect()
    assert rows
    n_ref = rows[0].n_ref
    assert all(r.n_ref == n_ref for r in rows)
    assert sum(r.n_win for r in rows) == n_ref
    for r in rows:
        assert 0.0 <= r.ks <= 1.0
        assert r.ks == r.ks_u / (r.n_win * r.n_ref)


def test_kmv_matrix_covers_all_pairs(spark):
    """One row per unordered source pair; sketch invariants per row."""
    rows = run(spark, "e_kmv_matrix").collect()
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    from cvemate_spark.queries.stats_ops import KMV_MK

    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_seen <= KMV_MK
        assert 0 <= r.n_both <= r.n_seen
        assert r.est_inter <= r.est_union
        if r.n_seen < KMV_MK:  # unfilled union sketch => exact
            assert r.est_union == float(r.n_seen)


def test_rrf_ivf_same_fusion_contract(spark):
    """The IVF-served variant obeys the same fusion laws, shares the
    sparse leg with retr_rrf, and only the dense candidate set may
    differ (recall loss bounded by the probe)."""
    brute = {r.doc_id: r for r in run(spark, "retr_rrf").collect()}
    ivf_rows = run(spark, "retr_rrf_ivf").collect()
    assert 0 < len(ivf_rows) <= 10
    for r in ivf_rows:
        assert r.n_legs in (1, 2)
        assert r.rrf == r.rrf_u / 1e6
    scores = [r.rrf_u for r in ivf_rows]
    assert scores == sorted(scores, reverse=True)
    # two-leg fusions carry at least the two worst-rank contributions
    # (each leg rank <= 20 => r_u >= 10^6 // 80 per leg)
    for r in ivf_rows:
        if r.n_legs == 2:
            assert r.rrf_u >= 2 * (1000000 // (60 + 20))
    # the sparse legs are literally shared code — if any doc appears
    # in both outputs with 2 legs each, the scores can differ only
    # through the dense rank, bounded by the leg contribution range
    for doc_id, r in brute.items():
        assert r.n_legs in (1, 2)


def test_emb_drift_is_valid_statistic(spark):
    row = run(spark, "emb_drift").collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0.0 <= row.ks <= 1.0
    assert row.ks == row.ks_u / (row.n_a * row.n_b)
    from cvemate_spark.queries.stats_ops import EMB_NBINS

    assert 0 <= row.ks_bin < EMB_NBINS


def test_curate_mix_upweights_english(spark):
    """The mixing capstone: the weighted sample overrepresents English
    (weights doubled for en), the KS audit is a valid statistic, and
    the sample size is min(corpus, MIX_K)."""
    from cvemate_spark.queries.stats_ops import MIX_K

    row = run(spark, "curate_mix").collect()[0]
    assert row.n_sample == min(row.n_corpus, MIX_K)
    assert 0.0 <= row.ks <= 1.0
    assert row.ks == row.ks_u / (row.n_sample * row.n_corpus)
    # en fraction in the 2x-upweighted sample exceeds the corpus rate
    assert row.en_sample / row.n_sample > row.en_corpus / row.n_corpus


def test_rrf_fusion_laws(spark):
    """Every fused doc comes from >= 1 leg; scores are the exact integer
    RRF sums; a doc in BOTH legs at rank r beats a doc in one leg at the
    same rank (the fusion monotonicity RRF exists for)."""
    rows = run(spark, "retr_rrf").collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r.n_legs in (1, 2)
        assert r.rrf == r.rrf_u / 1e6
        # max possible: two legs at rank 1
        assert 0 < r.rrf_u <= 2 * (1000000 // 61)
    # descending fused order
    scores = [r.rrf_u for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------- fuzz
# Property fuzz for the KMV estimator (the codec-fuzz pattern: few
# examples, Spark-backed, laws checked against python recomputation).
from hypothesis import HealthCheck, given, settings, strategies as st

hash_sets = st.lists(
    st.integers(min_value=0, max_value=(1 << 60) - 1),
    min_size=0, max_size=400, unique=True,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(xs=hash_sets, ys=hash_sets, k=st.sampled_from([4, 16, 64]))
def test_kmv_laws_fuzz(spark, xs, ys, k):
    """For ARBITRARY hash sets and k: (1) merge of sketches == sketch
    of union; (2) n_both counts exactly the bottom-k members present in
    both sides; (3) the unfilled branch is exact."""
    from cvemate_spark.operators.kmv import (
        bottom_k, merge_flags, union_intersect_estimate,
    )

    a = spark.createDataFrame([(h,) for h in xs] or [(0,)], "h: long")
    b = spark.createDataFrame([(h,) for h in ys] or [(0,)], "h: long")
    if not xs:
        a = a.filter("h < 0")
    if not ys:
        b = b.filter("h < 0")
    sk_a, sk_b = bottom_k(a, k), bottom_k(b, k)

    merged = sorted(
        r.h for r in merge_flags(sk_a, sk_b).orderBy("h").limit(k).collect()
    )
    direct = sorted(r.h for r in bottom_k(a.unionByName(b), k).collect())
    assert merged == direct  # mergeability

    row = union_intersect_estimate(sk_a, sk_b, k).collect()[0]
    union = sorted(set(xs) | set(ys))
    bottom = set(union[:k])
    sa, sb = set(sorted(set(xs))[:k]), set(sorted(set(ys))[:k])
    assert row.n_seen == len(bottom)
    assert row.n_both == len(bottom & sa & sb)
    if len(union) < k:  # unfilled => exact
        assert row.est_union == float(len(union))
        assert row.est_inter == (
            0.0 if not bottom else row.n_both / row.n_seen * len(union)
        )


def test_s14_incremental_sketch_laws(spark):
    """Incremental KMV streaming state: per-day rows, sketch bounded at
    k, unfilled days exact, filled days inside the error envelope."""
    from cvemate_spark.streaming.drift import SKETCH_K

    rows = run(spark, "s14_kmv").collect()
    assert rows
    sigma = 1.0 / math.sqrt(SKETCH_K - 1)
    for r in rows:
        assert 0 < r.n_seen <= SKETCH_K
        if r.n_seen < SKETCH_K:  # sketch never filled -> exact
            assert r.est_users == float(r.n_seen)
            assert r.n_seen == r.exact_users
        else:
            assert abs(r.est_users - r.exact_users) <= 6 * sigma * r.exact_users


def test_quantile_2pass_matches_sorted_order_statistic(spark):
    """The whole point of the 2-pass plan: exact equality with the
    order statistic a total sort would give, at every target."""
    rows = {r.q: r for r in run(spark, "e_quantile_2pass").collect()}
    vals = sorted(
        r.v
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .selectExpr("cast(floor(l_extendedprice * 100 + 0.5) as long) AS v")
        .collect()
    )
    n = len(vals)
    from cvemate_spark.queries.stats_ops import QUANT_TARGETS

    assert set(rows) == {name for name, _, _ in QUANT_TARGETS}
    for name, num, den in QUANT_TARGETS:
        rank = (n * num + den - 1) // den
        assert rows[name].n == n
        assert rows[name].rank == rank
        assert rows[name].value == vals[rank - 1] / 100.0


def test_quantile_2pass_monotone(spark):
    rows = {r.q: r.value for r in run(spark, "e_quantile_2pass").collect()}
    assert rows["p50"] <= rows["p90"] <= rows["p99"]


def test_quantile_2pass_histogram_is_bounded(spark):
    """Scale pin: no global sort in the plan — the only Sort nodes are
    inside the bounded-window stages, and there is no range-partitioned
    Exchange over the data (rangepartitioning appears only for the
    final 3-row orderBy, if at all)."""
    from cvemate_spark.queries.stats_ops import QUANT_BINS

    df = run(spark, "e_quantile_2pass")
    plan = physical_plan(df)
    assert_jvm_only(plan, "e_quantile_2pass")
    assert "CartesianProduct" not in plan
    # the histogram relation is structurally <= QUANT_BINS rows
    assert QUANT_BINS == 256


def test_s15_incremental_cms_laws(spark):
    """Incremental CMS streaming state: the estimate NEVER undercounts
    (the one-sided CMS guarantee survives the streaming fold), and the
    incremental state equals the direct batch sketch estimate-for-
    estimate (counter additivity)."""
    rows = run(spark, "s15_cms").collect()
    assert rows
    for r in rows:
        assert r.est >= r.true_cnt
        assert r.overcount == r.est - r.true_cnt

    # direct batch rebuild must give the identical relation
    from cvemate_spark.operators.sketch import cms_build_grouped
    from cvemate_spark.streaming.drift import CMS_DEPTH, CMS_WIDTH
    from cvemate_spark.operators.sketch import _bucket_expr_spark

    from cvemate_spark.streaming.jobs import _stage_events

    ev = spark.read.parquet(_stage_events(SF)).selectExpr(
        "date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss')"
        " AS win_start",
        "event_type AS term",
    )
    sk = cms_build_grouped(ev, "win_start", depth=CMS_DEPTH, width=CMS_WIDTH)
    exact = ev.groupBy("win_start", "term").count()
    probe = exact.select(
        "win_start", "term",
        F.explode(F.expr(f"sequence(0, {CMS_DEPTH - 1})")).alias("j"),
    ).withColumn("bucket", F.expr(_bucket_expr_spark("term", "j", CMS_WIDTH)))
    est = (
        probe.join(F.broadcast(sk), ["win_start", "j", "bucket"])
        .groupBy("win_start", "term")
        .agg(F.min("cnt").alias("est"))
    )
    batch = {(r.win_start, r.term): r.est for r in est.collect()}
    assert {(r.win_start, r.term): r.est for r in rows} == batch


def test_cms_grouped_merge_is_sketch_of_concatenation(spark):
    """The law the streaming fold relies on: merging per-chunk grouped
    sketches == the sketch of the concatenated stream, cell by cell."""
    from cvemate_spark.operators.sketch import (
        cms_build_grouped,
        cms_merge_grouped,
    )

    toks = spark.createDataFrame(
        [("g1", t) for t in "a b a c a b".split()]
        + [("g2", t) for t in "x y x".split()],
        "g string, term string",
    )
    a, b = toks.filter("term <= 'b' OR term = 'x'"), toks.filter(
        "term > 'b' AND term != 'x'"
    )
    merged = cms_merge_grouped(
        cms_build_grouped(a, "g", width=16),
        cms_build_grouped(b, "g", width=16),
        "g",
    )
    direct = cms_build_grouped(toks, "g", width=16)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_stratified_sample_exact_budget(spark):
    """Largest-remainder apportionment laws: the realized sample is
    EXACTLY K rows, per-stratum counts equal the quota, and every quota
    is within 1 of the exact proportional share k*n_g/n."""
    from cvemate_spark.queries.stats_ops import STRAT_K

    rows = run(spark, "t_sample_stratified").collect()
    assert len(rows) == STRAT_K
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r)
        assert 1 <= r.rn <= r.quota <= r.n_g
    n = sum({r.lang: r.n_g for r in rows}[g] for g in per)
    # n above counts only sampled strata; recompute from the corpus
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    for g, grp in per.items():
        quota, n_g = grp[0].quota, grp[0].n_g
        assert len(grp) == quota
        assert abs(quota - STRAT_K * n_g / n) < 1.0


def test_quantile_grouped_matches_per_group_order_statistic(spark):
    """Grouped 2-pass: exact per-group order statistics at every
    (source, target), verified against an in-memory per-group sort."""
    from cvemate_spark.queries.stats_ops import GQ_TARGETS

    rows = run(spark, "e_quantile_grouped").collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    per = {}
    for r in docs:
        per.setdefault(r.source, []).append(r.n_chars)
    assert {r.source for r in rows} == set(per)
    assert len(rows) == len(per) * len(GQ_TARGETS)
    by_key = {(r.source, r.q): r for r in rows}
    for src, vals in per.items():
        vals.sort()
        for name, num, den in GQ_TARGETS:
            rank = (len(vals) * num + den - 1) // den
            r = by_key[(src, name)]
            assert r.n == len(vals)
            assert r.rank == rank
            assert r.value == vals[rank - 1]


def test_cohort_retention_laws(spark):
    """Offset-0 cells are the cohort itself (rate == 10000 bp exactly),
    no cell exceeds its cohort, and cohort sizes partition the user
    base (every user is in exactly one cohort)."""
    rows = run(spark, "e_cohort_retention").collect()
    assert rows
    sizes = {}
    for r in rows:
        assert 0 <= r.n_users <= r.cohort_size
        assert r.rate_bp == (r.n_users * 10000) // r.cohort_size
        if r.off == 0:
            assert r.n_users == r.cohort_size
            assert r.rate_bp == 10000
            sizes[r.cohort_day] = r.cohort_size
        assert r.off >= 0
    from cvemate_spark.streaming.jobs import _stage_events

    n_users = (
        spark.read.parquet(_stage_events(SF)).select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


def test_path_transitions_conservation(spark):
    """Per-source totals and the global conservation law: every user
    with k events contributes exactly k-1 transitions."""
    rows = run(spark, "e_path_transitions").collect()
    assert rows
    from cvemate_spark.streaming.jobs import _stage_events

    ev = spark.read.parquet(_stage_events(SF))
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    per_src = {}
    for r in rows:
        per_src.setdefault(r.src, [0, r.src_total])
        per_src[r.src][0] += r.n
        assert 0 <= r.rate_bp <= 10000
        assert r.rate_bp == (r.n * 10000) // r.src_total
    for src, (s, tot) in per_src.items():
        assert s == tot, src


def test_anomaly_volume_flag_consistency(spark):
    """Integer z-score laws: flags agree with the cross-multiplied
    z^2 > 9 test, z2_c is the floored centi-unit z^2 (or the -1
    zero-variance sentinel), every day with enough trailing history
    gets a verdict."""
    rows = run(spark, "e_anomaly_volume").collect()
    assert rows
    from cvemate_spark.queries.stats_ops import ANOM_MIN, ANOM_WIN

    for r in rows:
        assert ANOM_MIN <= r.c <= ANOM_WIN
        assert r.is_anomaly in (0, 1)
        assert r.z2_c >= -1
        if r.z2_c == -1:
            assert r.is_anomaly == 1  # zero-variance baseline, deviation
        elif r.is_anomaly == 1:
            assert r.z2_c >= 900  # z^2 > 9 => floor(100 z^2) >= 900


def test_ab_test_integer_identities(spark):
    """The z^2 identity recomputed in exact Python bignums, plus the
    structural counters (arms partition users, conversions bounded)."""
    row = run(spark, "e_ab_test").collect()[0]
    assert 0 <= row.c_a <= row.n_a and 0 <= row.c_b <= row.n_b
    pool = row.c_a + row.c_b
    tot = row.n_a + row.n_b
    if pool in (0, tot):
        assert row.z2_c == 0 and row.significant == 0
    else:
        diff = row.c_a * row.n_b - row.c_b * row.n_a
        num = diff * diff * tot
        den = row.n_a * row.n_b * pool * (tot - pool)
        assert row.z2_c == (num * 100) // den
        assert row.significant == int(num * 100 > 384 * den)
    assert row.rate_a_bp == (row.c_a * 10000) // row.n_a
    assert row.rate_b_bp == (row.c_b * 10000) // row.n_b
    from cvemate_spark.streaming.jobs import _stage_events

    n_users = (
        spark.read.parquet(_stage_events(SF)).select("user_id").distinct().count()
    )
    assert row.n_a + row.n_b == n_users


def test_ab_test_decimal_domain(spark):
    """The DECIMAL(38,0) z^2 path is exact on counters whose
    cross-products overflow int64 (the old ~30k-users/arm ceiling):
    1e6 users/arm at a 90%-vs-10% effect gives diff^2 = 6.4e23 >>
    2^63. Verified against exact Python bignum arithmetic, including
    a boundary pair straddling the 3.84 significance threshold."""
    from cvemate_spark.queries.stats_ops import _ab_stats

    cases = [
        (1_000_000, 1_000_000, 900_000, 100_000),   # diff^2 ~ 6.4e23
        (10_000_000, 10_000_000, 5_000_100, 5_000_000),  # tiny effect
        (2_000_000, 1_000_000, 3, 0),               # near-degenerate
        (1_000_000, 1_000_000, 501_386, 500_000),   # just significant
        (1_000_000, 1_000_000, 501_385, 500_000),   # just below
    ]
    agg = spark.createDataFrame(
        [(int(a), int(b), int(c), int(d)) for a, b, c, d in cases],
        "n_a long, n_b long, c_a long, c_b long",
    )
    rows = {
        (r.n_a, r.n_b, r.c_a, r.c_b): r for r in _ab_stats(agg).collect()
    }
    for n_a, n_b, c_a, c_b in cases:
        r = rows[(n_a, n_b, c_a, c_b)]
        pool, tot = c_a + c_b, n_a + n_b
        diff = c_a * n_b - c_b * n_a
        num = diff * diff * tot * 100
        den = n_a * n_b * pool * (tot - pool)
        assert num > 2**63 or den > 2**63 or abs(diff) ** 2 > 2**63 or (
            (n_a, n_b, c_a, c_b) == cases[2]
        ), "case does not exercise the >int64 domain"
        assert r.z2_c == num // den
        assert r.significant == int(num > 384 * den)
        assert r.rate_a_bp == (c_a * 10000) // n_a
        assert r.rate_b_bp == (c_b * 10000) // n_b
    # the straddling pair really does disagree on significance
    assert rows[(1_000_000, 1_000_000, 501_386, 500_000)].significant == 1
    assert rows[(1_000_000, 1_000_000, 501_385, 500_000)].significant == 0


def test_s16_incremental_histogram_laws(spark):
    """S16: two rows per day (p50, p95), rank within [1, n], the p95
    bin never below the p50 bin, and the served bin really is the
    rank's bin against a direct batch histogram."""
    rows = run(spark, "s16_quantile").collect()
    assert rows
    per = {}
    for r in rows:
        assert 1 <= r.rank <= r.n
        assert 0 <= r.bin < 32
        assert r.lo == r.bin * 16
        per.setdefault(r.win_start, {})[r.q] = r
    from cvemate_spark.streaming.jobs import _stage_events

    ev = spark.read.parquet(_stage_events(SF)).selectExpr(
        "date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss')"
        " AS win_start",
        "least(cast(floor(value / 16) as long), 31) AS bin",
    ).collect()
    hist = {}
    for e in ev:
        hist.setdefault(e.win_start, {}).setdefault(e.bin, 0)
        hist[e.win_start][e.bin] += 1
    assert set(per) == set(hist)
    for day, qs in per.items():
        assert set(qs) == {"p50", "p95"}
        assert qs["p50"].bin <= qs["p95"].bin
        n = sum(hist[day].values())
        for name, num, den in (("p50", 1, 2), ("p95", 19, 20)):
            r = qs[name]
            assert r.n == n
            assert r.rank == (n * num + den - 1) // den  # ceil(p*n)
            cum = 0
            for b in sorted(hist[day]):
                prev = cum
                cum += hist[day][b]
                if prev < r.rank <= cum:
                    assert r.bin == b
                    break
