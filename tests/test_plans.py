"""Plan-quality regression tests: the physical plan IS the product.

Each assertion pins a scale-critical plan property (SURVEY §4.3,
SCALE.md): predicate pushdown reaching the parquet scan, column
pruning, dimension broadcast, distributed top-k, and the absence of
row-at-a-time Python evaluation or cartesian products in hot paths.
A refactor that silently loses one of these would still pass the
value-correctness gate but regress at scale — these tests catch it.
"""

from __future__ import annotations

import pytest

from cvemate_spark.plans.audit import (
    analyzed_plan,
    assert_jvm_only,
    assert_no_pathological_join,
    physical_plan,
)
from cvemate_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return physical_plan(REGISTRY.specs[name].builder(spark, SF))


def test_q01_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01")
    assert "PushedFilters: [" in plan
    assert "StringStartsWith(l_returnflag,R)" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan
    # projection pruned to exactly the needed columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_quantity:double,l_returnflag:string>" in plan
    )


def test_q07_broadcasts_all_dims(spark):
    """r13 shape: the dimension star (supplier ⨝ nation ⨝ region)
    collapses to one (s_suppkey, n_name) build relation, so the fact
    scan pays exactly ONE broadcast hash probe (guide §2.4) — the two
    dim-dim joins stay broadcast joins inside the build subtree."""
    import re

    plan = plan_of(spark, "q07")
    # detail headers count each node once (the tree prints them again)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # fact scan pruned to join key + measures
    assert "l_extendedprice" in plan and "l_comment" not in plan


def test_q06_semi_prefilter_below_agg(spark):
    """r13 shape (guide §3.2): the lineitem aggregation is prefiltered
    by a broadcast LEFT SEMI probe of the surviving orders relation,
    so the per-orderkey aggregate and its exchange carry only rows
    that can survive the final inner join."""
    plan = plan_of(spark, "q06")
    # semi probes: orders ⋉ customer, lineitem ⋉ surviving orders (the
    # optimizer may expand the latter into a chain of per-dim semis)
    assert plan.count("BroadcastHashJoin LeftSemi") >= 2
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_q17_distributed_topk(spark):
    plan = plan_of(spark, "q17")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort for a limit-k


def test_q11_partial_final_agg(spark):
    plan = plan_of(spark, "q11")
    # Catalyst plans two HashAggregates (partial map-side + final)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_no_python_udf_in_sql_hot_paths(spark):
    """The relational/dedup surface must stay JVM-side (whole-stage
    codegen); Python appears only in declared Arrow stages."""
    for name in ("q01", "q06", "q11", "q15", "q19", "dedup_minhash", "q26",
                 "curate_pipeline", "ann_lsh", "cve_pipeline"):
        plan = plan_of(spark, name)
        assert_jvm_only(plan, name)
        # q26/ann_* deliberately broadcast a ONE-ROW query-vector relation
        # (BroadcastNestedLoopJoin with a scalar build side is the intended
        # plan there, not a blow-up)
        if name not in ("q26", "ann_lsh"):
            assert_no_pathological_join(plan, name)


def test_new_pipeline_ops_stay_jvm_side(spark):
    """The round-2 training-pipeline surface (split/sample/pack/redact/
    novelty, incremental dedup, batched ANN, pivot) is pure codegen —
    no Python eval, no cartesian blow-up anywhere."""
    for name in ("t_split", "t_sample", "t_pack", "t_redact", "t_novelty",
                 "dedup_incremental", "ann_lsh_batch", "e_pivot", "e_unpivot",
                 "t_decontam", "t_repetition", "t_shuffle", "emb_quantize",
                 "t_chunk"):
        plan = plan_of(spark, name)
        assert_jvm_only(plan, name)
        assert_no_pathological_join(plan, name)


def test_pivot_declared_values_single_aggregate(spark):
    """pivot(col, values) with the value list DECLARED: one aggregate
    pass, no hidden distinct-discovery job (which would be an extra
    corpus scan at 100 TB)."""
    import re

    plan = plan_of(spark, "e_pivot")
    # formatted mode prints each node twice (tree + detail); count the
    # detail headers
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_arrow_stages_where_declared(spark):
    """mapInPandas/applyInPandas surfaces use Arrow eval, never
    row-at-a-time pickling."""
    for name, marker in (
        ("mm_meta", "MapInPandas"),
        ("q28", "FlatMapGroupsInPandas"),
        ("emb_neardup", "FlatMapGroupsInPandas"),
    ):
        plan = plan_of(spark, name)
        assert marker in plan, name
        assert "BatchEvalPython" not in plan, name


def test_new_r4_operators_plan_shapes(spark):
    """Round-4 operators keep their scale shapes: the semdedup-GEMM
    assignment is an Arrow MapInPandas stage (never BatchEvalPython,
    never an n*C crossJoin+Window materialization), and the exact
    pruned near-dup route keeps the no-forced-broadcast rule on its
    candidate rescore (an exact-tie plateau can make candidates
    quadratic in duplicate multiplicity)."""
    plan = plan_of(spark, "emb_semdedup_gemm")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan  # the fold-based argmax rank is gone

    df = REGISTRY.specs["emb_neardup_semdedup"].builder(spark, SF)
    logical = analyzed_plan(df)
    # centroid/survivor broadcasts are bounded-by-construction hints;
    # the candidate relations (applyInPandas outputs) must carry none.
    # They are the only FlatMapGroupsInPandas sources in this plan, so
    # assert no hint sits directly above one.
    import re

    for m in re.finditer(r"ResolvedHint[^\n]*\n((?:.*\n){0,3})", logical):
        assert "FlatMapGroupsInPandas" not in m.group(1)


def test_asof_is_single_window_not_range_join(spark):
    plan = plan_of(spark, "e_asof")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_merge_is_single_shuffle_join(spark):
    plan = plan_of(spark, "q05")
    assert "FullOuter" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cwe_enrich_broadcasts_dimension(spark):
    """The reference-shaped cve↔cwe enrichment: the parsed CWE catalog
    is a bounded dimension (thousands of rows at any corpus scale), so
    the weakness-refs join must be a BroadcastHashJoin — never a
    shuffle of the full refs side."""
    plan = plan_of(spark, "cwe_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_verify_has_no_forced_broadcast(spark):
    """The per-doc `sizes` relation in the Jaccard verify is one row
    per document — billions of rows at 100 TB. A broadcast *hint* on it
    commits the plan to an executor OOM at scale, so the dedup queries
    must carry no ResolvedHint at all; AQE alone decides whether the
    small-at-test-scale relation gets broadcast at runtime."""
    for name in ("dedup_minhash", "dedup_ngram_jaccard"):
        df = REGISTRY.specs[name].builder(spark, SF)
        logical = analyzed_plan(df)
        assert "ResolvedHint" not in logical, name
        assert "UnresolvedHint" not in logical, name


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """§4.3 layout claim: tables bucketed on the join key sort-merge
    join with ZERO exchanges — the cve-table design that makes repeated
    MERGEs shuffle only the incoming batch at 100 TB."""
    from cvemate_spark.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem")
        orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("orders_b")
        lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("lineitem_b")
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            spark.table("orders_b")["o_orderkey"]
            == spark.table("lineitem_b")["l_orderkey"],
        )
        plan = physical_plan(joined)
        # bucketed layout claim: the join runs WITHOUT re-shuffling
        # either side. The algorithm may be sort-merge (bucket+sortBy
        # satisfies the sort requirement) or shuffled-hash (since the
        # r13 preferSortMergeJoin=false session default) — the pinned
        # invariant is the absent Exchange, not the join algorithm.
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Write-time partitioning -> read-time partition pruning: a filter
    on the partition column must land in PartitionFilters (directories
    skipped at planning), NOT as a row filter over a full scan — at
    100 TB this is the difference between listing 1/5 of the table and
    reading all of it."""
    from cvemate_spark.plans.audit import physical_plan
    from cvemate_spark.tables import load_table

    path = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    got = spark.read.parquet(path).filter("o_orderpriority = '1-URGENT'")
    plan = physical_plan(got)
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    n = got.count()
    assert n == orders.filter("o_orderpriority = '1-URGENT'").count() > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP: when the partition key is only constrained THROUGH a join
    with a filtered dimension, Spark must still prune the fact scan at
    runtime (dynamicpruning subquery in the partition filters). This is
    the scan-avoidance path for star joins at 100 TB."""
    from cvemate_spark.plans.audit import physical_plan
    from cvemate_spark.tables import load_table

    path = str(tmp_path / "orders_by_status")
    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    # the selective predicate must sit on a NON-join dim column: a
    # filter on the join key itself would constant-propagate into a
    # static partition filter and DPP would have nothing to do
    dim = spark.createDataFrame(
        [("F", 1), ("O", 0), ("P", 0)], ["o_orderstatus", "flag"]
    ).filter("flag = 1")
    joined = fact.join(dim.hint("broadcast"), "o_orderstatus")
    plan = physical_plan(joined).lower()
    assert "dynamicpruning" in plan
    assert joined.count() == orders.filter("o_orderstatus = 'F'").count() > 0


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution: a landing zone accumulates files written under
    different schema versions (a feed adds a column mid-stream). The
    reader must reconcile them (mergeSchema), old files yielding NULL
    for the new column — silent column loss is how pipelines corrupt
    history."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id").alias("k")).write.parquet(f"{base}/v1")
    spark.range(5, 8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    ).write.parquet(f"{base}/v2")
    df = spark.read.option("mergeSchema", "true").parquet(f"{base}/v1", f"{base}/v2")
    assert set(df.columns) == {"k", "extra"}
    rows = {r["k"]: r["extra"] for r in df.collect()}
    assert rows[0] is None and rows[7] == 70


def test_runtime_bloom_filter_reaches_fact_side(spark):
    """Runtime-filter story for the shuffle-join regime: when the dim
    side carries a selective predicate and broadcast is off (the 100-TB
    fact⋈fact shape), Catalyst must inject a bloom filter that prunes
    the fact side BEFORE its shuffle — the engine's join shapes have to
    stay eligible for it (equi-join on a raw column, no UDF on the
    key). Pins `might_contain` on the application side and the
    `bloom_filter_agg` build on the creation side."""
    from pyspark.sql import functions as F

    from cvemate_spark.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = physical_plan(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_curation_sketch_layout_plan_shapes(spark):
    """The new curation/sketch/layout gates stay JVM-side and keep
    their scale-critical shapes: partial+final agg for the sketch build
    with its bounded-relation broadcast, distributed top-k for the
    z-key query, and NO forced broadcast of dedup_paragraph's
    corpus-sized per-block count relation."""
    for name in ("t_gopher", "dedup_paragraph", "e_cms", "e_zorder"):
        assert_jvm_only(plan_of(spark, name), name)

    p = plan_of(spark, "e_cms")
    assert p.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in p

    p = plan_of(spark, "e_zorder")
    assert "TakeOrderedAndProject" in p

    logical = analyzed_plan(REGISTRY.specs["dedup_paragraph"].builder(spark, SF))
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_bucket_pruning_for_point_lookup(spark, tmp_path):
    """SNK-4 point-lookup path: a key-equality filter on a bucketed
    table must prune to ONE bucket (SelectedBucketsCount 1 out of N) —
    the scan reads 1/N of the files, the layout-level analog of the
    reference's primary-key index. autoBucketedScan is disabled for
    the probe because the planner otherwise drops bucketed scanning
    when nothing downstream consumes the distribution."""
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        spark.sql("DROP TABLE IF EXISTS bucket_prune_probe")
        (
            spark.range(1000)
            .withColumn("k", F.col("id") % 50)
            .write.bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable("bucket_prune_probe")
        )
        plan = physical_plan(spark.table("bucket_prune_probe").filter("k = 7"))
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
        spark.sql("DROP TABLE IF EXISTS bucket_prune_probe")


def test_nested_schema_pruning_reaches_scan(spark, tmp_path):
    """Nested-column pruning: selecting one field of a struct column
    (the cve table is all nested structs) must narrow ReadSchema to
    that field — reading the full struct for a one-field projection
    multiplies scan bytes by the struct width at 100 TB."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "nested")
    (
        spark.range(100)
        .select(
            F.struct(
                F.col("id").alias("a"), (F.col("id") * 2).alias("wide_unused")
            ).alias("s")
        )
        .write.parquet(path)
    )
    plan = physical_plan(spark.read.parquet(path).select("s.a"))
    assert "ReadSchema: struct<s:struct<a:bigint>>" in plan
    assert "wide_unused" not in plan


def test_round2_analysis_ops_plan_shapes(spark):
    """Graph/substring/classifier/PQ gates keep their scale shapes:
    all JVM-side (t_compress is the one declared Arrow stage), no
    cartesian products, PQ's codebook and distance table broadcast,
    classifier/substring aggs partial+final, pagerank top-k
    distributed."""
    for name in ("g_pagerank", "dedup_substring", "t_classify", "emb_pq",
                 "src_orc"):
        plan = plan_of(spark, name)
        assert_jvm_only(plan, name)
        assert_no_pathological_join(plan, name)

    p = plan_of(spark, "emb_pq")
    assert p.count("BroadcastHashJoin") >= 2  # codebook (encode) + qd table
    assert "SortMergeJoin" not in p

    p = plan_of(spark, "t_classify")
    assert p.count("HashAggregate") >= 2  # partial map-side + final

    p = plan_of(spark, "g_pagerank")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p

    # substring join-back carries no forced broadcast of the
    # corpus-sized window-count relation (AQE decides)
    logical = analyzed_plan(REGISTRY.specs["dedup_substring"].builder(spark, SF))
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_subquery_decorrelation_shapes(spark):
    """EXISTS becomes a semi join; the correlated scalar aggregate
    becomes partkey-keyed aggregates joined back — never a per-row
    re-execution or cartesian product."""
    p = plan_of(spark, "q29")
    assert "SemiJoin" in p or "LeftSemi" in p
    assert "CartesianProduct" not in p

    p = plan_of(spark, "q30")
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p
    assert_jvm_only(p, "q30")


def test_not_in_is_null_aware_anti_join(spark):
    p = plan_of(spark, "q31")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_round2b_plan_shapes(spark):
    """winnow/entropy/merge-delete/batch-PQ stay JVM-side with their
    scale shapes: windows partitioned by doc/qid (never unpartitioned),
    partial+final aggs, no cartesian products."""
    for name in ("t_winnow", "t_entropy", "e_merge_delete", "ann_pq_batch"):
        plan = plan_of(spark, name)
        assert_jvm_only(plan, name)
        assert_no_pathological_join(plan, name)

    # an unpartitioned window would serialize the whole corpus through
    # one task — pin that every windowspecdefinition in these plans
    # carries the doc_id partition key
    import re

    for name in ("t_winnow", "t_entropy"):
        p = plan_of(spark, name)
        specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
        assert specs, name
        assert all(s.startswith("doc_id") for s in specs), (name, specs)
    p = plan_of(spark, "ann_pq_batch")
    assert p.count("BroadcastHashJoin") >= 2


def test_curate_pipeline2_is_two_shuffles_one_scan(spark):
    """The composition law: four curation signals ride ONE parquet scan
    (row-local folds), and the whole pipeline is exactly two exchanges
    (digest window + final agg) — adding a signal must not add a pass."""
    import re

    p = plan_of(spark, "curate_pipeline2")
    assert_jvm_only(p, "curate_pipeline2")
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1
    # (the third exchange is the output ORDER BY's rangepartitioning —
    # the determinism contract, not pipeline work)
    assert len(re.findall(r"Arguments: hashpartitioning", p)) <= 2


def test_bloom_semi_prefilter_is_broadcast(spark):
    """The explicit hash-mod prefilter must reach the fact side as a
    BroadcastHashJoin (bounded bit relation), never a shuffle."""
    p = plan_of(spark, "e_bloom_semi")
    assert p.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in p
    assert_jvm_only(p, "e_bloom_semi")


def test_interval_bin_join_is_hash_not_bnlj(spark):
    """The bin rewrite must make the unkeyed interval join a hash
    join; a BroadcastNestedLoopJoin or cartesian product means the
    rewrite regressed to points x intervals."""
    p = plan_of(spark, "e_interval_bin")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_topn_group_uses_window_group_limit(spark):
    """The rank<=k filter must compile to WindowGroupLimit — Spark
    keeps a bounded per-group heap (partial BEFORE the shuffle and
    final after), never ranks-then-filters the full partition."""
    import re

    p = plan_of(spark, "e_topn_group")
    assert len(re.findall(r"^\(\d+\) WindowGroupLimit", p, re.M)) >= 2


def test_grouping_sets_single_expand_pass(spark):
    """Three aggregation grains from ONE scan via Expand — a plan that
    re-scanned per grain would triple the corpus reads."""
    import re

    p = plan_of(spark, "e_grouping_sets")
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1
    assert "Expand" in p


def test_parquet_aggregate_pushdown_metadata_only_scan(spark):
    """COUNT/MIN/MAX with no filter must come from parquet FOOTERS, not
    row data (DSv2 + spark.sql.parquet.aggregatePushdown): the scan
    shows PushedAggregation and reads zero data pages. At 100 TB this
    turns full-table audit queries (row counts, key ranges, freshness
    watermarks) into metadata-only operations — milliseconds against
    manifests instead of a petabyte scan. Isolated in its own session:
    the v2 reader list is session-wide and every other plan pin in
    this suite asserts against the v1 FileScan shape."""
    import pyspark.sql.functions as F

    s = spark.newSession()
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    df = (
        s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(
            F.count("*").alias("n"),
            F.min("l_orderkey").alias("k_min"),
            F.max("l_orderkey").alias("k_max"),
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation" in plan, plan
    assert "COUNT(*)" in plan and "MIN(l_orderkey)" in plan
    row = df.collect()[0]
    base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert row["n"] == base.count()
    truth = base.agg(
        F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
    ).collect()[0]
    assert (row["k_min"], row["k_max"]) == (truth["lo"], truth["hi"])


def test_minhash_signatures_are_shuffle_free(spark):
    """The minhash signature relation must fold ROW-LOCALLY over the
    shingle array (minhash_signatures_local): exactly one Exchange in
    its plan — the explicit doc-id repartition — and zero
    HashAggregates. The groupBy(min) formulation this replaced put a
    per-doc aggregation exchange in front of the band join; at 100 TB
    that shuffles the entire hashed-shingle stream for an associative
    fold that never needed to leave its row."""
    from cvemate_spark.operators.dedup import (
        doc_shingle_arrays,
        minhash_signatures_local,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(minhash_signatures_local(doc_shingle_arrays(docs)))
    # formatted plans print each node twice (tree line + detail block)
    assert plan.count("Exchange") == 2, plan
    assert "HashAggregate" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_minhash_verify_is_array_local(spark):
    """The Jaccard verify must not re-explode shingles: the full
    dedup_minhash plan contains the band-join candidate aggregation
    (distinct) but NO per-pair count aggregation afterwards — the
    intersection is an array_intersect expression. Pin: at most two
    HashAggregate pairs (the candidate distinct's partial+final),
    and no Generate (explode) downstream of the first join."""
    plan = plan_of(spark, "dedup_minhash")
    # distinct = one partial+final pair (each printed twice in the
    # formatted plan); the signature path contributes none
    assert plan.count("HashAggregate") <= 4, plan
    assert "array_intersect" in plan, plan


def test_round8_ops_plan_shapes(spark):
    """Round-8 gates keep their scale shapes: the prefix-filter join
    and containment decontamination stay all-JVM with no pathological
    joins; dedup_prefix's candidate legs are equi-joins (never a
    cartesian); t_decontam_containment's bench side arrives by
    broadcast at test scale (a fixed-size suite at any scale)."""
    for name in ("dedup_prefix", "dedup_prefix_neardup",
                 "t_decontam_containment", "e_merge_scoped"):
        plan = plan_of(spark, name)
        assert_jvm_only(plan, name)
        assert_no_pathological_join(plan, name)

    p = plan_of(spark, "t_decontam_containment")
    assert "BroadcastHashJoin" in p, p
    # the prefix join verifies via integer cross-multiplication: no
    # float comparison enters the filter (jaccard is output-only)
    p = plan_of(spark, "dedup_prefix")
    assert "round(" in p.lower()  # the output column
    assert (
        "SortMergeJoin" in p
        or "BroadcastHashJoin" in p
        or "ShuffledHashJoin" in p
    )


def test_unbounded_bnlj_policy_trips_and_passes(spark):
    """P3 pin (VERDICT r8 item 5): the plan audit's named invariant
    "BroadcastNestedLoopJoin only when the broadcast side is bounded
    by construction" must actually FIRE on a deliberately unbounded
    BNLJ (broadcasting a raw parquet relation under a non-equi join)
    and stay silent on the three bounded shapes the fleet uses: a
    Range spine, a scalar aggregate, and driver-materialized rows."""
    from pyspark.sql import functions as F

    from tools.plan_audit import unbounded_bnlj_count

    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")

    # unbounded: broadcast side scans a data relation with no bound
    bad = o.join(c.hint("broadcast"), o.o_totalprice > c.c_acctbal)
    assert unbounded_bnlj_count(bad) == 1

    # bounded: small Range spine
    assert unbounded_bnlj_count(o.crossJoin(F.broadcast(spark.range(5)))) == 0
    # bounded: scalar aggregate (one row by construction)
    avg1 = c.agg(F.avg("c_acctbal").alias("a"))
    assert unbounded_bnlj_count(
        o.join(F.broadcast(avg1), o.o_totalprice > avg1.a)
    ) == 0
    # bounded: driver-materialized rows (the collected-centroids shape)
    local = spark.createDataFrame([(1.0,), (2.0,)], ["t"])
    assert unbounded_bnlj_count(
        o.join(F.broadcast(local), o.o_totalprice > local.t)
    ) == 0
    # bounded: a LIMIT over a data relation
    assert unbounded_bnlj_count(
        o.join(c.limit(10).hint("broadcast"), o.o_totalprice > c.c_acctbal)
    ) == 0


def test_unbounded_bnlj_allowance_pins(spark):
    """The P3 allowance ledger: every pinned query's structural count
    equals its pin EXACTLY (a drop means the pin should shrink, a rise
    is a violation), and audit_one fires on an unpinned query with an
    unbounded BNLJ. Join-strategy confs are pinned to the audit
    session's defaults first — earlier tests in the session legally
    mutate them, and the ledger is defined against the audit context."""
    from tools.plan_audit import (
        P3_DOMAIN_BOUNDED, audit_one, unbounded_bnlj_count,
    )

    pinned = {
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.adaptive.enabled": "true",
    }
    saved = {k: spark.conf.get(k) for k in pinned}
    for k, v in pinned.items():
        spark.conf.set(k, v)
    try:
        counts = {}
        for name, (allowed, _why) in sorted(P3_DOMAIN_BOUNDED.items()):
            df = REGISTRY.specs[name].builder(spark, SF)
            counts[name] = (unbounded_bnlj_count(df), allowed)
        # never MORE than the pin (a rise is the P3 violation); session
        # residue from earlier tests can legally shrink a count here —
        # exact ledger equality is enforced by tools/plan_audit.py in
        # its own controlled session (committed PLANAUDIT.json)
        over = {n: c for n, (c, a) in counts.items() if c > a}
        assert not over, over
        assert any(c == a > 0 for c, a in counts.values())  # ledger live
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    class FakeSpec:
        @staticmethod
        def builder(spark_, sf_dir):
            o = spark_.read.parquet(f"{sf_dir}/orders.parquet")
            c = spark_.read.parquet(f"{sf_dir}/customer.parquet")
            return o.join(c.hint("broadcast"), o.o_totalprice > c.c_acctbal)

    res = audit_one(spark, FakeSpec, SF, name="not_pinned")
    assert res["unbounded_bnlj"] == 1
    assert any(v.startswith("P3") for v in res["violations"])


def test_retrieval_leg_windows_ride_bounded_topk(spark):
    """The remaining unpartitioned windows in the registry live in the
    stats_ops retrieval legs (rank = row_number over a global ORDER
    BY): safe by construction because each window's input is the
    orderBy().limit(RRF_LEG_K) relation, which compiles to
    TakeOrderedAndProject — a <= RRF_LEG_K-row single-partition
    relation, so the one-task window is the correct plan, not a scale
    liability. Pin: every window in these plans is the rank window,
    and the plan carries one bounded TakeOrderedAndProject per window
    (VERDICT r12 item 8)."""
    import re

    from cvemate_spark.queries.stats_ops import RRF_LEG_K

    for name in ("retr_rrf", "retr_rrf_ivf"):
        p = plan_of(spark, name)
        specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
        assert specs, name  # the unpartitioned-window site exists
        # all of them are the global rank windows: first arg is a sort
        # column (direction keyword), never a partition key
        assert all(
            " ASC" in s.split(",")[0] or " DESC" in s.split(",")[0]
            for s in specs
        ), (name, specs)
        # every Window node's immediate child in the plan tree is a
        # TakeOrderedAndProject — the bounded (<= RRF_LEG_K rows)
        # relation the unpartitioned window is safe over
        tree = [
            ln for ln in p.splitlines()
            if re.search(r"(Window|TakeOrderedAndProject) \(\d+\)", ln)
        ]
        win_lines = [
            i for i, ln in enumerate(tree) if re.search(r"Window \(", ln)
        ]
        assert win_lines, name
        for i in win_lines:
            assert i + 1 < len(tree) and "TakeOrderedAndProject" in tree[
                i + 1
            ], (name, tree)
        # and those TakeOrdereds carry the leg's K as their limit
        # (formatted-explain details print it as "Arguments: <k>, ...")
        # (the plan also carries the query's own output top-k as a
        # final TakeOrderedAndProject — only the window-feeding legs
        # must carry the leg's K)
        args = re.findall(
            r"TakeOrderedAndProject\nInput[^\n]*\nArguments: (\d+),", p
        )
        assert sum(1 for x in args if int(x) == RRF_LEG_K) >= len(
            win_lines
        ), (name, args)


def test_q10_band_join_is_single_exchange_window(spark):
    """q10's interval band self-join runs as ONE user_id exchange and a
    RANGE-frame window count (optimization r13, guide §2.4) — never a
    second scan/shuffle/broadcast of the events relation and never a
    join. The O(n) two-pointer frame is the only shape that survives
    100 TB, where neither self-join side broadcasts."""
    import re

    plan = plan_of(spark, "q10")
    assert "Window" in plan
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan, bad
    # one parquet scan of events, total
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
