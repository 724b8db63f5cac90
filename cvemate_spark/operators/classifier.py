"""Distributed trainer for the hashed-feature text quality classifier.

The inference side (`t_classify` / `curate_pipeline2`) scores documents
with a 4096-bucket hashing-trick linear model — the fastText-style
quality-classifier filter every large corpus-curation pipeline runs
(reference parity: none — this is §Phase-4 LLM-pipeline surface; the
reference has no model training of any kind).

This module adds the TRAINING loop, shaped like `kmeans_fit`
(operators/similarity.py): per iteration exactly ONE distributed job,
and only `n_buckets` rows ever return to the driver — corpus size
never touches driver memory.

Determinism doctrine (the same one the engine's aggregates follow):
floating-point sums across partitions are order-dependent, so a naive
float gradient would make training results depend on partition layout
and cluster size. Here every per-document gradient contribution is
quantized to integer micro-units BEFORE aggregation, the cross-row sum
is an exact BIGINT sum, and the weight update happens on the driver in
integer arithmetic — so the trained weights are bit-identical under
any repartitioning (law-tested), and a training run is reproducible on
a laptop and a 1000-executor cluster alike.

Scale shape per iteration:
  - weights enter as a broadcast 4096-row relation (bounded by
    construction, like the t_domain lexicon — never corpus-sized);
  - margin = one token explode + doc_id-keyed partial-agg'd sum;
  - per-doc sigmoid is ROW-LOCAL float math (deterministic per row,
    no cross-row float accumulation);
  - gradient = one bucket-keyed partial-agg'd BIGINT sum -> 4096 rows.
Two keyed shuffles per iteration, both map-side combinable; the token
explode re-runs per iteration unless the caller persists the
featurized relation (done in `classifier_fit`), mirroring the
persist-static-relations lesson from PageRank/k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_BUCKETS = 4096
W_SCALE = 1_000_000  # weights in micro-units (integer)
G_SCALE = 1_000_000  # per-doc gradient contributions in micro-units

_TERM_BUCKET = (
    "cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint) % {b}"
)


def featurize(docs: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, bucket, cnt): sparse hashed bag-of-words features.

    Same 60-bit md5 term hash as t_classify, so a model trained here
    drops into the inference query as the bucket->weight broadcast dim
    with no re-featurization.
    """
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        tok.select(
            "doc_id",
            F.expr(_TERM_BUCKET.format(b=n_buckets)).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def weights_df(spark, weights: list[int]) -> DataFrame:
    """The model as a (bucket, w) relation — n_buckets rows by
    construction, so the explicit broadcast is structurally safe (the
    t_domain-lexicon rule). A literal-array encoding was measured and
    rejected: 4096 literals inflate every iteration's plan tree, and
    the broadcast dim is what a served model looks like anyway."""
    return spark.createDataFrame(
        [(i, int(w)) for i, w in enumerate(weights)], "bucket long, w long"
    )


def _margins(feats: DataFrame, weights: list[int]) -> DataFrame:
    """(doc_id, margin): w.x via a broadcast join + one keyed agg.

    Zero-weight buckets still produce rows (w=0 contributes 0), and
    every feature bucket is in [0, n_buckets), so the inner join
    drops nothing."""
    wdf = weights_df(feats.sparkSession, weights)
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .select("doc_id", (F.col("w") * F.col("cnt")).alias("c"))
        .groupBy("doc_id")
        .agg((F.sum("c").cast("double") / float(W_SCALE)).alias("margin"))
    )


def gradient_step(
    feats: DataFrame,
    labels: DataFrame,
    weights: list[int],
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """One logistic-loss gradient as a (bucket, g) relation.

    g[bucket] = sum over docs of round((sigmoid(margin) - y) * cnt *
    G_SCALE) — the rounding happens PER (doc, bucket) row (row-local,
    deterministic), the sum is an exact BIGINT sum (order-free). With
    zero weights sigmoid(0) = 0.5 exactly, so the first step is pure
    rational arithmetic and has an exact SQL oracle (t_classify_grad).
    """
    m = _margins(feats, weights)
    err = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))) - F.col("y")
    per_row = (
        feats.join(m, "doc_id")
        .join(labels, "doc_id")
        .select(
            "bucket",
            F.round(err * F.col("cnt") * G_SCALE).cast("long").alias("gq"),
        )
    )
    return per_row.groupBy("bucket").agg(F.sum("gq").alias("g"))


def classifier_fit(
    docs: DataFrame,
    labels: DataFrame,
    n_buckets: int = N_BUCKETS,
    iters: int = 8,
    lr_num: int = 4,
    lr_den: int = 1,
) -> list[int]:
    """Train integer weights by full-batch gradient descent.

    labels: (doc_id, y) with y in {0, 1} (0/1 integers; cast to double
    in the gradient). Returns micro-unit integer weights, length
    n_buckets. Learning rate is the rational lr_num/lr_den so the
    driver-side update w -= lr * g / n stays in integer arithmetic —
    no float ever enters the persisted model state.
    """
    feats = featurize(docs, n_buckets).persist()
    lab = labels.select("doc_id", F.col("y").cast("double").alias("y"))
    n_docs = lab.count()
    w = [0] * n_buckets
    for _ in range(iters):
        rows = gradient_step(feats, lab, w, n_buckets).collect()
        for r in rows:
            # integer update in micro-unit space, truncated TOWARD
            # ZERO: plain // floors toward -inf, so a tiny negative
            # gradient sum would still bump the weight a full
            # micro-unit while the equal-magnitude positive one
            # truncates to nothing — a systematic positive bias.
            # Symmetric truncation keeps the update exact, unbiased
            # and deterministic (G_SCALE cancels against W_SCALE).
            num, den = lr_num * int(r["g"]), lr_den * n_docs
            step = abs(num) // den
            w[int(r["bucket"])] -= step if num >= 0 else -step
    feats.unpersist()
    return w


def predict(docs: DataFrame, weights: list[int], n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, score_u, label): score in micro-units (exact BIGINT)."""
    feats = featurize(docs, n_buckets)
    wdf = weights_df(docs.sparkSession, weights)
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .select("doc_id", (F.col("w") * F.col("cnt")).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("score_u"))
        .select(
            "doc_id",
            "score_u",
            F.when(F.col("score_u") > 0, F.lit("pos")).otherwise(F.lit("neg")).alias("label"),
        )
    )
