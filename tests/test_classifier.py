"""Laws for the hashed-feature classifier trainer (operators/classifier.py).

The iterative loop has no SQL oracle (sigmoid of nonzero margins), so
its guarantees are pinned here, the kmeans_fit pattern:
  - it LEARNS: on a corpus with a planted vocabulary signal, trained
    weights separate the classes that the zero model cannot;
  - loss is monotone non-increasing over full-batch GD iterations;
  - determinism: weights are bit-identical under different partition
    layouts (the integer-quantized-gradient doctrine — a float
    gradient sum would break this under shuffle-order change).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cvemate_spark.operators.classifier import (
    W_SCALE,
    classifier_fit,
    featurize,
    gradient_step,
    predict,
)

POS_WORDS = "excellent clear thorough precise rigorous"
NEG_WORDS = "spam junk clickbait garbled filler"


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rows = []
    for i in range(120):
        if i % 2 == 0:
            text = f"{POS_WORDS} document number {i} body text"
            y = 1
        else:
            text = f"{NEG_WORDS} document number {i} body text"
            y = 0
        rows.append((i, text, y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _loss(docs_with_labels, weights):
    """Driver-side logistic loss over the small test corpus."""
    from cvemate_spark.operators.classifier import _margins

    m = _margins(featurize(docs_with_labels), weights)
    rows = m.join(docs_with_labels.select("doc_id", "y"), "doc_id").collect()
    tot = 0.0
    for r in rows:
        z = r["margin"]
        # log(1 + exp(-z)) stable form
        tot += math.log1p(math.exp(-abs(z))) + max(0.0, -z if r["y"] else z)
    return tot / len(rows)


def test_trainer_learns_planted_signal(labeled_docs):
    labels = labeled_docs.select("doc_id", "y")
    w = classifier_fit(labeled_docs, labels, iters=6)
    pred = predict(labeled_docs, w).join(labels, "doc_id")
    acc = (
        pred.select(
            (
                ((F.col("label") == "pos") & (F.col("y") == 1))
                | ((F.col("label") == "neg") & (F.col("y") == 0))
            ).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, f"trained accuracy {acc}"


def test_loss_monotone_over_iterations(labeled_docs):
    labels = labeled_docs.select("doc_id", "y")
    losses = [_loss(labeled_docs, [0] * 4096)]
    for it in (2, 4, 6):
        w = classifier_fit(labeled_docs, labels, iters=it)
        losses.append(_loss(labeled_docs, w))
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), losses


def test_weights_invariant_under_repartitioning(labeled_docs):
    labels = labeled_docs.select("doc_id", "y")
    w3 = classifier_fit(labeled_docs.repartition(3), labels, iters=3)
    w7 = classifier_fit(labeled_docs.repartition(7), labels.repartition(5), iters=3)
    assert w3 == w7


def test_first_gradient_matches_rational_form(labeled_docs):
    """From zero weights the gradient is (1/2 - y)*cnt in micro-units —
    the exact arithmetic the t_classify_grad oracle uses."""
    labels = labeled_docs.select("doc_id", "y")
    g = {
        r["bucket"]: r["g"]
        for r in gradient_step(featurize(labeled_docs), labels, [0] * 4096).collect()
    }
    expected = {}
    for r in (
        featurize(labeled_docs)
        .join(labels, "doc_id")
        .select("bucket", ((F.lit(500000) - F.lit(1000000) * F.col("y")) * F.col("cnt")).alias("gq"))
        .groupBy("bucket")
        .agg(F.sum("gq").alias("g"))
        .collect()
    ):
        expected[r["bucket"]] = r["g"]
    assert g == expected
