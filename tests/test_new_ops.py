"""Unit tests for the newer operator surface: landing determinism,
hyperplane-LSH ANN, multimodal resize/frame-sample plumbing."""

from __future__ import annotations

import hashlib

import pytest

from cvemate_spark.operators import multimodal
from cvemate_spark.operators.similarity import lsh_topk
from cvemate_spark.sources import landing
from cvemate_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _digest(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def test_landing_generation_deterministic(tmp_path, monkeypatch):
    monkeypatch.setattr(landing, "SCRATCH", str(tmp_path / "a"))
    first = {
        "epss": _digest(landing.gen_epss_csv(SF)),
        "kev": _digest(landing.gen_kev_json(SF)),
        "zip": _digest(landing.gen_cveorg_zip(SF)),
        "xml": _digest(landing.gen_cwe_xml(SF)),
    }
    monkeypatch.setattr(landing, "SCRATCH", str(tmp_path / "b"))
    second = {
        "epss": _digest(landing.gen_epss_csv(SF)),
        "kev": _digest(landing.gen_kev_json(SF)),
        "zip": _digest(landing.gen_cveorg_zip(SF)),
        "xml": _digest(landing.gen_cwe_xml(SF)),
    }
    assert first == second


def test_lsh_topk_contains_query_vector(spark):
    emb = load_table(spark, SF, "embeddings")
    ids = [r[0] for r in lsh_topk(emb, query_vec_id=0, k=10).collect()]
    # the query vector has cosine 1.0 with itself and always shares its
    # own bucket, so it must rank first
    assert ids[0] == 0
    assert len(ids) == len(set(ids)) <= 10


def test_resize_plan_bounds(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = multimodal.attach_payload(docs)
    rows = multimodal.resize_plan(media, max_dim=256).collect()
    assert rows
    for r in rows:
        assert 0 <= r["rs_w"] <= 256 and 0 <= r["rs_h"] <= 256
        # no upscaling: dims <= max_dim stay unchanged
        if max(r["width"], r["height"]) <= 256:
            assert (r["rs_w"], r["rs_h"]) == (r["width"], r["height"])


def test_sample_frames_stride(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = multimodal.attach_payload(docs)
    frames = multimodal.sample_frames(media, stride=2).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    metas = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    for doc_id, idxs in by_doc.items():
        n = metas[doc_id]["n_frames"]
        assert sorted(idxs) == list(range(0, n, 2))


def test_decode_without_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")


def test_json_sink_roundtrip(spark, tmp_path):
    """SNK-3: debug-snapshot JSON sink (utils.py:33-54 shape) — write a
    keyed frame as JSON lines, read back value-identical."""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang").limit(20)
    out = str(tmp_path / "snap.json")
    docs.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    assert {tuple(r) for r in back.select("doc_id", "lang").collect()} == {
        tuple(r) for r in docs.collect()
    }
