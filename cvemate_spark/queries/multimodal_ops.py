"""Multimodal query surface: binary-column metadata extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_payload, extract_metadata
from ..tables import load_table
from .base import Registry

REG = Registry()


@REG.add(
    "mm_meta",
    """
    SELECT doc_id, 'text' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    ORDER BY doc_id, media_type, n_bytes, digest
    """,
    doc="Multimodal plumbing: text wrapped as an opaque binary payload, "
    "byte-level metadata (length + md5) extracted by an Arrow-batched "
    "mapInPandas stage — the real decode path with the codec stubbed.",
)
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    return extract_metadata(media).orderBy("doc_id", "media_type", "n_bytes", "digest")


@REG.add(
    "mm_features",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST(octet_length(encode(text)) % 480 AS INT) AS height,
           CAST(1 + octet_length(encode(text)) % 8 AS INT) AS n_frames,
           CAST((octet_length(encode(text)) % 640) * 256
                // greatest(octet_length(encode(text)) % 640,
                            octet_length(encode(text)) % 480, 256)
                AS INT) AS rs_w,
           CAST((octet_length(encode(text)) % 480) * 256
                // greatest(octet_length(encode(text)) % 640,
                            octet_length(encode(text)) % 480, 256)
                AS INT) AS rs_h
    FROM documents
    ORDER BY doc_id, width, height, n_frames, rs_w, rs_h
    """,
    doc="Multimodal decode + resize plumbing: mapInPandas decode stage "
    "(deterministic fake codec standing in for the image lib) plus the "
    "integer letterbox-fit resize plan; oracle rebuilds the codec's "
    "outputs from byte lengths.",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import extract_features, resize_plan

    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    feats = extract_features(media).select("doc_id", "width", "height", "n_frames")
    rs = resize_plan(media).select("doc_id", "rs_w", "rs_h")
    return (
        feats.join(rs, "doc_id")
        .select("doc_id", "width", "height", "n_frames", "rs_w", "rs_h")
        .orderBy("doc_id", "width", "height", "n_frames", "rs_w", "rs_h")
    )


@REG.add(
    "mm_frames",
    """
    SELECT doc_id, CAST(idx AS INT) AS frame_idx,
           md5(text || CAST(idx AS VARCHAR)) AS digest
    FROM documents,
         unnest(range(0, 1 + octet_length(encode(text)) % 8, 2)) AS t(idx)
    ORDER BY doc_id, frame_idx, digest
    """,
    doc="Multimodal frame sampling: one row per sampled frame index "
    "(UDTF shape, stride 2) via mapInPandas; frame digests are "
    "payload+index md5 so the oracle verifies the exact fan-out.",
)
def mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    return sample_frames(media).orderBy("doc_id", "frame_idx", "digest")
