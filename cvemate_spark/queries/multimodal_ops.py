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
