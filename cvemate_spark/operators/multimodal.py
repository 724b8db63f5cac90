"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the 100 TB training-data shape):
- media rides in an opaque `payload: binary` column next to typed
  metadata (`media_type`, `n_bytes`, `digest`); parquet stores the
  bytes page-compressed and Spark never interprets them until an
  explicit decode stage;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` stages — bytes stay in Arrow buffers end to end, one
  Python roundtrip per *batch*, not per row;
- the actual codec calls are STUBBED here (no image/audio libs in this
  container): `decode_image` raises NotImplementedError unless handed
  a codec. The Spark-side plumbing — schema, batch iteration,
  partitioning — is real, and the boundary is proven twice over: the
  deterministic `fake_decode` (tests/oracle), and `bmp_codec` — a real
  library-free BMP header decoder, showing a production codec drops in
  with no plumbing changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, payload binary"
META_SCHEMA = "doc_id long, media_type string, n_bytes long, digest string"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, digest string, "
    "width int, height int, n_frames int"
)


def attach_payload(docs: DataFrame, media_type: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload column."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Byte-level metadata via mapInPandas (Arrow-batched, no decode)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(batches, schema=META_SCHEMA)


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake codec for tests: 'decodes' byte length into
    a (width, height, n_frames) tuple."""
    n = len(payload)
    return {"width": n % 640, "height": n % 480, "n_frames": 1 + n % 8}


def bmp_codec(payload: bytes) -> dict:
    """A REAL decoder for one format, zero libraries: BMP dimensions
    straight from the BITMAPINFOHEADER (bytes 18-25 of the file, public
    spec). Proves the codec-injection boundary carries an actual codec,
    not only the test fake — `extract_features(media, codec=bmp_codec)`
    runs the same Arrow mapInPandas plumbing end to end. Still images:
    n_frames is always 1.

    Raises ValueError on a non-BMP payload (magic != 'BM' or truncated
    header) — malformed media should fail loudly at the decode stage,
    not propagate garbage dimensions downstream.
    """
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    # negative height encodes top-down row order in the spec
    return {"width": width, "height": abs(height), "n_frames": 1}


def decode_image(payload: bytes, codec: Callable[[bytes], dict] | None = None) -> dict:
    """Decode an image/video payload to typed features.

    STUB: real decoding needs an image library that is not in this
    container. Pass `codec=fake_decode` (tests) or a real codec; with
    no codec this raises, making the stub boundary explicit.
    """
    if codec is None:
        raise NotImplementedError(
            "no image/audio codec available in this environment; "
            "pass codec= (e.g. multimodal.fake_decode) explicitly"
        )
    return codec(payload)


def extract_features(
    media: DataFrame, codec: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Decode-stage plumbing: metadata + per-payload decoded features."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda b: decode_image(bytes(b), codec))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": feats.map(lambda d: d["width"]).astype("int32"),
                    "height": feats.map(lambda d: d["height"]).astype("int32"),
                    "n_frames": feats.map(lambda d: d["n_frames"]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, rs_w int, rs_h int"
FRAME_SCHEMA = "doc_id long, frame_idx int, digest string"


def resize_plan(
    media: DataFrame, max_dim: int = 256, codec: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Resize stage plumbing: decode dims, compute the letterbox-fit
    target size (integer math so the oracle can reproduce it). The
    actual pixel resample is part of the stubbed codec boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_image(bytes(payload), codec)
                w, h = d["width"], d["height"]
                denom = max(w, h, max_dim)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "rs_w": w * max_dim // denom,
                        "rs_h": h * max_dim // denom,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "rs_w", "rs_h"]
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, stride: int = 2, codec: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame index
    (0, stride, 2*stride, … < n_frames) — the UDTF shape (1 payload →
    N frames). Frame 'content' is a deterministic digest of
    payload+index so the gate can verify the fan-out exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                d = decode_image(b, codec)
                for idx in range(0, d["n_frames"], stride):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "digest": hashlib.md5(
                                b + str(idx).encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "digest"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
