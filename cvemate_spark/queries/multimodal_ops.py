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


@REG.add(
    "mm_dedup",
    """
    SELECT digest,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dup,
           CAST(sum(CAST(octet_length(encode(text)) AS BIGINT))
                AS BIGINT) AS bytes_total
    FROM (
        SELECT doc_id, text, md5(text) AS digest FROM documents
    )
    GROUP BY digest
    ORDER BY digest, keep_id, n_dup, bytes_total
    """,
    doc="Binary-payload exact dedup (the image/audio-pipeline form of "
    "dedup_exact): the opaque payload column is hashed AT THE BYTES "
    "(md5 over binary, computed inside the same Arrow mapInPandas "
    "stage that owns the payload — the digest is a by-product of the "
    "metadata pass, no second scan), then hash-groupBy keeps min id "
    "and accounts the reclaimable duplicate bytes. At 100 TB of "
    "media this is always the FIRST dedup: bytes-identical payloads "
    "are the bulk of crawl duplication and the digest costs nothing "
    "beyond the scan already extracting metadata.",
)
def mm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    meta = extract_metadata(attach_payload(docs))  # (doc_id, ..., n_bytes, digest)
    return (
        meta.groupBy("digest")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            (F.count("*") - 1).cast("long").alias("n_dup"),
            F.sum("n_bytes").cast("long").alias("bytes_total"),
        )
        .orderBy("digest", "keep_id", "n_dup", "bytes_total")
    )


@REG.add(
    "mm_png",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 9 + 1 AS INT) AS width,
           CAST(octet_length(encode(text)) % 5 + 1 AS INT) AS height,
           CAST(1 AS INT) AS n_frames
    FROM documents
    ORDER BY doc_id, width, height, n_frames
    """,
    doc="REAL image decode through the multimodal plumbing: per doc, a "
    "genuine PNG payload is written (png_encode: zlib-deflated, "
    "CRC-stamped chunks) with dimensions derived from the text's byte "
    "length, then decoded back by the format-sniffing decode path "
    "(png_codec: CRC-verified chunk walk + IHDR) inside the same "
    "Arrow mapInPandas feature stage every codec uses. The oracle "
    "recomputes the construction rule; a decoder that misread any "
    "chunk, dimension, or byte order would mismatch. Closes the "
    "round-4 'no real image codec' boundary (the full pixel "
    "inflate+de-filter law lives in tests/test_new_ops.py).",
)
def mm_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import MEDIA_SCHEMA, extract_features, png_encode

    docs = load_table(spark, sf_dir, "documents")

    def to_png(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": [
                        png_encode(
                            np.full(
                                (int(k) % 5 + 1, int(k) % 9 + 1, 3),
                                int(k) % 256,
                                dtype=np.uint8,
                            )
                        )
                        for k in n
                    ],
                }
            )

    media = docs.mapInPandas(to_png, schema=MEDIA_SCHEMA)
    return (
        extract_features(media, codec=None)
        .select("doc_id", "width", "height", "n_frames")
        .orderBy("doc_id", "width", "height", "n_frames")
    )


@REG.add(
    "mm_jpeg",
    """
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 9 + 1) * 8 AS INT) AS width,
           CAST((octet_length(encode(text)) % 5 + 1) * 8 AS INT) AS height,
           CAST((2 * octet_length(encode(text))) % 256 AS INT) AS px_min,
           CAST((2 * octet_length(encode(text))) % 256 AS INT) AS px_max
    FROM documents
    ORDER BY doc_id, width, height, px_min, px_max
    """,
    doc="REAL JPEG decode end-to-end (operators/jpeg.py, round-6 "
    "closure of the last compressed-image boundary): per doc a genuine "
    "baseline-sequential JPEG is encoded (constant gray, EVEN value "
    "2k%256, 8-multiple dims from the text length k) and decoded back "
    "to PIXELS — Huffman tables read from DHT, bit-unstuffing, "
    "dequant, IDCT, level shift. Constant-even-gray DC-only blocks "
    "round-trip BIT-EXACTLY at quality 50 (q00=16: quantized DC "
    "(g-128)/2 is integral), so px_min = px_max = g pins the whole "
    "chain with an integer oracle; a single wrong bit anywhere in the "
    "codec chain breaks the hash. Dims pin SOF0 and the MCU layout. "
    "Lossy-path laws (PSNR, 4:2:0, restart markers, SOF2 rejection) "
    "live in tests/test_new_ops.py.",
)
def mm_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.jpeg import jpeg_decode_pixels, jpeg_encode
    from ..operators.multimodal import MEDIA_SCHEMA

    # the documents table lands as ONE parquet file at bench scales →
    # one task; the codec stage is pure per-row CPU, so spread it
    # across the cores first (at 100 TB the input arrives many-partitioned
    # and this is a no-op-cost hash exchange of small rows)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def to_jpeg(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/jpeg",
                    "payload": [
                        jpeg_encode(
                            np.full(
                                ((int(k) % 5 + 1) * 8, (int(k) % 9 + 1) * 8),
                                (2 * int(k)) % 256,
                                dtype=np.uint8,
                            )
                        )
                        for k in n
                    ],
                }
            )

    def decode(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = jpeg_decode_pixels(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "px_min", "px_max"]
            )

    media = docs.mapInPandas(to_jpeg, schema=MEDIA_SCHEMA)
    return (
        media.mapInPandas(
            decode,
            schema="doc_id long, width int, height int, px_min int, px_max int",
        )
        .orderBy("doc_id", "width", "height", "px_min", "px_max")
    )


@REG.add(
    "mm_phash",
    """
    WITH px AS (
        SELECT doc_id, i, j,
               (octet_length(encode(text)) + 13 * i + 7 * j) % 256 AS p
        FROM documents, range(8) t1(i), range(8) t2(j)
    ),
    m AS (
        SELECT doc_id, avg(p) AS mean FROM px GROUP BY doc_id
    ),
    sig AS (
        SELECT px.doc_id,
               string_agg(CASE WHEN p > mean THEN '1' ELSE '0' END, ''
                          ORDER BY i, j) AS bits
        FROM px JOIN m ON px.doc_id = m.doc_id
        GROUP BY px.doc_id
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(hamming(a.bits, b.bits) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE hamming(a.bits, b.bits) <= 2
    ORDER BY d1, d2, hamming
    """,
    doc="Image near-dup via perceptual hash over REAL decoded pixels — "
    "the crossover the PNG codec enables: per doc, a deterministic "
    "8x8 gray pattern (pixel = (len + 13i + 7j) % 256) is encoded as "
    "a genuine PNG, decoded back through png_decode_pixels "
    "(inflate + de-filter), aHashed (mean-threshold 64-bit), and "
    "near-dup pairs found by the pigeonhole-banded hamming join "
    "(hamming_pairs, chunk-pair banding — never all-pairs in the "
    "plan). The oracle recomputes the hash arithmetically and "
    "verifies the FULL pair relation with string hamming, so the "
    "pixel decode, the hash, and the banding superset are all pinned "
    "at once. At 100 TB: decode+hash is a pure map; the pair join is "
    "bucketed by band keys like every dedup candidate path.",
)
def mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.dedup import hamming_pairs
    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        phash_frames,
        png_encode,
    )

    docs = load_table(spark, sf_dir, "documents")

    def to_png(it):
        i = np.arange(8).reshape(8, 1)
        j = np.arange(8).reshape(1, 8)
        base = 13 * i + 7 * j
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": [
                        png_encode(((int(k) + base) % 256).astype(np.uint8))
                        for k in n
                    ],
                }
            )

    media = docs.mapInPandas(to_png, schema=MEDIA_SCHEMA)
    sigs = phash_frames(media)
    return (
        hamming_pairs(sigs, max_hamming=2, bits=64, chunks=4)
        .select("d1", "d2", "hamming")
        .orderBy("d1", "d2", "hamming")
    )


@REG.add(
    "mm_wav",
    """
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS k,
               octet_length(encode(text)) % 50 + 10 AS n
        FROM documents
    ),
    s AS (
        SELECT doc_id, n, unnest(range(n)) AS i FROM b
    ),
    sv AS (
        SELECT doc_id, n,
               (b.k * 31 + i * 17) % 65536 - 32768 AS v
        FROM s JOIN b USING (doc_id, n)
    )
    SELECT doc_id, CAST(16000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(any_value(n) AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST(sum(v * v) AS BIGINT) AS energy
    FROM sv GROUP BY doc_id
    ORDER BY doc_id, sample_rate, channels, n_samples, peak, energy
    """,
    doc="REAL audio decode through the multimodal plumbing: per doc a "
    "genuine RIFF/WAVE payload (wav_encode, PCM-16) with samples "
    "derived from the text's byte length, decoded back by wav_codec/"
    "wav_decode_samples inside the Arrow audio_features stage — "
    "header fields plus integer sample statistics (peak, energy) the "
    "oracle recomputes arithmetically. Extends the multimodal surface "
    "from image-only to audio with an actual codec; non-PCM-16 "
    "payloads fail loudly (law-tested).",
)
def mm_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import MEDIA_SCHEMA, audio_features, wav_encode

    docs = load_table(spark, sf_dir, "documents")

    def to_wav(it):
        for pdf in it:
            n_bytes = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            for k in n_bytes:
                k = int(k)
                i = np.arange(k % 50 + 10, dtype=np.int64)
                s = ((k * 31 + i * 17) % 65536 - 32768).astype(np.int16)
                payloads.append(wav_encode(s, sample_rate=16000))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(to_wav, schema=MEDIA_SCHEMA)
    return audio_features(media).orderBy(
        "doc_id", "sample_rate", "channels", "n_samples", "peak", "energy"
    )


@REG.add(
    "mm_jpeg420",
    """
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 5 + 1) * 16 AS INT) AS width,
           CAST((octet_length(encode(text)) % 3 + 1) * 16 AS INT) AS height,
           CAST((2 * octet_length(encode(text))) % 256 AS INT) AS px_min,
           CAST((2 * octet_length(encode(text))) % 256 AS INT) AS px_max
    FROM documents
    ORDER BY doc_id, width, height, px_min, px_max
    """,
    doc="The 4:2:0 SUBSAMPLED decode path through the hash gate — the "
    "most intricate decoder code (interleaved MCUs: four Y blocks + "
    "one Cb + one Cr per 16x16 MCU, chroma box-downsample on encode, "
    "nearest-neighbor upsample on decode, three Huffman table pairs "
    "in flight). Exactness anchor: constant gray-as-RGB with an EVEN "
    "value — Cb=Cr=128 exactly when R=G=B (their DC is 0, immune to "
    "the chroma quantizer), Y carries the even-gray DC-only exactness "
    "— so every decoded RGB channel equals g bit-exactly and the "
    "integer oracle pins the full interleave/upsample/color-convert "
    "chain. 16-multiple dims exercise multi-MCU layouts both axes.",
)
def mm_jpeg420(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.jpeg import jpeg_decode_pixels, jpeg_encode
    from ..operators.multimodal import MEDIA_SCHEMA

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def to_jpeg(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            for k in n:
                k = int(k)
                g = (2 * k) % 256
                img = np.full(
                    ((k % 3 + 1) * 16, (k % 5 + 1) * 16, 3), g, dtype=np.uint8
                )
                payloads.append(jpeg_encode(img, subsample=True))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/jpeg",
                    "payload": payloads,
                }
            )

    def decode(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = jpeg_decode_pixels(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "px_min", "px_max"]
            )

    media = docs.mapInPandas(to_jpeg, schema=MEDIA_SCHEMA)
    return (
        media.mapInPandas(
            decode,
            schema="doc_id long, width int, height int, px_min int, px_max int",
        )
        .orderBy("doc_id", "width", "height", "px_min", "px_max")
    )


@REG.add(
    "mm_transcode",
    """
    SELECT doc_id,
           CAST((octet_length(encode(text)) % 9 + 1) * 8 AS INT) AS width,
           CAST((octet_length(encode(text)) % 5 + 1) * 8 AS INT) AS height,
           CAST((2 * octet_length(encode(text))) % 256 AS INT) AS px,
           TRUE AS lossless_chain
    FROM documents
    ORDER BY doc_id, width, height, px, lossless_chain
    """,
    doc="Format-normalization transcode — the standard corpus curation "
    "stage (heterogeneous media in, one canonical format out), run "
    "through BOTH real codecs chained: each doc's baseline JPEG "
    "(constant even gray, 8-multiple dims) is DECODED to pixels "
    "(jpeg_decode_pixels: Huffman/dequant/IDCT), RE-ENCODED as "
    "canonical PNG (png_encode), then decoded AGAIN (png_decode_"
    "pixels: inflate/de-filter) — three codec passes in one Arrow "
    "map-only stage, no shuffle. On the constant-even-gray anchor the "
    "whole chain is LOSSLESS (JPEG DC-only exactness, then PNG's "
    "true losslessness), so the oracle pins dims + the exact pixel "
    "value + a lossless_chain flag (decoded-after == decoded-before, "
    "asserted per payload in the stage itself).",
)
def mm_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.jpeg import jpeg_decode_pixels, jpeg_encode
    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        png_decode_pixels,
        png_encode,
    )

    # the documents table lands as ONE parquet file at bench scales →
    # one task; the codec stage is pure per-row CPU, so spread it
    # across the cores first (at 100 TB the input arrives many-partitioned
    # and this is a no-op-cost hash exchange of small rows)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def to_jpeg(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/jpeg",
                    "payload": [
                        jpeg_encode(
                            np.full(
                                ((int(k) % 5 + 1) * 8, (int(k) % 9 + 1) * 8),
                                (2 * int(k)) % 256,
                                dtype=np.uint8,
                            )
                        )
                        for k in n
                    ],
                }
            )

    def transcode(it):
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                before = jpeg_decode_pixels(bytes(payload))
                png = png_encode(before[:, :, 0])  # canonical grayscale PNG
                after = png_decode_pixels(png)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": before.shape[1],
                        "height": before.shape[0],
                        "px": int(after[0, 0, 0]),
                        "lossless_chain": bool(
                            (after[:, :, 0] == before[:, :, 0]).all()
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "px", "lossless_chain"],
            )

    media = docs.mapInPandas(to_jpeg, schema=MEDIA_SCHEMA)
    return (
        media.mapInPandas(
            transcode,
            schema="doc_id long, width int, height int, px int, "
            "lossless_chain boolean",
        )
        .orderBy("doc_id", "width", "height", "px", "lossless_chain")
    )


@REG.add(
    "mm_resize",
    """
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS k,
               octet_length(encode(text)) % 5 + 1 AS h,
               octet_length(encode(text)) % 9 + 1 AS w
        FROM documents
    ),
    d AS (
        SELECT *, greatest(w, h, 3) AS denom FROM b
    ),
    dims AS (
        SELECT doc_id, k, h, w,
               greatest(1, w * 3 // denom) AS rs_w,
               greatest(1, h * 3 // denom) AS rs_h
        FROM d
    ),
    ri AS (
        SELECT *, unnest(range(rs_h)) AS i FROM dims
    ),
    rij AS (
        SELECT *, unnest(range(rs_w)) AS j FROM ri
    )
    SELECT doc_id, CAST(any_value(rs_w) AS INT) AS rs_w,
           CAST(any_value(rs_h) AS INT) AS rs_h,
           CAST(sum((k + 13 * (i * h // rs_h) + 7 * (j * w // rs_w)) % 256)
                AS BIGINT) AS pixsum
    FROM rij
    GROUP BY doc_id
    ORDER BY doc_id, rs_w, rs_h, pixsum
    """,
    doc="REAL pixel resampling end-to-end: patterned PNGs decoded "
    "(png_decode_pixels), letterbox-fit nearest-neighbor resampled "
    "(resize_nn: out[i,j] = in[i*h//rs_h, j*w//rs_w] — integer floor "
    "mapping, bit-deterministic), RE-ENCODED as PNG, then decoded "
    "AGAIN to sum the resized pixels — so the oracle's arithmetic "
    "recomputation of the resampled pixel sum pins the decoder, the "
    "resampler, and the encoder in one relation. Closes resize_plan's "
    "'actual pixel resample is stubbed' note.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        png_decode_pixels,
        png_encode,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")

    def to_png(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            for k in n:
                k = int(k)
                h, w = k % 5 + 1, k % 9 + 1
                i = np.arange(h).reshape(h, 1)
                j = np.arange(w).reshape(1, w)
                payloads.append(
                    png_encode(((k + 13 * i + 7 * j) % 256).astype(np.uint8))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(to_png, schema=MEDIA_SCHEMA)
    resized = resize_images(media, max_dim=3)

    def pixsum(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "rs_w": pdf["rs_w"],
                    "rs_h": pdf["rs_h"],
                    "pixsum": pdf["payload"].map(
                        lambda b: int(png_decode_pixels(bytes(b)).sum())
                    ),
                }
            )

    return (
        resized.mapInPandas(
            pixsum, schema="doc_id long, rs_w int, rs_h int, pixsum long"
        )
        .orderBy("doc_id", "rs_w", "rs_h", "pixsum")
    )


@REG.add(
    "mm_y4m",
    """
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS k,
               octet_length(encode(text)) % 6 + 2 AS n,
               ((octet_length(encode(text)) % 3) + 1) * 2 AS h,
               ((octet_length(encode(text)) % 4) + 1) * 2 AS w
        FROM documents
    ),
    fr AS (
        SELECT doc_id, k, h, w, unnest(range(0, n, 2)) AS f FROM b
    ),
    ri AS (
        SELECT *, unnest(range(h)) AS i FROM fr
    ),
    rij AS (
        SELECT *, unnest(range(w)) AS j FROM ri
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(sum((k + 11 * f + 13 * i + 7 * j) % 256) AS BIGINT)
               AS luma_sum
    FROM rij
    GROUP BY doc_id, f
    ORDER BY doc_id, frame_idx, luma_sum
    """,
    doc="REAL video decode through the multimodal plumbing: per doc a "
    "genuine YUV4MPEG2 stream (y4m_encode — the uncompressed "
    "interchange format, parseable without codec libraries) with "
    "patterned luma frames, decoded back by y4m_codec/"
    "y4m_decode_luma inside the Arrow video_frame_features stage; "
    "every stride-2 sampled frame emits its exact luma sum, which "
    "the oracle recomputes arithmetically — frame count, frame "
    "boundaries, and plane layout all pinned. Completes the "
    "real-codec triad (PNG/BMP image, WAV audio, Y4M video); only "
    "compressed formats needing external libraries (jpeg, h264) "
    "remain environment boundaries.",
)
def mm_y4m(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        video_frame_features,
        y4m_encode,
    )

    docs = load_table(spark, sf_dir, "documents")

    def to_y4m(it):
        for pdf in it:
            n_bytes = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            for k in n_bytes:
                k = int(k)
                n, h, w = k % 6 + 2, ((k % 3) + 1) * 2, ((k % 4) + 1) * 2
                f = np.arange(n).reshape(n, 1, 1)
                i = np.arange(h).reshape(1, h, 1)
                j = np.arange(w).reshape(1, 1, w)
                frames = ((k + 11 * f + 13 * i + 7 * j) % 256).astype(np.uint8)
                payloads.append(y4m_encode(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video/y4m",
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(to_y4m, schema=MEDIA_SCHEMA)
    return (
        video_frame_features(media, stride=2)
        .select("doc_id", "frame_idx", "luma_sum")
        .orderBy("doc_id", "frame_idx", "luma_sum")
    )


@REG.add(
    "mm_video_dedup",
    """
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS k,
               octet_length(encode(text)) % 6 + 2 AS n,
               ((octet_length(encode(text)) % 3) + 1) * 2 AS h,
               ((octet_length(encode(text)) % 4) + 1) * 2 AS w
        FROM documents
    ),
    fr AS (
        SELECT doc_id, k, h, w, unnest(range(0, n, 2)) AS f FROM b
    ),
    ri AS (
        SELECT *, unnest(range(h)) AS i FROM fr
    ),
    rij AS (
        SELECT *, unnest(range(w)) AS j FROM ri
    ),
    fp AS (
        SELECT DISTINCT doc_id, fpr FROM (
            SELECT doc_id, f,
                   sum((k + 11 * f + 13 * i + 7 * j) % 256) AS fpr
            FROM rij GROUP BY doc_id, f
        )
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fpr = b.fpr AND a.doc_id < b.doc_id
    GROUP BY d1, d2
    HAVING count(*) >= 2
    ORDER BY d1, d2, n_shared
    """,
    doc="Cross-video near-dup by shared frame fingerprints — the "
    "shot-overlap dedup a 100-TB video corpus runs FIRST: every "
    "sampled frame's fingerprint (exact luma sum over the REAL "
    "decoded plane, so the oracle recomputes it arithmetically) is "
    "the banding key; videos sharing >= 2 distinct fingerprints pair "
    "with their overlap count. The candidate join is "
    "fingerprint-equality (hash-partitioned equi-join, never "
    "all-pairs), the same superset-then-count shape as the text "
    "dedup family — at scale the fingerprint relation is tiny next "
    "to the video bytes (one row per sampled frame) and the hot-key "
    "story follows dedup_minhash's banding analysis.",
)
def mm_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        video_frame_features,
        y4m_encode,
    )

    docs = load_table(spark, sf_dir, "documents")

    def to_y4m(it):
        for pdf in it:
            n_bytes = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            for k in n_bytes:
                k = int(k)
                n, h, w = k % 6 + 2, ((k % 3) + 1) * 2, ((k % 4) + 1) * 2
                f = np.arange(n).reshape(n, 1, 1)
                i = np.arange(h).reshape(1, h, 1)
                j = np.arange(w).reshape(1, 1, w)
                frames = ((k + 11 * f + 13 * i + 7 * j) % 256).astype(np.uint8)
                payloads.append(y4m_encode(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video/y4m",
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(to_y4m, schema=MEDIA_SCHEMA)
    fp = (
        video_frame_features(media, stride=2)
        .select("doc_id", F.col("luma_sum").alias("fpr"))
        .distinct()
    )
    left = fp.select(F.col("doc_id").alias("d1"), "fpr")
    right = fp.select(F.col("doc_id").alias("d2"), F.col("fpr").alias("fpr2"))
    return (
        left.join(
            right, (F.col("fpr") == F.col("fpr2")) & (F.col("d1") < F.col("d2"))
        )
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("d1", "d2", "n_shared")
    )


@REG.add(
    "mm_curate",
    """
    WITH k AS (
        SELECT doc_id, octet_length(encode(text)) AS k FROM documents
    ),
    ok AS (
        -- the quarantine split: every 17th-by-length payload is corrupt
        SELECT doc_id, k,
               k % 3 = 0 AS is_jpeg,
               CAST(k % 9 + 1 AS INT) AS width,
               CAST(k % 5 + 1 AS INT) AS height,
               -- payload bytes are a pure function of the construction
               -- class: (format, dims, fill value) — byte-level digest
               -- equality == class equality
               CASE WHEN k % 3 = 0 THEN (2 * k) % 256 ELSE k % 256 END AS fill
        FROM k WHERE k % 17 != 0
    )
    SELECT CASE WHEN is_jpeg THEN 'image/jpeg' ELSE 'image/png' END
               AS media_type,
           width, height,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dup
    FROM ok
    GROUP BY is_jpeg, width, height, fill
    ORDER BY media_type, width, height, keep_id, n_dup
    """,
    doc="Composed MEDIA curation pipeline — the multimodal capstone "
    "mirroring curate_pipeline's text form: one DAG runs (1) real "
    "decode with QUARANTINE semantics over a mixed jpeg/png corpus "
    "with planted corruption (corrupt payloads are dropped, not "
    "fatal), then (2) byte-level exact dedup over the survivors "
    "(md5 over the payload BYTES, computed in the same Arrow stage "
    "that owns the payload), keeping the min doc_id per identical "
    "payload with the reclaimable-duplicate count. The oracle "
    "recomputes the quarantine rule and derives digest-equality "
    "classes arithmetically (payload bytes are a pure function of "
    "the construction class, so byte equality == class equality). "
    "All stages map-only except the final dedup groupBy — one "
    "shuffle on the digest, the 100-TB media-curation shape.",
)
def mm_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..operators.jpeg import jpeg_encode
    from ..operators.multimodal import png_encode

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    MEDIA_FEAT_SCHEMA = (
        "doc_id long, media_type string, ok boolean, "
        "width int, height int, digest string"
    )

    def decode_stage(it):
        # build + decode in one Arrow stage: the digest is a by-product
        # of the pass that owns the payload (no second scan)
        from ..operators.multimodal import decode_image

        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            rows = []
            for doc_id, k in zip(pdf["doc_id"], n):
                k = int(k)
                if k % 3 == 0:
                    payload = jpeg_encode(
                        np.full(
                            (k % 5 + 1, k % 9 + 1), (2 * k) % 256, dtype=np.uint8
                        )
                    )
                    mtype = "image/jpeg"
                    if k % 17 == 0:
                        payload = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
                else:
                    payload = png_encode(
                        np.full(
                            (k % 5 + 1, k % 9 + 1, 3), k % 256, dtype=np.uint8
                        )
                    )
                    mtype = "image/png"
                    if k % 17 == 0:
                        bad = bytearray(payload)
                        bad[-13] ^= 0xFF
                        payload = bytes(bad)
                try:
                    d = decode_image(payload)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "ok": True,
                            "width": d["width"],
                            "height": d["height"],
                            "digest": _hashlib.md5(payload).hexdigest(),
                        }
                    )
                except (ValueError, NotImplementedError):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "ok": False,
                            "width": None,
                            "height": None,
                            "digest": None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "ok", "width", "height", "digest",
                ],
            )

    feats = docs.mapInPandas(decode_stage, schema=MEDIA_FEAT_SCHEMA)
    return (
        feats.filter(F.col("ok"))  # quarantine: corrupt payloads drop out
        .groupBy("media_type", "width", "height", "digest")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            (F.count("*") - 1).cast("long").alias("n_dup"),
        )
        .select("media_type", "width", "height", "keep_id", "n_dup")
        .orderBy("media_type", "width", "height", "keep_id", "n_dup")
    )


@REG.add(
    "mm_quarantine",
    """
    WITH k AS (
        SELECT doc_id, octet_length(encode(text)) AS k FROM documents
    )
    SELECT doc_id,
           k % 17 != 0 AS ok,
           CASE WHEN k % 17 = 0 THEN
               CASE WHEN k % 3 = 0
                    THEN 'unsupported JPEG profile (SOF marker 0xFFC2): '
                         || 'only baseline sequential (SOF0) is implemented'
                    ELSE 'PNG chunk b''IDAT'' CRC mismatch' END
           END AS err,
           CASE WHEN k % 17 != 0 THEN CAST(k % 9 + 1 AS INT) END AS width,
           CASE WHEN k % 17 != 0 THEN CAST(k % 5 + 1 AS INT) END AS height
    FROM k
    ORDER BY doc_id, ok, err, width, height
    """,
    doc="Quarantine decode across BOTH real image codecs: every "
    "3rd-by-length doc carries a genuine JPEG (constant gray), the "
    "rest PNGs; every 17th-by-length payload is corrupted — the PNG "
    "leg by an IDAT CRC flip, the JPEG leg by rewriting SOF0 to SOF2 "
    "(progressive, deliberately unimplemented). The stage must decode "
    "the rest and emit (ok=false, err=<codec message>) for the bad "
    "ones — one corrupt blob must never kill the stage (at 100 TB "
    "corrupt media is routine, and the loud extract_features path "
    "would abort the job). The oracle recomputes the corruption rule, "
    "BOTH codecs' exact error strings, and the valid docs' dims — "
    "pinning that decode failures are (a) contained, (b) "
    "deterministic, (c) triageable, for png and jpeg alike.",
)
def mm_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.jpeg import jpeg_encode
    from ..operators.multimodal import (
        MEDIA_SCHEMA,
        png_encode,
        safe_decode_features,
    )

    docs = load_table(spark, sf_dir, "documents")

    def to_media(it):
        for pdf in it:
            n = pdf["text"].str.encode("utf-8").str.len().to_numpy()
            payloads = []
            types = []
            for k in n:
                k = int(k)
                if k % 3 == 0:
                    img = jpeg_encode(
                        np.full(
                            (k % 5 + 1, k % 9 + 1), (2 * k) % 256, dtype=np.uint8
                        )
                    )
                    if k % 17 == 0:  # corrupt: baseline -> progressive
                        img = img.replace(b"\xff\xc0", b"\xff\xc2", 1)
                    types.append("image/jpeg")
                else:
                    img = png_encode(
                        np.full(
                            (k % 5 + 1, k % 9 + 1, 3), k % 256, dtype=np.uint8
                        )
                    )
                    if k % 17 == 0:  # corrupt the IDAT CRC byte
                        bad = bytearray(img)
                        bad[-13] ^= 0xFF
                        img = bytes(bad)
                    types.append("image/png")
                payloads.append(img)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": types,
                    "payload": payloads,
                }
            )

    media = docs.mapInPandas(to_media, schema=MEDIA_SCHEMA)
    return (
        safe_decode_features(media)
        .select("doc_id", "ok", "err", "width", "height")
        .orderBy("doc_id", "ok", "err", "width", "height")
    )
