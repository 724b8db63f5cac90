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


def test_decode_without_codec_is_format_scoped_stub():
    """Compressed video still needs a library this container lacks:
    sniffing an unknown format fails with the explicit boundary error.
    JPEG no longer hits the boundary (round-6 codec): a jpeg-magic
    payload is dispatched to the real decoder, which rejects garbage
    as malformed (ValueError), not as an environment gap."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00\x00\x00\x18ftypmp42 video-ish")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish payload")


def test_png_codec_roundtrip_all_shapes_and_filters():
    """The real PNG codec law: png_decode_pixels(png_encode(a)) == a
    exactly for gray/GA/RGB/RGBA across the writer's filter types, and
    the sniffing decode_image path reads dims from a real PNG."""
    import numpy as np

    rng = np.random.RandomState(7)
    for shape in [(5, 7, 3), (4, 4, 1), (3, 6, 4), (2, 2, 2)]:
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2):
            png = multimodal.png_encode(a, filter_type=ft)
            back = multimodal.png_decode_pixels(png)
            assert back.shape == shape and (back == a).all(), (shape, ft)
    png = multimodal.png_encode(np.zeros((3, 9, 3), dtype=np.uint8))
    assert multimodal.decode_image(png) == {
        "width": 9, "height": 3, "n_frames": 1,
    }


def test_png_decoder_handles_average_and_paeth_filters():
    """Hand-filtered fixture (2x2 gray [[10,20],[30,40]]; row filters
    Paeth then Average, computed by hand from the spec) — covers the
    filter types the minimal writer never emits."""
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = bytes([4, 10, 10, 3, 25, 15])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert multimodal.png_decode_pixels(png).reshape(2, 2).tolist() == [
        [10, 20],
        [30, 40],
    ]


def test_png_codec_rejects_corruption_and_unsupported_shapes():
    import numpy as np

    png = multimodal.png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    bad = bytearray(png)
    bad[-13] ^= 0xFF  # IDAT CRC byte
    with pytest.raises(ValueError, match="CRC mismatch"):
        multimodal.png_codec(bytes(bad))
    with pytest.raises(ValueError, match="bad signature"):
        multimodal.png_codec(b"\x89PNG... not really")
    truncated = png[: len(png) - 14]
    with pytest.raises(ValueError):
        multimodal.png_codec(truncated)


def test_png_decode_through_spark_feature_plumbing(spark):
    """The codec boundary carries the real codec through the SAME
    Arrow mapInPandas plumbing: PNG payloads built per doc, features
    extracted with the sniffing decode (codec=None path via
    png_codec), dims must match the construction rule."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, SF, "documents").limit(30)

    def to_png(it):
        for pdf in it:
            n = pdf["text"].str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": [
                        multimodal.png_encode(
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

    media = docs.mapInPandas(to_png, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media, codec=None)
    got = {r["doc_id"]: (r["width"], r["height"]) for r in feats.collect()}
    want = {
        r["doc_id"]: (len(r["text"]) % 9 + 1, len(r["text"]) % 5 + 1)
        for r in docs.collect()
    }
    assert got == want


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


def test_lsh_topk_batch_rank1_is_self(spark):
    from cvemate_spark.operators.similarity import lsh_topk_batch

    emb = load_table(spark, SF, "embeddings")
    rows = lsh_topk_batch(emb, n_queries=4, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    assert sorted(by_q) == [0, 1, 2, 3]
    for q_id, ids in by_q.items():
        # cosine(self, self) = 1.0 and a query always probes its own
        # bucket, so rank 1 is the query itself
        assert ids[0] == q_id
        assert len(ids) == len(set(ids)) <= 5


def test_t_split_partitions_and_is_deterministic(spark):
    from cvemate_spark.queries import REGISTRY

    build = REGISTRY.specs["t_split"].builder
    a = [tuple(r) for r in build(spark, SF).collect()]
    b = [tuple(r) for r in build(spark, SF).collect()]
    assert a == b  # hash split: no run-to-run sampling noise
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r[1] for r in a) == n_docs  # a partition, not a sample
    frac = {r[0]: r[1] / n_docs for r in a}
    assert frac.get("train", 0) > 0.8  # 90/5/5 within small-SF wobble


def test_t_pack_bins_respect_budget(spark):
    from cvemate_spark.queries import REGISTRY
    from cvemate_spark.queries.text_ops import PACK_BUDGET

    rows = REGISTRY.specs["t_pack"].builder(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    from pyspark.sql import functions as F

    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n"))
        .collect()
    }
    for lang in per_lang:
        bins = sorted(r["bin"] for r in rows if r["lang"] == lang)
        assert bins == list(range(bins[-1] + 1))  # contiguous from 0
    # every doc lands in exactly one bin: token totals reconcile
    assert sum(r["n_tokens"] for r in rows) == sum(per_lang.values())
    # start-offset binning invariant: the first doc of bin b+1 starts at
    # cumulative offset >= (b+1)*budget, so the prefix token sum through
    # any non-tail bin covers that many whole budgets (individual bins
    # may hold slightly under budget when the previous doc overshoots
    # into them — that is expected concat-and-chunk behavior)
    for lang in per_lang:
        sizes = [r["n_tokens"] for r in sorted(
            (r for r in rows if r["lang"] == lang), key=lambda r: r["bin"]
        )]
        prefix = 0
        for b, s in enumerate(sizes[:-1]):
            prefix += s
            assert prefix >= PACK_BUDGET * (b + 1)


def test_dedup_canonical_reconciles_with_components(spark):
    from cvemate_spark.operators import dedup
    from cvemate_spark.queries import REGISTRY

    docs = load_table(spark, SF, "documents")
    rows = REGISTRY.specs["dedup_canonical"].builder(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    pairs = dedup.simhash_pairs(docs, max_hamming=2)
    comp = dedup.dedup_components(pairs)
    n_dropped = comp.filter("doc_id != component").count()
    assert sum(r["n_docs"] - r["n_kept"] for r in rows) == n_dropped


def test_decontam_flags_only_train_docs_with_real_overlap(spark):
    """Every flagged doc must be in the train bucket, and its reported
    gram hits must actually occur verbatim in at least one benchmark
    doc (5 consecutive tokens)."""
    from pyspark.sql import functions as F

    from cvemate_spark.functions.text import spark_str_hash
    from cvemate_spark.queries import REGISTRY

    rows = REGISTRY.specs["t_decontam"].builder(spark, SF).collect()
    assert rows  # non-empty at sf0.001 (verified hit rate ~1%)
    docs = load_table(spark, SF, "documents")
    bucket = F.expr(f"{spark_str_hash('cast(doc_id as string)')} % 100")
    by_bucket = {
        r["doc_id"]: r["b"] for r in docs.select("doc_id", bucket.alias("b")).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    bench_grams = set()
    for did, b in by_bucket.items():
        if b >= 95:
            t = texts[did].split(" ")
            bench_grams |= {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}
    for r in rows:
        assert by_bucket[r["doc_id"]] < 90  # train bucket only
        t = texts[r["doc_id"]].split(" ")
        hits = {
            " ".join(t[i : i + 5])
            for i in range(len(t) - 4)
            if " ".join(t[i : i + 5]) in bench_grams
        }
        assert len(hits) == r["n_hit_grams"]


def test_shuffle_is_a_permutation_and_salt_sensitive(spark):
    """t_shuffle covers every document exactly once across the 16
    shards; changing the salt changes the order digest (epoch reshuffle)
    while re-running the same salt reproduces it exactly."""
    from cvemate_spark.queries import REGISTRY

    docs = load_table(spark, SF, "documents")
    build = REGISTRY.specs["t_shuffle"].builder
    rows = build(spark, SF).collect()
    assert sorted(r["shard"] for r in rows) == list(range(16))
    assert sum(r["n_docs"] for r in rows) == docs.count()
    again = build(spark, SF).collect()
    assert [r["order_digest"] for r in again] == [r["order_digest"] for r in rows]


def test_kmeans_fit_monotone_deterministic_and_serves_ivf(spark):
    """Spherical k-means: cost is non-increasing per iteration, the fit
    is reproducible (same seeds, same assignment tie-break), and the
    trained centroids slot into ivf_topk with reasonable recall vs the
    brute-force exact top-k."""
    from pyspark.sql import functions as F

    from cvemate_spark.operators.similarity import brute_topk, ivf_topk, kmeans_fit

    emb = load_table(spark, SF, "embeddings")
    cents, costs = kmeans_fit(emb, k=8, iters=4)
    assert len(costs) == 4
    for a, b in zip(costs, costs[1:]):
        assert b <= a + 1e-9  # monotone under normalized means
    cents2, costs2 = kmeans_fit(emb, k=8, iters=4)
    assert all(abs(a - b) < 1e-6 for a, b in zip(costs, costs2))
    for (i1, v1), (i2, v2) in zip(cents, cents2):
        assert i1 == i2
        assert max(abs(a - b) for a, b in zip(v1, v2)) < 1e-6
    for _, v in cents:  # unit vectors
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9

    cdf = spark.createDataFrame(
        [(cid, v) for cid, v in cents], "cent_id int, cent_emb array<double>"
    )
    got = {r["vec_id"] for r in ivf_topk(emb, query_vec_id=1, k=10, cents=cdf).collect()}
    exact = {r["vec_id"] for r in brute_topk(emb, query_vec_id=1, k=10).collect()}
    assert len(got) == 10
    recall = len(got & exact) / 10
    assert recall >= 0.5, recall


def test_observe_metrics_ride_the_action(spark):
    """Operational surface: df.observe attaches accumulator-style
    metrics (row counts, kept counts, quality sums) to an existing
    plan — ONE action yields both the data and the audit metrics, the
    no-extra-scan form of pipeline observability at 100 TB."""
    from pyspark.sql import Observation, functions as F
    from cvemate_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    obs = Observation("curation_audit")
    kept = (F.size(F.split("text", " ")) >= 50).cast("long")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(kept).alias("n_kept"),
        F.sum(F.col("n_chars")).alias("total_chars"),
    )
    out = observed.filter(F.col("lang") == "en")
    n_en = out.count()  # one action: data AND metrics
    m = obs.get
    assert m["n_rows"] == docs.count()
    assert 0 <= m["n_kept"] <= m["n_rows"]
    assert m["total_chars"] > 0
    assert n_en <= m["n_rows"]


def test_png_codec_reads_apng_frame_count():
    """APNG: the acTL chunk's num_frames is the n_frames the
    frame-sampling stage fans out over; a plain PNG stays 1."""
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = bytes([0, 7])  # 1x1 gray, filter None
    apng = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"acTL", struct.pack(">II", 12, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert multimodal.png_codec(apng) == {
        "width": 1, "height": 1, "n_frames": 12,
    }


def test_ahash64_threshold_and_channels():
    import numpy as np

    # half dark / half bright: bright half sets exactly those 32 bits
    tile = np.zeros((8, 8), dtype=np.uint8)
    tile[:, 4:] = 200
    h = multimodal.ahash64(tile)
    want = 0
    for i in range(8):
        for j in range(4, 8):
            want |= 1 << (i * 8 + j)
    assert h == np.int64(np.uint64(want)).item()
    # channel mean first: RGB tile with the same gray projection
    rgb = np.stack([tile, tile, tile], axis=2)
    assert multimodal.ahash64(rgb) == h
    with pytest.raises(ValueError, match="8x8"):
        multimodal.ahash64(np.zeros((4, 4), dtype=np.uint8))


def test_hamming_pairs_equals_brute_force(spark):
    """The generalized banded hamming join (pigeonhole superset +
    exact verify) must equal the all-pairs computation, including on
    signed 64-bit hashes where bit 63 lives in the sign bit."""
    import itertools

    import numpy as np

    from cvemate_spark.operators.dedup import hamming_pairs

    rng = np.random.RandomState(3)
    base = rng.randint(-(2**62), 2**62, size=12, dtype=np.int64)
    hashes = list(base)
    # plant near-dups: flips of 1 and 2 bits, including bit 63
    hashes.append(np.int64(np.uint64(base[0]) ^ np.uint64(1 << 63)))
    hashes.append(np.int64(np.uint64(base[1]) ^ np.uint64(0b11)))
    hashes.append(base[2])  # exact dup
    sigs = spark.createDataFrame(
        [(i, int(h)) for i, h in enumerate(hashes)], "doc_id long, phash long"
    )
    got = sorted(
        (r["d1"], r["d2"], r["hamming"])
        for r in hamming_pairs(sigs, max_hamming=2).collect()
    )
    brute = sorted(
        (i, k, bin(np.uint64(hashes[i]) ^ np.uint64(hashes[k])).count("1"))
        for i, k in itertools.combinations(range(len(hashes)), 2)
        if bin(np.uint64(hashes[i]) ^ np.uint64(hashes[k])).count("1") <= 2
    )
    assert got == brute and got  # non-trivial: the planted pairs exist


def test_wav_codec_roundtrip_and_rejection():
    """Audio codec laws: encode/decode round-trip exact for mono and
    multi-channel PCM-16; malformed/non-PCM payloads fail loudly."""
    import numpy as np

    rng = np.random.RandomState(5)
    for shape in [(100,), (64, 2), (7, 3), (1, 1)]:
        a = rng.randint(-32768, 32768, size=shape, dtype=np.int16)
        b = multimodal.wav_encode(a, sample_rate=8000)
        meta = multimodal.wav_codec(b)
        want_ch = 1 if a.ndim == 1 else a.shape[-1]
        assert meta["channels"] == want_ch
        assert meta["sample_rate"] == 8000
        assert meta["n_samples"] == a.shape[0]
        back = multimodal.wav_decode_samples(b)
        assert (back == (a[:, None] if a.ndim == 1 else a)).all()
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        multimodal.wav_codec(b"nope")
    whole = multimodal.wav_encode(np.zeros(4, np.int16))
    with pytest.raises(ValueError):
        multimodal.wav_codec(whole[:20])  # truncated chunk list


def test_malformed_but_structurally_valid_media_raises_valueerror():
    """Chunk-length validation: payloads whose chunk framing is intact
    but whose chunk BODY is too short for its declared struct (short
    IHDR, short WAV fmt) must surface as ValueError — the quarantine
    contract's error class — never struct.error escaping the handler."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # CRC-valid PNG with a 5-byte IHDR: framing fine, body malformed
    short_ihdr = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="too short"):
        multimodal.png_codec(short_ihdr)
    with pytest.raises(ValueError, match="13 bytes"):
        multimodal.png_decode_pixels(short_ihdr)

    # WAV with an 8-byte fmt chunk (PCM fmt is >= 16 by spec)
    fmt8 = b"\x01\x00\x01\x00\x40\x1f\x00\x00"
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", 0)
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk too short"):
        multimodal.wav_codec(wav)

    # zero block_align: division guard, not ZeroDivisionError
    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 0, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt16)) + fmt16
        + b"data" + struct.pack("<I", 0)
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="zero block_align"):
        multimodal.wav_codec(wav)

    # corrupt inflate stream behind valid CRC: ValueError, not zlib.error
    ihdr13 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_idat = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr13)
        + chunk(b"IDAT", b"not-a-zlib-stream")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflate failed"):
        multimodal.png_decode_pixels(bad_idat)
    assert np is not None


def test_jpeg_constant_gray_roundtrips_exactly():
    """The exactness anchor the mm_jpeg gate rests on: constant gray,
    EVEN value, 8-multiple dims -> DC-only blocks -> bit-exact through
    the whole Huffman+DCT chain at quality 50 (q00=16)."""
    import numpy as np

    from cvemate_spark.operators import jpeg

    for g in (0, 2, 56, 128, 200, 254):
        for shape in [(8, 8), (16, 24), (40, 72)]:
            b = jpeg.jpeg_encode(np.full(shape, g, np.uint8))
            meta = jpeg.jpeg_codec(b)
            assert (meta["width"], meta["height"]) == (shape[1], shape[0])
            assert meta["n_frames"] == 1
            px = jpeg.jpeg_decode_pixels(b)
            assert px.shape == (shape[0], shape[1], 1)
            assert (px == g).all()


def test_jpeg_lossy_roundtrip_quality_and_shapes():
    """Decoder correctness on the lossy paths: constant RGB within the
    DC-quantization error bound; smooth images at high PSNR; odd
    (non-8-multiple) dims preserved; 4:2:0 subsampling; restart
    markers decode identically to the unrestarted stream."""
    import numpy as np

    from cvemate_spark.operators import jpeg

    rng = np.random.RandomState(0)
    # constant RGB: per-channel error bounded by DC quant + rounding
    for color in [(10, 200, 60), (255, 0, 0), (130, 130, 131)]:
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = color
        px = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img))
        assert np.abs(px.astype(int) - np.array(color)).max() <= 4
    # smooth gradient: >= 35 dB at default quality
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = ((x * 2 + y * 3) % 256).astype(np.uint8)
    px = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img))[:, :, 0]
    mse = np.mean((px.astype(float) - img) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) >= 35
    # odd dims survive the MCU padding/cropping
    img = rng.randint(0, 256, (37, 51, 3), np.uint8)
    px = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img, quality=90))
    assert px.shape == (37, 51, 3)
    assert 10 * np.log10(
        255**2 / np.mean((px.astype(float) - img) ** 2)
    ) >= 25
    # 4:2:0 chroma subsampling on a smooth image
    smooth = np.zeros((32, 48, 3), np.uint8)
    smooth[:, :, 0] = np.linspace(0, 255, 48, dtype=np.uint8)[None, :]
    smooth[:, :, 1] = 100
    smooth[:, :, 2] = 180
    px = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(smooth, subsample=True))
    assert px.shape == smooth.shape
    assert 10 * np.log10(
        255**2 / np.mean((px.astype(float) - smooth) ** 2)
    ) >= 35
    # restart markers: DRI/RSTn resync decodes to the identical image
    img = rng.randint(0, 256, (24, 80), np.uint8)
    p0 = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img))
    p1 = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img, restart_interval=3))
    assert (p0 == p1).all()


def test_jpeg_property_roundtrip_fuzz():
    """Hypothesis fuzz over the codec laws: any uint8 image (gray or
    RGB, arbitrary small dims) must encode to a stream the decoder
    accepts with exact dims back, bounded error at quality 95, and a
    byte-identical re-encode (determinism). Constant even-gray images
    additionally round-trip exactly at quality 50 whatever the dims
    (8-multiples or not — edge blocks are padded by replication, so
    they stay constant)."""
    import numpy as np
    from hypothesis import HealthCheck, given, settings, strategies as st

    from cvemate_spark.operators import jpeg

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, ch, seed):
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, 3)
        img = rng.randint(0, 256, shape, np.uint8)
        b = jpeg.jpeg_encode(img, quality=95)
        assert b == jpeg.jpeg_encode(img, quality=95)  # deterministic
        px = jpeg.jpeg_decode_pixels(b)
        assert px.shape == (h, w, ch)
        ref = img[:, :, None] if ch == 1 else img
        # quality-95 luminance quantizers are tiny; random noise is the
        # worst case, so the bound is loose but must hold
        assert np.abs(px.astype(int) - ref.astype(int)).max() <= 64

    @settings(max_examples=25, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40), g=st.integers(0, 127))
    def constant_exact(h, w, g):
        img = np.full((h, w), 2 * g, np.uint8)
        px = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(img))
        assert (px == 2 * g).all()

    roundtrip()
    constant_exact()


def test_wav_y4m_property_roundtrip_fuzz():
    """Property form of the lossless codec laws: ANY int16 sample
    array round-trips WAV exactly; ANY uint8 frame stack round-trips
    Y4M exactly — encoders and decoders are inverse bijections on
    their whole domains, not just the fixed test vectors."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from cvemate_spark.operators import multimodal as mm

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 200),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, ch, rate, seed):
        rng = np.random.RandomState(seed)
        a = rng.randint(-32768, 32768, (n, ch), np.int16)
        b = mm.wav_encode(a, sample_rate=rate)
        meta = mm.wav_codec(b)
        assert (meta["n_samples"], meta["channels"], meta["sample_rate"]) == (
            n, ch, rate,
        )
        assert (mm.wav_decode_samples(b) == a).all()

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 8),
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    def y4m_roundtrip(n, h, w, seed):
        rng = np.random.RandomState(seed)
        # Y4M 4:2:0 chroma planes need even dims; the encoder pads or
        # requires even — mirror its contract by using even dims
        frames = rng.randint(0, 256, (n, h * 2, w * 2), np.uint8)
        b = mm.y4m_encode(frames)
        back = mm.y4m_decode_luma(b)
        assert (back == frames).all()

    wav_roundtrip()
    y4m_roundtrip()


def test_jpeg_rejects_malformed_and_unsupported_profiles():
    """Honest-failure rule, same as the other codecs: progressive SOF2
    is a scoped ValueError, truncation and garbage are ValueError —
    and all of it is CONTAINED by the quarantine path (the error class
    the quarantine handler catches)."""
    import numpy as np

    from cvemate_spark.operators import jpeg

    good = jpeg.jpeg_encode(np.full((8, 8), 100, np.uint8))
    with pytest.raises(ValueError, match="SOF marker 0xFFC2"):
        jpeg.jpeg_codec(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        jpeg.jpeg_decode_pixels(good[:-30])
    with pytest.raises(ValueError):
        jpeg.jpeg_codec(b"not a jpeg")
    # the decode_image sniffer dispatches jpeg magic to the real codec
    meta = multimodal.decode_image(good)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 8, 1)
    # spec-valid streams from OTHER encoders: 0xFF fill bytes before a
    # marker code must be skipped, not treated as corruption
    filled = good.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    assert jpeg.jpeg_codec(filled)["width"] == 8
    assert (jpeg.jpeg_decode_pixels(filled) == 100).all()


def test_hamming_banding_guard_refuses_recall_loss():
    """max_hamming > chunks-1 breaks the pigeonhole superset — the
    banding must refuse loudly rather than return a silently lossy
    pair relation (mirrors the MINHASH_K divisor guard)."""
    from cvemate_spark.operators.dedup import _simhash_band_exprs

    with pytest.raises(ValueError, match="pigeonhole"):
        _simhash_band_exprs(4, 4, 16)  # h=4, chunks=4: no intact chunk
    # boundary cases stay legal
    assert _simhash_band_exprs(3, 4, 16)  # single-chunk banding
    assert len(_simhash_band_exprs(2, 4, 16)) == 6  # pair banding


def test_resize_nn_floor_mapping_and_identity():
    """Resample law: out[i,j] == in[i*h//rs_h, j*w//rs_w] exactly;
    same-size resize is the identity; resized payloads from
    resize_images are themselves valid PNGs of the planned dims."""
    import numpy as np

    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
    r = multimodal.resize_nn(a, 3, 5)
    assert r.shape == (5, 3, 3)
    for i in range(5):
        for j in range(3):
            assert (r[i, j] == a[i * 10 // 5, j * 6 // 3]).all()
    assert (multimodal.resize_nn(a, 6, 10) == a).all()
    with pytest.raises(ValueError):
        multimodal.resize_nn(a, 0, 5)


def test_resize_images_emits_valid_pngs(spark):
    import numpy as np
    import pandas as pd

    docs = load_table(spark, SF, "documents").limit(20)

    def to_png(it):
        for pdf in it:
            n = pdf["text"].str.len().to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": [
                        multimodal.png_encode(
                            np.full(
                                (int(k) % 7 + 2, int(k) % 11 + 2, 3),
                                int(k) % 256,
                                dtype=np.uint8,
                            )
                        )
                        for k in n
                    ],
                }
            )

    media = docs.mapInPandas(to_png, schema=multimodal.MEDIA_SCHEMA)
    for r in multimodal.resize_images(media, max_dim=4).collect():
        px = multimodal.png_decode_pixels(bytes(r["payload"]))
        assert px.shape[:2] == (r["rs_h"], r["rs_w"])
        assert 1 <= max(r["rs_h"], r["rs_w"]) <= 4


def test_y4m_codec_roundtrip_and_rejection():
    """Video codec laws: luma round-trip exact across frame counts;
    header fields parsed; malformed/truncated streams fail loudly."""
    import numpy as np

    rng = np.random.RandomState(9)
    a = rng.randint(0, 256, size=(5, 6, 8), dtype=np.uint8)
    b = multimodal.y4m_encode(a, fps=30)
    assert multimodal.y4m_codec(b) == {
        "width": 8, "height": 6, "n_frames": 5, "fps_num": 30, "fps_den": 1,
    }
    assert (multimodal.y4m_decode_luma(b) == a).all()
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        multimodal.y4m_codec(b"nope")
    with pytest.raises(ValueError):
        multimodal.y4m_codec(b[:-5])  # truncated final frame
    with pytest.raises(ValueError, match="even"):
        multimodal.y4m_encode(np.zeros((1, 3, 4), dtype=np.uint8))


def test_video_frame_features_hash_matches_independent_numpy(spark):
    """The per-frame aHash pipeline (resize_nn 8x8 -> ahash64) must
    match an independent numpy recomputation over the same frames —
    pinning the part of the video stage the SQL oracle (luma sums)
    does not cover."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(13)
    vids = {d: rng.randint(0, 256, size=(4, 6, 8), dtype=np.uint8) for d in range(5)}
    media = spark.createDataFrame(
        [(d, "video/y4m", bytearray(multimodal.y4m_encode(v))) for d, v in vids.items()],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        (r["doc_id"], r["frame_idx"]): (r["luma_sum"], r["frame_hash"])
        for r in multimodal.video_frame_features(media, stride=2).collect()
    }
    for d, v in vids.items():
        for idx in range(0, 4, 2):
            luma = v[idx]
            want_hash = multimodal.ahash64(
                multimodal.resize_nn(luma, 8, 8)[..., 0]
            )
            assert got[(d, idx)] == (int(luma.astype(np.int64).sum()), want_hash)


def test_safe_decode_quarantines_instead_of_failing(spark):
    """One corrupt payload must not kill the stage: the quarantine
    decode emits (ok=false, err) for the bad blob and real dims for
    the rest — while the loud extract_features path raises on the
    same input (both behaviors are contracts)."""
    import numpy as np

    good = multimodal.png_encode(np.zeros((2, 3, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[-13] ^= 0xFF
    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(good)),
            (2, "image/png", bad),
            (3, "application/octet-stream", bytearray(b"\xff\xd8 jpeg-ish")),
            (4, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42")),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["doc_id"]: r for r in multimodal.safe_decode_features(media).collect()
    }
    assert rows[1]["ok"] and (rows[1]["width"], rows[1]["height"]) == (3, 2)
    assert not rows[2]["ok"] and "CRC mismatch" in rows[2]["err"]
    # jpeg-magic garbage is now contained as MALFORMED JPEG (real codec)
    assert not rows[3]["ok"] and "JPEG" in rows[3]["err"]
    assert not rows[4]["ok"] and "no built-in codec" in rows[4]["err"]
    with pytest.raises(Exception):  # the loud path keeps failing loudly
        multimodal.extract_features(media, codec=None).collect()
