"""Laws for the round-2 analysis operators: PageRank, repeated-substring
exposure, hashed classifier, product quantization."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from cvemate_spark.operators.graph import BASE, RANK_SCALE, pagerank
from cvemate_spark.queries.curation_ops import CLS_B, CLS_MULT
from cvemate_spark.queries.dedup_ops import SPAN_K, dedup_substring
from cvemate_spark.queries.similarity_ops import PQ_DSUB, PQ_K, PQ_M


def _ref_pagerank(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    """Driver-side reference of the integer recurrence."""
    from collections import defaultdict

    outdeg: dict[str, int] = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    ranks = {u: RANK_SCALE for u in outdeg}
    for _ in range(iters):
        nxt: dict[str, int] = defaultdict(int)
        for s, d in edges:
            nxt[d] += (85 * ranks[s]) // (100 * outdeg[s])
        ranks = {v: BASE + c for v, c in nxt.items()}
    return ranks


def test_pagerank_matches_reference_recurrence(spark):
    # star + chain: a<->b, a<->c, c<->d (undirected as directed pairs)
    und = [("a", "b"), ("a", "c"), ("c", "d")]
    edges = und + [(d, s) for s, d in und]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    assert got == _ref_pagerank(edges, iters=3)
    # hub a (degree 2) outranks leaves b, d (degree 1)
    assert got["a"] > got["b"] and got["a"] > got["d"]


def test_pagerank_partitioning_invariant(spark):
    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    edges = und + [(d, s) for s, d in und]
    df1 = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    df8 = df1.repartition(8)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, iters=2).collect()}
    r8 = {r["node"]: r["rank"] for r in pagerank(df8, iters=2).collect()}
    assert r1 == r8  # integer arithmetic: layout can't change the result


def test_dedup_substring_known_span(spark, tmp_path):
    # doc 1 and 2 share a verbatim 10-token run; doc 3 is unique
    shared = " ".join(f"s{i}" for i in range(10))
    docs = [
        Row(doc_id=1, text=f"a1 a2 a3 {shared} a4 a5"),
        Row(doc_id=2, text=f"b1 {shared} b2 b3 b4"),
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(20))),
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))
    out = {r["doc_id"]: r.asDict() for r in dedup_substring(spark, str(sf)).collect()}
    # a 10-token shared run = 10 - K + 1 duplicated window positions,
    # merging to one island whose span is exactly 10 tokens
    expect_dup = 10 - SPAN_K + 1
    for d in (1, 2):
        assert out[d]["dup_win"] == expect_dup
        assert out[d]["max_span"] == 10
    assert out[3]["dup_win"] == 0 and out[3]["max_span"] == 0 and out[3]["keep"] == 1


def test_classifier_weights_are_signed_and_bounded():
    # the pseudo-weight table spans both classes and stays in [-1000, 1000]
    ws = [((b % CLS_B) * CLS_MULT) % 2001 - 1000 for b in range(CLS_B)]
    assert min(ws) >= -1000 and max(ws) <= 1000
    assert any(w < 0 for w in ws) and any(w > 0 for w in ws)


def test_pq_seed_vectors_encode_to_themselves(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.rand(PQ_M * PQ_DSUB)])
        for i in range(60)
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows).write.parquet(str(sf / "embeddings.parquet"))

    from cvemate_spark.queries.similarity_ops import emb_pq

    out = emb_pq(spark, str(sf)).collect()
    codes = {r["vec_id"]: (r["c0"], r["c1"], r["c2"], r["c3"]) for r in out}
    # every emitted code is a valid codeword id
    assert all(0 <= c < PQ_K for cs in codes.values() for c in cs)
    # a codebook seed's subvectors are distance-0 to their own codeword,
    # so any seed that reaches the top-20 encodes to itself
    for vid, cs in codes.items():
        if vid < PQ_K:
            assert cs == (vid, vid, vid, vid)


def test_compress_ratio_orders_repetition(spark, tmp_path):
    docs = [
        Row(doc_id=1, text="spam ham " * 200),          # repetitive
        Row(doc_id=2, text=" ".join(f"w{i*7919%4096}x{i}" for i in range(400))),
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))
    from cvemate_spark.queries.text_ops import t_compress

    out = {r["doc_id"]: r.asDict() for r in t_compress(spark, str(sf)).collect()}
    assert out[1]["ratio_pm"] < out[2]["ratio_pm"]  # repetition compresses harder
    for r in out.values():
        assert 0 < r["z_bytes"] and 0 < r["ratio_pm"] <= 1100
        assert r["ratio_pm"] == r["z_bytes"] * 1000 // r["n_bytes"]
    # determinism across runs (fixed zlib level)
    again = {r["doc_id"]: r.asDict() for r in t_compress(spark, str(sf)).collect()}
    assert out == again


def test_compress_aggregate_matches_python_oracle(spark):
    """The oracle-adjacent pin for the registry's one rows-only gate
    query: the per-corpus aggregate (row count, sum of byte counts,
    sum of permille ratios) from the Spark mapInPandas pass must equal
    a plain-Python zlib recomputation over the same parquet — the
    value-level proof SQL engines can't express for zlib."""
    import zlib

    import pyarrow.parquet as pq

    from cvemate_spark.queries.text_ops import t_compress

    sf = "/root/testdata/sf0.001"
    got = t_compress(spark, sf).groupBy().agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("nb"),
        F.sum("z_bytes").alias("zb"),
        F.sum("ratio_pm").alias("rp"),
    ).collect()[0]

    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
    n = nb = zb = rp = 0
    for txt in tbl.column("text").to_pylist():
        raw = txt.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        n += 1
        nb += len(raw)
        zb += z
        rp += (z * 1000) // len(raw)
    assert (got["n"], got["nb"], got["zb"], got["rp"]) == (n, nb, zb, rp)


def test_orc_roundtrip_is_value_exact(spark):
    from cvemate_spark.sources.landing import gen_orc_documents
    from cvemate_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    orc = spark.read.orc(gen_orc_documents(sf))
    pq = load_table(spark, sf, "documents")
    assert orc.count() == pq.count()
    assert orc.exceptAll(pq).count() == 0 and pq.exceptAll(orc).count() == 0


def test_winnow_guarantee_shared_fingerprint(spark, tmp_path):
    """Winnowing's theorem: docs sharing a verbatim run of at least
    K + W - 1 tokens select at least one common (hash, local-min)
    fingerprint hash."""
    from cvemate_spark.queries.text_ops import WIN_K, WIN_W, t_winnow

    shared = " ".join(f"s{i}" for i in range(WIN_K + WIN_W - 1))
    docs = [
        Row(doc_id=1, text=f"a1 a2 a3 a4 {shared} a5 a6 a7"),
        Row(doc_id=2, text=f"{shared} b1 b2 b3 b4 b5"),
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(30))),
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))
    out = t_winnow(spark, str(sf))
    assert out.count() == 3  # every long-enough doc emits fingerprints

    # recompute the selected hash sets per doc to check the overlap law
    from cvemate_spark.queries.text_ops import _POS_BITS  # noqa: F401
    import hashlib

    def fps(text: str) -> set[int]:
        t = text.split(" ")
        hs = [
            int(hashlib.md5(" ".join(t[i : i + WIN_K]).encode()).hexdigest()[:10], 16)
            for i in range(len(t) - WIN_K + 1)
        ]
        packed = [h * (1 << _POS_BITS) + i + 1 for i, h in enumerate(hs)]
        return {
            min(packed[i : i + WIN_W]) >> _POS_BITS
            for i in range(len(packed) - WIN_W + 1)
        }

    assert fps(docs[0].text) & fps(docs[1].text)  # shared run -> shared fp
    assert not (fps(docs[2].text) & fps(docs[0].text))


def test_winnow_position_overflow_raises(spark, tmp_path, monkeypatch):
    """The (hash, pos) pack is exact only while pos < 2^_POS_BITS; past
    the cap the job must fail loudly, never silently corrupt the
    frame-min. Proven by shrinking the cap to 8 positions and feeding a
    longer doc."""
    import pytest as _pytest

    import cvemate_spark.queries.text_ops as T

    docs = [Row(doc_id=1, text=" ".join(f"w{i}" for i in range(40)))]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))
    monkeypatch.setattr(T, "_POS_BITS", 3)
    with _pytest.raises(Exception, match="overflows"):
        T.t_winnow(spark, str(sf)).collect()


def test_entropy_extremes(spark, tmp_path):
    docs = [
        Row(doc_id=1, text="spam " * 50 + "spam"),          # one token: H = 0
        Row(doc_id=2, text=" ".join(f"w{i}" for i in range(51))),  # all distinct
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(docs).write.parquet(str(sf / "documents.parquet"))
    from cvemate_spark.queries.text_ops import t_entropy

    out = {r["doc_id"]: r.asDict() for r in t_entropy(spark, str(sf)).collect()}
    assert out[1]["ent_q"] == 0 and out[1]["n_distinct"] == 1
    # all-distinct: H*n = n*ln(n); quantized per term as floor(ln(51)*1e6)*51
    import math

    assert out[2]["ent_q"] == 51 * math.floor(math.log(51.0) * 1000000)
    assert out[2]["n_distinct"] == 51
