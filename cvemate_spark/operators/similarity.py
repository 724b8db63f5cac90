"""Embedding similarity search: brute-force cosine top-k, IVF probe, near-dup.

Spark-first design for 100 TB:

- the query vector rides along as a broadcast one-row DataFrame
  (crossJoin(broadcast(q))) — never a driver-side collect in the plan;
- dot products are `aggregate(zip_with(...))` lambda folds — JVM-side,
  codegen'd, no Python UDF, and sequential so the DuckDB oracle
  (list_reduce with the same fold order) is bit-identical;
- brute-force top-k is orderBy(limit(k)) = Catalyst
  TakeOrderedAndProject: per-partition top-k then a k-row merge on the
  driver — the correct distributed top-k, no global sort;
- the IVF variant (`ivf_topk`) is the scale path: vectors are
  pre-assigned to coarse centroids (one broadcast join + argmax), the
  query probes the nearest `n_probe` cells, and only those cells are
  scanned. At 100 TB the assignment is a write-time partition key, so
  a probe prunes partitions instead of filtering rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

# observability for the angular-bound pruner (neardup_pairs_topk_semdedup):
# set on every call — {cells, cell_pairs, survivors, L}. Read by tests and
# the SCALE.md candidate-growth measurements; never consumed by query logic.
LAST_PRUNE_STATS: dict | None = None

# cross-stage batch packing budgets for neardup_pairs_topk_semdedup —
# module-level so tests can shrink them to force the multi-batch path
# on small corpora (exactness must not depend on batch composition)
SEMDEDUP_WORK_BUDGET = 4_000_000  # pairwise dots per batch (~2 GFLOP @64d)
SEMDEDUP_ROW_BUDGET = 8_192  # member rows per batch (Arrow memory bound)

COS_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> double(x) * double(y)), 0D, (s, v) -> s + v)"
    " / (sqrt(aggregate(transform({a}, x -> double(x) * double(x)), 0D, (s, v) -> s + v))"
    " * sqrt(aggregate(transform({b}, x -> double(x) * double(x)), 0D, (s, v) -> s + v)))"
)


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (s, v) -> s + v)"
    )


def duck_cosine(a: str, b: str) -> str:
    """DuckDB cosine with the same sequential fold as COS_SPARK."""
    return f"({_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)})))"


def cosine_col(a: str, b: str) -> F.Column:
    return F.expr(COS_SPARK.format(a=a, b=b))


def _pfold_cos(ma, mb):
    """Vectorized PORTABLE-fold cosine over row pairs, bit-identical to
    COS_SPARK / duck_cosine: np.cumsum is a strict sequential prefix
    sum, so its last element is exactly the left fold the oracle
    computes (law-tested in tests/test_operators.py — random
    mixed-magnitude trials plus the float32 widen), and dot/norm
    products commute. Inputs are RAW float64 row matrices (exact
    widenings of the stored float32 vectors). Computing this inside
    the candidate-emitting Arrow stage removes the two id-joins and
    the extra embedding scans the separate rescore paid (guide §1.2 /
    §2.4 — the candidates already sit next to their vectors)."""
    import numpy as np

    dots = np.cumsum(ma * mb, axis=1)[:, -1]
    na = np.sqrt(np.cumsum(ma * ma, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(mb * mb, axis=1)[:, -1])
    return dots / (na * nb)


def brute_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Cosine top-k against one query vector; returns (vec_id) ranked."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "vec_id", cosine_col("embedding", "q_emb").alias("cos")
    )
    return (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
) -> tuple[list[tuple[int, list[float]]], list[float]]:
    """Spherical k-means (Lloyd's) over the embedding column — the
    iterative coarse-quantizer trainer behind a production IVF index.

    The Spark shape of an iterative algorithm: per-iteration state is
    the k centroid vectors (k rows — driver-bounded no matter the
    corpus size), each iteration is ONE distributed job — broadcast
    centroids -> argmax-cosine assignment (window rank, same shape as
    `ivf_topk`'s assign) -> per-dimension mean via posexplode +
    partial-aggregated groupBy — and only k centroid rows ever come
    back to the driver. Means are L2-normalized driver-side (k*dim
    floats), which keeps spherical k-means' cost monotone. Empty
    clusters keep their previous centroid. At 100 TB: train on a
    hash-sampled slice (the standard IVF recipe), cache the training
    slice, and ship the final centroids to `ivf_topk(cents=...)` as
    the write-time partition key.

    Returns (centroids as [(cent_id, unit_vector)], per-iteration mean
    cost 1-cos — non-increasing, asserted in tests).
    """
    spark = embeddings.sparkSession
    seeds = embeddings.orderBy("vec_id").limit(k).collect()
    cents = {
        i: _l2_normalize([float(x) for x in r["embedding"]])
        for i, r in enumerate(seeds)
    }
    costs: list[float] = []
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(cid, emb) for cid, emb in sorted(cents.items())],
            "cent_id int, cent_emb array<double>",
        )
        w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
        assigned = (
            embeddings.crossJoin(F.broadcast(cdf))
            .select(
                "vec_id",
                "embedding",
                "cent_id",
                cosine_col("embedding", "cent_emb").alias("cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        dim = len(next(iter(cents.values())))
        per_dim = (
            assigned.select(
                "cent_id",
                ((1.0 - F.col("cos")) / dim).alias("cost_part"),
                F.posexplode("embedding").alias("pos", "v"),
            )
            .groupBy("cent_id", "pos")
            .agg(F.avg("v").alias("m"), F.sum("cost_part").alias("c"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("emb"),
                F.sum("c").alias("cost"),
            )
            .collect()
        )
        costs.append(float(sum(r["cost"] for r in per_dim)))
        for r in per_dim:  # empty clusters keep their previous centroid
            cents[r["cent_id"]] = _l2_normalize([float(x) for x in r["emb"]])
    return sorted(cents.items()), costs


def _l2_normalize(vec: list[float]) -> list[float]:
    n = sum(x * x for x in vec) ** 0.5
    return [x / n for x in vec] if n > 0 else vec


def stride_cents(embeddings: DataFrame, centroid_stride: int = 50) -> DataFrame:
    """Deterministic coarse centroids: vectors whose id is a stride multiple
    (a seeded-sample stand-in kept for the DuckDB oracle's benefit)."""
    return embeddings.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )


def assign_cells(
    embeddings: DataFrame, cents: DataFrame, keep_cos: bool = False
) -> DataFrame:
    """Assign every vector to its nearest centroid (broadcast argmax).

    Centroids are the bounded small side — broadcast is correct at any
    corpus size (|cells| grows with sqrt(N) at most, not N). Returns
    (vec_id, embedding, cent_id); at 100 TB cent_id becomes a
    write-time partition key so probes prune partitions. With
    `keep_cos` the member-to-centroid cosine rides along as
    `cent_cos`, so downstream cell-radius aggregates need no re-join
    and no cosine recompute.
    """
    w = W.partitionBy("vec_id").orderBy(F.desc("cent_cos"), F.asc("cent_id"))
    out = (
        embeddings.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cent_id",
            cosine_col("embedding", "cent_emb").alias("cent_cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return out if keep_cos else out.drop("cent_cos")


def assign_cells_gemm(
    embeddings: DataFrame,
    cents: DataFrame,
    keep_cos: bool = False,
    keep_embedding: bool = False,
    crows: list | None = None,
) -> DataFrame:
    """`assign_cells` with the argmax computed as one BLAS matmul per
    Arrow batch instead of materializing the |n|·|C| crossJoin relation
    through JVM lambda folds + a window rank.

    Why it exists (round-4 second-decade measurement): the fold-based
    assignment materializes n·C rows and window-sorts them — at 200 k
    vectors x 4 000 cells that is an 800 M-row exchange for what is a
    51-GFLOP dense matmul. Here the bounded centroid matrix (k rows —
    the kmeans_fit driver-state precedent) rides into a mapInPandas
    closure, each Arrow batch scores batch x C in one float64 GEMM,
    and only (vec_id, cent_id) comes out — no corpus-sized wide
    relation ever exists. This keeps cells ∝ n affordable, which is
    what holds SemDeDup's within-cell pair count LINEAR in corpus
    size (constant cell occupancy) instead of n²/C.

    Tie-break matches assign_cells (max cosine, then ASC cent_id);
    the float64 GEMM and the sequential fold can disagree only on
    exact centroid-cosine ties within one ulp — validated
    hash-identical against the fold-based oracle at sf0.001/0.01/0.1
    (emb_semdedup_gemm).

    `crows` lets a caller that has ALREADY collected the bounded
    centroid relation (e.g. the neardup-semdedup driver geometry) hand
    the rows in, so the assignment costs zero extra Spark jobs instead
    of re-collecting the same relation (optimization r13: one of the
    operator's five driver actions removed this way).

    `keep_cos` / `keep_embedding` let callers that need the member
    payload or the member-to-centroid cosine downstream (the
    neardup-semdedup radius aggregate) carry them straight out of the
    closure — the GEMM already has both, so this replaces a
    corpus-sized re-join with a column passthrough. The carried
    cent_cos is the GEMM value (within ~d·ulp of the fold); consumers
    must tolerate that slack (the radius math's ANG_EPS dwarfs it).
    """
    import numpy as np
    import pandas as pd

    if crows is None:
        crows = cents.collect()  # bounded: one row per cell
    if not crows:  # empty corpus -> empty assignment (totality)
        cols = ["vec_id", F.lit(0).cast("int").alias("cent_id")]
        if keep_cos:
            cols.append(F.lit(0.0).alias("cent_cos"))
        if keep_embedding:
            cols.append("embedding")
        return embeddings.limit(0).select(*cols)
    cent_ids = np.array([int(r["cent_id"]) for r in crows])
    order = np.argsort(cent_ids)  # ASC cent_id for deterministic ties
    cent_ids = cent_ids[order]
    cm = np.vstack(
        [np.asarray(crows[i]["cent_emb"], dtype=np.float64) for i in order]
    )
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cos = m @ cm.T
            best = np.argmax(cos, axis=1)  # first (lowest cent_id) max wins
            out = {"vec_id": pdf["vec_id"].to_numpy(), "cent_id": cent_ids[best]}
            if keep_cos:
                out["cent_cos"] = cos[np.arange(len(best)), best]
            if keep_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    schema = "vec_id long, cent_id int"
    if keep_cos:
        schema += ", cent_cos double"
    if keep_embedding:
        emb_t = embeddings.schema["embedding"].dataType.simpleString()
        schema += f", embedding {emb_t}"
    return embeddings.mapInPandas(assign, schema=schema)


def semdedup_gemm(
    embeddings: DataFrame, tau: float = 0.30, centroid_stride: int = 50
) -> DataFrame:
    """`semdedup` served from the GEMM assignment: identical output
    contract (dup_id, rep_id, n_sim), same within-cell equi-join and
    JVM-fold threshold compare — only the cell-assignment stage is the
    Arrow GEMM argmax, and the vector payloads re-attach via one
    doc-keyed join (the corpus never flows through Python)."""
    assigned = assign_cells_gemm(
        embeddings, stride_cents(embeddings, centroid_stride)
    ).join(embeddings, "vec_id")
    a = assigned.select(
        "cent_id",
        F.col("vec_id").alias("rep_cand"),
        F.col("embedding").alias("a_emb"),
    )
    b = assigned.select(
        "cent_id",
        F.col("vec_id").alias("dup_id"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = (
        a.join(b, "cent_id")
        .filter(F.col("rep_cand") < F.col("dup_id"))
        .filter(cosine_col("a_emb", "b_emb") >= F.lit(tau))
    )
    return (
        pairs.groupBy("dup_id")
        .agg(
            F.min("rep_cand").alias("rep_id"),
            F.count("*").alias("n_sim"),
        )
        .orderBy("dup_id")
    )


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    cents: DataFrame | None = None,
    centroid_stride: int = 50,
    use_gemm: bool = False,
) -> None:
    """Materialize the IVF layout the scale docs promise: vectors
    written PARTITIONED BY their cell id, centroids alongside.

    Every in-memory IVF operator here notes "at 100 TB the assignment
    is a write-time partition key, so a probe prunes partitions" —
    this is that write. `path/vectors/cent_id=<c>/` holds each cell's
    vectors (Hive-style partitioning, so a cent_id predicate becomes
    PARTITION PRUNING — pruned directories are never listed, let alone
    read); `path/centroids/` holds the bounded centroid relation the
    probe side needs. Serving reads are `ivf_topk_indexed`, whose scan
    provably touches only the probed cells
    (tests/test_layout_sketch.py asserts inputFiles ⊂ probed dirs).

    Scale knobs (the sf10 measurement, tools/ivf_sf10.py, forced
    both): `use_gemm=True` computes the assignment as the Arrow-GEMM
    argmax instead of the n·C crossJoin fold — at 200k vectors x 4k
    cells the fold is an 800M-row exchange, the GEMM a 51-GFLOP
    matmul (validated hash-identical at the gated scales,
    emb_semdedup_gemm). The write always repartitions by cent_id
    first, so each cell lands in ONE task -> ONE file per directory;
    without it every write task emits a file into every cell it
    holds — up to tasks x cells tiny files, the object-store killer.
    """
    if cents is None:
        cents = stride_cents(embeddings, centroid_stride)
    if use_gemm:
        assigned = assign_cells_gemm(embeddings, cents).join(embeddings, "vec_id")
    else:
        assigned = assign_cells(embeddings, cents)
    (
        assigned.repartition("cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(f"{path}/vectors")
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    # secondary index vec_id -> cent_id, RANGE-sorted by vec_id so a
    # point lookup prunes to one file + one row group via parquet
    # min/max stats — the corpus-internal query-row fetch in
    # ivf_topk_indexed would otherwise scan the whole vectors table
    # (vec_ids are scattered across cell dirs, so their per-file
    # stats prune nothing). Payload is 2 longs/vector: ~16 B * n,
    # negligible next to the vectors themselves.
    (
        assigned.select("vec_id", "cent_id")
        .repartitionByRange(16, "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(f"{path}/vec_index")
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Serve an IVF top-k FROM the partitioned index — the production
    read path, where cell pruning happens in the filesystem layout
    instead of a runtime filter over all rows.

    The probe list comes from the bounded centroid relation (driver
    k-row collect, the kmeans_fit precedent); `cent_id IN (probes)` on
    a cent_id-partitioned table is satisfied by PartitionFilters at
    scan planning: unprobed directories are never read. Output is
    identical to `ivf_topk` over the same vectors/centroids (law in
    tests/test_layout_sketch.py); the difference is the scan's
    inputFiles — |probed cells| directories instead of the corpus.
    """
    import os

    cents = spark.read.parquet(f"{path}/centroids")
    try:
        vectors = spark.read.parquet(f"{path}/vectors")
    except Exception as e:  # empty-corpus index: no files, no schema
        raise ValueError(
            f"ivf_topk_indexed: index at {path!r} holds no vectors — "
            f"query vec_id={query_vec_id} cannot exist"
        ) from e
    # the query vector is ONE row (in production it arrives with the
    # request, not from the corpus) — fetch it driver-side so the
    # serving plan's ONLY corpus scan is the probed-cells scan, which
    # keeps the partition-pruning law assertable on inputFiles.
    # Lookup path: the vec_id-sorted secondary index maps the query id
    # to its cell (point filter -> one file/row group via parquet
    # stats), then the embedding read is partition-pruned to that one
    # cell — bounded I/O however large the corpus. Indexes written
    # before the vec_index existed fall back to the full-table filter
    # (correct, just unpruned).
    if os.path.isdir(f"{path}/vec_index"):
        idx_row = (
            spark.read.parquet(f"{path}/vec_index")
            .filter(F.col("vec_id") == query_vec_id)
            .first()
        )
        qrow = (
            None
            if idx_row is None
            else vectors.filter(
                (F.col("cent_id") == idx_row["cent_id"])
                & (F.col("vec_id") == query_vec_id)
            )
            .select("embedding")
            .first()
        )
    else:
        qrow = (
            vectors.filter(F.col("vec_id") == query_vec_id)
            .select("embedding")
            .first()
        )
    if qrow is None:
        raise ValueError(
            f"ivf_topk_indexed: query vec_id={query_vec_id} not found in "
            f"index at {path!r} — pass a vec_id present in the indexed "
            "vectors (or serve an external query vector via ivf_topk)"
        )
    q_lit = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    probed = (
        cents.withColumn("q", q_lit)
        .select("cent_id", cosine_col("cent_emb", "q").alias("qc"))
        .orderBy(F.desc("qc"), F.asc("cent_id"))
        .limit(n_probe)
        .collect()
    )
    probe_ids = [int(r["cent_id"]) for r in probed]
    return (
        vectors.filter(F.col("cent_id").isin(probe_ids))
        .withColumn("q", q_lit)
        .select("vec_id", cosine_col("embedding", "q").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )


def ivf_topk_indexed_batch(
    spark,
    path: str,
    n_queries: int = 8,
    k: int = 10,
    n_probe: int = 3,
    query_rows: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """AMORTIZED many-query serve over the PERSISTED index (VERDICT r5
    item 4): one partition-pruned scan answers |Q| queries.

    `ivf_topk_indexed` pays full Spark-job latency per query — correct
    pruning, but listing + scheduling dominate when queries arrive in
    batches (IVFBENCH r5: 6-13 s wall per probe set at sf10). Here the
    batch shares ONE plan: the scan's PartitionFilters is the UNION of
    every query's probe cells (still a literal IN-list, so pruning
    happens at listing time — unprobed directories are never listed),
    and per-query scoping rides a broadcast join against the
    (q_id, cent_id, q_emb) probe relation (|Q|·n_probe rows). Listing,
    scan, and scheduling amortize across the batch; files read ≤
    |Q|·n_probe directories however large the corpus.

    Query resolution (all BOUNDED driver work, resolved before the
    returned plan so its only file scan is the pruned cells scan —
    same structure as the single-query server):
    1. query embeddings: |Q| rows via the vec_id-sorted secondary
       index (point-pruned), or passed in as `query_rows` (the
       production shape — queries arrive with the request);
    2. per-query probe ranking: queries × centroids (bounded side)
       computed Spark-side with the SAME cosine expression as the
       in-memory path, so float ties break identically and the output
       is law-equal to `ivf_topk_batch` (tests/test_layout_sketch.py).

    Returns (q_id, vec_id), the per-query top-k.
    """
    import os

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    try:
        vectors = spark.read.parquet(f"{path}/vectors")
    except Exception:
        # an index written from an EMPTY corpus has no data files to
        # infer a schema from — an empty batch answer, not a crash
        # (empty slices are routine at 100 TB)
        from pyspark.sql.types import LongType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [StructField("q_id", LongType()), StructField("vec_id", LongType())]
            ),
        )
    if query_rows is None:
        # bounded fetch of the query vectors from the index itself
        if os.path.isdir(f"{path}/vec_index"):
            idx = (
                spark.read.parquet(f"{path}/vec_index")
                .filter(F.col("vec_id") < n_queries)
                .collect()
            )
            qcells = sorted({int(r["cent_id"]) for r in idx})
            qsrc = vectors.filter(
                F.col("cent_id").isin(qcells) & (F.col("vec_id") < n_queries)
            )
        else:
            qsrc = vectors.filter(F.col("vec_id") < n_queries)
        query_rows = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in qsrc.select("vec_id", "embedding").collect()
        ]
    if not query_rows:
        raise ValueError("ivf_topk_indexed_batch: empty query batch")
    qschema = StructType(
        [
            StructField("q_id", LongType()),
            StructField("q_emb", ArrayType(DoubleType())),
        ]
    )
    queries_df = spark.createDataFrame(query_rows, qschema)

    # probe ranking: separate bounded job (queries × centroids), NOT
    # part of the returned plan — mirrors the single-query server
    cents = spark.read.parquet(f"{path}/centroids")
    w_probe = W.partitionBy("q_id").orderBy(F.desc("qc"), F.asc("cent_id"))
    probe_rows = (
        cents.crossJoin(F.broadcast(queries_df))
        .select(
            "q_id",
            "cent_id",
            cosine_col("cent_emb", "q_emb").alias("qc"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "cent_id")
        .collect()
    )
    probe_cells = sorted({int(r["cent_id"]) for r in probe_rows})
    pschema = StructType(
        [StructField("q_id", LongType()), StructField("cent_id", LongType())]
    )
    probes_df = spark.createDataFrame(
        [(int(r["q_id"]), int(r["cent_id"])) for r in probe_rows], pschema
    )

    w_topk = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        vectors.filter(F.col("cent_id").isin(probe_cells))  # static pruning
        .join(F.broadcast(probes_df), "cent_id")
        .join(F.broadcast(queries_df), "q_id")
        .select("q_id", "vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    centroid_stride: int = 50,
    n_probe: int = 3,
    cents: DataFrame | None = None,
    use_gemm: bool = False,
) -> DataFrame:
    """IVF-style ANN: coarse centroids, probe nearest cells, scan only those.

    Deterministic "training": by default centroids come from
    `stride_cents` (oracle-expressible); the plumbing — broadcast
    assign, cell pruning, in-cell top-k — is the production shape. Pass
    `cents` (cent_id, cent_emb) — e.g. from `kmeans_fit` — to serve
    from trained centroids instead. `use_gemm=True` swaps the
    assignment stage for the Arrow-GEMM argmax (the second-decade
    setting; see write_ivf_index).
    """
    if cents is None:
        cents = stride_cents(embeddings, centroid_stride)
    if use_gemm:
        assigned = assign_cells_gemm(embeddings, cents).join(embeddings, "vec_id")
    else:
        assigned = assign_cells(embeddings, cents)
    # the query probes its n_probe nearest centroids
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", cosine_col("cent_emb", "q_emb").alias("qc"))
        .orderBy(F.desc("qc"), F.asc("cent_id"))
        .limit(n_probe)
        .select("cent_id")
    )
    # in-cell scan + global top-k merge
    return (
        assigned.join(F.broadcast(probed), "cent_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )


def ivf_topk_batch(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    centroid_stride: int = 50,
    n_probe: int = 3,
    cents: DataFrame | None = None,
    use_gemm: bool = False,
) -> DataFrame:
    """Batched IVF probe: N query vectors served in ONE plan.

    The single-query `ivf_topk` rides the query along as a broadcast
    1-row relation; that shape re-runs the whole plan per query. Here
    the queries are a *relation*: per-query probe cells come from a
    window rank over the (queries × centroids) broadcast product —
    centroids are the bounded side, so this is |Q|·|C| rows, never
    |Q|·|data| — and data flows through one equi-join on `cent_id`
    between the assigned vectors and the probe list. At 100 TB the
    assignment is a write-time partition key, the probe join prunes to
    the probed cells, and adding queries adds rows to the small side
    of one join instead of whole plan re-runs. No crossJoin against
    the data side anywhere.

    Returns (q_id, vec_id): the per-query top-k, self-matches included
    (rank 1 is the query itself, as with any recall-oriented ANN).

    Pass `cents` (cent_id, cent_emb — e.g. from `kmeans_fit`) to serve
    from trained centroids; default is the oracle-expressible stride
    quantizer. `use_gemm=True` swaps the n·C crossJoin-fold assignment
    for the Arrow-GEMM argmax (the second-decade setting, same as
    `ivf_topk`/`write_ivf_index` — validated hash-identical at the
    gated scales).
    """
    if cents is None:
        cents = stride_cents(embeddings, centroid_stride)
    if use_gemm:
        assigned = assign_cells_gemm(embeddings, cents).join(embeddings, "vec_id")
    else:
        assigned = assign_cells(embeddings, cents)
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w_probe = W.partitionBy("q_id").orderBy(F.desc("qc"), F.asc("cent_id"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "q_id", "q_emb", "cent_id", cosine_col("cent_emb", "q_emb").alias("qc")
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "cent_id", "q_emb")
    )
    w_topk = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        assigned.join(probes, "cent_id")
        .select("q_id", "vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )


def trained_ivf_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    k_cents: int = 8,
    iters: int = 3,
    n_probe: int = 3,
    min_recall_pm: int = 600,
) -> DataFrame:
    """Measured recall gate for the TRAINED IVF path: fit spherical
    k-means, serve the batched IVF top-k from the trained centroids,
    and compare against the exact brute-force top-k.

    Output is ONE row: (n_queries, k, brute_ids_sum, recall_ok) where
    `brute_ids_sum` is the sum of the exact top-k vec_ids over all
    queries (oracle-computable: DuckDB reproduces the brute truth
    bit-exactly with the same cosine fold) and `recall_ok` gates
    aggregate recall@k >= min_recall_pm permille. The e_hll pattern:
    the approximate path is proven by MEASUREMENT against the exact
    one inside the gated query itself, so a quantizer regression
    (bad training, wrong probe join) flips the boolean and fails the
    hash gate. kmeans_fit's cost-monotonicity/determinism laws live in
    tests/test_new_ops.py; this gate proves the trained centroids
    actually serve good neighbors."""
    spark = embeddings.sparkSession
    cents_list, _ = kmeans_fit(embeddings, k=k_cents, iters=iters)
    cdf = spark.createDataFrame(
        [(cid, v) for cid, v in cents_list], "cent_id int, cent_emb array<double>"
    )
    ivf = ivf_topk_batch(
        embeddings, n_queries=n_queries, k=k, n_probe=n_probe, cents=cdf
    )
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w_topk = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    brute = (
        embeddings.crossJoin(F.broadcast(queries))
        .select("q_id", "vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .withColumn("rn", F.row_number().over(w_topk))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )
    hits = ivf.join(brute, ["q_id", "vec_id"]).agg(
        F.count("*").alias("n_hits")
    )
    truth = brute.agg(
        F.countDistinct("q_id").alias("n_queries"),
        (F.count("*") / F.countDistinct("q_id")).cast("long").alias("k"),
        F.sum("vec_id").alias("brute_ids_sum"),
    )
    return truth.crossJoin(hits).select(
        "n_queries",
        "k",
        "brute_ids_sum",
        (
            F.col("n_hits") * 1000 >= F.lit(min_recall_pm) * n_queries * k
        ).alias("recall_ok"),
    )


def neardup_pairs_topk(
    embeddings: DataFrame, k: int = 20, n_blocks: int = 8
) -> DataFrame:
    """Top-k most-similar distinct pairs (embedding near-dup candidates).

    Blocked pairwise kernel — the shape that survives 100 TB:
    vectors are hashed into `n_blocks` blocks; every block *pair*
    (b1 <= b2) becomes one group whose members arrive via
    `applyInPandas`, where a float64 BLAS matmul scores the whole
    block-cross at once and emits only that group's local top-k.
    The global answer is the k-row merge of per-group candidates
    (TakeOrderedAndProject), so driver traffic is O(groups * k), and
    compute is n^2/2 dot products done as dense GEMM, not 2M
    interpreted expression folds. Each vector is replicated n_blocks
    times — the standard replication/compute trade of block joins.
    Pick n_blocks so one block-pair's GEMM tile fits executor memory:
    at 100 TB that means hundreds of blocks; at bench scale 8 keeps
    every core busy without replication dominating.

    Portability at the boundary (found by the sf1 oracle sweep): BLAS
    sums dot products in a different order than a sequential fold, so
    GEMM cosines differ from the oracle's in the last ulp — harmless
    until the corpus has near-ties at the global k-th rank (the
    sign-flipped sf1 copies manufacture exactly that), where the ulp
    decides set membership. So GEMM only SELECTS candidates (top-2k
    per block-pair group — k plus a tie margin), and the final
    ranking re-scores that O(groups·k) sliver with the portable
    sequential fold (the identical expression the DuckDB oracle and
    q26 use), making the output bit-exact at any scale. The candidate
    relation is O(groups·k) PLUS any exact-tie plateau at the
    selection threshold — quadratic in duplicate multiplicity on a
    duplicate-heavy corpus. It has exactly ONE consumer in the final
    plan (see the NOTE below: the second, d2-distinct semi-filter
    subtree was removed, so no persist is needed — the GEMM stage runs
    once per action) and it is never broadcast-hinted: AQE broadcasts
    it at runtime when it is actually small and degrades to a shuffled
    join instead of an executor OOM when a plateau blows it up (the
    same no-forced-broadcast rule the dedup verify pins).
    """
    import numpy as np
    import pandas as pd

    nb = n_blocks
    k_emit = 2 * k  # per-group margin so ulp-reordered boundary pairs survive selection

    def pair_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        b1, b2 = int(pdf["b1"].iloc[0]), int(pdf["b2"].iloc[0])
        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1] if b1 != b2 else left
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"d1": [], "d2": [], "cos": []}).astype(
                {"d1": "int64", "d2": "int64", "cos": "float64"}
            )
        lraw = np.vstack(left["embedding"].to_numpy()).astype(np.float64)
        rraw = (
            np.vstack(right["embedding"].to_numpy()).astype(np.float64)
            if b1 != b2
            else lraw
        )
        lm = lraw / np.linalg.norm(lraw, axis=1, keepdims=True)
        rm = (
            rraw / np.linalg.norm(rraw, axis=1, keepdims=True)
            if b1 != b2
            else lm
        )
        cos = lm @ rm.T
        lid = left["vec_id"].to_numpy()
        rid = right["vec_id"].to_numpy()
        if b1 == b2:
            # one orientation per within-block pair: mask the lower
            # triangle + diagonal in-place (-inf never survives the
            # selection). Position-based masking + the id min/max
            # canonicalization below yields the same unordered pair
            # set as the previous explicit li<rj id filter.
            cos[np.tri(len(lid), dtype=bool)] = -np.inf
        c = cos.ravel()
        # Threshold-select on the FLAT score array first and only then
        # materialize ids for the survivors (idx -> row, col): the old
        # meshgrid path built two m-row id arrays plus min/max/compare
        # over all m = |left|*|right| pairs per group — at sf1 that is
        # ~6M-row temporaries x several arrays x 36 groups of pure
        # allocation for pairs the selection immediately discards.
        if len(c) > k_emit:
            # O(m) threshold selection with an ulp-proof margin: find
            # the k_emit-th largest GEMM cosine and keep EVERYTHING
            # >= (kth - EPS). The margin is what makes selection
            # EXACT, not heuristic: a pair's GEMM score and its
            # portable-fold score differ by at most
            # delta ~ d * ulp ~ 1.4e-14 (64 dims, unit vectors), so
            # with EPS > 2*delta, any pair cut here has >= k_emit
            # group-mates whose PORTABLE scores strictly beat its own
            # portable score — i.e. it provably cannot be in the
            # global top-k (k_emit >= k). A duplicate-heavy corpus
            # (the sf1 derivation puts ~10k exact-tie pairs at
            # cos=1.0 on each diagonal block group) therefore emits
            # its whole plateau — the one case where emission exceeds
            # O(k), bounded by duplicate multiplicity, and exactly
            # the case where cutting inside the plateau by GEMM order
            # produced wrong top-k membership. No local sort: the
            # distributed rescore does the only ordering that counts.
            kth = -np.partition(-c, k_emit - 1)[k_emit - 1]
            keep = c >= kth - 1e-12
        else:
            keep = np.ones(len(c), dtype=bool)
        # the kth value can be -inf when a diagonal group has fewer
        # than k_emit VALID (upper-triangle) pairs, and -inf >= -inf
        # passes the margin compare — masked entries must never emit
        keep &= np.isfinite(c)
        idx = np.nonzero(keep)[0]
        ncols = len(rid)
        li, rj = lid[idx // ncols], rid[idx % ncols]
        # canonicalize (cross-block groups exist only for b1 < b2, so
        # both id orderings occur and must map to (min, max))
        d1, d2 = np.minimum(li, rj), np.maximum(li, rj)
        # the emitted score is the PORTABLE fold for survivors (see
        # _pfold_cos) — the GEMM scores only selected; the downstream
        # total order therefore needs no rescore joins
        pcos = _pfold_cos(lraw[idx // ncols], rraw[idx % ncols])
        return pd.DataFrame({"d1": d1, "d2": d2, "cos": pcos})

    # replicate each vector to every block pair it participates in
    with_block = embeddings.select(
        "vec_id", "embedding", (F.col("vec_id") % nb).alias("b")
    )
    lefts = with_block.select(
        "vec_id",
        "embedding",
        F.col("b").alias("b1"),
        F.explode(F.expr(f"sequence(b, {nb - 1})")).alias("b2"),
        F.lit(0).alias("side"),
    )
    rights = with_block.select(
        "vec_id",
        "embedding",
        F.explode(F.expr("sequence(0, b)")).alias("b1"),
        F.col("b").alias("b2"),
        F.lit(1).alias("side"),
    ).filter(F.col("b1") != F.col("b2"))
    candidates = (
        lefts.unionByName(rights)
        .groupBy("b1", "b2")
        .applyInPandas(pair_groups, schema="d1 long, d2 long, cos double")
    )
    # NOTE: candidates appears exactly ONCE in the final plan (the
    # d2-distinct semi-filter subtree that used to consume it a second
    # time is gone), so the blocked GEMM stage runs once per action —
    # no persist needed, no recompute to guard.
    # The portable sequential-fold score was computed INSIDE the GEMM
    # stage for the bounded candidate sliver (_pfold_cos — the vectors
    # are already in the task), so the bit-exact total order needs no
    # rescore joins and no extra embedding scans.
    return (
        candidates.orderBy(F.desc("cos"), F.asc("d1"), F.asc("d2"))
        .limit(k)
        .select("d1", "d2")
    )


def neardup_pairs_topk_semdedup(
    embeddings: DataFrame,
    k: int = 20,
    centroid_stride: int = 50,
) -> DataFrame:
    """EXACT top-k most-similar distinct pairs via CLUSTER-BOUNDED GEMM
    with angular-bound pruning — the sub-quadratic route for the same
    question `neardup_pairs_topk` answers with deliberate all-pairs
    work.

    `neardup_pairs_topk` is quadratic BY CONTRACT (every block pair
    meets). This variant bounds where expensive work happens with
    SemDeDup-style coarse cells (the `semdedup` clustering stage) and
    stays EXACT by a two-phase ball-tree-join argument instead of a
    recall hope:

    1. every vector is assigned to its nearest cell (Arrow-GEMM
       argmax, `assign_cells_gemm` — a partitioning, not a
       replication; any tie-shift between the GEMM and the fold
       argmax moves a vector between cells without touching
       soundness, since radii are computed from actual members and
       the result is gated against the brute oracle); the within-cell
       GEMM yields candidate pairs whose k-th GEMM cosine, minus a
       margin dominating the GEMM-vs-portable-fold divergence
       (~d·ulp), is a LOWER bound L on the global k-th best portable
       cosine (within-cell pairs are a subset — adding cross-cell
       pairs can only raise the k-th best). k rows to the driver —
       bounded, the kmeans_fit precedent.
    2. for each cell: its angular radius r = max member angle to its
       centroid (one C-row aggregate). For a cell pair (a, b) with
       centroid angle θ_ab, the spherical triangle inequality gives
       every cross pair angle >= θ_ab - r_a - r_b, i.e. cosine
       <= cos(max(0, θ_ab - r_a - r_b)) = ub(a, b). Cell pairs with
       ub < L (safe-side ε margins on both sides) are PRUNED — no
       member of those two cells can form a top-k pair, proven, not
       assumed. Surviving cell pairs run the cross-cell GEMM with the
       same ulp-margin top-2k cut, the union of both phases feeds the
       portable-fold rescore, and the total order is bit-exact.

    Work: within-cell n²/C plus cross work only where the similarity
    structure demands it. On a near-dup-heavy corpus (the SemDeDup
    regime this targets) L ≈ 1, so only near-overlapping cells
    survive and total work is ~n²/C with C growing with the corpus —
    genuinely sub-quadratic. On an unclustered corpus whose top-k
    pairs are weak (cos ~0.4 — exactly what the sf* testdata is) most
    cell pairs survive and the operator honestly degrades to blocked
    all-pairs — the price of exactness, and the reason emb_neardup's
    quadratic contract still exists. The gated query
    (emb_neardup_semdedup) hash-checks this route against the EXACT
    brute-force oracle, so a pruning-soundness bug fails the gate.

    Centroids default to the oracle-expressible `stride_cents`
    (deterministic); `kmeans_fit` centroids slot in for production.
    """
    import math

    import numpy as np
    import pandas as pd

    global LAST_PRUNE_STATS
    k_emit = 2 * k
    ANG_EPS = 1e-6  # safe-side slack on driver-side angle arithmetic
    cents = stride_cents(embeddings, centroid_stride)
    # ONE collect of the bounded centroid relation, shared with the
    # GEMM assignment (crows passthrough) and the driver geometry
    # below — the operator used to run this exact job twice
    # (optimization r13, guide §1.2: don't compute things twice).
    crows = cents.collect()
    # GEMM assignment with embedding + cent_cos carried through: the
    # cell-radius aggregate below then needs no centroid re-join and
    # no cosine recompute, and no n·C crossJoin relation ever exists
    assigned = assign_cells_gemm(
        embeddings, cents, keep_cos=True, keep_embedding=True, crows=crows
    ).persist()

    def diag_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-cell GEOMETRY rides along as one sentinel row per group
        # (d1 = -1 - n_members, d2 = cent_id, gcos = min member
        # cent_cos): the cell-radius/size aggregate that used to be a
        # separate groupBy job over the cached assignment now costs
        # zero extra passes — this applyInPandas already holds the
        # whole cell (optimization r13, one driver action removed).
        sentinel = pd.DataFrame(
            {
                "d1": np.array([-1 - len(pdf)], dtype="int64"),
                "d2": np.array([int(pdf["cent_id"].iloc[0])], dtype="int64"),
                "gcos": np.array([float(pdf["cent_cos"].min())], dtype="float64"),
                "pcos": np.array([0.0], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return sentinel
        raw = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        m = raw / np.linalg.norm(raw, axis=1, keepdims=True)
        cos = m @ m.T
        ids = pdf["vec_id"].to_numpy()
        # flat selection before id materialization (see pair_groups):
        # mask lower triangle + diagonal, threshold-cut on the flat
        # score array with the same ulp-proof margin, then derive
        # (row, col) ids for survivors only.
        cos[np.tri(len(ids), dtype=bool)] = -np.inf
        c = cos.ravel()
        if len(c) > k_emit:
            kth = -np.partition(-c, k_emit - 1)[k_emit - 1]
            keep = c >= kth - 1e-12
        else:
            keep = np.ones(len(c), dtype=bool)
        keep &= np.isfinite(c)
        idx = np.nonzero(keep)[0]
        li, rj = ids[idx // len(ids)], ids[idx % len(ids)]
        d1, d2 = np.minimum(li, rj), np.maximum(li, rj)
        # portable cosine for survivors only, in-stage (see _pfold_cos)
        pcos = _pfold_cos(raw[idx // len(ids)], raw[idx % len(ids)])
        return pd.concat(
            [sentinel, pd.DataFrame({"d1": d1, "d2": d2, "gcos": c[idx], "pcos": pcos})],
            ignore_index=True,
        )

    # the GEMM cosine rides along so the pruning bound needs no
    # portable-rescore round trip; the candidate relation (pairs of
    # ids + a double) is persisted instead of the rescored one — the
    # single portable rescore now runs once, over the diag ∪ cross
    # union, inside the final action
    cand_diag = (
        assigned.groupBy("cent_id")
        .applyInPandas(
            diag_pairs, schema="d1 long, d2 long, gcos double, pcos double"
        )
        .persist()
    )
    # ONE driver action fetches both phase-1 products off the cached
    # candidate relation, as ONE TakeOrdered pass (was a union of two
    # legs, each scanning the cache as its own job — 5 jobs total at
    # r13 close; guide §1.2): sentinels (d1 < 0) sort before every
    # pair row, then pair rows by gcos descending, and limit
    # |cells| + k. All sentinels fit (at most one per non-empty cell,
    # |crows| bounds them), so the tail of the collected rows is
    # exactly the top-k within-cell GEMM cosines, possibly padded
    # with extra pair rows when some cells are empty — ignored by the
    # k-th-element read below.
    #
    # L, the phase-1 lower bound, is the k-th best within-cell GEMM
    # cosine minus a margin that dominates the GEMM-vs-portable-fold
    # divergence (delta ~ d·ulp ~ 1.4e-14 at 64 dims): kth_gemm − 1e-9
    # ≤ kth_portable_within ≤ kth_portable_global, so pruning against
    # it stays provably safe. -inf when the corpus has fewer than k
    # within-cell pairs — then nothing prunes.
    fetched = (
        cand_diag.orderBy(
            (F.col("d1") >= 0).asc(), F.desc("gcos"),
            F.asc("d1"), F.asc("d2"),
        )
        .limit(len(crows) + k)
        .collect()
    )
    geo_rows = [r for r in fetched if r["d1"] < 0]
    top_cos = sorted((float(r["gcos"]) for r in fetched if r["d1"] >= 0),
                     reverse=True)
    L = top_cos[k - 1] - 1e-9 if len(top_cos) >= k else float("-inf")

    if not geo_rows:  # empty corpus -> no cells, no pairs (totality)
        return cand_diag.select("d1", "d2").limit(0)
    cent_emb = {
        int(r["cent_id"]): np.asarray(r["cent_emb"], dtype=np.float64)
        for r in crows
    }
    # sorted: collect order is shuffle-nondeterministic, and the tile
    # packing below keys off dense positions in this list
    cent_ids = sorted(int(r["d2"]) for r in geo_rows)
    cm = np.vstack([cent_emb[c] for c in cent_ids])
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)
    radius = {
        int(r["d2"]): math.acos(max(-1.0, min(1.0, float(r["gcos"]))))
        + ANG_EPS
        for r in geo_rows
    }
    size = {int(r["d2"]): int(-r["d1"] - 1) for r in geo_rows}
    n_cells = len(cent_ids)

    # Vectorized cell-pair survival + TILE-granular packing. The
    # per-pair Python loop and per-survivor pair list were the scale
    # liability: at C cells the driver paid O(C²) loop iterations and
    # shipped O(survivors) pair tuples inside the UDF closure (~8M
    # pairs / hundreds of MB at sf10's C≈4000). Instead:
    #   * the survival mask is ONE numpy expression over the C×C
    #     angle matrix (cells already cap C at ~sqrt-corpus scale);
    #   * cells group into tiles of g dense indices, g sized so a
    #     full tile pair ≈ one work budget (the blocked-GEMM square
    #     decomposition — also bounds member replication at ~C/(g·s̄)
    #     instead of lexicographic packing's ~C/g copies);
    #   * batches are built from tile PAIRS that contain at least one
    #     surviving cell pair, so driver + closure state is
    #     O(C·d + tile_pairs), never O(survivors);
    #   * each worker re-derives its blocks' survival mask from the
    #     shipped geometry (cm rows, radii, L). The driver and worker
    #     evaluate the same double-precision expression; a last-ulp
    #     disagreement at the threshold is absorbed by the 1e-9 slack
    #     (a pair at ub < L is provably outside the top-k either
    #     way), and tiles are selected by the driver mask, which can
    #     only ADD a no-op empty block, never drop a surviving one —
    #     wait: selection uses the driver mask, the worker mask could
    #     in principle keep a pair the driver's tile screen dropped
    #     only if the whole tile pair had zero driver-surviving
    #     pairs, in which case every such pair sits below L and emits
    #     nothing that can reach the top-k. Exactness is inherited;
    #     the gate is the brute oracle regardless.
    # Inside a surviving block each cell pair still runs its own GEMM
    # with the SAME ulp-margin top-k_emit cut, so the candidate
    # multiset matches the per-pair formulation pair-for-pair.
    WORK_BUDGET = SEMDEDUP_WORK_BUDGET
    ROW_BUDGET = SEMDEDUP_ROW_BUDGET
    r_arr = np.array([radius[c] for c in cent_ids])
    sz_arr = np.array([size[c] for c in cent_ids], dtype=np.int64)
    thetas = np.arccos(np.clip(cm @ cm.T, -1.0, 1.0))
    gap = thetas - r_arr[:, None] - r_arr[None, :] - ANG_EPS
    ub = np.cos(np.maximum(0.0, gap))
    mask = ub >= L - 1e-9
    mask[np.tril_indices(n_cells)] = False  # upper triangle: i < j
    n_survivors = int(mask.sum())

    avg_s = max(1.0, float(sz_arr.mean()))
    g = max(1, int(math.sqrt(WORK_BUDGET) / avg_s))
    n_tiles = -(-n_cells // g)
    pad = n_tiles * g - n_cells
    work = np.where(mask, sz_arr[:, None] * sz_arr[None, :], 0)
    wp = np.pad(work, ((0, pad), (0, pad)))
    blk_work = wp.reshape(n_tiles, g, n_tiles, g).sum(axis=(1, 3))
    mp = np.pad(mask, ((0, pad), (0, pad)))
    blk_live = mp.reshape(n_tiles, g, n_tiles, g).any(axis=(1, 3))
    tile_rows = np.pad(sz_arr, (0, pad)).reshape(n_tiles, g).sum(axis=1)

    # greedy pack of live tile pairs (upper triangle incl. diagonal:
    # a diagonal tile holds its own cross-cell pairs) — O(tiles²)
    # iterations, tiles ≈ C·s̄/√WORK_BUDGET
    batches: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cur_tiles: set[int] = set()
    cur_work = 0
    for ta in range(n_tiles):
        for tb in range(ta, n_tiles):
            if not blk_live[ta, tb]:
                continue
            w = int(blk_work[ta, tb])
            new_tiles = cur_tiles | {ta, tb}
            rows = int(sum(tile_rows[t] for t in new_tiles))
            if cur and (cur_work + w > WORK_BUDGET or rows > ROW_BUDGET):
                batches.append(cur)
                cur, cur_tiles, cur_work = [], set(), 0
            cur.append((ta, tb))
            cur_tiles |= {ta, tb}
            cur_work += w
    if cur:
        batches.append(cur)
    LAST_PRUNE_STATS = {
        "cells": n_cells,
        "cell_pairs": n_cells * (n_cells - 1) // 2,
        "survivors": n_survivors,
        "tile_pairs": sum(len(b) for b in batches),
        "batches": len(batches),
        "L": L,
    }

    if n_survivors:
        spark = embeddings.sparkSession
        batch_tiles = {bi: tiles for bi, tiles in enumerate(batches)}
        dense = {c: i for i, c in enumerate(cent_ids)}
        cellmap_rows = sorted(
            {
                (bi, cent_ids[idx])
                for bi, tiles in batch_tiles.items()
                for ab in tiles
                for t in ab
                for idx in range(t * g, min((t + 1) * g, n_cells))
            }
        )
        cellmap = spark.createDataFrame(
            cellmap_rows, "batch int, cent_id int"
        )
        members = assigned.join(F.broadcast(cellmap), "cent_id").select(
            "batch", "cent_id", "vec_id", "embedding"
        )
        # closure state for the workers: O(C·d) geometry, O(C) radii
        # and dense ids, O(tile_pairs) block list — never pair lists
        w_cm, w_r, w_dense, w_L = cm, r_arr, dense, L

        def cross_batch(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            tiles = batch_tiles.get(int(key[0]), [])
            cells: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
            for cid, grp in pdf.groupby("cent_id"):
                raw = np.vstack(grp["embedding"].to_numpy()).astype(np.float64)
                m = raw / np.linalg.norm(raw, axis=1, keepdims=True)
                cells[w_dense[int(cid)]] = (grp["vec_id"].to_numpy(), m, raw)
            d1s: list[np.ndarray] = []
            d2s: list[np.ndarray] = []
            pcs: list[np.ndarray] = []
            for ta, tb in tiles:
                for ia in range(ta * g, (ta + 1) * g):
                    la = cells.get(ia)
                    if la is None:
                        continue
                    lo_b = max(tb * g, ia + 1)
                    for ib in range(lo_b, (tb + 1) * g):
                        rb = cells.get(ib)
                        if rb is None:
                            continue
                        # re-derive this pair's survival from the
                        # shipped geometry (same expression as the
                        # driver mask)
                        th = math.acos(
                            max(-1.0, min(1.0, float(w_cm[ia] @ w_cm[ib])))
                        )
                        pg = th - w_r[ia] - w_r[ib] - ANG_EPS
                        if math.cos(max(0.0, pg)) < w_L - 1e-9:
                            continue
                        (lid, lm, lraw), (rid, rm, rraw) = la, rb
                        c = (lm @ rm.T).ravel()
                        if len(c) > k_emit:
                            kth = -np.partition(-c, k_emit - 1)[k_emit - 1]
                            keep = np.nonzero(c >= kth - 1e-12)[0]
                        else:
                            keep = np.arange(len(c))
                        li, rj = lid[keep // len(rid)], rid[keep % len(rid)]
                        d1s.append(np.minimum(li, rj))
                        d2s.append(np.maximum(li, rj))
                        # portable cosine in-stage (see _pfold_cos)
                        pcs.append(
                            _pfold_cos(
                                lraw[keep // len(rid)], rraw[keep % len(rid)]
                            )
                        )
            if not d1s:
                return pd.DataFrame(
                    {"d1": [], "d2": [], "cos": []}
                ).astype({"d1": "int64", "d2": "int64", "cos": "float64"})
            return pd.DataFrame(
                {
                    "d1": np.concatenate(d1s),
                    "d2": np.concatenate(d2s),
                    "cos": np.concatenate(pcs),
                }
            )

        # no .distinct(): cell membership is a partition and each
        # tile pair lives in exactly one batch, so a (d1, d2)
        # candidate can be emitted at most once by construction.
        cand_cross = members.groupBy("batch").applyInPandas(
            cross_batch, schema="d1 long, d2 long, cos double"
        )
        candidates = (
            cand_diag.filter(F.col("d1") >= 0)
            .select("d1", "d2", F.col("pcos").alias("cos"))
            .unionByName(cand_cross)
        )
    else:
        candidates = cand_diag.filter(F.col("d1") >= 0).select(
            "d1", "d2", F.col("pcos").alias("cos")
        )
    # the portable cosine was computed INSIDE the candidate-emitting
    # stages (next to the vectors — _pfold_cos), so the bit-exact
    # total order needs no rescore joins or extra embedding scans
    return (
        candidates.orderBy(F.desc("cos"), F.asc("d1"), F.asc("d2"))
        .limit(k)
        .select("d1", "d2")
    )


def semdedup(
    embeddings: DataFrame, tau: float = 0.30, centroid_stride: int = 50
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster embeddings, drop any vector
    whose cosine to a LOWER-id member of the same cluster is >= tau.

    The two-stage shape from the SemDeDup paper (Abbas et al. 2023) —
    coarse k-means clustering so that pairwise similarity is only ever
    computed WITHIN a cluster, never across the corpus:

    - clustering: `assign_cells` (broadcast argmax against the bounded
      centroid relation; `stride_cents` default keeps the oracle
      expressible, `kmeans_fit` centroids slot in for production);
    - within-cluster pairs: one equi-join on `cent_id` with the id
      inequality + cosine threshold as join filters — a single shuffle
      keyed by cluster, all-JVM codegen. Cluster sizes are bounded by
      construction (that is the point of the clustering stage), so the
      quadratic stays local to a cell; for heavy cells the blocked-GEMM
      kernel (`neardup_pairs_topk`'s applyInPandas shape) drops in
      per-cluster.
    - keep rule: the surviving representative is the MINIMUM id among
      tau-similar cluster-mates — deterministic, no score ordering.

    Returns (dup_id, rep_id, n_sim): each dropped vector, its kept
    representative, and how many kept-side vectors it matched.
    """
    assigned = assign_cells(embeddings, stride_cents(embeddings, centroid_stride))
    a = assigned.select(
        "cent_id",
        F.col("vec_id").alias("rep_cand"),
        F.col("embedding").alias("a_emb"),
    )
    b = assigned.select(
        "cent_id",
        F.col("vec_id").alias("dup_id"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = (
        a.join(b, "cent_id")
        .filter(F.col("rep_cand") < F.col("dup_id"))
        .filter(cosine_col("a_emb", "b_emb") >= F.lit(tau))
    )
    return (
        pairs.groupBy("dup_id")
        .agg(
            F.min("rep_cand").alias("rep_id"),
            F.count("*").alias("n_sim"),
        )
        .orderBy("dup_id")
    )


# ------------------------------------------------- random-hyperplane LSH
def _hyperplanes(n_planes: int = 8, dim: int = 64):
    """Deterministic signed-random-projection planes, rounded to 6 dp so
    the identical decimal literals parse to the same doubles in Spark
    and DuckDB (the oracle embeds them verbatim)."""
    import numpy as np

    rs = np.random.RandomState(7)
    return [[round(float(x), 6) for x in row] for row in rs.standard_normal((n_planes, dim))]


HYPERPLANES = _hyperplanes()


def _plane_dot(engine: str, plane: list[float]) -> str:
    if engine == "spark":
        lits = ", ".join(f"{x:.6f}D" for x in plane)
        return (
            f"aggregate(zip_with(embedding, array({lits}), "
            "(x, y) -> double(x) * y), 0D, (s, v) -> s + v)"
        )
    lits = ", ".join(f"{x:.6f}" for x in plane)
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {len(plane) + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ([{lits}])[i])), (s, v) -> s + v)"
    )


def lsh_signature_expr(engine: str) -> str:
    """Bit-packed sign signature over the shared hyperplanes."""
    bits = [
        f"(CASE WHEN {_plane_dot(engine, p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(HYPERPLANES)
    ]
    return " + ".join(bits)


def lsh_topk_batch(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Batched multi-probe LSH ANN: N query vectors served in ONE plan.

    Mirror of `ivf_topk_batch` for the signature-bucketed path: the
    queries are a relation; each explodes into its own bucket plus the
    8 Hamming-1 neighbor signatures (9·|Q| probe rows — grows with the
    query batch, never with the data), and the data side flows through
    one equi-join on the bit-packed signature. Per-query top-k via a
    window rank on (q_id). No broadcast hint on the probe relation —
    it is small per batch but unbounded across batches, so AQE decides
    (same rule as the dedup sizes joins). At 100 TB the signature is a
    write-time partition key and the probe join prunes partitions.

    Returns (q_id, vec_id) per-query top-k, self-matches included.
    """
    sigs = embeddings.withColumn("sig", F.expr(lsh_signature_expr("spark")))
    queries = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sig").alias("qsig"),
    )
    masks = [0] + [1 << i for i in range(len(HYPERPLANES))]
    probes = queries.select(
        "q_id",
        "q_emb",
        F.explode(F.array(*[F.expr(f"qsig ^ {m}") for m in masks])).alias("p"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sigs.join(probes, F.col("sig") == F.col("p"))
        .select("q_id", "vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )


def lsh_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Signed-random-projection LSH ANN: bucket by sign signature,
    multi-probe the query bucket plus its 8 Hamming-1 neighbors, scan
    only those buckets. At 100 TB the signature is a write-time
    partition key (like the IVF cell), so probing prunes partitions;
    recall/latency trades via n_planes and the probe radius."""
    sigs = embeddings.withColumn("sig", F.expr(lsh_signature_expr("spark")))
    q = sigs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("sig").alias("qsig"), F.col("embedding").alias("q_emb")
    )
    masks = [0] + [1 << i for i in range(len(HYPERPLANES))]
    probes = q.select(
        F.explode(F.array(*[F.expr(f"qsig ^ {m}") for m in masks])).alias("p"),
        "q_emb",
    )
    return (
        sigs.join(F.broadcast(probes), F.col("sig") == F.col("p"))
        .select("vec_id", cosine_col("embedding", "q_emb").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
