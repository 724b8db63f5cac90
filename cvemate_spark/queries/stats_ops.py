"""Corpus-statistics / monitoring operators: drift detection, sketch
set-cardinality, weighted sampling, hybrid retrieval fusion.

The monitoring-and-mixing surface a 100-TB training-data pipeline runs
on every ingest batch, alongside the dedup/quality passes:

- `t_drift_ks`   — two-sample Kolmogorov-Smirnov distance between the
  length distributions of two corpus slices, computed over a BOUNDED
  equi-width histogram (the scale-honest formulation: the classic
  sort-based KS needs a global sort of the pooled sample; the binned
  form needs one map-side-combinable groupBy over <=64 bins).
- `t_drift_psi`  — population-stability index over the same bins
  (the drift score model-monitoring systems threshold on).
- `e_kmv_intersect` — KMV (k-minimum-values / bottom-k) sketch
  distinct-count and set-intersection estimation between two corpus
  vocabularies (Bar-Yossef et al. 2002; Beyer et al. 2007). The sketch
  is k rows NO MATTER the corpus size and merges by union+re-min, so
  per-shard sketches roll up without touching raw data — the
  complement to the count-min sketch in `operators/sketch.py` (point
  frequency) and HLL (`e_hll`, distinct-only: KMV adds INTERSECTION).
- `t_sample_weighted` — weighted reservoir sampling (Efraimidis &
  Spirakis 2006, A-ES keys): reproducible hash-seeded top-k by
  ln(u)/w, the data-mixing primitive for importance-weighted corpus
  selection (complements the stratified-rate `t_sample`).
- `retr_rrf` — hybrid retrieval: reciprocal-rank fusion (Cormack et
  al. 2009) of a sparse BM25 leg and a dense cosine-ANN leg — the
  standard RAG retrieval stack expressed as two bounded top-k legs
  plus a k-row fusion aggregate.

Reference parity: the reference's closest surfaces are its per-source
status/freshness bookkeeping (mongodb_handler.py:212-307 —
update_status / get_last_update_time / update_source_status) and the
per-batch insert/update counts it logs in _process_request
(mongodb_handler.py:141-195); drift / sketch / fusion are the
scale-side extensions this engine adds for corpus monitoring at sizes
where exact global statistics are a luxury.

Scale notes (100 TB):
- the drift pair needs ONE scan + one bounded groupBy (<=64 bins,
  partial-agg map-side); every window below the agg runs over <=64
  rows on one reducer — constant work after the scan;
- the KMV bottom-k per side is orderBy(h).limit(k) =
  TakeOrderedAndProject: per-partition k-heaps, never a global sort;
  the assembled sketch relation is <=2k rows;
- weighted sampling is one scan + TakeOrderedAndProject(k) — the A-ES
  key makes "weighted sample of the whole corpus" a top-k, not a
  shuffle;
- RRF fuses two ALREADY-BOUNDED top-k legs (20 rows each): the fusion
  groupBy moves <=40 rows; leg cost is the legs' own scale story
  (BM25 = tokenize+agg; dense = GEMM/IVF — here the brute baseline);
- float portability: per-row transcendental contributions (ln) are
  quantized to integer micro-units BEFORE any cross-row aggregate
  (the bm25/t_perplexity pattern), so sums are order-independent;
  pure-ratio divisions (KS, KMV estimates) stay exact-integer until
  one final correctly-rounded double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions.text import duck_str_hash, spark_str_hash
from ..operators.similarity import cosine_col, duck_cosine
from ..streaming.drift import DRIFT_BIN_W, DRIFT_NBINS, SKETCH_K
from ..tables import load_table
from .base import Registry

REG = Registry()

# ------------------------------------------------------------ drift
# Slice A = English documents, slice B = everything else; the drifting
# statistic is document length (n_chars). Equi-width bins, clamped to
# a fixed bin count so the aggregate is bounded at ANY corpus size.
KS_BIN_W = 16
KS_NBINS = 64

_DUCK_BINNED = f"""
    binned AS (
        SELECT least(CAST(floor(n_chars / {KS_BIN_W}) AS BIGINT),
                     {KS_NBINS - 1}) AS bin,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a
        FROM documents
    ),
    per_bin AS (
        SELECT bin,
               CAST(sum(is_a) AS BIGINT) AS a_cnt,
               CAST(sum(1 - is_a) AS BIGINT) AS b_cnt
        FROM binned GROUP BY bin
    )
"""


@REG.add(
    "t_drift_ks",
    f"""
    WITH {_DUCK_BINNED},
    cum AS (
        SELECT bin,
               sum(a_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
               sum(b_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
               sum(a_cnt) OVER () AS n_a,
               sum(b_cnt) OVER () AS n_b
        FROM per_bin
    ),
    diffs AS (
        SELECT bin, n_a, n_b,
               abs(cum_a * n_b - cum_b * n_a) AS diff_u,
               max(abs(cum_a * n_b - cum_b * n_a)) OVER () AS ks_u
        FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(max(ks_u) AS BIGINT) AS ks_u,
           CAST(max(ks_u) AS DOUBLE) / (n_a * n_b) AS ks,
           CAST(min(bin) AS BIGINT) AS ks_bin
    FROM diffs WHERE diff_u = ks_u
    GROUP BY n_a, n_b
    """,
    doc="Two-sample Kolmogorov-Smirnov drift distance between the "
    "document-length distributions of the English and non-English "
    "slices, over a fixed 64-bin equi-width histogram. The statistic "
    "stays EXACT INTEGER until the final division: D*n_a*n_b = "
    "max_bin |cumA*n_b - cumB*n_a|. One scan + one bounded groupBy "
    "(map-side partial agg into <=64 bins); the CDF windows run over "
    "the 64-row bin relation. ks_bin = first bin achieving the max "
    "(where the distributions diverge most).",
)
def t_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_bin = _per_bin(spark, sf_dir)
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    all_w = W.partitionBy()
    cum = per_bin.select(
        "bin",
        F.sum("a_cnt").over(cum_w).alias("cum_a"),
        F.sum("b_cnt").over(cum_w).alias("cum_b"),
        F.sum("a_cnt").over(all_w).alias("n_a"),
        F.sum("b_cnt").over(all_w).alias("n_b"),
    )
    diff_u = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    diffs = cum.select(
        "bin", "n_a", "n_b",
        diff_u.alias("diff_u"),
        F.max(diff_u).over(all_w).alias("ks_u"),
    )
    # groupBy (n_a, n_b are constant => one group) instead of a global
    # agg so an EMPTY corpus yields an EMPTY result, not one NULL row
    return (
        diffs.filter(F.col("diff_u") == F.col("ks_u"))
        .groupBy("n_a", "n_b")
        .agg(
            F.max("ks_u").cast("long").alias("ks_u"),
            F.min("bin").cast("long").alias("ks_bin"),
        )
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "ks_u",
            (F.col("ks_u").cast("double") / (F.col("n_a") * F.col("n_b"))).alias(
                "ks"
            ),
            "ks_bin",
        )
    )


PSI_SMOOTH = 1  # add-one smoothing so empty-on-one-side bins stay finite


@REG.add(
    "t_drift_psi",
    f"""
    WITH {_DUCK_BINNED},
    tot AS (
        SELECT sum(a_cnt) AS n_a, sum(b_cnt) AS n_b,
               count(*) AS nbins FROM per_bin
    ),
    contrib AS (
        SELECT n_a, n_b, nbins, CAST(floor(
            ((a_cnt + {PSI_SMOOTH}) / (n_a + {PSI_SMOOTH} * nbins)
             - (b_cnt + {PSI_SMOOTH}) / (n_b + {PSI_SMOOTH} * nbins))
            * ln(((a_cnt + {PSI_SMOOTH}) / (n_a + {PSI_SMOOTH} * nbins))
                 / ((b_cnt + {PSI_SMOOTH}) / (n_b + {PSI_SMOOTH} * nbins)))
            * 1000000.0 + 0.5) AS BIGINT) AS c_u
        FROM per_bin, tot
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(nbins AS BIGINT) AS nbins,
           CAST(sum(c_u) AS BIGINT) AS psi_u,
           CAST(sum(c_u) AS DOUBLE) / 1000000.0 AS psi
    FROM contrib
    GROUP BY n_a, n_b, nbins
    """,
    doc="Population-stability index between the same two slices over "
    "the same bounded histogram: sum_bin (pA-pB)*ln(pA/pB) with "
    "add-one smoothing. Per-bin contributions are quantized to integer "
    "micro-units BEFORE the sum (the bm25 portability pattern), so the "
    "cross-engine aggregate is an exact integer sum. Same one-scan + "
    "bounded-agg plan as t_drift_ks; PSI > 0.2 is the classic "
    "'significant drift' monitoring threshold.",
)
def t_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_bin = _per_bin(spark, sf_dir)
    tot = per_bin.agg(
        F.sum("a_cnt").alias("n_a"),
        F.sum("b_cnt").alias("n_b"),
        F.count("*").alias("nbins"),
    )
    pa = (F.col("a_cnt") + PSI_SMOOTH) / (
        F.col("n_a") + PSI_SMOOTH * F.col("nbins")
    )
    pb = (F.col("b_cnt") + PSI_SMOOTH) / (
        F.col("n_b") + PSI_SMOOTH * F.col("nbins")
    )
    c_u = F.floor((pa - pb) * F.log(pa / pb) * F.lit(1000000.0) + F.lit(0.5))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "n_a", "n_b", "nbins",
            c_u.cast("long").alias("c_u"),
        )
        .groupBy("n_a", "n_b", "nbins")
        .agg(
            F.sum("c_u").cast("long").alias("psi_u"),
            (F.sum("c_u").cast("double") / F.lit(1000000.0)).alias("psi"),
        )
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("nbins").cast("long").alias("nbins"),
            "psi_u", "psi",
        )
    )


def _staged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micros-staged events with the session confs pinned.

    The behavioral-analytics builders truncate to UTC day boundaries
    (date_trunc / date_format); a non-UTC session would silently
    diverge from the UTC-naive DuckDB oracle, so pin the timezone the
    way every load_table-based query does."""
    from ..streaming.jobs import _stage_events
    from ..tables import _ensure_session_confs

    _ensure_session_confs(spark)
    return spark.read.parquet(_stage_events(sf_dir))


def _per_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_a = F.when(F.col("lang") == "en", 1).otherwise(0)
    bin_col = F.least(
        F.floor(F.col("n_chars") / KS_BIN_W).cast("long"),
        F.lit(KS_NBINS - 1).cast("long"),
    )
    return (
        docs.select(is_a.alias("is_a"), bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum("is_a").cast("long").alias("a_cnt"),
            F.sum(1 - F.col("is_a")).cast("long").alias("b_cnt"),
        )
    )


# ----------------------------------------------------- KMV sketch
KMV_K = 256
HASH_SPACE = 1 << 60  # spark_str_hash/duck_str_hash range: [0, 2^60)

_KMV_EST_DUCK = (
    f"CASE WHEN n_seen < {KMV_K} THEN CAST(n_seen AS DOUBLE) "
    f"ELSE ({KMV_K - 1}.0 * {HASH_SPACE}.0) / CAST(u_k AS DOUBLE) END"
)


@REG.add(
    "e_kmv_intersect",
    f"""
    WITH t AS (
        SELECT doc_id % 2 AS side, string_split(text, ' ') AS toks
        FROM documents
    ),
    sh AS (
        SELECT side,
               unnest(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                   AS s
        FROM t
    ),
    dist AS (SELECT DISTINCT side, {duck_str_hash("s")} AS h FROM sh),
    sk_a AS (SELECT h FROM dist WHERE side = 0 ORDER BY h LIMIT {KMV_K}),
    sk_b AS (SELECT h FROM dist WHERE side = 1 ORDER BY h LIMIT {KMV_K}),
    merged AS (
        SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
            SELECT h, 1 AS in_a, 0 AS in_b FROM sk_a
            UNION ALL
            SELECT h, 0 AS in_a, 1 AS in_b FROM sk_b
        ) GROUP BY h
    ),
    bottom AS (SELECT * FROM merged ORDER BY h LIMIT {KMV_K}),
    est AS (
        SELECT count(*) AS n_seen, max(h) AS u_k,
               CAST(COALESCE(sum(in_a * in_b), 0) AS BIGINT) AS n_both
        FROM bottom
    ),
    exact AS (
        SELECT CAST(COALESCE(sum(has_a), 0) AS BIGINT) AS exact_a,
               CAST(COALESCE(sum(has_b), 0) AS BIGINT) AS exact_b,
               CAST(COALESCE(sum(has_a * has_b), 0) AS BIGINT) AS exact_inter
        FROM (
            SELECT h, max(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS has_a,
                   max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS has_b
            FROM dist GROUP BY h
        )
    )
    SELECT CAST({KMV_K} AS BIGINT) AS k,
           CAST(n_seen AS BIGINT) AS n_seen,
           CAST(u_k AS BIGINT) AS u_k,
           n_both,
           {_KMV_EST_DUCK} AS est_union,
           CASE WHEN n_seen = 0 THEN 0.0
                ELSE (CAST(n_both AS DOUBLE) / CAST(n_seen AS DOUBLE))
                     * ({_KMV_EST_DUCK}) END AS est_inter,
           exact_a, exact_b, exact_inter
    FROM est, exact
    """,
    doc="KMV (bottom-k) sketch set cardinality + INTERSECTION between "
    "the word-trigram shingle sets of the even-id and odd-id document "
    "shards (Beyer et al. 2007) — the cross-shard overlap a dedup "
    "planner reads before scheduling a full pairwise pass. Keep the "
    "k=256 smallest distinct 60-bit shingle hashes per shard "
    "(distinct + orderBy+limit = TakeOrderedAndProject: per-partition "
    "k-heaps, never a global sort), merge to the bottom-k of the "
    "union, estimate |A u B| = (k-1)*M/U_(k) (exact n_seen when the "
    "sketch never filled) and |A n B| = (n_both/n_seen)*est_union. "
    "The sketch is k rows at ANY corpus size and merges by "
    "union+re-min, so per-shard/day sketches roll up without raw "
    "data. Exact distincts ride along so the result self-reports "
    "sketch error; estimates stay integer until one final double "
    "division. Operator core: operators/kmv.py.",
)
def e_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmv import bottom_k, union_intersect_estimate

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    # sequence(1, size-2) counts DOWN for size < 3 — guard short docs
    # (duck's end-exclusive range is empty there, the t_novelty guard)
    arr = F.when(F.size(toks) >= 3, tri).otherwise(F.array().cast("array<string>"))
    sh = docs.select(
        (F.col("doc_id") % 2).alias("side"), F.explode(arr).alias("s")
    )
    dist = sh.select("side", F.expr(spark_str_hash("s")).alias("h")).distinct()
    sk_a = bottom_k(dist.filter(F.col("side") == 0), KMV_K)
    sk_b = bottom_k(dist.filter(F.col("side") == 1), KMV_K)
    est = union_intersect_estimate(sk_a, sk_b, KMV_K)
    flags = dist.groupBy("h").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("has_a"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("has_b"),
    )
    exact = flags.agg(
        F.coalesce(F.sum("has_a"), F.lit(0)).cast("long").alias("exact_a"),
        F.coalesce(F.sum("has_b"), F.lit(0)).cast("long").alias("exact_b"),
        F.coalesce(F.sum(F.col("has_a") * F.col("has_b")), F.lit(0))
        .cast("long")
        .alias("exact_inter"),
    )
    return est.crossJoin(exact)


# ------------------------------------------- KMV overlap matrix
KMV_MK = 128  # per-source sketch size for the pairwise matrix

_KMV_MEST_DUCK = (
    f"CASE WHEN n_seen < {KMV_MK} THEN CAST(n_seen AS DOUBLE) "
    f"ELSE ({KMV_MK - 1}.0 * {HASH_SPACE}.0) / CAST(u_k AS DOUBLE) END"
)


@REG.add(
    "e_kmv_matrix",
    f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
    sh AS (
        SELECT source,
               unnest(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                   AS s
        FROM t
    ),
    dist AS (SELECT DISTINCT source, {duck_str_hash("s")} AS h FROM sh),
    sk AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM dist
        ) WHERE rn <= {KMV_MK}
    ),
    srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b
        FROM srcs a, srcs b WHERE a.source < b.source
    ),
    cand AS (
        SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.src_a
        UNION ALL
        SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.src_b
    ),
    merged AS (
        SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
        FROM cand GROUP BY src_a, src_b, h
    ),
    bottom AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_a, src_b ORDER BY h) AS rn
            FROM merged
        ) WHERE rn <= {KMV_MK}
    ),
    est AS (
        SELECT src_a, src_b, count(*) AS n_seen, max(h) AS u_k,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        FROM bottom GROUP BY src_a, src_b
    )
    SELECT src_a, src_b,
           CAST(n_seen AS BIGINT) AS n_seen, n_both,
           {_KMV_MEST_DUCK} AS est_union,
           (CAST(n_both AS DOUBLE) / CAST(n_seen AS DOUBLE))
               * ({_KMV_MEST_DUCK}) AS est_inter
    FROM est
    ORDER BY src_a, src_b
    """,
    doc="Sketch-powered cross-source overlap MATRIX: per-source KMV "
    "sketches (k=128 smallest distinct trigram-shingle hashes, one "
    "windowed pass over the distinct relation — operators/kmv.py::"
    "per_group_bottom_k), then every source pair's union/intersection "
    "estimated from the <= 2k merged sketch rows per pair. The "
    "sublinear counterpart to t_overlap's exact pairwise Jaccard: "
    "corpus-scale work is ONE distinct pass; the pairwise stage "
    "touches |sources|^2 x k sketch rows only — at 100 TB the "
    "sketches are the only thing that moves, and per-shard sketches "
    "roll up by union+re-min without re-reading raw data. This is "
    "the dedup-planning input: pairs with high estimated overlap "
    "get the full MinHash pass first.",
)
def e_kmv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmv import per_group_bottom_k

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    arr = F.when(F.size(toks) >= 3, tri).otherwise(F.array().cast("array<string>"))
    sh = docs.select("source", F.explode(arr).alias("s"))
    dist = sh.select("source", F.expr(spark_str_hash("s")).alias("h")).distinct()
    sk = per_group_bottom_k(dist, "source", KMV_MK)

    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    cand_a = pairs.join(sk, sk.source == pairs.src_a).select(
        "src_a", "src_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    cand_b = pairs.join(sk, sk.source == pairs.src_b).select(
        "src_a", "src_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        cand_a.unionByName(cand_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    pair_w = W.partitionBy("src_a", "src_b").orderBy("h")
    bottom = (
        merged.select("*", F.row_number().over(pair_w).alias("rn"))
        .filter(F.col("rn") <= KMV_MK)
    )
    est = bottom.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_seen"),
        F.max("h").alias("u_k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("n_seen") < KMV_MK, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(float(KMV_MK - 1))
        * F.lit(float(HASH_SPACE))
        / F.col("u_k").cast("double")
    )
    return est.select(
        "src_a", "src_b",
        F.col("n_seen").cast("long").alias("n_seen"),
        "n_both",
        est_union.alias("est_union"),
        (
            (F.col("n_both").cast("double") / F.col("n_seen").cast("double"))
            * est_union
        ).alias("est_inter"),
    ).orderBy("src_a", "src_b")


# -------------------------------------------- weighted reservoir
WRS_K = 64


@REG.add(
    "t_sample_weighted",
    f"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(floor(ln(
               ({duck_str_hash("'ws:' || CAST(doc_id AS VARCHAR)")} + 1)
               / {HASH_SPACE}.0) * 1000000.0) AS BIGINT)
               / CAST(n_chars AS DOUBLE) AS w_key
    FROM documents
    ORDER BY w_key DESC, doc_id ASC
    LIMIT {WRS_K}
    """,
    doc="Weighted reservoir sampling (Efraimidis-Spirakis A-ES): each "
    "document draws a reproducible uniform u from a salted 60-bit hash "
    "of its id and gets key ln(u)/w with weight w = n_chars; the "
    "weighted-without-replacement sample IS the top-k by key. "
    "Hash-seeded keys make the sample reproducible and "
    "cluster-size-independent; the plan is one scan + "
    "TakeOrderedAndProject(k) — 'weighted sample of the corpus' "
    "without any shuffle. ln(u) is quantized to integer micro-units "
    "before the one exact double division by the integer weight, so "
    "cross-engine ordering is deterministic (ties break on doc_id).",
)
def t_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_str_hash("concat('ws:', cast(doc_id as string))"))
    u = (h + 1) / F.lit(float(HASH_SPACE))
    lnu_u = F.floor(F.log(u) * F.lit(1000000.0))
    key = lnu_u.cast("double") / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            key.alias("w_key"),
        )
        .orderBy(F.desc("w_key"), F.asc("doc_id"))
        .limit(WRS_K)
    )


# ------------------------------------------------- streaming drift
@REG.add(
    "s13_drift",
    f"""
    WITH binned AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')
                   AS win_start,
               least(CAST(floor(value / {DRIFT_BIN_W}) AS BIGINT),
                     {DRIFT_NBINS - 1}) AS bin
        FROM events
    ),
    win_hist AS (
        SELECT win_start, bin, count(*) AS cnt
        FROM binned GROUP BY win_start, bin
    ),
    ref AS (SELECT bin, count(*) AS ref_cnt FROM binned GROUP BY bin),
    wins AS (SELECT DISTINCT win_start FROM win_hist),
    spine AS (SELECT w.win_start, r.bin, r.ref_cnt FROM wins w, ref r),
    joined AS (
        SELECT s.win_start, s.bin, s.ref_cnt, coalesce(h.cnt, 0) AS cnt
        FROM spine s LEFT JOIN win_hist h
          ON s.win_start = h.win_start AND s.bin = h.bin
    ),
    cum AS (
        SELECT win_start, bin,
               sum(cnt) OVER (PARTITION BY win_start ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
               sum(ref_cnt) OVER (PARTITION BY win_start ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
               sum(cnt) OVER (PARTITION BY win_start) AS n_win,
               sum(ref_cnt) OVER (PARTITION BY win_start) AS n_ref
        FROM joined
    )
    SELECT win_start,
           CAST(max(n_win) AS BIGINT) AS n_win,
           CAST(max(n_ref) AS BIGINT) AS n_ref,
           CAST(max(abs(cum_w * n_ref - cum_ref * n_win)) AS BIGINT) AS ks_u,
           CAST(max(abs(cum_w * n_ref - cum_ref * n_win)) AS DOUBLE)
               / (max(n_win) * max(n_ref)) AS ks
    FROM cum GROUP BY win_start
    ORDER BY win_start
    """,
    doc="S13: continuous distribution-drift monitoring — per event-time "
    "day, the streamed `value` histogram (watermark + tumbling window "
    "groupBy into <= 32 bounded bins, availableNow) is KS-scored "
    "against the static full-corpus reference histogram. State is "
    "|windows| x 32 rows, watermark-evicted; scoring is the exact-"
    "integer KS over the bounded windows x bins spine. The streaming "
    "face of t_drift_ks: streaming/drift.py.",
)
def s13_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import windowed_value_drift

    return windowed_value_drift(spark, sf_dir).orderBy("win_start")


# ------------------------------------------------ hybrid retrieval
# Sparse leg: the bm25_topk scoring (same 3 fixed terms, k1/b) — kept
# self-contained here so this module's hash pin is independent of
# retrieval_ops.py. Dense leg: brute cosine against the vec_id-0
# embedding (embeddings.vec_id aligns 1:1 with documents.doc_id in the
# driver testdata). RRF (Cormack et al. 2009): score(d) =
# sum_legs 1/(C + rank_leg(d)), C = 60 — integer-exact via the
# micro-unit floor division 10^6 DIV (C + rank).
RRF_C = 60
RRF_LEG_K = 20
RRF_TERMS = ("spark", "merge", "dup")
RRF_K1 = 1.2
RRF_B = 0.75
_RRF_TERMS_SQL = ", ".join(f"'{t}'" for t in RRF_TERMS)


@REG.add(
    "retr_rrf",
    f"""
    WITH tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM tok WHERE term IN ({_RRF_TERMS_SQL})
        GROUP BY doc_id, dl, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS sum_dl
        FROM documents
    ),
    contrib AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * {RRF_K1 + 1.0})
                   / (tf.tf + {RRF_K1} * ({1.0 - RRF_B} + {RRF_B} * tf.dl
                       / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                   * 1000000.0 + 0.5) AS BIGINT) AS c_u
        FROM tf JOIN df ON tf.term = df.term, stats s
    ),
    sparse AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY sum(c_u) DESC, doc_id ASC) AS rank
        FROM contrib GROUP BY doc_id
        ORDER BY rank LIMIT {RRF_LEG_K}
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (
                   ORDER BY {duck_cosine("e.embedding", "q.q_emb")} DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings e, q
        ORDER BY rank LIMIT {RRF_LEG_K}
    ),
    fused AS (
        SELECT doc_id, 1000000 // ({RRF_C} + rank) AS r_u FROM sparse
        UNION ALL
        SELECT doc_id, 1000000 // ({RRF_C} + rank) AS r_u FROM dense
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_legs,
           CAST(sum(r_u) AS BIGINT) AS rrf_u,
           CAST(sum(r_u) AS DOUBLE) / 1000000.0 AS rrf
    FROM fused GROUP BY doc_id
    ORDER BY rrf_u DESC, doc_id ASC
    LIMIT 10
    """,
    doc="Hybrid retrieval via reciprocal-rank fusion: a sparse BM25 "
    "top-20 leg (the bm25_topk scoring, integer-quantized "
    "contributions) and a dense cosine top-20 leg against the vec_id-0 "
    "query embedding, fused by RRF score sum(10^6 DIV (60 + rank)) — "
    "exact integer arithmetic end-to-end. Both legs are bounded top-k "
    "(TakeOrderedAndProject / 20-row windows); the fusion groupBy "
    "moves <= 40 rows, so the cost IS the legs — each independently "
    "scale-proven (BM25: tokenize+bounded-broadcast stats; dense: the "
    "q26 brute baseline, upgradeable to the IVF index unchanged).",
)
def retr_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dense = _dense_leg_brute(emb)
    return _rrf_fuse(_sparse_leg(docs), dense)


def _sparse_leg(docs: DataFrame) -> DataFrame:
    """BM25 top-RRF_LEG_K (doc_id, rank) for the fixed 3-term query."""
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    tf = (
        toks.filter(F.col("term").isin(*RRF_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("sum_dl"),
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(RRF_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(RRF_K1)
            * (F.lit(1.0 - RRF_B) + F.lit(RRF_B) * F.col("dl") / avgdl)
        )
    )
    c_u = F.floor(contrib * F.lit(1000000.0) + F.lit(0.5))
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", c_u.alias("c_u"))
        .groupBy("doc_id")
        .agg(F.sum("c_u").alias("s_u"))
    )
    return (
        scored.orderBy(F.desc("s_u"), F.asc("doc_id"))
        .limit(RRF_LEG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("s_u"), F.asc("doc_id")))
            .alias("rank"),
        )
    )


def _dense_leg_brute(emb: DataFrame) -> DataFrame:
    """Brute cosine top-RRF_LEG_K (doc_id, rank) — the q26 shape."""
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    dense_scored = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        cosine_col("embedding", "q_emb").alias("cos"),
    )
    return (
        dense_scored.orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(RRF_LEG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("cos"), F.asc("doc_id")))
            .alias("rank"),
        )
    )


def _rrf_fuse(sparse: DataFrame, dense: DataFrame) -> DataFrame:
    r_u = F.expr(f"1000000 div ({RRF_C} + rank)")
    fused = sparse.select("doc_id", r_u.alias("r_u")).unionByName(
        dense.select("doc_id", r_u.alias("r_u"))
    )
    return (
        fused.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_legs"),
            F.sum("r_u").cast("long").alias("rrf_u"),
            (F.sum("r_u").cast("double") / F.lit(1000000.0)).alias("rrf"),
        )
        .orderBy(F.desc("rrf_u"), F.asc("doc_id"))
        .limit(10)
    )


# The same fusion with the dense leg served by the IVF cell-pruned
# path (the ann_ivf shape: deterministic stride-50 coarse centroids,
# 3-cell probe) — at 100 TB the dense leg reads n_probe partitions of
# the persisted index (ann_ivf_serve) instead of scanning every
# vector; the fusion stage is unchanged.
_RRF_IVF_DENSE_SQL = f"""
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    assigned AS (
        SELECT vec_id, embedding, cent_id FROM (
            SELECT e.vec_id, e.embedding, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {duck_cosine("e.embedding", "c.cent_emb")} DESC,
                                c.cent_id ASC) AS rn
            FROM embeddings e, cents c
        ) WHERE rn = 1
    ),
    probed AS (
        SELECT cent_id FROM cents c, q
        ORDER BY {duck_cosine("c.cent_emb", "q.q_emb")} DESC, cent_id ASC
        LIMIT 3
    ),
    dense AS (
        SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC)
                   AS rank
        FROM (
            SELECT e.vec_id AS doc_id,
                   {duck_cosine("e.embedding", "q.q_emb")} AS cos
            FROM assigned e JOIN probed p ON e.cent_id = p.cent_id, q
        )
        ORDER BY rank LIMIT {RRF_LEG_K}
    )
"""


@REG.add(
    "retr_rrf_ivf",
    f"""
    WITH tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM tok WHERE term IN ({_RRF_TERMS_SQL})
        GROUP BY doc_id, dl, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS sum_dl
        FROM documents
    ),
    contrib AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * {RRF_K1 + 1.0})
                   / (tf.tf + {RRF_K1} * ({1.0 - RRF_B} + {RRF_B} * tf.dl
                       / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                   * 1000000.0 + 0.5) AS BIGINT) AS c_u
        FROM tf JOIN df ON tf.term = df.term, stats s
    ),
    sparse AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY sum(c_u) DESC, doc_id ASC) AS rank
        FROM contrib GROUP BY doc_id
        ORDER BY rank LIMIT {RRF_LEG_K}
    ),
    {_RRF_IVF_DENSE_SQL},
    fused AS (
        SELECT doc_id, 1000000 // ({RRF_C} + rank) AS r_u FROM sparse
        UNION ALL
        SELECT doc_id, 1000000 // ({RRF_C} + rank) AS r_u FROM dense
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_legs,
           CAST(sum(r_u) AS BIGINT) AS rrf_u,
           CAST(sum(r_u) AS DOUBLE) / 1000000.0 AS rrf
    FROM fused GROUP BY doc_id
    ORDER BY rrf_u DESC, doc_id ASC
    LIMIT 10
    """,
    doc="Hybrid RRF retrieval with the dense leg served by the IVF "
    "cell-pruned path (ann_ivf shape: stride-50 coarse centroids, "
    "3-cell probe) instead of the brute scan — the production serving "
    "topology: at 100 TB the dense leg reads n_probe partitions of "
    "the persisted index (ann_ivf_serve's layout) while the sparse "
    "leg stays tokenize+bounded-broadcast; the integer-exact fusion "
    "stage is IDENTICAL to retr_rrf (only the candidate generator "
    "changed — the RRF contract).",
)
def retr_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import assign_cells_gemm, stride_cents

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = stride_cents(emb, 50)
    # Arrow-GEMM cell assignment (argmax-identical to the fold path,
    # r5-proven): the fold/window form materializes |vectors| x |cents|
    # rows — 800M at sf10 — where the assignment is one BLAS matmul
    # per Arrow batch. Keeps the query runnable at the second decade.
    assigned = assign_cells_gemm(emb, cents).join(emb, "vec_id")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select("cent_id", cosine_col("cent_emb", "q_emb").alias("qc"))
        .orderBy(F.desc("qc"), F.asc("cent_id"))
        .limit(3)
        .select("cent_id")
    )
    dense = (
        assigned.join(F.broadcast(probed), "cent_id")
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_col("embedding", "q_emb").alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(RRF_LEG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("cos"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    return _rrf_fuse(_sparse_leg(docs), dense)


# ---------------------------------------------- mixing capstone
# Weighted data mixing + drift audit in ONE relation: pick a budgeted
# sample weighted toward English (w = token_count x 2 for en, x1
# otherwise — the A-ES keys make it a reproducible top-k), then score
# the sample's length distribution against the corpus with the binned
# KS statistic. This is the loop a data-mixing team runs on every
# recipe change: "does the reweighted sample distort the shape?"
MIX_K = 256


@REG.add(
    "curate_mix",
    f"""
    WITH weighted AS (
        SELECT doc_id, n_chars, lang,
               CAST(floor(ln(
                   ({duck_str_hash("'mix:' || CAST(doc_id AS VARCHAR)")} + 1)
                   / {HASH_SPACE}.0) * 1000000.0) AS BIGINT)
                   / CAST(len(string_split(text, ' '))
                          * (CASE WHEN lang = 'en' THEN 2 ELSE 1 END)
                          AS DOUBLE) AS w_key
        FROM documents
    ),
    sample AS (
        SELECT doc_id, n_chars, lang FROM weighted
        ORDER BY w_key DESC, doc_id ASC LIMIT {MIX_K}
    ),
    corpus_bins AS (
        SELECT least(CAST(floor(n_chars / 16) AS BIGINT), 63) AS bin,
               count(*) AS c_cnt
        FROM documents GROUP BY bin
    ),
    sample_bins AS (
        SELECT least(CAST(floor(n_chars / 16) AS BIGINT), 63) AS bin,
               count(*) AS s_cnt
        FROM sample GROUP BY bin
    ),
    joined AS (
        SELECT c.bin, c.c_cnt, coalesce(s.s_cnt, 0) AS s_cnt
        FROM corpus_bins c LEFT JOIN sample_bins s ON c.bin = s.bin
    ),
    cum AS (
        SELECT sum(s_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
               sum(c_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
               sum(s_cnt) OVER () AS n_s,
               sum(c_cnt) OVER () AS n_c
        FROM joined
    ),
    ks AS (
        SELECT max(n_s) AS n_sample, max(n_c) AS n_corpus,
               max(abs(cum_s * n_c - cum_c * n_s)) AS ks_u
        FROM cum
    ),
    enf AS (
        SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS en_sample
        FROM sample
    ),
    enc AS (
        SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS en_corpus
        FROM documents
    )
    SELECT CAST(n_sample AS BIGINT) AS n_sample,
           CAST(n_corpus AS BIGINT) AS n_corpus,
           CAST(ks_u AS BIGINT) AS ks_u,
           CAST(ks_u AS DOUBLE) / (n_sample * n_corpus) AS ks,
           en_sample, en_corpus
    FROM ks, enf, enc
    """,
    doc="Data-mixing capstone: a budgeted weighted sample (A-ES keys, "
    "weight = token count, doubled for English — the language-"
    "upweighting recipe) audited IN THE SAME RELATION by the binned "
    "exact-integer KS of its length distribution against the corpus, "
    "plus the en counts proving the upweighting engaged. The sample "
    "is one scan + TakeOrderedAndProject(256); the audit adds two "
    "bounded 64-bin aggregates — at 100 TB the recipe check costs "
    "one extra scan, not a second pipeline.",
)
def curate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_str_hash("concat('mix:', cast(doc_id as string))"))
    lnu_u = F.floor(F.log((h + 1) / F.lit(float(HASH_SPACE))) * F.lit(1000000.0))
    w = F.size(F.split("text", " ")) * F.when(
        F.col("lang") == "en", F.lit(2)
    ).otherwise(F.lit(1))
    key = lnu_u.cast("double") / w.cast("double")
    sample = (
        docs.select("doc_id", "n_chars", "lang", key.alias("w_key"))
        .orderBy(F.desc("w_key"), F.asc("doc_id"))
        .limit(MIX_K)
    )
    bin_of = lambda c: F.least(  # noqa: E731
        F.floor(F.col(c) / 16).cast("long"), F.lit(63).cast("long")
    )
    corpus_bins = (
        docs.select(bin_of("n_chars").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("c_cnt"))
    )
    sample_bins = (
        sample.select(bin_of("n_chars").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("s_cnt"))
    )
    joined = corpus_bins.join(sample_bins, "bin", "left").select(
        "bin", "c_cnt", F.coalesce("s_cnt", F.lit(0)).alias("s_cnt")
    )
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    all_w = W.partitionBy()
    cum = joined.select(
        F.sum("s_cnt").over(cum_w).alias("cum_s"),
        F.sum("c_cnt").over(cum_w).alias("cum_c"),
        F.sum("s_cnt").over(all_w).alias("n_s"),
        F.sum("c_cnt").over(all_w).alias("n_c"),
    )
    ks = cum.agg(
        F.max("n_s").alias("n_sample"),
        F.max("n_c").alias("n_corpus"),
        F.max(
            F.abs(F.col("cum_s") * F.col("n_c") - F.col("cum_c") * F.col("n_s"))
        ).alias("ks_u"),
    )
    enf = sample.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("en_sample")
    )
    enc = docs.agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("en_corpus")
    )
    return (
        ks.crossJoin(enf)
        .crossJoin(enc)
        .select(
            F.col("n_sample").cast("long").alias("n_sample"),
            F.col("n_corpus").cast("long").alias("n_corpus"),
            F.col("ks_u").cast("long").alias("ks_u"),
            (
                F.col("ks_u").cast("double")
                / (F.col("n_sample") * F.col("n_corpus"))
            ).alias("ks"),
            "en_sample", "en_corpus",
        )
    )


# ------------------------------------------- embedding-space drift
# The embeddings modality joins the monitoring family: did a slice's
# GEOMETRY shift? Statistic: cosine against a fixed reference
# direction (the vec_id-0 embedding — at scale: yesterday's centroid),
# histogrammed into 32 bounded bins over [-1, 1], KS between the
# even-label and odd-label slices. The cosine is the engine's
# portable sequential fold, so both engines bin identically.
EMB_NBINS = 32


@REG.add(
    "emb_drift",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    binned AS (
        SELECT least(CAST(floor(({duck_cosine("e.embedding", "q.q_emb")} + 1.0)
                         / 2.0 * {EMB_NBINS}) AS BIGINT),
                     {EMB_NBINS - 1}) AS bin,
               CASE WHEN e.label % 2 = 0 THEN 1 ELSE 0 END AS is_a
        FROM embeddings e, q
    ),
    per_bin AS (
        SELECT bin,
               CAST(sum(is_a) AS BIGINT) AS a_cnt,
               CAST(sum(1 - is_a) AS BIGINT) AS b_cnt
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin,
               sum(a_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
               sum(b_cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
               sum(a_cnt) OVER () AS n_a,
               sum(b_cnt) OVER () AS n_b
        FROM per_bin
    ),
    diffs AS (
        SELECT bin, n_a, n_b,
               abs(cum_a * n_b - cum_b * n_a) AS diff_u,
               max(abs(cum_a * n_b - cum_b * n_a)) OVER () AS ks_u
        FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(max(ks_u) AS BIGINT) AS ks_u,
           CAST(max(ks_u) AS DOUBLE) / (n_a * n_b) AS ks,
           CAST(min(bin) AS BIGINT) AS ks_bin
    FROM diffs WHERE diff_u = ks_u
    GROUP BY n_a, n_b
    """,
    doc="Embedding-space drift: the cosine-to-reference-direction "
    "distribution (vec_id-0 embedding as the fixed reference; at "
    "scale, a persisted centroid) of the even-label slice KS-tested "
    "against the odd-label slice over 32 bounded bins. One scan with "
    "a broadcast 1-row reference, fold-based cosine (JVM codegen, "
    "identical in both engines so binning is deterministic), then "
    "the same exact-integer KS machinery as t_drift_ks. The geometry "
    "watchdog for embedding pipelines: a model/version change shifts "
    "this distribution before any downstream metric notices.",
)
def emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = cosine_col("embedding", "q_emb")
    bin_col = F.least(
        F.floor((cos + F.lit(1.0)) / F.lit(2.0) * EMB_NBINS).cast("long"),
        F.lit(EMB_NBINS - 1).cast("long"),
    )
    per_bin = (
        emb.crossJoin(F.broadcast(q))
        .select(
            bin_col.alias("bin"),
            F.when(F.col("label") % 2 == 0, 1).otherwise(0).alias("is_a"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_a").cast("long").alias("a_cnt"),
            F.sum(1 - F.col("is_a")).cast("long").alias("b_cnt"),
        )
    )
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    all_w = W.partitionBy()
    cum = per_bin.select(
        "bin",
        F.sum("a_cnt").over(cum_w).alias("cum_a"),
        F.sum("b_cnt").over(cum_w).alias("cum_b"),
        F.sum("a_cnt").over(all_w).alias("n_a"),
        F.sum("b_cnt").over(all_w).alias("n_b"),
    )
    diff_u = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    diffs = cum.select(
        "bin", "n_a", "n_b",
        diff_u.alias("diff_u"),
        F.max(diff_u).over(all_w).alias("ks_u"),
    )
    return (
        diffs.filter(F.col("diff_u") == F.col("ks_u"))
        .groupBy("n_a", "n_b")
        .agg(
            F.max("ks_u").cast("long").alias("ks_u"),
            F.min("bin").cast("long").alias("ks_bin"),
        )
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "ks_u",
            (F.col("ks_u").cast("double") / (F.col("n_a") * F.col("n_b"))).alias(
                "ks"
            ),
            "ks_bin",
        )
    )


# ------------------------------------- streaming sketch state (S14)
@REG.add(
    "s14_kmv",
    f"""
    WITH h AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')
                   AS win_start,
               {duck_str_hash("'u:' || CAST(user_id AS VARCHAR)")} AS h,
               user_id
        FROM events
    ),
    dist AS (SELECT DISTINCT win_start, h FROM h),
    sk AS (
        SELECT win_start, h FROM (
            SELECT win_start, h,
                   row_number() OVER (PARTITION BY win_start ORDER BY h) AS rn
            FROM dist
        ) WHERE rn <= {SKETCH_K}
    ),
    est AS (
        SELECT win_start, count(*) AS n_seen, max(h) AS u_k
        FROM sk GROUP BY win_start
    ),
    exact AS (
        SELECT win_start, count(DISTINCT user_id) AS exact_users
        FROM h GROUP BY win_start
    )
    SELECT e.win_start,
           CAST(n_seen AS BIGINT) AS n_seen,
           CAST(u_k AS BIGINT) AS u_k,
           CASE WHEN n_seen < {SKETCH_K} THEN CAST(n_seen AS DOUBLE)
                ELSE ({SKETCH_K - 1}.0 * {HASH_SPACE}.0)
                     / CAST(u_k AS DOUBLE) END
               AS est_users,
           CAST(exact_users AS BIGINT) AS exact_users
    FROM est e JOIN exact x ON e.win_start = x.win_start
    ORDER BY e.win_start
    """,
    doc="S14: incremental KMV sketch maintenance as streaming state — "
    "per event-time day, the distinct-user bottom-64 sketch is merged "
    "across out-of-order micro-batches (the S3 foreachBatch-MERGE "
    "landing) by union + re-bottom-k. The KMV merge law makes the "
    "incremental state EXACTLY the batch sketch, so the oracle is the "
    "direct batch KMV — the hash gate proves the streaming fold "
    "changes nothing. State is |windows| x 64 rows FOREVER: distinct-"
    "users-per-day stays queryable with no distinct shuffle over "
    "history. Exact counts ride along; streaming/drift.py.",
)
def s14_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import incremental_kmv_users

    return incremental_kmv_users(spark, sf_dir).orderBy("win_start")


# ------------------------------------- exact quantiles, no global sort
# Two histogram-guided passes instead of a total order: Spark's exact
# percentile() buffers every value per group and a sort-based order
# statistic is a full range-shuffle — neither survives 100 TB. The
# 2-pass form locates each target rank's bin with ONE bounded-histogram
# scan, then selects the exact order statistic INSIDE that bin only.
QUANT_BINS = 256
QUANT_TARGETS = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]

_Q_TARGET_DUCK = ", ".join(
    f"('{name}', {num}, {den})" for name, num, den in QUANT_TARGETS
)


@REG.add(
    "e_quantile_2pass",
    f"""
    WITH v AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        FROM lineitem
    ),
    tot AS (SELECT count(*) AS n FROM v),
    targets(q, num, den) AS (VALUES {_Q_TARGET_DUCK}),
    tr AS (
        SELECT q, n, (n * num + den - 1) // den AS rank
        FROM targets, tot
    ),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
    SELECT tr.q AS q,
           CAST(tr.n AS BIGINT) AS n,
           CAST(tr.rank AS BIGINT) AS rank,
           CAST(r.v AS DOUBLE) / 100.0 AS value
    FROM tr JOIN ranked r ON r.rn = tr.rank
    ORDER BY q
    """,
    doc="EXACT order-statistic quantiles (p50/p90/p99 of "
    "l_extendedprice) WITHOUT a global sort: pass 1 aggregates "
    "(min, max, n); pass 2 builds a bounded 256-bin equi-width "
    "histogram over integer cents (map-side-combinable, <=256 rows "
    "shuffled); the target rank ceil(p*n) is located in the unique "
    "bin with cum_prev < rank <= cum (a <=3x256 broadcast range "
    "join); pass 3 rank-selects within THAT bin only (expected n/256 "
    "rows reach the per-target window). All arithmetic is integer "
    "(cents, DIV) so binning is engine-portable; the oracle is the "
    "direct sorted order statistic, proving the histogram path exact. "
    "Contrast e_quantiles (percentile(): per-group value buffer) and "
    "e_quantiles_approx (bounded-memory, 5%% error): this form is "
    "exact AND bounded — 3 column-pruned scans, no total order. "
    "Adversarial skew (one bin >> n/256) recurses the same histogram "
    "inside the hot bin; at 256 bins/level, 100 TB of cents needs "
    "<=4 levels.",
)
def e_quantile_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v")
    )
    stats = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n")
    )
    bin_expr = F.least(
        F.expr(f"(v - lo) * {QUANT_BINS} DIV (hi - lo + 1)"),
        F.lit(QUANT_BINS - 1).cast("long"),
    )
    hist = (
        vals.join(F.broadcast(stats))
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "bin",
        (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(cum_w).alias("cum"),
    )
    targets = spark.createDataFrame(QUANT_TARGETS, "q string, num int, den int")
    tr = targets.join(F.broadcast(stats)).select(
        "q", "n", F.expr("(n * num + den - 1) DIV den").alias("rank")
    )
    # the unique bin holding the rank: cum_prev < rank <= cum
    tb = tr.join(
        F.broadcast(cum),
        (F.col("cum_prev") < F.col("rank")) & (F.col("rank") <= F.col("cum")),
    ).select("q", "n", "rank", "bin", "cum_prev")
    sel_w = W.partitionBy("q").orderBy("v")
    return (
        vals.join(F.broadcast(stats))
        .select("v", bin_expr.alias("bin"))
        .join(F.broadcast(tb), "bin")
        .select("q", "n", "rank", "v", F.row_number().over(sel_w).alias("rn"))
        .filter(F.col("rn") == F.col("rank") - F.col("cum_prev"))
        .select(
            "q",
            F.col("n").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
            (F.col("v").cast("double") / F.lit(100.0)).alias("value"),
        )
        .orderBy("q")
    )


# ------------------------------------- streaming CMS state (S15)
def _s15_oracle() -> str:
    from ..operators.sketch import _bucket_expr_duck
    from ..streaming.drift import CMS_DEPTH, CMS_WIDTH

    bucket = _bucket_expr_duck("term", "j", CMS_WIDTH)
    return f"""
    WITH tok AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')
                   AS win_start,
               event_type AS term
        FROM events
    ),
    js AS (SELECT unnest(range({CMS_DEPTH})) AS j),
    sketch AS (
        SELECT win_start, j, {bucket} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok CROSS JOIN js
        GROUP BY 1, 2, 3
    ),
    exact AS (
        SELECT win_start, term, CAST(count(*) AS BIGINT) AS true_cnt
        FROM tok GROUP BY win_start, term
    ),
    probe AS (
        SELECT win_start, term, true_cnt, j, {bucket} AS bucket
        FROM exact CROSS JOIN js
    )
    SELECT p.win_start AS win_start, p.term AS term, p.true_cnt AS true_cnt,
           CAST(min(s.cnt) AS BIGINT) AS est,
           CAST(min(s.cnt) - p.true_cnt AS BIGINT) AS overcount
    FROM probe p JOIN sketch s
      ON p.win_start = s.win_start AND p.j = s.j AND p.bucket = s.bucket
    GROUP BY 1, 2, 3
    ORDER BY win_start, term
    """


@REG.add(
    "s15_cms",
    _s15_oracle(),
    doc="S15: incremental COUNT-MIN maintenance as streaming state — "
    "the frequency complement of s14_kmv. Per event-time day, the "
    "(d=4, w=64) sketch of the event_type stream is merged across "
    "out-of-order micro-batches (the S3 foreachBatch-MERGE landing) "
    "by union + counter re-sum. Counters are ADDITIVE, so the "
    "incremental state is EXACTLY the batch sketch: the oracle "
    "rebuilds it directly and the hash gate proves the streaming "
    "fold changes nothing — including the sketch's own overcounts. "
    "State is |windows| x 256 rows FOREVER; per-day term frequencies "
    "stay point-queryable with no replay and no per-term state at "
    "any stream volume. streaming/drift.py; operators/sketch.py.",
)
def s15_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import incremental_cms_event_types

    return incremental_cms_event_types(spark, sf_dir).orderBy(
        "win_start", "term"
    )


# --------------------------------- exact-quota stratified sampling
# t_sample (text_ops) keeps a RATE per stratum — the sample size then
# fluctuates hypergeometrically. Training-data mixing usually needs the
# dual: an EXACT total budget apportioned across strata proportionally
# (largest-remainder / Hamilton method), each stratum filled by a
# reproducible hash order. Sum of quotas == K exactly, every stratum
# within 1 of its exact proportional share.
STRAT_K = 120


@REG.add(
    "t_sample_stratified",
    f"""
    WITH counts AS (
        SELECT lang, count(*) AS n_g FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_g) AS n FROM counts),
    appor AS (
        SELECT lang, n_g,
               ({STRAT_K} * n_g) // n AS base,
               row_number() OVER (
                   ORDER BY ({STRAT_K} * n_g) % n DESC, lang) AS rr,
               {STRAT_K} - sum(({STRAT_K} * n_g) // n) OVER () AS deficit
        FROM counts, tot
    ),
    q AS (
        SELECT lang, n_g,
               base + CASE WHEN rr <= deficit THEN 1 ELSE 0 END AS quota
        FROM appor
    ),
    sel AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {duck_str_hash("'samp:' || CAST(doc_id AS VARCHAR)")},
                            doc_id) AS rn
        FROM documents
    )
    SELECT s.lang AS lang, s.doc_id AS doc_id,
           CAST(s.rn AS BIGINT) AS rn,
           CAST(q.quota AS BIGINT) AS quota,
           CAST(q.n_g AS BIGINT) AS n_g
    FROM sel s JOIN q ON s.lang = q.lang
    WHERE s.rn <= q.quota
    ORDER BY lang, rn
    """,
    doc="Exact-budget stratified sampling: a total budget of K=120 "
    "documents apportioned across language strata by the largest-"
    "remainder (Hamilton) method — sum of quotas == K EXACTLY, every "
    "stratum within 1 of its exact proportional share — then each "
    "stratum filled in reproducible salted-hash order (per-group "
    "row_number <= quota). The dual of t_sample's per-stratum RATES "
    "(whose realized size fluctuates): mixing pipelines that promise "
    "'exactly K docs, proportionally stratified' need this form. "
    "Scale: the apportionment runs on the |strata|-row count relation; "
    "selection is one lang-partitioned window over (hash, id) pairs — "
    "narrow rows, and at extreme stratum skew the same quota feeds a "
    "threshold refinement (select h below the quota-th smallest, the "
    "e_quantile_2pass bin trick) instead of a full in-group sort.",
)
def t_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_g"))
    tot = counts.agg(F.sum("n_g").alias("n"))
    rem_w = W.orderBy(
        F.desc((F.lit(STRAT_K) * F.col("n_g")) % F.col("n")), F.asc("lang")
    )
    all_w = W.partitionBy()
    appor = counts.join(F.broadcast(tot)).select(
        "lang", "n_g",
        F.expr(f"({STRAT_K} * n_g) DIV n").alias("base"),
        F.row_number().over(rem_w).alias("rr"),
    )
    quota = appor.select(
        "lang", "n_g",
        (
            F.col("base")
            + F.when(
                F.col("rr") <= F.lit(STRAT_K) - F.sum("base").over(all_w), 1
            ).otherwise(0)
        ).alias("quota"),
    )
    h = F.expr(spark_str_hash("concat('samp:', cast(doc_id as string))"))
    sel_w = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    sel = docs.select(
        "lang", "doc_id", F.row_number().over(sel_w).alias("rn")
    )
    return (
        sel.join(F.broadcast(quota), "lang")
        .filter(F.col("rn") <= F.col("quota"))
        .select(
            "lang",
            "doc_id",
            F.col("rn").cast("long").alias("rn"),
            F.col("quota").cast("long").alias("quota"),
            F.col("n_g").cast("long").alias("n_g"),
        )
        .orderBy("lang", "rn")
    )


# --------------------------------- grouped 2-pass quantiles
# The per-group form of e_quantile_2pass — the shape corpus-quality
# dashboards actually run ("p50/p99 doc length per source"). Same
# histogram-guided rank selection, with the group key carried through
# every stage: the histogram is |groups| x 256 rows, bin location is a
# per-group range join on that bounded relation, and the selection
# window partitions by (group, target) so only in-bin rows sort.
GQ_TARGETS = [("p50", 1, 2), ("p99", 99, 100)]

_GQ_TARGET_DUCK = ", ".join(
    f"('{name}', {num}, {den})" for name, num, den in GQ_TARGETS
)


@REG.add(
    "e_quantile_grouped",
    f"""
    WITH v AS (SELECT source, n_chars AS v FROM documents),
    tot AS (SELECT source, count(*) AS n FROM v GROUP BY source),
    targets(q, num, den) AS (VALUES {_GQ_TARGET_DUCK}),
    tr AS (
        SELECT source, q, n, (n * num + den - 1) // den AS rank
        FROM targets, tot
    ),
    ranked AS (
        SELECT source, v,
               row_number() OVER (PARTITION BY source ORDER BY v) AS rn
        FROM v
    )
    SELECT tr.source AS source, tr.q AS q,
           CAST(tr.n AS BIGINT) AS n,
           CAST(tr.rank AS BIGINT) AS rank,
           CAST(r.v AS BIGINT) AS value
    FROM tr JOIN ranked r ON r.source = tr.source AND r.rn = tr.rank
    ORDER BY source, q
    """,
    doc="Per-source EXACT p50/p99 of document length WITHOUT sorting "
    "any group: the grouped form of e_quantile_2pass. Pass 1 "
    "aggregates (min, max, n) per source; pass 2 histograms into "
    "|sources| x 256 bounded bins (map-side-combinable); each "
    "(source, target) rank is located in its unique bin (cum_prev < "
    "rank <= cum) by a broadcast range join on the bounded histogram; "
    "pass 3 rank-selects inside that bin only, the selection window "
    "partitioned by (source, target) so ~n_g/256 rows reach each "
    "sort. Oracle = per-group sorted order statistics — the hash gate "
    "proves the sort-free plan exact for every group. This is the "
    "corpus-quality dashboard query ('length percentiles per source') "
    "at 100 TB: per-group percentile() buffers whole groups; this "
    "form's biggest materialized relation is |groups| x 256.",
)
def e_quantile_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.select("source", F.col("n_chars").alias("v"))
    stats = vals.groupBy("source").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n")
    )
    bin_expr = F.least(
        F.expr(f"(v - lo) * {QUANT_BINS} DIV (hi - lo + 1)"),
        F.lit(QUANT_BINS - 1).cast("long"),
    )
    hist = (
        vals.join(F.broadcast(stats), "source")
        .select("source", bin_expr.alias("bin"))
        .groupBy("source", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum_w = (
        W.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.select(
        "source", "bin",
        (F.sum("cnt").over(cum_w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(cum_w).alias("cum"),
    )
    targets = spark.createDataFrame(GQ_TARGETS, "q string, num int, den int")
    tr = F.broadcast(stats).join(targets).select(
        "source", "q", "n", F.expr("(n * num + den - 1) DIV den").alias("rank")
    )
    tb = tr.join(
        F.broadcast(cum),
        (tr["source"] == cum["source"])
        & (F.col("cum_prev") < F.col("rank"))
        & (F.col("rank") <= F.col("cum")),
    ).select(tr["source"], "q", "n", "rank", "bin", "cum_prev")
    sel_w = W.partitionBy("source", "q").orderBy("v")
    return (
        vals.join(F.broadcast(stats), "source")
        .select("source", "v", bin_expr.alias("bin"))
        .join(F.broadcast(tb), ["source", "bin"])
        .select(
            "source", "q", "n", "rank", "v",
            F.row_number().over(sel_w).alias("rn"),
        )
        .filter(F.col("rn") == F.col("rank") - F.col("cum_prev"))
        .select(
            "source",
            "q",
            F.col("n").cast("long").alias("n"),
            F.col("rank").cast("long").alias("rank"),
            F.col("v").cast("long").alias("value"),
        )
        .orderBy("source", "q")
    )


# --------------------------------------- cohort retention
@REG.add(
    "e_cohort_retention",
    """
    WITH act AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    first AS (
        SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id
    ),
    cell AS (
        SELECT f.cohort AS cohort, date_diff('day', f.cohort, a.day) AS off,
               count(*) AS n_users
        FROM act a JOIN first f ON a.user_id = f.user_id
        GROUP BY 1, 2
    ),
    size AS (SELECT cohort, n_users AS cohort_size FROM cell WHERE off = 0)
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(c.off AS BIGINT) AS off,
           CAST(c.n_users AS BIGINT) AS n_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST((c.n_users * 10000) // s.cohort_size AS BIGINT) AS rate_bp
    FROM cell c JOIN size s ON c.cohort = s.cohort
    ORDER BY cohort_day, off
    """,
    doc="Cohort retention matrix (behavioral analytics): users are "
    "cohorted by their FIRST event day; each (cohort, day-offset) "
    "cell counts users active again at that offset, with the "
    "retention rate in integer basis points against the offset-0 "
    "cohort size. Counts come from the deduplicated (user, day) "
    "activity relation, so no cell double-counts a user — count(*) "
    "after the per-user first-day join IS the distinct count, with "
    "no per-cell distinct shuffle. Scale: one map-side-combinable "
    "distinct over (user, day), one user-keyed min-agg, one user-"
    "keyed join, one (cohort, offset)-keyed agg — cells are at most "
    "|days|^2 rows, the size leg a broadcast. At extreme user "
    "cardinality the exact legs swap for the per-day KMV sketches "
    "s14_kmv already maintains (union/intersection estimates per "
    "cohort) without touching raw history.",
)
def e_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _staged_events(spark, sf_dir)
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    cell = (
        act.join(first, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").alias("off"))
        .agg(F.count("*").alias("n_users"))
    )
    size = cell.filter(F.col("off") == 0).select(
        "cohort", F.col("n_users").alias("cohort_size")
    )
    return (
        cell.join(F.broadcast(size), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("off").cast("long").alias("off"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr("(n_users * 10000) DIV cohort_size")
            .cast("long")
            .alias("rate_bp"),
        )
        .orderBy("cohort_day", "off")
    )


# --------------------------------------- event-path transitions
@REG.add(
    "e_path_transitions",
    """
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ),
    pair AS (
        SELECT src, dst, count(*) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS src_total,
           CAST((n * 10000) // sum(n) OVER (PARTITION BY src) AS BIGINT)
               AS rate_bp
    FROM pair
    ORDER BY src, dst
    """,
    doc="Event-path transition matrix (behavioral analytics): for each "
    "user's time-ordered event sequence (ties broken by event_id so "
    "the sequence is total and engine-portable), count consecutive "
    "event_type pairs and the per-source transition rate in integer "
    "basis points — the first-order Markov model of user journeys. "
    "Scale: ONE user-keyed window (the unavoidable sequence "
    "reconstruction — a hash shuffle on user_id, sort within user "
    "only) feeding a map-side-combinable pair count; everything "
    "downstream is the <=|types|^2 transition relation, and the "
    "normalizing window runs over that bounded relation, not the "
    "events.",
)
def e_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _staged_events(spark, sf_dir)
    seq_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(seq_w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    tot_w = W.partitionBy("src")
    return pair.select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(tot_w).cast("long").alias("src_total"),
        F.expr("n * 10000").cast("long").alias("_nr"),
    ).select(
        "src", "dst", "n", "src_total",
        F.expr("_nr DIV src_total").cast("long").alias("rate_bp"),
    ).orderBy("src", "dst")


# --------------------------------------- volume anomaly detection
ANOM_WIN = 7  # trailing days in the baseline window
ANOM_MIN = 3  # minimum trailing days before a verdict


@REG.add(
    "e_anomaly_volume",
    f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    trail AS (
        SELECT day, n,
               count(*) OVER w AS c,
               sum(n) OVER w AS s,
               sum(n * n) OVER w AS sq
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n,
           CAST(c AS BIGINT) AS c,
           CAST(CASE WHEN c * sq - s * s = 0
                     THEN CASE WHEN n * c - s = 0 THEN 0 ELSE -1 END
                     ELSE ((n * c - s) * (n * c - s) * 100)
                          // (c * (c * sq - s * s))
                END AS BIGINT) AS z2_c,
           CAST(CASE WHEN c * sq - s * s = 0
                     THEN CASE WHEN n * c - s = 0 THEN 0 ELSE 1 END
                     WHEN (n * c - s) * (n * c - s)
                          > 9 * c * (c * sq - s * s) THEN 1
                     ELSE 0
                END AS BIGINT) AS is_anomaly
    FROM trail
    WHERE c >= {ANOM_MIN}
    ORDER BY day
    """,
    doc="Daily-volume anomaly detection — the alerting face of the "
    "monitoring family: each day's event count is z-scored against "
    "its TRAILING 7-day window (mean/variance from integer sums), "
    "flagged when |z| > 3. The entire statistic stays EXACT INTEGER: "
    "z^2 = (n*c - s)^2 / (c*(c*sq - s^2)) is compared via cross-"
    "multiplication, and z2_c reports z^2 in integer centi-units "
    "(-1 = zero-variance baseline with a deviating day). Scale: ONE "
    "map-side-combinable day agg over the corpus; the rolling window "
    "runs over the |days| relation — constant work after the scan, "
    "the t_drift_ks shape with time as the axis.",
)
def e_anomaly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _staged_events(spark, sf_dir)
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = W.orderBy("day").rowsBetween(-ANOM_WIN, -1)
    trail = daily.select(
        "day", "n",
        F.count("*").over(w).alias("c"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
    ).filter(F.col("c") >= ANOM_MIN)
    varnum = F.col("c") * F.col("sq") - F.col("s") * F.col("s")
    diff = F.col("n") * F.col("c") - F.col("s")
    z2_c = F.when(
        varnum == 0, F.when(diff == 0, F.lit(0)).otherwise(F.lit(-1))
    ).otherwise(
        F.expr(
            f"((n * c - s) * (n * c - s) * 100) DIV (c * (c * sq - s * s))"
        )
    )
    is_anom = F.when(
        varnum == 0, F.when(diff == 0, F.lit(0)).otherwise(F.lit(1))
    ).otherwise((diff * diff > F.lit(9) * F.col("c") * varnum).cast("int"))
    return trail.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("c"),
        z2_c.cast("long").alias("z2_c"),
        is_anom.cast("long").alias("is_anomaly"),
    ).orderBy("day")


# --------------------------------------- two-proportion A/B test
@REG.add(
    "e_ab_test",
    """
    WITH arm AS (
        SELECT user_id % 2 AS grp,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    agg AS (
        SELECT CAST(COALESCE(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS n_a,
               CAST(COALESCE(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS n_b,
               CAST(COALESCE(sum(CASE WHEN grp = 0 THEN converted
                                      ELSE 0 END), 0) AS BIGINT) AS c_a,
               CAST(COALESCE(sum(CASE WHEN grp = 1 THEN converted
                                      ELSE 0 END), 0) AS BIGINT) AS c_b
        FROM arm
    )
    SELECT n_a, n_b, c_a, c_b,
           CAST(CASE WHEN n_a = 0 THEN 0
                ELSE (c_a * 10000) // n_a END AS BIGINT) AS rate_a_bp,
           CAST(CASE WHEN n_b = 0 THEN 0
                ELSE (c_b * 10000) // n_b END AS BIGINT) AS rate_b_bp,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 OR (c_a + c_b) = 0
                       OR (c_a + c_b) = (n_a + n_b) THEN 0
                ELSE ((CAST(c_a AS HUGEINT) * n_b
                       - CAST(c_b AS HUGEINT) * n_a)
                      * (CAST(c_a AS HUGEINT) * n_b
                         - CAST(c_b AS HUGEINT) * n_a)
                      * (n_a + n_b) * 100)
                     // (CAST(n_a AS HUGEINT) * n_b * (c_a + c_b)
                         * (n_a + n_b - c_a - c_b))
                END AS BIGINT) AS z2_c,
           CAST(CASE WHEN n_a = 0 OR n_b = 0 OR (c_a + c_b) = 0
                       OR (c_a + c_b) = (n_a + n_b) THEN 0
                WHEN (CAST(c_a AS HUGEINT) * n_b
                      - CAST(c_b AS HUGEINT) * n_a)
                     * (CAST(c_a AS HUGEINT) * n_b
                        - CAST(c_b AS HUGEINT) * n_a)
                     * (n_a + n_b) * 100
                     > 384 * CAST(n_a AS HUGEINT) * n_b * (c_a + c_b)
                           * (n_a + n_b - c_a - c_b) THEN 1
                ELSE 0
                END AS BIGINT) AS significant
    FROM agg
    ORDER BY n_a
    """,
    doc="Two-proportion A/B significance test, EXACT INTEGER: users "
    "split into arms by id parity (at scale: the experiment "
    "assignment column), conversion = any 'purchase' event; the "
    "pooled two-proportion z^2 = (ca*nb - cb*na)^2 (na+nb) / "
    "(na*nb*(ca+cb)*(na+nb-ca-cb)) is reported in integer "
    "centi-units and compared to the 95% chi-square bound 3.84 by "
    "cross-multiplication — no floating point anywhere, so the "
    "verdict is engine-portable and auditable. Scale: one user-keyed "
    "conversion agg (map-side-combinable max), then a single 4-counter "
    "row — the entire test after the scan is O(1). Degenerate pools "
    "(0% or 100% conversion) return z^2 = 0, not a division error. "
    "Numeric domain: the cross-product diff^2*(na+nb)*100 (diff <= "
    "na*nb) runs in DECIMAL(38,0) on the Spark side and HUGEINT in "
    "the DuckDB oracle, so it is exact to ~1e38 — ~1.4e7 users/arm at "
    "ANY effect size (200*N^5 < 1e38) and ~4.6e7/arm at realistic "
    "(<5pp) effects, vs the old int64 path's ~3e4 ceiling "
    "(tests/test_stats_ops.py::test_ab_test_decimal_domain proves a "
    "counter set that overflows int64). The final z2_c/significant "
    "values are small integers, so the OUTPUT stays BIGINT.",
)
def e_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _staged_events(spark, sf_dir)
    arm = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("grp"), "converted")
    agg = arm.agg(
        F.coalesce(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("c_a"),
        F.coalesce(
            F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("c_b"),
    )
    return _ab_stats(agg).orderBy("n_a")


def _ab_stats(agg: DataFrame) -> DataFrame:
    """Pooled two-proportion z^2 from a 4-counter relation
    (n_a, n_b, c_a, c_b — BIGINT). All cross-products run in
    DECIMAL(38,0) so the statistic is exact far beyond the int64
    ceiling (the DuckDB oracle mirrors this with HUGEINT); the
    outputs are small integers, cast back to BIGINT."""
    # one decimal cast per counter; Spark promotes the rest of the
    # expression tree to decimal, and DIV on decimals returns BIGINT
    dec = "CAST({} AS DECIMAL(38,0))"
    d_ca, d_cb = dec.format("c_a"), dec.format("c_b")
    d_na = dec.format("n_a")
    diff = f"({d_ca} * n_b - {d_cb} * n_a)"
    num = f"({diff} * {diff} * (n_a + n_b) * 100)"
    den = f"({d_na} * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b))"
    degenerate = (
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | (F.col("c_a") + F.col("c_b") == 0)
        | (F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b"))
    )
    return agg.select(
        "n_a", "n_b", "c_a", "c_b",
        F.expr("CASE WHEN n_a = 0 THEN 0 ELSE (c_a * 10000) DIV n_a END")
        .cast("long")
        .alias("rate_a_bp"),
        F.expr("CASE WHEN n_b = 0 THEN 0 ELSE (c_b * 10000) DIV n_b END")
        .cast("long")
        .alias("rate_b_bp"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.expr(f"{num} DIV {den}"))
        .cast("long")
        .alias("z2_c"),
        F.when(degenerate, F.lit(0))
        .otherwise(
            # z^2 > 3.84  <=>  (diff^2*(n)*100) > 384*den — exact
            # integer cross-multiplication, the oracle's form verbatim
            (F.expr(num) > F.expr(f"384 * {den}")).cast("int")
        )
        .cast("long")
        .alias("significant"),
    )


# ------------------------------------- streaming histogram state (S16)
@REG.add(
    "s16_quantile",
    f"""
    WITH binned AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')
                   AS win_start,
               least(CAST(floor(value / {DRIFT_BIN_W}) AS BIGINT),
                     {DRIFT_NBINS - 1}) AS bin
        FROM events
    ),
    hist AS (
        SELECT win_start, bin, count(*) AS cnt
        FROM binned GROUP BY win_start, bin
    ),
    cum AS (
        SELECT win_start, bin,
               sum(cnt) OVER (PARTITION BY win_start ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt AS cum_prev,
               sum(cnt) OVER (PARTITION BY win_start ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(cnt) OVER (PARTITION BY win_start) AS n
        FROM hist
    ),
    targets(q, num, den) AS (VALUES ('p50', 1, 2), ('p95', 19, 20)),
    tq AS (
        SELECT win_start, q, bin, cum_prev, cum, n,
               (n * num + den - 1) // den AS rank
        FROM cum, targets
    )
    SELECT win_start, q,
           CAST(n AS BIGINT) AS n,
           CAST(rank AS BIGINT) AS rank,
           CAST(bin AS BIGINT) AS bin,
           CAST(bin * {DRIFT_BIN_W} AS BIGINT) AS lo
    FROM tq
    WHERE cum_prev < rank AND rank <= cum
    ORDER BY win_start, q
    """,
    doc="S16: incremental HISTOGRAM maintenance as streaming state — "
    "the distribution member of the sketch-state trio (s14 distinct, "
    "s15 frequency, s16 quantiles). Per event-time day the bounded "
    "32-bin histogram of `value` is merged across out-of-order "
    "micro-batches by union + counter re-sum (additive, so "
    "incremental == batch EXACTLY — the oracle rebuilds the histogram "
    "directly); binned p50/p95 are then served from the state alone, "
    "each rank ceil(p*n) located in the unique bin with cum_prev < "
    "rank <= cum (the e_quantile_2pass trick, with the state already "
    "BEING the histogram — no second data pass exists). State is "
    "|windows| x 32 rows forever: per-day value quantiles stay "
    "queryable with no replay at any stream volume, to bin "
    "resolution (the production dial: more bins or the 2-pass "
    "refinement over landed data when exactness is needed). "
    "streaming/drift.py.",
)
def s16_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.drift import incremental_value_quantiles

    return incremental_value_quantiles(spark, sf_dir).orderBy("win_start", "q")
