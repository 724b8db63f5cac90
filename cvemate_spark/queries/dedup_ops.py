"""Dedup query surface: MinHash+LSH, SimHash, n-gram Jaccard (Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup
from ..tables import load_table
from .base import Registry

REG = Registry()


@REG.add(
    "dedup_minhash",
    dedup.minhash_pairs_oracle(jaccard_threshold=0.3),
    doc="MinHash+LSH near-dup pairs (12 hashes, 4 bands x 3 rows) verified by "
    "exact Jaccard >= 0.3. Candidate generation is an equi-join on band "
    "signatures — no cross join anywhere.",
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_pairs(docs, jaccard_threshold=0.3).orderBy(
        "d1", "d2", "jaccard"
    )


@REG.add(
    "dedup_simhash",
    dedup.simhash_pairs_oracle(max_hamming=1),
    doc="SimHash near-dup pairs: 32-bit bit-vote signatures, 8-bit chunk "
    "banding, hamming <= 1 verify via bit_count(xor).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=1).orderBy("d1", "d2", "hamming")


@REG.add(
    "dedup_components",
    dedup.dedup_components_oracle(dedup.simhash_pairs_oracle(max_hamming=2)),
    doc="Duplicate clustering: connected components over simhash "
    "near-dup pairs (hamming <= 2) via iterative min-label propagation "
    "— the GraphX-CC shape, two edge-relation shuffles per round, "
    "convergence probed driver-side. The component id is min(doc_id) = "
    "the canonical survivor. Oracle is an exact recursive-CTE "
    "transitive closure, so a hash match also proves the propagation "
    "converged.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(docs, max_hamming=2)
    return dedup.dedup_components(pairs).orderBy("doc_id", "component")


@REG.add(
    "dedup_incremental",
    dedup.minhash_pairs_incremental_oracle(batch_mod=10, jaccard_threshold=0.3),
    doc="Incremental MinHash dedup: an arriving batch (doc_id % 10 == 0) "
    "band-joined against the corpus index (the rest) — the steady-state "
    "100 TB shape where the corpus signatures are a persisted write-time "
    "index and per-batch cost is O(|batch| + matches), never corpus x "
    "corpus recompute.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_pairs_incremental(
        docs, batch_mod=10, jaccard_threshold=0.3
    ).orderBy("batch_doc", "index_doc", "jaccard")


@REG.add(
    "dedup_canonical",
    dedup.dedup_canonical_oracle(dedup.simhash_pairs_oracle(max_hamming=2)),
    doc="The composed fuzzy-dedup pass a curation pipeline actually runs: "
    "simhash near-dup pairs (hamming <= 2) -> connected components -> "
    "keep the canonical survivor (min doc_id; unpaired docs survive as "
    "singletons) -> per-source corpus shrinkage (docs/tokens kept). The "
    "pair set and component relation are near-dup-density-sized, so the "
    "only corpus-wide work is one scan and the final left join on "
    "doc_id.",
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(docs, max_hamming=2)
    comp = dedup.dedup_components(pairs)
    kept = F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id")
    n_tok = F.size(F.split("text", " "))
    return (
        docs.join(comp, "doc_id", "left")
        .select("source", kept.alias("kept"), n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .orderBy("source", "n_docs", "n_kept", "kept_tokens")
    )


NGRAM_DF_CAP = 200  # hot-shingle document-frequency cap (see dedup.py)


@REG.add(
    "dedup_ngram_jaccard",
    dedup.ngram_jaccard_pairs_oracle(threshold=0.3, df_cap=NGRAM_DF_CAP),
    doc="Exact 3-gram Jaccard over co-occurring pairs (join on shingle), "
    "threshold 0.3, hot shingles (document frequency > 200) excluded "
    "from the candidate join so one stop-phrase can't go quadratic — "
    "the verify-side ground truth for the LSH variants.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, threshold=0.3, df_cap=NGRAM_DF_CAP
    ).orderBy("d1", "d2", "jaccard")


SPAN_K = 8  # window length (tokens) for repeated-substring detection


@REG.add(
    "dedup_substring",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    wins AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(t[i:i + {SPAN_K} - 1], ' ')) AS wh
        FROM toks, UNNEST(range(1, len(t) - {SPAN_K} + 2)) AS r(i)
        WHERE len(t) >= {SPAN_K}
    ),
    cnt AS (SELECT wh, count(*) AS c FROM wins GROUP BY wh),
    dup AS (SELECT doc_id, pos FROM wins JOIN cnt USING (wh) WHERE c >= 2),
    isl AS (
        SELECT doc_id,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM dup
    ),
    runs AS (SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY 1, 2),
    per AS (SELECT doc_id, count(*) AS n_win FROM wins GROUP BY doc_id),
    agg AS (
        SELECT doc_id, CAST(sum(run) AS BIGINT) AS dup_win, max(run) AS mx
        FROM runs GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_win, 0) AS BIGINT) AS n_win,
           CAST(coalesce(a.dup_win, 0) AS BIGINT) AS dup_win,
           CAST(CASE WHEN a.mx IS NULL THEN 0
                     ELSE a.mx + {SPAN_K} - 1 END AS BIGINT) AS max_span,
           CAST(CASE WHEN coalesce(a.dup_win, 0) * 5 <= coalesce(p.n_win, 0)
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM documents d
    LEFT JOIN per p USING (doc_id)
    LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Repeated-substring exposure per document (the position-level "
    "form of 'Deduplicating Training Data Makes Language Models "
    "Better', Lee et al. 2022): every overlapping 8-token window is "
    "hashed, windows whose hash occurs >= 2 times corpus-wide mark "
    "their position as duplicated, and consecutive duplicated "
    "positions merge into spans (gaps-and-islands) whose longest run "
    "bounds the longest verbatim repeated substring. Emits per-doc "
    "window/duplicate counts, max repeated-span length (tokens), and "
    "a keep flag at the 20% duplicated-position budget — all integer "
    "arithmetic. One corpus-wide hash-count shuffle (map-side "
    "partial) + one doc_id-keyed window; the window hash relation is "
    "joined back unhinted so AQE sizes it (never a per-doc "
    "broadcast). At 100 TB the count relation prunes to c >= 2 hashes "
    "BEFORE the join-back (a semi-join on the tiny duplicated "
    "minority), keeping the join input corpus-linear.",
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    wins = (
        toks.filter(F.size("t") >= SPAN_K)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(t) - {SPAN_K} + 1),"
                    f" i -> md5(concat_ws(' ', slice(t, i, {SPAN_K}))))"
                )
            ).alias("p0", "wh"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "wh")
    )
    cnt = wins.groupBy("wh").agg(F.count("*").alias("c"))
    dup = (
        wins.join(cnt.filter(F.col("c") >= 2), "wh")
        .select("doc_id", "pos")
    )
    isl = dup.select(
        "doc_id",
        (
            F.col("pos")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
        ).alias("grp"),
    )
    runs = isl.groupBy("doc_id", "grp").agg(F.count("*").alias("run"))
    per = wins.groupBy("doc_id").agg(F.count("*").alias("n_win"))
    agg = runs.groupBy("doc_id").agg(
        F.sum("run").cast("long").alias("dup_win"), F.max("run").alias("mx")
    )
    n_win = F.coalesce(F.col("n_win"), F.lit(0)).cast("long")
    dup_win = F.coalesce(F.col("dup_win"), F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_win.alias("n_win"),
            dup_win.alias("dup_win"),
            F.when(F.col("mx").isNull(), F.lit(0).cast("long"))
            .otherwise((F.col("mx") + SPAN_K - 1).cast("long"))
            .alias("max_span"),
            (dup_win * 5 <= n_win).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )
