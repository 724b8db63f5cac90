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
