"""Text-analysis queries: Q24/Q25 + the LLM-pipeline text operators.

All of these run over the `documents` table and stay entirely inside
whole-stage codegen (built-in functions + lambda folds; no Python in
the hot path). At 100 TB each is a single scan + narrow shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import duck_str_hash, spark_str_hash, stopword_in_list_sql
from ..tables import load_table
from .base import Registry

REG = Registry()

_STOPS = stopword_in_list_sql()

PACK_BUDGET = 512  # tokens per packed training sequence (t_pack)


# ---------------------------------------------------------------- Q24
@REG.add(
    "q24",
    f"""
    SELECT term, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    WHERE term NOT IN ({_STOPS})
    GROUP BY term
    ORDER BY cnt DESC, term ASC
    LIMIT 20
    """,
    doc="UDTF-shaped text analysis: tokenize + stopword filter + top-20 terms "
    "(deterministic tie-break on term).",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(~F.col("term").isin(*["the", "a"]))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------- Q25
@REG.add(
    "q25",
    """
    SELECT md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS fp,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY fp
    HAVING count(*) > 1
    ORDER BY fp, cnt
    """,
    doc="Exact-duplicate detection by content hash (hash-groupBy dedup). The "
    "driver corpus has no full-text duplicates, so the canonical form is the "
    "16-token prefix (documented deviation from full-text md5; the full-text "
    "variant is the `dedup_exact` query).",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 16))
    return (
        docs.select(F.md5(prefix.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .orderBy("fp", "cnt")
    )


# ------------------------------------------------------ dedup_exact
@REG.add(
    "dedup_exact",
    """
    SELECT md5(text) AS digest,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM documents
    GROUP BY digest
    ORDER BY digest, keep_doc_id, n_dropped
    """,
    doc="Exact dedup, full text: one representative (min doc_id) per content "
    "hash. At scale: hash-shuffle on digest, map-side partial agg.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .orderBy("digest", "keep_doc_id", "n_dropped")
    )


# ------------------------------------------------------ t_langid
@REG.add(
    "t_langid",
    f"""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                         t -> t IN ({_STOPS}))) * 10
                     > len(string_split(text, ' ')) THEN 'en'
                ELSE 'other' END AS pred_lang
    FROM documents
    ORDER BY doc_id, lang, pred_lang
    """,
    doc="Language-ID heuristic: function-word density (the n-gram-heuristic "
    "shape; the synthetic corpus shares one vocabulary so the rule is a "
    "stopword-ratio threshold). Pure codegen expression.",
)
def t_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    pred = F.when(n_stop * 10 > F.size(toks), "en").otherwise("other")
    return docs.select("doc_id", "lang", pred.alias("pred_lang")).orderBy(
        "doc_id", "lang", "pred_lang"
    )


# ------------------------------------------------------ t_quality
@REG.add(
    "t_quality",
    f"""
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           floor((LEAST(n_tok / 100.0, 1.0) * 0.5
                  + (n_distinct * 1.0 / n_tok) * 0.3
                  + (1.0 - n_stop * 1.0 / n_tok) * 0.2) * 10000 + 0.5)
               / 10000.0 AS quality
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({_STOPS}))) AS n_stop
        FROM documents
    )
    ORDER BY doc_id, n_tok, quality
    """,
    doc="Quality scoring: length saturation + lexical diversity + stopword "
    "penalty, the classic pretraining-filter shape, as one scan.",
)
def t_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda t: t.isin("the", "a"))).alias("n_stop"),
    )
    # portable half-up round: Spark's round() goes through the double's
    # shortest decimal repr while DuckDB rounds the scaled binary value —
    # they can disagree by 1e-4 on .00005 boundaries. floor(x*1e4 + 0.5)
    # is the same bit-level algorithm in both engines.
    raw_quality = (
        F.least(F.col("n_tok") / 100.0, F.lit(1.0)) * 0.5
        + (F.col("n_distinct") * 1.0 / F.col("n_tok")) * 0.3
        + (1.0 - F.col("n_stop") * 1.0 / F.col("n_tok")) * 0.2
    )
    quality = F.floor(raw_quality * 10000 + F.lit(0.5)) / 10000.0
    return base.select(
        "doc_id", F.col("n_tok").cast("long").alias("n_tok"), quality.alias("quality")
    ).orderBy("doc_id", "n_tok", "quality")


# ------------------------------------------------------ t_tokens
@REG.add(
    "t_tokens",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re
    FROM documents
    ORDER BY doc_id, n_ws, n_re
    """,
    doc="Token counting: whitespace tokens + a BPE-ish regex token count "
    "(regexp stays JVM-side; no Python tokenizer in the scan).",
)
def t_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws"),
        F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
        .cast("long")
        .alias("n_re"),
    ).orderBy("doc_id", "n_ws", "n_re")


# ------------------------------------------------------ t_fingerprint
@REG.add(
    "t_fingerprint",
    f"""
    SELECT doc_id, {duck_str_hash('text')} AS fp
    FROM documents
    ORDER BY doc_id, fp
    """,
    doc="Document fingerprinting: rolling polynomial hash of the full text, "
    "computed by an identical lambda fold in both engines.",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.expr(spark_str_hash("text")).alias("fp")
    ).orderBy("doc_id", "fp")


# ------------------------------------------------------ t_split
@REG.add(
    "t_split",
    f"""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM (
        SELECT text,
               CASE WHEN {duck_str_hash("CAST(doc_id AS VARCHAR)")} % 100 < 90
                         THEN 'train'
                    WHEN {duck_str_hash("CAST(doc_id AS VARCHAR)")} % 100 < 95
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split
    ORDER BY split, n_docs, total_tokens
    """,
    doc="Deterministic train/val/test split (90/5/5): assignment is "
    "hash(doc_id) mod 100 — stable across runs, engines and cluster "
    "sizes, never a random() sample (which is neither reproducible nor "
    "consistent between a 32-core and a 1000-executor run). Pure "
    "codegen; at 100 TB the split column is computed in the scan "
    "projection and can be a write-time partition key.",
)
def t_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"{spark_str_hash('cast(doc_id as string)')} % 100")
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .orderBy("split", "n_docs", "total_tokens")
    )


# ------------------------------------------------------ t_pack
@REG.add(
    "t_pack",
    f"""
    SELECT lang, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM (
        SELECT lang, n_tok,
               CAST(floor((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS bin
        FROM (
            SELECT lang, len(string_split(text, ' ')) AS n_tok,
                   sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM documents
        )
    )
    GROUP BY lang, bin
    ORDER BY lang, bin, n_docs, n_tokens
    """,
    doc="Sequence packing (concat-and-chunk): documents are concatenated "
    "in doc_id order within each language shard and cut into "
    f"{PACK_BUDGET}-token training sequences; a document's bin is its "
    "start-offset div budget (running-sum window), so packing is one "
    "window + one agg — no per-row Python. Scale note: the window "
    "partitions by shard (lang here; any bounded shard key in "
    "production), so no global-order single-partition bottleneck.",
)
def t_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sized = docs.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok"))
    binned = sized.select(
        "lang",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / float(PACK_BUDGET))
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("lang", "bin", "n_docs", "n_tokens")
    )


# ------------------------------------------------------ t_redact
@REG.add(
    "t_redact",
    """
    SELECT event_id,
           regexp_replace(line, '[0-9]+', '[NUM]', 'g') AS redacted,
           CAST(len(regexp_extract_all(line, '[0-9]+')) AS BIGINT) AS n_redacted
    FROM (
        SELECT event_id,
               'user=' || CAST(user_id AS VARCHAR) || ' type=' || event_type
                   || ' props=' || props AS line
        FROM events
    )
    ORDER BY event_id, redacted, n_redacted
    """,
    doc="PII-style regex redaction: rebuild a log line per event, replace "
    "every digit run with a [NUM] placeholder and count redactions — the "
    "scrubbing pass a training pipeline runs before text leaves the "
    "enclave. JVM regexp_replace/regexp_extract_all in the scan "
    "projection (one map stage, no shuffle); production swaps in the "
    "email/phone/ssn pattern alternation, same plan shape. DuckDB's "
    "regexp_replace needs the 'g' flag to match Spark's replace-all.",
)
def t_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    line = F.concat(
        F.lit("user="),
        F.col("user_id").cast("string"),
        F.lit(" type="),
        F.col("event_type"),
        F.lit(" props="),
        F.col("props"),
    )
    lined = ev.select("event_id", line.alias("line"))
    return lined.select(
        "event_id",
        F.regexp_replace("line", "[0-9]+", "[NUM]").alias("redacted"),
        F.size(F.expr("regexp_extract_all(line, '[0-9]+', 0)"))
        .cast("long")
        .alias("n_redacted"),
    ).orderBy("event_id", "redacted", "n_redacted")


# ------------------------------------------------------ t_sample
@REG.add(
    "t_sample",
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {duck_str_hash("CAST(doc_id AS VARCHAR)")} % 1000
                              < 100 + 45 * (CAST(substring(source, 4) AS INT) % 10)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY source
    ORDER BY source, n_total, n_kept
    """,
    doc="Stratified deterministic sampling (data mixing): each source "
    "stratum keeps a different fraction of its documents — the rate here "
    "derives from the source id (100-505 permille) standing in for a "
    "mixing-weight table — selected by hash(doc_id) mod 1000 against the "
    "stratum's permille rate. Hash selection makes the mix reproducible "
    "and cluster-size-independent (a random() sample is neither), and "
    "composes with t_split: disjoint hash functions, independent draws. "
    "One scan, one agg; the kept set is a filter in the same scan when "
    "materializing.",
)
def t_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"{spark_str_hash('cast(doc_id as string)')} % 1000")
    rate = 100 + 45 * (F.substring("source", 4, 10).cast("int") % 10)
    return (
        docs.select("source", (bucket < rate).cast("int").alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        .orderBy("source", "n_total", "n_kept")
    )


# ------------------------------------------------------ t_novelty
@REG.add(
    "t_novelty",
    """
    WITH bi AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(t)),
                   i -> t[i] || ' ' || t[i + 1]))) AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    df AS (SELECT bigram, count(*) AS df FROM bi GROUP BY bigram)
    SELECT bi.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor((sum(df.df) * 1.0 / count(*)) * 10000 + 0.5) / 10000.0
               AS avg_bigram_df
    FROM bi JOIN df ON bi.bigram = df.bigram
    GROUP BY bi.doc_id
    ORDER BY doc_id, n_bigrams, avg_bigram_df
    """,
    doc="Corpus-statistics novelty scoring (the integer-exact stand-in for "
    "bigram-LM perplexity): per-document mean document-frequency of its "
    "distinct bigrams. Low = unusual/novel text, high = boilerplate — the "
    "repetition/novelty quality signal a curation pass thresholds on. Two "
    "shuffles (global bigram df agg, per-doc agg) + one equi-join on "
    "bigram, all corpus-side work linear in token count; the score "
    "arithmetic is exact BIGINT sums with a single portable-rounded "
    "division at the end (transcendental log-prob sums are deliberately "
    "avoided — double addition is order-sensitive across engines).",
)
def t_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    # sequence(1, 0) counts DOWN in Spark — guard 1-token docs (duck's
    # end-exclusive range is empty there, same as the shingle guard)
    arr = F.when(F.size(toks) >= 2, bigrams).otherwise(
        F.array().cast("array<string>")
    )
    bi = docs.select("doc_id", F.explode(F.array_distinct(arr)).alias("bigram"))
    df_rel = bi.groupBy("bigram").agg(F.count("*").alias("df"))
    avg = F.sum("df") * 1.0 / F.count("*")
    return (
        bi.join(df_rel, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.floor(avg * 10000 + F.lit(0.5)) / 10000.0).alias("avg_bigram_df"),
        )
        .orderBy("doc_id", "n_bigrams", "avg_bigram_df")
    )


# ------------------------------------------------------ t_decontam
@REG.add(
    "t_decontam",
    f"""
    WITH g AS (
        SELECT doc_id,
               {duck_str_hash("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
               unnest(list_distinct(list_transform(range(1, len(t) - 3),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                        || t[i+3] || ' ' || t[i+4]))) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 5
    ),
    bench AS (SELECT DISTINCT gram, doc_id AS bench_doc FROM g WHERE bucket >= 95),
    train AS (SELECT doc_id, gram FROM g WHERE bucket < 90)
    SELECT train.doc_id,
           CAST(count(DISTINCT train.gram) AS BIGINT) AS n_hit_grams,
           CAST(count(DISTINCT bench.bench_doc) AS BIGINT) AS n_bench_docs
    FROM train JOIN bench USING (gram)
    GROUP BY train.doc_id
    ORDER BY doc_id, n_hit_grams, n_bench_docs
    """,
    doc="Benchmark decontamination: flag training documents sharing any "
    "5-gram with the held-out benchmark set (here: the t_split test "
    "bucket standing in for an eval suite), reporting how many distinct "
    "grams and benchmark docs each one hits. The production shape for "
    "100 TB: the benchmark side is a FIXED-SIZE suite (MBs of eval "
    "data), so its distinct-gram relation stays tiny no matter how the "
    "corpus grows — the join is a broadcast semi-join against the "
    "corpus scan (no hint needed; AQE broadcasts the small side), one "
    "corpus-linear explode + one agg, never a corpus self-join.",
)
def t_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 4),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
            F.element_at(toks, i + 4),
        ),
    )
    # sequence() counts DOWN when end < start: guard short docs
    arr = F.when(F.size(toks) >= 5, grams).otherwise(F.array().cast("array<string>"))
    bucket = F.expr(f"{spark_str_hash('cast(doc_id as string)')} % 100")
    g = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.explode(F.array_distinct(arr)).alias("gram"),
    )
    bench = (
        g.filter(F.col("bucket") >= 95)
        .select("gram", F.col("doc_id").alias("bench_doc"))
        .distinct()
    )
    train = g.filter(F.col("bucket") < 90).select("doc_id", "gram")
    return (
        train.join(bench, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
        .orderBy("doc_id", "n_hit_grams", "n_bench_docs")
    )


# ------------------------------------------- t_decontam_containment
DECON_NUM, DECON_DEN = 1, 10  # containment threshold 10% (rational)


@REG.add(
    "t_decontam_containment",
    f"""
    WITH g AS (
        SELECT doc_id,
               {duck_str_hash("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
               unnest(list_distinct(list_transform(range(1, len(t) - 3),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                        || t[i+3] || ' ' || t[i+4]))) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 5
    ),
    bench AS (SELECT doc_id AS bench_doc, gram FROM g WHERE bucket >= 95),
    bsize AS (SELECT bench_doc, count(*) AS bench_sz FROM bench GROUP BY bench_doc),
    train AS (SELECT doc_id, gram FROM g WHERE bucket < 90),
    hits AS (
        SELECT t.doc_id, b.bench_doc, count(*) AS n_common
        FROM train t JOIN bench b ON t.gram = b.gram
        GROUP BY t.doc_id, b.bench_doc
    )
    SELECT h.doc_id, h.bench_doc,
           CAST(h.n_common AS BIGINT) AS n_common,
           CAST(s.bench_sz AS BIGINT) AS bench_sz,
           CAST((h.n_common * 1000) // s.bench_sz AS BIGINT) AS containment_pm
    FROM hits h JOIN bsize s ON h.bench_doc = s.bench_doc
    WHERE h.n_common * {DECON_DEN} >= {DECON_NUM} * s.bench_sz
    ORDER BY h.doc_id, h.bench_doc
    """,
    doc="Fuzzy benchmark decontamination by CONTAINMENT: for every "
    "(training doc, benchmark doc) pair, the fraction of the BENCHMARK "
    "doc's distinct 5-grams present in the training doc, kept when "
    ">= 10% (integer cross-multiplication against the rational "
    "threshold; containment reported in exact permille). This is the "
    "graded form of t_decontam's any-shared-gram flag — the statistic "
    "LLM pipelines actually threshold on, since one common idiom "
    "should not evict a document but a leaked eval item (high "
    "containment) must. Scale: identical to t_decontam — the bench "
    "side is a fixed-size suite, its gram relation broadcast; the "
    "per-pair agg is bounded by |bench grams| x hit docs, never a "
    "corpus self-join.",
)
def t_decontam_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 4),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
            F.element_at(toks, i + 4),
        ),
    )
    arr = F.when(F.size(toks) >= 5, grams).otherwise(
        F.array().cast("array<string>")
    )
    bucket = F.expr(f"{spark_str_hash('cast(doc_id as string)')} % 100")
    g = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.explode(F.array_distinct(arr)).alias("gram"),
    )
    bench = g.filter(F.col("bucket") >= 95).select(
        F.col("doc_id").alias("bench_doc"), "gram"
    )
    bsize = bench.groupBy("bench_doc").agg(F.count("*").alias("bench_sz"))
    train = g.filter(F.col("bucket") < 90).select("doc_id", "gram")
    hits = (
        train.join(bench, "gram")
        .groupBy("doc_id", "bench_doc")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        hits.join(bsize, "bench_doc")
        .filter(
            F.col("n_common") * DECON_DEN >= DECON_NUM * F.col("bench_sz")
        )
        .select(
            "doc_id",
            "bench_doc",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("bench_sz").cast("long").alias("bench_sz"),
            F.expr("(n_common * 1000) DIV bench_sz")
            .cast("long")
            .alias("containment_pm"),
        )
        .orderBy("doc_id", "bench_doc")
    )


# ------------------------------------------------------ t_repetition
@REG.add(
    "t_repetition",
    """
    WITH cnt AS (
        SELECT doc_id, bigram, count(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i + 1])) AS bigram
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
            WHERE len(t) >= 2
        )
        GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           floor(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 10000.0 / sum(c)
                 + 0.5) / 10000.0 AS dup_frac,
           floor(max(c) * 10000.0 / sum(c) + 0.5) / 10000.0 AS top_frac
    FROM cnt
    GROUP BY doc_id
    ORDER BY doc_id, n_bigrams, dup_frac, top_frac
    """,
    doc="Repetition quality metrics (the Gopher-style repetition filters): "
    "per document, the fraction of bigram occurrences belonging to a "
    "repeated bigram and the share of the single most frequent bigram. "
    "High values = boilerplate/degenerate text a pretraining filter "
    "drops. Shapes: explode -> partial-agg on (doc_id, bigram) -> final "
    "agg on doc_id — both aggs keyed by doc_id so the second is an "
    "almost-local regroup; corpus-linear, no join. Ratios are exact "
    "BIGINT sums with one portable floor-round division at the end.",
)
def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    arr = F.when(F.size(toks) >= 2, bigrams).otherwise(F.array().cast("array<string>"))
    cnt = (
        docs.select("doc_id", F.explode(arr).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    total = F.sum("c")
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
    return (
        cnt.groupBy("doc_id")
        .agg(
            total.cast("long").alias("n_bigrams"),
            (F.floor(dup * 10000.0 / total + F.lit(0.5)) / 10000.0).alias("dup_frac"),
            (F.floor(F.max("c") * 10000.0 / total + F.lit(0.5)) / 10000.0).alias(
                "top_frac"
            ),
        )
        .orderBy("doc_id", "n_bigrams", "dup_frac", "top_frac")
    )


# ------------------------------------------------------ t_shuffle
@REG.add(
    "t_shuffle",
    f"""
    WITH h AS (
        SELECT doc_id,
               {duck_str_hash("'shuf1:' || CAST(doc_id AS VARCHAR)")} AS hv
        FROM documents
    ),
    s AS (
        SELECT doc_id, hv, hv % 16 AS shard,
               row_number() OVER (PARTITION BY hv % 16
                                  ORDER BY hv, doc_id) AS pos
        FROM h
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(hv) AS BIGINT) AS first_hv,
           CAST(max(hv) AS BIGINT) AS last_hv,
           CAST(CAST(sum(pos * doc_id) AS BIGINT) % 1000000007 AS BIGINT)
               AS order_digest
    FROM s
    GROUP BY shard
    ORDER BY shard, n_docs, first_hv, last_hv, order_digest
    """,
    doc="Deterministic global shuffle (training-order assignment): each "
    "document gets a salted hash; shard = hash mod 16, position = rank "
    "of the hash within the shard. order_digest (sum of pos*doc_id mod "
    "p) proves both engines assign the exact same training order. The "
    "100 TB shape: repartition by shard + sortWithinPartitions(hv) — "
    "a bounded per-shard local sort writing N independent shard files, "
    "never a single global orderBy (whose final merge would serialize); "
    "reshuffling an epoch is just a new salt, still one pass. A "
    "random() shuffle is neither reproducible nor stable across "
    "cluster sizes — hash order is both.",
)
def t_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    hv = F.expr(spark_str_hash("'shuf1:' || cast(doc_id as string)"))
    h = docs.select("doc_id", hv.alias("hv"), (hv % 16).alias("shard"))
    w = W.partitionBy("shard").orderBy("hv", "doc_id")
    s = h.select("doc_id", "hv", "shard", F.row_number().over(w).alias("pos"))
    return (
        s.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("hv").alias("first_hv"),
            F.max("hv").alias("last_hv"),
            (F.sum(F.col("pos") * F.col("doc_id")) % 1000000007)
            .cast("long")
            .alias("order_digest"),
        )
        .select(F.col("shard").cast("long").alias("shard"), "n_docs", "first_hv", "last_hv", "order_digest")
        .orderBy("shard", "n_docs", "first_hv", "last_hv", "order_digest")
    )


# ------------------------------------------------------ curation pipeline
@REG.add(
    "curate_pipeline",
    f"""
    WITH scored AS (
        SELECT doc_id, source, md5(text) AS digest,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ({_STOPS}))) AS n_stop
        FROM documents
    ),
    kept AS (
        SELECT doc_id, source, digest, n_tok,
               LEAST(n_tok / 100.0, 1.0) * 0.5
                   + (n_distinct * 1.0 / n_tok) * 0.3
                   + (1.0 - n_stop * 1.0 / n_tok) * 0.2 AS quality
        FROM scored
        WHERE n_stop * 10 > n_tok
        QUALIFY row_number() OVER (PARTITION BY digest ORDER BY doc_id) = 1
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           floor(avg(quality) * 10000 + 0.5) / 10000.0 AS avg_quality
    FROM kept
    WHERE quality >= 0.5
    GROUP BY source
    ORDER BY source, n_docs, total_tokens, avg_quality
    """,
    doc="End-to-end training-data curation: language-ID gate (stopword "
    "density) -> quality floor -> exact-dedup keep-first -> per-source "
    "corpus stats. One scan, one digest shuffle, one final agg — the "
    "composed form of t_langid/t_quality/dedup_exact, which is how the "
    "pieces run in a real 100 TB curation pass.",
)
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda t: t.isin("the", "a"))).alias("n_stop"),
    )
    quality = (
        F.least(F.col("n_tok") / 100.0, F.lit(1.0)) * 0.5
        + (F.col("n_distinct") * 1.0 / F.col("n_tok")) * 0.3
        + (1.0 - F.col("n_stop") * 1.0 / F.col("n_tok")) * 0.2
    )
    w = W.partitionBy("digest").orderBy("doc_id")
    kept = (
        scored.filter(F.col("n_stop") * 10 > F.col("n_tok"))
        .withColumn("quality", quality)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("quality") >= 0.5)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.floor(F.avg("quality") * 10000 + F.lit(0.5)) / 10000.0).alias("avg_quality"),
        )
        .orderBy("source", "n_docs", "total_tokens", "avg_quality")
    )


# ------------------------------------------------------ t_chunk
CHUNK_SIZE = 32   # tokens per chunk
CHUNK_STRIDE = 24  # overlap = CHUNK_SIZE - CHUNK_STRIDE = 8 tokens


@REG.add(
    "t_chunk",
    f"""
    WITH sized AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    chunked AS (
        SELECT doc_id, n_tok,
               CASE WHEN n_tok <= {CHUNK_SIZE} THEN 1
                    ELSE CAST(floor((n_tok - {CHUNK_SIZE}
                              + {CHUNK_STRIDE} - 1) / {CHUNK_STRIDE})
                         AS BIGINT) + 1 END AS n_chunks,
               t
        FROM sized
    ),
    per_chunk AS (
        SELECT doc_id, n_tok, n_chunks,
               unnest(range(0, n_chunks)) AS chunk_idx,
               t
        FROM chunked
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_SIZE}, n_tok - chunk_idx * {CHUNK_STRIDE})
                AS BIGINT) AS chunk_len,
           md5(array_to_string(
               t[chunk_idx * {CHUNK_STRIDE} + 1 :
                 chunk_idx * {CHUNK_STRIDE}
                 + LEAST({CHUNK_SIZE}, n_tok - chunk_idx * {CHUNK_STRIDE})],
               ' ')) AS chunk_fp
    FROM per_chunk
    ORDER BY doc_id, chunk_idx, chunk_len, chunk_fp
    """,
    doc="RAG-style document chunking with overlap: fixed-size token "
    f"windows ({CHUNK_SIZE} tokens, stride {CHUNK_STRIDE}, overlap "
    f"{CHUNK_SIZE - CHUNK_STRIDE}) — the embedding-prep step of a "
    "retrieval/training pipeline. Chunk count and boundaries are pure "
    "integer arithmetic; the md5 fingerprint of each chunk's token "
    "span proves both engines extract the exact same text windows. "
    "Row-local explode in the scan projection — chunking 100 TB is "
    "zero-shuffle and the chunk rows flow straight into the embed/"
    "quantize/index stages.",
)
def t_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_chunks = F.when(n_tok <= CHUNK_SIZE, F.lit(1).cast("long")).otherwise(
        F.floor((n_tok - CHUNK_SIZE + CHUNK_STRIDE - 1) / CHUNK_STRIDE) + 1
    )
    sized = docs.select("doc_id", toks.alias("t"), n_tok.alias("n_tok"),
                        n_chunks.alias("n_chunks"))
    per_chunk = sized.select(
        "doc_id",
        "n_tok",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    chunk_len = F.least(
        F.lit(CHUNK_SIZE), F.col("n_tok") - F.col("chunk_idx") * CHUNK_STRIDE
    )
    span = F.slice(F.col("t"), F.col("chunk_idx") * CHUNK_STRIDE + 1, chunk_len)
    return per_chunk.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        chunk_len.cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", span).cast("binary")).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_idx", "chunk_len", "chunk_fp")

# ------------------------------------------------------ t_compress
@REG.add(
    "t_compress",
    None,  # zlib exists in no SQL engine: rows-only driver check; the
    # determinism/ordering laws live in tests/test_graph_analysis.py
    doc="Compression-ratio quality signal (used by RefinedWeb/Gopher-"
    "family pipelines: highly compressible text is boilerplate or "
    "repetition, incompressible text is noise): per-doc "
    "zlib-compressed size over raw size, as permille. Python is "
    "unavoidable (zlib), so the scan is ONE Arrow-batched mapInPandas "
    "pass — per-batch C-speed zlib, no per-row UDF overhead, no "
    "shuffle at all (row-local); output is (doc_id, n_bytes, z_bytes, "
    "ratio_pm) with the ratio in integer permille so downstream "
    "keep-thresholds are float-drift-free.",
)
def t_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def compress_batches(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n = raw.str.len().astype("int64")
            z = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "z_bytes": z,
                    "ratio_pm": (z * 1000) // n,
                }
            )

    out_schema = "doc_id long, n_bytes long, z_bytes long, ratio_pm long"
    return docs.mapInPandas(compress_batches, schema=out_schema).orderBy("doc_id")

# ------------------------------------------------------ t_winnow
WIN_K = 5   # k-gram length for winnowing
WIN_W = 4   # winnowing window (guarantee: any match >= K+W-1 tokens is caught)
_POS_BITS = 22  # pack (hash, pos) -> one BIGINT for a frame-min with tie-break
# 40-bit hash + 22-bit position = 62 bits, exact in int64. Docs longer than
# 2^22-1 (~4.2M) token positions would corrupt the pack silently, so the
# Spark path raises on overflow instead (the oracle never sees such rows).


@REG.add(
    "t_winnow",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               CAST(('0x' || substring(md5(array_to_string(t[i:i + {WIN_K} - 1],
                    ' ')), 1, 10)) AS BIGINT) AS h
        FROM toks, UNNEST(range(1, len(t) - {WIN_K} + 2)) AS r(i)
        WHERE len(t) >= {WIN_K} + {WIN_W} - 1
    ),
    packed AS (
        SELECT doc_id, pos, h * {1 << _POS_BITS} + pos AS ph FROM grams
    ),
    mins AS (
        SELECT doc_id,
               min(ph) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING)
                   AS m,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM packed
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               m // {1 << _POS_BITS} AS fh, m % {1 << _POS_BITS} AS fpos
        FROM mins WHERE rn <= n - {WIN_W - 1}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(min(fh) AS BIGINT) AS min_fh,
           CAST(max(fpos) AS BIGINT) AS last_pos
    FROM fps
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken "
    "2003, the MOSS algorithm): hash every 5-token k-gram, slide a "
    "4-window over the hash sequence and keep each window's minimum "
    "(ties broken by rightmost position via packing (hash, pos) into "
    "one BIGINT before the frame-min) — selecting O(n/w) "
    "position-stable fingerprints that guarantee any verbatim match "
    "of >= k+w-1 tokens shares a fingerprint. The per-doc frame-min "
    "is ONE doc_id-keyed window pass (row-frame, streaming-friendly); "
    "selected fingerprints are the compact index a 100-TB dedup joins "
    "on INSTEAD of all overlapping windows (w-fold candidate "
    "reduction vs dedup_substring's full position set, the standard "
    "recall/cost dial). 40-bit hash + 22-bit position keeps the pack "
    "exact in int64; positions past the 22-bit cap raise instead of "
    "silently corrupting the frame-min.",
)
def t_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    grams = (
        toks.filter(F.size("t") >= WIN_K + WIN_W - 1)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(t) - {WIN_K} + 1), i -> "
                    f"cast(conv(substring(md5(concat_ws(' ', slice(t, i, {WIN_K}))),"
                    f" 1, 10), 16, 10) as bigint))"
                )
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    )
    packed = grams.select(
        "doc_id",
        "pos",
        F.expr(
            f"CASE WHEN pos >= {1 << _POS_BITS} THEN "
            f"raise_error(concat('t_winnow: position overflows {_POS_BITS}-bit "
            f"pack for doc_id=', doc_id)) "
            f"ELSE h * {1 << _POS_BITS}L + pos END"
        ).alias("ph"),
    )
    byPos = W.partitionBy("doc_id").orderBy("pos")
    mins = packed.select(
        "doc_id",
        F.min("ph").over(byPos.rowsBetween(0, WIN_W - 1)).alias("m"),
        F.row_number().over(byPos).alias("rn"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n"),
    )
    fps = (
        mins.filter(F.col("rn") <= F.col("n") - (WIN_W - 1))
        .select(
            "doc_id",
            F.expr(f"m div {1 << _POS_BITS}").alias("fh"),
            (F.col("m") % (1 << _POS_BITS)).alias("fpos"),
        )
        .distinct()
    )
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fp"),
            F.min("fh").cast("long").alias("min_fh"),
            F.max("fpos").cast("long").alias("last_pos"),
        )
        .orderBy("doc_id")
    )

# ------------------------------------------------------ t_entropy
@REG.add(
    "t_entropy",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    cnt AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
    wc AS (
        SELECT doc_id, term, c,
               sum(c) OVER (PARTITION BY doc_id) AS n
        FROM cnt
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tok,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CAST(floor(c * ln(CAST(n AS DOUBLE) / c) * 1000000)
                         AS BIGINT)) AS BIGINT) AS ent_q
    FROM wc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Token-distribution entropy per document (the unigram-entropy "
    "gibberish/repetition signal: near-zero for one-token spam, "
    "log(n) for all-distinct text): H*n = sum over terms of "
    "c*ln(n/c). Each term's contribution is quantized to an integer "
    "(x1e6 floor) BEFORE the per-doc sum, so the aggregate is "
    "order-independent — the one ln touches an exact integer ratio, "
    "same portable-log discipline as t_colloc/t_perplexity. Shape: "
    "one (doc_id, term) count shuffle + one doc_id window/agg, all "
    "JVM codegen. ent_q/1e6/n_tok/ln(2) is bits-per-token; kept "
    "integer here so keep-thresholds cannot float-drift.",
)
def t_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cnt = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    wc = cnt.withColumn("n", F.sum("c").over(W.partitionBy("doc_id")))
    term_q = F.floor(
        F.col("c") * F.log(F.col("n").cast("double") / F.col("c")) * 1000000
    ).cast("long")
    return (
        wc.groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tok"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(term_q).cast("long").alias("ent_q"),
        )
        .orderBy("doc_id")
    )



# ------------------------------------------------------ t_length_hist
@REG.add(
    "t_length_hist",
    """
    SELECT source,
           CAST(CASE WHEN len(string_split(text, ' ')) >= 200 THEN 21
                     ELSE len(string_split(text, ' ')) // 10 + 1 END
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                AS BIGINT) AS tokens
    FROM documents
    GROUP BY source, bucket
    ORDER BY source, bucket, n_docs, tokens
    """,
    doc="Token-length histogram per source (20 equal 10-token bins "
    "over 0..200 plus an overflow bucket — width_bucket semantics "
    "spelled as integer arithmetic, since DuckDB lacks the "
    "function): the length-distribution report every mixture plan "
    "and packing-efficiency estimate starts from. One scan, one "
    "map-side-combinable (source, bucket) agg; bucket ids and token "
    "sums are integers, so the gate is exact.",
)
def t_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return (
        docs.select(
            "source",
            F.expr(
                "CAST(CASE WHEN size(split(text, ' ')) >= 200 THEN 21"
                " ELSE size(split(text, ' ')) div 10 + 1 END AS BIGINT)"
            ).alias("bucket"),
            n_tok.cast("long").alias("n_tok"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
        .orderBy("source", "bucket", "n_docs", "tokens")
    )


# ------------------------------------------------- t_winnow_pairs
WINP_DF_CAP = 200  # hot-fingerprint document-frequency cap
WINP_MIN_SHARED = 2  # pairs must share >= 2 selected fingerprints


@REG.add(
    "t_winnow_pairs",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               CAST(('0x' || substring(md5(array_to_string(t[i:i + {WIN_K} - 1],
                    ' ')), 1, 10)) AS BIGINT) AS h
        FROM toks, UNNEST(range(1, len(t) - {WIN_K} + 2)) AS r(i)
        WHERE len(t) >= {WIN_K} + {WIN_W} - 1
    ),
    packed AS (
        SELECT doc_id, pos, h * {1 << _POS_BITS} + pos AS ph FROM grams
    ),
    mins AS (
        SELECT doc_id,
               min(ph) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING)
                   AS m,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM packed
    ),
    fps AS (
        SELECT DISTINCT doc_id, m // {1 << _POS_BITS} AS fh
        FROM mins WHERE rn <= n - {WIN_W - 1}
    ),
    keep AS (
        SELECT fh FROM fps GROUP BY fh
        HAVING count(*) BETWEEN 2 AND {WINP_DF_CAP}
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(count(*) AS BIGINT) AS shared_fp
    FROM fps a
    JOIN keep k ON a.fh = k.fh
    JOIN fps b ON a.fh = b.fh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINP_MIN_SHARED}
    ORDER BY d1, d2, shared_fp
    """,
    doc="Winnowing candidate pairs (the MOSS pipeline's second half): "
    "documents joined on SELECTED fingerprints only — a w-fold "
    "smaller join input than the full window set dedup_substring "
    "touches — with a hot-fingerprint document-frequency cap "
    "(2..200) so one boilerplate span cannot go quadratic (the "
    "dedup_ngram_jaccard lesson), and a >= 2 shared-fingerprint "
    "floor to suppress single-collision noise. Emits (d1, d2, "
    "shared_fp) candidates for a downstream exact verify. All "
    "integer counts; one doc_id window pass + one fingerprint-keyed "
    "join.",
)
def t_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    grams = (
        toks.filter(F.size("t") >= WIN_K + WIN_W - 1)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(t) - {WIN_K} + 1), i -> "
                    f"cast(conv(substring(md5(concat_ws(' ', slice(t, i, {WIN_K}))),"
                    f" 1, 10), 16, 10) as bigint))"
                )
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    )
    packed = grams.select(
        "doc_id", "pos", (F.col("h") * (1 << _POS_BITS) + F.col("pos")).alias("ph")
    )
    byPos = W.partitionBy("doc_id").orderBy("pos")
    mins = packed.select(
        "doc_id",
        F.min("ph").over(byPos.rowsBetween(0, WIN_W - 1)).alias("m"),
        F.row_number().over(byPos).alias("rn"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n"),
    )
    fps = (
        mins.filter(F.col("rn") <= F.col("n") - (WIN_W - 1))
        .select("doc_id", F.expr(f"m div {1 << _POS_BITS}").alias("fh"))
        .distinct()
    )
    keep = (
        fps.groupBy("fh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df").between(2, WINP_DF_CAP))
        .select("fh")
    )
    a = fps.join(keep, "fh").select(F.col("doc_id").alias("d1"), "fh")
    b = fps.select(F.col("doc_id").alias("d2"), "fh")
    return (
        a.join(b, "fh")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("long").alias("shared_fp"))
        .filter(F.col("shared_fp") >= WINP_MIN_SHARED)
        .orderBy("d1", "d2", "shared_fp")
    )
