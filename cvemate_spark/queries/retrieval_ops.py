"""Retrieval + language-model quality operators over `documents`.

The search/scoring surface a training-data pipeline runs alongside the
dedup/quality passes already in `text_ops`:

- `bm25_topk`  — BM25 keyword retrieval (Robertson/Sparck Jones; the
  scoring function behind Lucene/Elasticsearch defaults).
- `t_perplexity` — CCNet-style bigram-LM negative-log-likelihood
  scoring: train add-k-smoothed bigram counts on a reference slice of
  the corpus, score every document; high avg NLL = far from the
  reference distribution (the classic LM-perplexity quality filter).
- `t_domain` — lexicon-based topic/domain classification (weighted
  keyword votes, argmax with deterministic tie-break).

Scale notes (100 TB):
- everything is built-in-function codegen — tokenize/explode/agg/join;
  no Python in any hot path;
- corpus statistics (N, total length, vocab size) ride along as
  broadcast one-row relations, never a driver collect;
- the BM25 df relation and the domain lexicon are bounded by |query
  terms| / |lexicon| — broadcast is structurally safe;
- the bigram model is bounded by vocab², NOT corpus size, but vocab²
  can still be large — the model joins are left UNHINTED so AQE
  broadcasts only when the built model is actually small (the same
  rule the dedup `sizes` joins follow after the round-1 verdict);
- float portability: every per-row log-contribution is quantized to
  integer micro-units (floor(x*1e6+0.5) as BIGINT) BEFORE the
  aggregate, so cross-engine sums are exact integer sums — order
  independent — and only the final display division is floating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions.text import duck_str_hash, spark_str_hash
from ..tables import load_table
from .base import Registry

REG = Registry()

# ------------------------------------------------------------- BM25
# Query terms: one common, one mid, one rare ('dup' only appears in the
# planted near-duplicate documents) so the idf spread is visible.
BM25_TERMS = ("spark", "merge", "dup")
BM25_K1 = 1.2
BM25_B = 0.75

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@REG.add(
    "bm25_topk",
    f"""
    WITH tok AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM tok WHERE term IN ({_TERMS_SQL})
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
                   * (tf.tf * {BM25_K1 + 1.0})
                   / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * tf.dl
                       / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                   * 1000000.0 + 0.5) AS BIGINT) AS c_u
        FROM tf JOIN df ON tf.term = df.term, stats s
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit,
           CAST(sum(c_u) AS DOUBLE) / 1000000.0 AS score
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 20
    """,
    doc="BM25 keyword retrieval, top-20 for a fixed 3-term query. "
    "tf/df/length statistics in one tokenize pass; df and the corpus "
    "stats are bounded-small broadcast relations; per-term scores are "
    "quantized to integer micro-units before the per-doc sum so the "
    "cross-engine aggregate is exact. Top-k = TakeOrderedAndProject.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_TERMS))
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
        * (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
        )
    )
    c_u = F.floor(contrib * F.lit(1000000.0) + F.lit(0.5))
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", c_u.alias("c_u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hit"),
            (F.sum("c_u").cast("double") / F.lit(1000000.0)).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# -------------------------------------------------- bigram perplexity
PPL_REF_SOURCE = "src0"  # the "clean reference corpus" slice
PPL_ALPHA = 0.5  # add-k smoothing


@REG.add(
    "t_perplexity",
    f"""
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    flat AS (
        SELECT doc_id, source, b.w1 AS w1, b.w2 AS w2 FROM (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(toks)),
                          i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
            FROM tok
        )
    ),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM flat
           WHERE source = '{PPL_REF_SOURCE}' GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS c1 FROM flat
           WHERE source = '{PPL_REF_SOURCE}' GROUP BY w1),
    v AS (SELECT count(DISTINCT w1) AS vocab FROM flat
          WHERE source = '{PPL_REF_SOURCE}'),
    scored AS (
        SELECT f.doc_id,
               CAST(floor(-ln((coalesce(c2.c2, 0) + {PPL_ALPHA})
                              / (coalesce(c1.c1, 0) + {PPL_ALPHA} * v.vocab))
                          * 1000000.0 + 0.5) AS BIGINT) AS lp_u
        FROM flat f
        LEFT JOIN c2 ON f.w1 = c2.w1 AND f.w2 = c2.w2
        LEFT JOIN c1 ON f.w1 = c1.w1, v
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp_u) AS DOUBLE) / 1000000.0 / count(*) AS avg_nll
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="CCNet-style LM-perplexity quality scoring: add-k-smoothed bigram "
    "model trained on the reference slice (source=src0), every document "
    "scored by average negative log-likelihood. Model relations are "
    "vocab-bounded and join UNHINTED (AQE broadcasts when small); "
    "per-bigram logprobs are integer-quantized before the per-doc sum "
    "so the aggregate is order-independent across engines.",
)
def t_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bigrams = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(x, i) -> struct(x AS w1, element_at(toks, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "source", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    ref = bigrams.filter(F.col("source") == PPL_REF_SOURCE)
    c2 = ref.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = ref.groupBy("w1").agg(F.count("*").alias("c1"))
    v = ref.agg(F.countDistinct("w1").alias("vocab"))
    lp = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(PPL_ALPHA))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(PPL_ALPHA) * F.col("vocab"))
    )
    lp_u = F.floor(lp * F.lit(1000000.0) + F.lit(0.5))
    scored = (
        bigrams.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp_u.alias("lp_u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("lp_u").cast("double") / F.lit(1000000.0) / F.count("*")).alias(
                "avg_nll"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- lexicon domain classify
# (term, domain, weight) — weight-2 terms are each domain's signature.
DOMAIN_LEXICON: tuple[tuple[str, str, int], ...] = (
    ("join", "join", 2), ("hash", "join", 1), ("merge", "join", 1),
    ("key", "join", 1),
    ("scan", "exec", 2), ("filter", "exec", 1), ("agg", "exec", 1),
    ("sort", "exec", 1), ("group", "exec", 1),
    ("stream", "stream", 2), ("window", "stream", 1), ("batch", "stream", 1),
    ("line", "stream", 1),
    ("table", "storage", 2), ("column", "storage", 1), ("row", "storage", 1),
    ("part", "storage", 1),
)

_LEX_VALUES = ", ".join(f"('{t}', '{d}', {w})" for t, d, w in DOMAIN_LEXICON)


@REG.add(
    "t_domain",
    f"""
    WITH lex(term, domain, w) AS (VALUES {_LEX_VALUES}),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    votes AS (
        SELECT t.doc_id, l.domain, CAST(sum(l.w) AS BIGINT) AS score
        FROM tok t JOIN lex l ON t.term = l.term
        GROUP BY t.doc_id, l.domain
    ),
    ranked AS (
        SELECT doc_id, domain, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, domain ASC) AS rn
        FROM votes
    )
    SELECT doc_id, domain, score FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    doc="Lexicon-based domain classification: weighted keyword votes per "
    "(doc, domain), argmax with deterministic tie-break on domain name. "
    "The lexicon is a constant-size broadcast literal (the one join "
    "where a broadcast hint is structurally safe at any corpus size); "
    "integer weights keep the vote sums exact.",
)
def t_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        list(DOMAIN_LEXICON), "term string, domain string, w long"
    )
    votes = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .join(F.broadcast(lex), "term")
        .groupBy("doc_id", "domain")
        .agg(F.sum("w").alias("score"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("domain"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "domain", "score")
        .orderBy("doc_id")
    )


# ------------------------------------------- DSIR importance weights
# Data Selection via Importance Resampling (Xie et al. 2023): score how
# much more likely each document is under a TARGET slice's hashed-ngram
# distribution than under the raw-corpus distribution; positive weight
# = closer to target.  Features are bigrams hashed into a fixed bucket
# count, so both "models" are constant-size (B rows) by construction.
DSIR_TARGET_SOURCE = "src1"
DSIR_BUCKETS = 64
DSIR_ALPHA = 0.5

_SPARK_CONCAT = "concat(w1, ' ', w2)"
_DUCK_CONCAT = "w1 || ' ' || w2"
_SPARK_BUCKET = f"({spark_str_hash(_SPARK_CONCAT)} % {DSIR_BUCKETS})"
_DUCK_BUCKET = f"({duck_str_hash(_DUCK_CONCAT)} % {DSIR_BUCKETS})"


@REG.add(
    "t_dsir",
    f"""
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    flat AS (
        SELECT doc_id, source, {_DUCK_BUCKET} AS bkt FROM (
            SELECT doc_id, source, b.w1 AS w1, b.w2 AS w2 FROM (
                SELECT doc_id, source,
                       unnest(list_transform(range(1, len(toks)),
                              i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
                FROM tok
            )
        )
    ),
    cc AS (SELECT bkt, count(*) AS cc FROM flat GROUP BY bkt),
    ct AS (SELECT bkt, count(*) AS ct FROM flat
           WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY bkt),
    stats AS (
        SELECT cc.bkt, coalesce(ct.ct, 0) AS ct, cc.cc
        FROM cc LEFT JOIN ct ON cc.bkt = ct.bkt
    ),
    totals AS (SELECT sum(ct) AS t_tot, sum(cc) AS c_tot FROM stats),
    scored AS (
        SELECT f.doc_id,
               CAST(floor(ln(((s.ct + {DSIR_ALPHA})
                              / (t.t_tot + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                             / ((s.cc + {DSIR_ALPHA})
                              / (t.c_tot + {DSIR_ALPHA} * {DSIR_BUCKETS})))
                          * 1000000.0 + 0.5) AS BIGINT) AS lw_u
        FROM flat f JOIN stats s ON f.bkt = s.bkt, totals t
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lw_u) AS DOUBLE) / 1000000.0 / count(*) AS avg_lw,
           CAST(sum(lw_u) > 0 AS BOOLEAN) AS selected
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="DSIR-style importance weighting (Xie et al. 2023): hashed-bigram "
    "bucket distributions for a target slice vs the raw corpus; per-doc "
    "log importance weight, selected = weight > 0. Both distribution "
    "relations are exactly B=64 rows (constant by construction) so the "
    "stats join broadcasts safely at any corpus size; the selection "
    "threshold compares an exact integer sum, no float boundary.",
)
def t_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flat = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1), "
                    "(x, i) -> struct(x AS w1, element_at(toks, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        .select(
            "doc_id",
            "source",
            F.col("b.w1").alias("w1"),
            F.col("b.w2").alias("w2"),
        )
        .select("doc_id", "source", F.expr(_SPARK_BUCKET).alias("bkt"))
    )
    cc = flat.groupBy("bkt").agg(F.count("*").alias("cc"))
    ct = (
        flat.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("bkt")
        .agg(F.count("*").alias("ct"))
    )
    stats = cc.join(ct, "bkt", "left").select(
        "bkt", F.coalesce(F.col("ct"), F.lit(0)).alias("ct"), "cc"
    )
    totals = stats.agg(
        F.sum("ct").alias("t_tot"), F.sum("cc").alias("c_tot")
    )
    lw = F.log(
        (
            (F.col("ct") + F.lit(DSIR_ALPHA))
            / (F.col("t_tot") + F.lit(DSIR_ALPHA * DSIR_BUCKETS))
        )
        / (
            (F.col("cc") + F.lit(DSIR_ALPHA))
            / (F.col("c_tot") + F.lit(DSIR_ALPHA * DSIR_BUCKETS))
        )
    )
    lw_u = F.floor(lw * F.lit(1000000.0) + F.lit(0.5))
    scored = (
        flat.join(F.broadcast(stats), "bkt")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", lw_u.alias("lw_u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.sum("lw_u").cast("double") / F.lit(1000000.0) / F.count("*")).alias(
                "avg_lw"
            ),
            (F.sum("lw_u") > F.lit(0)).alias("selected"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------- positional phrase match
PHRASE = ("hash", "join")


@REG.add(
    "t_phrase",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
        SELECT doc_id, unnest(toks) AS term,
               unnest(range(0, len(toks))) AS pos
        FROM tok
    )
    SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS n_occ
    FROM pos p1 JOIN pos p2
      ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
    WHERE p1.term = '{PHRASE[0]}' AND p2.term = '{PHRASE[1]}'
    GROUP BY p1.doc_id
    ORDER BY p1.doc_id
    """,
    doc="Exact phrase search over a positional posting list: posexplode "
    "gives (doc_id, term, pos); consecutive-position equi-join finds "
    "phrase occurrences. Both posting relations are filtered to their "
    "term BEFORE the join (term selectivity cuts the join input by "
    "~|vocab|x) and the join key leads with doc_id — at 100 TB the "
    "posting list is written bucketed by term, so each phrase term "
    "reads one bucket and the position join shuffles only matching "
    "postings, never the corpus.",
)
def t_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    p1 = pos.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos1")
    )
    p2 = pos.filter(F.col("term") == PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos2")
    )
    return (
        p1.join(
            p2,
            (p1.doc_id == p2.doc_id) & (F.col("pos2") == F.col("pos1") + 1),
        )
        .groupBy(p1.doc_id.alias("doc_id"))
        .agg(F.count("*").alias("n_occ"))
        .orderBy("doc_id")
    )


# ------------------------------------------------- PMI collocations
PMI_MIN_COUNT = 10  # drop rare pairs before scoring (variance control)


@REG.add(
    "t_colloc",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    pos AS (
        SELECT doc_id, unnest(toks) AS term,
               unnest(range(0, len(toks))) AS pos
        FROM tok
    ),
    uni AS (SELECT term, count(*) AS c FROM pos GROUP BY term),
    tot AS (SELECT sum(c) AS n FROM uni),
    pairs AS (
        SELECT p1.term AS w1, p2.term AS w2, count(*) AS c12
        FROM pos p1 JOIN pos p2
          ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
        GROUP BY w1, w2
        HAVING count(*) >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
           floor(ln((t.n * pairs.c12) / (CAST(u1.c AS DOUBLE) * u2.c))
                 * 10000 + 0.5) / 10000.0 AS pmi
    FROM pairs
    JOIN uni u1 ON pairs.w1 = u1.term
    JOIN uni u2 ON pairs.w2 = u2.term, tot t
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
    doc="PMI collocation mining: adjacent-pair co-occurrence counts vs "
    "unigram expectation, top-20 scoring pairs. One tokenize pass "
    "feeds both the unigram and the pair counts; the pair relation is "
    "min-count-filtered BEFORE scoring (rare-pair variance control AND "
    "the size cap); unigram joins are vocab-bounded and unhinted. The "
    "log only touches exact integer ratios, portable-rounded once.",
)
def t_colloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    uni = pos.groupBy("term").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").alias("n"))
    p1 = pos.select("doc_id", F.col("pos").alias("pos1"), F.col("term").alias("w1"))
    p2 = pos.select("doc_id", F.col("pos").alias("pos2"), F.col("term").alias("w2"))
    pairs = (
        p1.join(p2, (p1.doc_id == p2.doc_id) & (F.col("pos2") == F.col("pos1") + 1))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= PMI_MIN_COUNT)
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    pmi_raw = F.log(
        (F.col("n") * F.col("c12")) / (F.col("c1").cast("double") * F.col("c2"))
    )
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            (F.floor(pmi_raw * 10000 + F.lit(0.5)) / 10000.0).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )
