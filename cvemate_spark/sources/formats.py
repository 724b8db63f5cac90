"""Source normalizers: each reference feed format → {id, <source>: struct} rows.

One small DataFrame function per SRC-* operator (SURVEY §2.1). HTTP
fetching/rate-limiting stays outside the engine exactly as in the
reference (there it is requests+threads; here any fetcher that lands
files). Every normalizer takes a raw DataFrame (or path) and emits the
keyed shape the merge expects: an `id` column plus one struct column
named after the source — the Spark form of the reference's
`{'id': cve_id, '<source>': payload}` documents.

Reference citations are per-function; none of this is a translation —
each is the declarative DataFrame equivalent of an imperative loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CVE_PREFIX = "CVE-"


# ----------------------------------------------------------- SRC-1 NVD
def normalize_nvd(raw: DataFrame) -> DataFrame:
    """NVD vulnerabilities array page → {id, nvd}.

    Mirrors datasources/nvd_handler.py:73-77: pull `cve.id` out as the
    key, nest the whole record under `nvd`.
    """
    return raw.select(
        F.col("cve.id").alias("id"), F.col("cve").alias("nvd")
    ).filter(F.col("id").isNotNull())


def read_nvd_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Landing-zone NVD page files: JSON with a `vulnerabilities` array
    (nvd_handler.py:99-115). Explodes to one row per CVE."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    pages = reader.json(path)
    return pages.select(F.explode("vulnerabilities").alias("v")).select("v.*")


# ----------------------------------------------------------- SRC-2 RedHat
def read_redhat_json(spark: SparkSession, path: str) -> DataFrame:
    """RedHat hydra securitydata landing pages: the same paginated
    {vulnerabilities: [...]} envelope as NVD (redhat_handler.py:92-96
    reads `data.get('vulnerabilities', [])`), one row per record.
    Pagination (resultsPerPage/startIndex), rate-limiting and retry are
    ingestion-side in the reference (redhat_handler.py:62-90,
    threads + ratelimit decorators) and stay outside the engine."""
    pages = spark.read.json(path)
    return pages.select(F.explode("vulnerabilities").alias("v")).select("v.*")


def normalize_redhat(raw: DataFrame) -> DataFrame:
    """RedHat page record → {id, redhat}.

    Mirrors redhat_handler.py:92-101: each vulnerability's `cve` dict
    is the stored payload, keyed by its id. The incremental window
    (lastModStartDate/lastModEndDate, redhat_handler.py:141-168) is a
    request parameter upstream; its engine-side analog is the standard
    watermark predicate (streaming/state.py::incremental_filter).
    """
    return raw.select(
        F.col("cve.id").alias("id"), F.col("cve").alias("redhat")
    ).filter(F.col("id").isNotNull())


# ----------------------------------------------------------- SRC-5 ExploitDB
def normalize_exploitdb(raw: DataFrame) -> DataFrame:
    """ExploitDB CSV → one row per (CVE code) with exploit payload.

    Mirrors datasources/exploitdb_handler.py:62-78: split `codes` on
    ';' (OP-EXPL-1), keep CVE-prefixed codes (OP-FILT-1), drop the
    `codes` column from the payload (OP-PROJ), key by the CVE id.
    Duplicate (exploit, cve) pairs collapse in the downstream upsert.
    """
    payload_cols = [c for c in raw.columns if c != "codes"]
    return (
        raw.select(
            F.explode(F.split("codes", ";")).alias("id"),
            F.struct(*payload_cols).alias("exploitdb"),
        )
        .filter(F.col("id").startswith(CVE_PREFIX))
    )


# ----------------------------------------------------------- SRC-6 EPSS
def read_epss_csv(spark: SparkSession, path: str) -> DataFrame:
    """EPSS gzipped CSV with a '#...' metadata comment line
    (epss_handler.py:72-151). gz is transparent to the csv reader;
    columns land as strings (cast-at-use semantics, SURVEY §1.2)."""
    return spark.read.csv(path, header=True, comment="#")


def read_epss_metadata(spark: SparkSession, path: str) -> DataFrame:
    """The reference regex-parses line 0 for model_version/score_date
    (epss_handler.py:93-101); same here via regexp_extract over the
    first text line."""
    first = spark.read.text(path).limit(1)
    return first.select(
        F.regexp_extract("value", r"model_version:([^,]*)", 1).alias("model_version"),
        F.regexp_extract("value", r"score_date:(.*)$", 1).alias("score_date"),
    )


def normalize_epss(raw: DataFrame) -> DataFrame:
    """{cve, epss, percentile} strings → {id, epss:{epss_score, percentile}}.

    Completeness filter mirrors epss_handler.py:134-142 (drop rows with
    any missing field, OP-FILT-2); scores stay strings, as stored by
    epss_handler.py:145-151.
    """
    return (
        raw.filter(
            F.col("cve").isNotNull()
            & F.col("epss").isNotNull()
            & F.col("percentile").isNotNull()
        )
        .select(
            F.col("cve").alias("id"),
            F.struct(
                F.col("epss").alias("epss_score"), F.col("percentile")
            ).alias("epss"),
        )
    )


# ----------------------------------------------------------- SRC-7 CISA KEV
def normalize_kev(spark: SparkSession, path: str) -> DataFrame:
    """KEV catalog JSON {catalogVersion, dateReleased, vulnerabilities[]}
    → {id, kev} (cisa_handler.py:47-67): explode the array, key by cveID."""
    cat = spark.read.option("multiLine", "true").json(path)
    return cat.select(F.explode("vulnerabilities").alias("kev")).select(
        F.col("kev.cveID").alias("id"), "kev"
    )


def kev_release_date(spark: SparkSession, path: str) -> str:
    """dateReleased freshness probe for the ST-5 CDC gate
    (cisa_handler.py:52-55)."""
    return (
        spark.read.option("multiLine", "true")
        .json(path)
        .select("dateReleased")
        .first()[0]
    )


# ----------------------------------------------------------- SRC-8 Metasploit
def normalize_metasploit(spark: SparkSession, path: str) -> DataFrame:
    """Metasploit modules JSON: one top-level dict keyed by module path
    (metasploit_handler.py:61-77). Map-typed parse + one-level unnest
    (OP-EXPL-3), then explode `references`, keep CVE refs (OP-FILT-1).
    Output {id, metasploit:{key, data}} — `key` is the module path,
    exactly the reference's record shape (metasploit_handler.py:72-77).
    """
    raw = spark.read.text(path, wholetext=True)
    module_schema = T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("fullname", T.StringType()),
                T.StructField("rank", T.LongType()),
                T.StructField("disclosure_date", T.StringType()),
                T.StructField("references", T.ArrayType(T.StringType())),
            ]
        ),
    )
    modules = raw.select(
        F.explode(F.from_json("value", module_schema)).alias("key", "data")
    )
    return (
        modules.select(
            "key", "data", F.explode("data.references").alias("ref")
        )
        .filter(F.col("ref").startswith(CVE_PREFIX))
        .select(
            F.col("ref").alias("id"),
            F.struct("key", "data").alias("metasploit"),
        )
    )


# ----------------------------------------------------------- SRC-8 Debian
def normalize_debian(spark: SparkSession, path: str) -> DataFrame:
    """Debian tracker JSON: {package: {cve_id: details}} — two-level map
    unnest (debian_handler.py:52-71) → {id, debian:{package, description,
    scope}}."""
    raw = spark.read.text(path, wholetext=True)
    details = T.StructType(
        [
            T.StructField("description", T.StringType()),
            T.StructField("scope", T.StringType()),
        ]
    )
    two_level = T.MapType(T.StringType(), T.MapType(T.StringType(), details))
    pkgs = raw.select(F.explode(F.from_json("value", two_level)).alias("package", "cves"))
    return (
        pkgs.select("package", F.explode("cves").alias("cve_id", "details"))
        .filter(F.col("cve_id").startswith(CVE_PREFIX))
        .select(
            F.col("cve_id").alias("id"),
            F.struct(
                "package",
                F.col("details.description").alias("description"),
                F.col("details.scope").alias("scope"),
            ).alias("debian"),
        )
    )


# ----------------------------------------------------------- SRC-3/4 CVE.org
def normalize_cveorg_delta(spark: SparkSession, path: str) -> DataFrame:
    """deltaLog.json: array of {fetchTime, new[], updated[]} records
    (cveorg_handler.py:119-156). One row per changed CVE id with its
    fetchTime — `new + updated` concat = the reference's list union.
    """
    log = spark.read.option("multiLine", "true").json(path)
    entry = F.explode(
        F.concat(
            F.coalesce("new", F.array()), F.coalesce("updated", F.array())
        )
    )
    return log.select(
        F.to_timestamp(F.regexp_replace("fetchTime", "Z$", "+00:00")).alias(
            "fetch_time"
        ),
        entry.alias("rec"),
    ).select("fetch_time", F.col("rec.cveId").alias("id"))


def read_cveorg_landing(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Exploded CVE.org zip landing dir: one JSON file per CVE
    (cveorg_handler.py:57-86). The zip itself is pre-extracted on
    ingest (SRC-10: Spark has no zip codec); the filename filter
    `CVE*.json` (cveorg_handler.py:70) becomes an input_file_name
    predicate, and the id is parsed from the filename (OP-FILT-3)."""
    df = spark.read.option("recursiveFileLookup", "true").json(
        landing_dir, pathGlobFilter="CVE*.json"
    )
    return df.withColumn(
        "file_id",
        F.regexp_extract(F.input_file_name(), r"(CVE-\d{4}-\d+)\.json", 1),
    )
