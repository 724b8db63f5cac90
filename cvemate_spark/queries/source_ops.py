"""SRC-* source formats under the oracle gate (SURVEY §2.1).

Each query (1) derives a CveMate-shaped landing file deterministically
from the driver parquet (sources/landing.py — the stand-in for the
reference's HTTP fetchers), (2) reads it back through the engine's
real SRC-* reader, and (3) aggregates to a small deterministic output
whose DuckDB oracle recomputes the same values straight from the
parquet views. This puts every source reader — gz CSV with comment
line, JSON catalog, map-typed JSON (1 and 2 levels), zip-of-JSON with
filename ids, delta log, XML-via-mapInPandas — inside the correctness
gate, not just the unit tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import landing
from ..sources.archive import unzip_to_landing
from ..sources.cwe_xml import read_cwe_xml
from ..sources.formats import (
    normalize_cveorg_delta,
    normalize_debian,
    normalize_epss,
    normalize_kev,
    normalize_metasploit,
    read_cveorg_landing,
    read_epss_csv,
    read_epss_metadata,
)
from .base import Registry

REG = Registry()


# ------------------------------------------------------------ SRC-6
@REG.add(
    "src_epss",
    f"""
    SELECT '{landing.EPSS_MODEL_VERSION}' AS model_version,
           '{landing.EPSS_SCORE_DATE}' AS score_date,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(avg(CAST('0.' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0')
                          AS DOUBLE)), 4) AS avg_epss
    FROM (SELECT event_id FROM events ORDER BY event_id LIMIT {landing.EPSS_LIMIT})
    WHERE event_id % 97 <> 0
    ORDER BY model_version, score_date, n_rows, avg_epss
    """,
    doc="SRC-6/SRC-10: gzipped CSV with '#' metadata comment line "
    "(EPSS shape: epss_handler.py:72-151) — comment-skip read, regex "
    "metadata extract, completeness filter (OP-FILT-2), cast-at-use.",
)
def src_epss(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = landing.gen_epss_csv(sf_dir)
    norm = normalize_epss(read_epss_csv(spark, path))
    meta = read_epss_metadata(spark, path)
    agg = norm.agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.col("epss.epss_score").cast("double")), 4).alias("avg_epss"),
    )
    return (
        agg.crossJoin(F.broadcast(meta))
        .select("model_version", "score_date", "n_rows", "avg_epss")
        .orderBy("model_version", "score_date", "n_rows", "avg_epss")
    )


# ------------------------------------------------------------ SRC-7
@REG.add(
    "src_kev",
    f"""
    SELECT o_orderstatus AS vendor, CAST(count(*) AS BIGINT) AS n_rows,
           max(o_orderpriority) AS max_product
    FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT {landing.KEV_LIMIT})
    GROUP BY o_orderstatus
    ORDER BY vendor, n_rows, max_product
    """,
    doc="SRC-7: JSON catalog {catalogVersion, dateReleased, "
    "vulnerabilities[]} (KEV shape: cisa_handler.py:47-67) — multiline "
    "read + array explode (OP-EXPL-2), keyed by cveID.",
)
def src_kev(spark: SparkSession, sf_dir: str) -> DataFrame:
    kev = normalize_kev(spark, landing.gen_kev_json(sf_dir))
    return (
        kev.groupBy(F.col("kev.vendorProject").alias("vendor"))
        .agg(
            F.count("*").alias("n_rows"),
            F.max("kev.product").alias("max_product"),
        )
        .orderBy("vendor", "n_rows", "max_product")
    )


# ------------------------------------------------------------ SRC-8 (1-level)
@REG.add(
    "src_metasploit",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT 'CVE-2020-' || CAST(o_orderkey AS VARCHAR))
                AS BIGINT) AS n_ids,
           CAST(sum(o_orderkey % 600) AS BIGINT) AS sum_rank
    FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT {landing.MSF_LIMIT})
    ORDER BY n_rows, n_ids, sum_rank
    """,
    doc="SRC-8: map-typed module JSON, one-level unnest (Metasploit "
    "shape: metasploit_handler.py:61-77) — from_json MapType + explode, "
    "references explode, CVE prefix filter (OP-FILT-1).",
)
def src_metasploit(spark: SparkSession, sf_dir: str) -> DataFrame:
    msf = normalize_metasploit(spark, landing.gen_metasploit_json(sf_dir))
    return msf.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("id").alias("n_ids"),
        F.sum("metasploit.data.rank").alias("sum_rank"),
    ).orderBy("n_rows", "n_ids", "sum_rank")


# ------------------------------------------------------------ SRC-8 (2-level)
@REG.add(
    "src_debian",
    f"""
    SELECT n_name AS package, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT {landing.DEBIAN_LIMIT}) c
    JOIN nation ON c.c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY package, n_rows, n_segments
    """,
    doc="SRC-8: dict-of-dicts JSON, two-level map unnest (Debian shape: "
    "debian_handler.py:52-71) — from_json nested MapType + double "
    "explode (OP-EXPL-3).",
)
def src_debian(spark: SparkSession, sf_dir: str) -> DataFrame:
    deb = normalize_debian(spark, landing.gen_debian_json(sf_dir))
    return (
        deb.groupBy(F.col("debian.package").alias("package"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("debian.description").alias("n_segments"),
        )
        .orderBy("package", "n_rows", "n_segments")
    )


# ------------------------------------------------------------ SRC-3/10
@REG.add(
    "src_cveorg_zip",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_id_match,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (SELECT * FROM documents ORDER BY doc_id LIMIT {landing.ZIP_LIMIT})
    ORDER BY n_files, n_id_match, sum_chars
    """,
    doc="SRC-3/SRC-10: zip of per-CVE JSON files (CVE.org dump shape: "
    "cveorg_handler.py:57-86) — unzip to landing, CVE*.json name filter "
    "(OP-FILT-3), id from filename via input_file_name + regexp_extract.",
)
def src_cveorg_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    zip_path = landing.gen_cveorg_zip(sf_dir)
    extract_dir = zip_path + ".extracted"
    if not os.path.isdir(extract_dir):
        unzip_to_landing(zip_path, extract_dir)
    df = read_cveorg_landing(spark, extract_dir)
    return df.agg(
        F.count("*").alias("n_files"),
        F.sum((F.col("file_id") == F.col("cveId")).cast("long")).alias("n_id_match"),
        F.sum("nChars").alias("sum_chars"),
    ).orderBy("n_files", "n_id_match", "sum_chars")


# ------------------------------------------------------------ SRC-4
@REG.add(
    "src_delta_log",
    f"""
    SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_changed,
           min('CVE-2024-' || CAST(event_id AS VARCHAR)) AS min_id,
           max('CVE-2024-' || CAST(event_id AS VARCHAR)) AS max_id
    FROM (SELECT event_id FROM events ORDER BY event_id LIMIT {landing.DELTA_LIMIT})
    ORDER BY n_changed, min_id, max_id
    """,
    doc="SRC-4: deltaLog.json incremental scan (cveorg_handler.py:119-156) "
    "— explode new[]+updated[] union, watermark predicate on fetchTime "
    "(OP-FILT-4) excludes the stale record.",
)
def src_delta_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    delta = normalize_cveorg_delta(spark, landing.gen_delta_log(sf_dir))
    recent = delta.filter(
        F.col("fetch_time") > F.lit(landing.DELTA_WATERMARK).cast("timestamp")
    )
    return recent.agg(
        F.countDistinct("id").alias("n_changed"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    ).orderBy("n_changed", "min_id", "max_id")


# ------------------------------------------------------------ SRC-9
@REG.add(
    "src_cwe_xml",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS id, n_name AS name,
           'In region ' || CAST(n_regionkey AS VARCHAR) || ' weakness'
               AS description,
           'R' || CAST(n_regionkey AS VARCHAR) AS parent
    FROM nation
    ORDER BY id, name, description, parent
    """,
    doc="SRC-9: CWE catalog XML through the primary reader (Spark 4 "
    "native XML source when available, mapInPandas ElementTree UDTF "
    "otherwise; cwe_handler.py:60-102) — namespace strip, recursive "
    "text flatten with xhtml→html rewrite, Related_Weaknesses array.",
)
def src_cwe_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    cwe = read_cwe_xml(spark, landing.gen_cwe_xml(sf_dir))
    return cwe.select(
        F.col("ID").alias("id"),
        F.col("Name").alias("name"),
        F.col("Description").alias("description"),
        F.element_at("Related_Weaknesses", 1)["id"].alias("parent"),
    ).orderBy("id", "name", "description", "parent")


@REG.add(
    "src_cwe_xml_udtf",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS id, n_name AS name,
           'In region ' || CAST(n_regionkey AS VARCHAR) || ' weakness'
               AS description,
           'R' || CAST(n_regionkey AS VARCHAR) AS parent
    FROM nation
    ORDER BY id, name, description, parent
    """,
    doc="SRC-9 fallback reader, pinned: the Arrow mapInPandas "
    "ElementTree walk (cwe_handler.py:60-102), gated to the SAME "
    "oracle as src_cwe_xml so the native/UDTF pair is provably "
    "hash-equal (also asserted row-for-row in tests/test_sources.py).",
)
def src_cwe_xml_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.cwe_xml import read_cwe_xml_udtf

    cwe = read_cwe_xml_udtf(spark, landing.gen_cwe_xml(sf_dir))
    return cwe.select(
        F.col("ID").alias("id"),
        F.col("Name").alias("name"),
        F.col("Description").alias("description"),
        F.element_at("Related_Weaknesses", 1)["id"].alias("parent"),
    ).orderBy("id", "name", "description", "parent")


# ------------------------------------------------------------ SRC-1/2
@REG.add(
    "src_nvd",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT 'CVE-2020-' || CAST(o_orderkey AS VARCHAR))
                AS BIGINT) AS n_ids,
           max(o_orderstatus) AS max_vendor
    FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT {landing.NVD_LIMIT})
    ORDER BY n_rows, n_ids, max_vendor
    """,
    doc="SRC-1/SRC-2: paginated NVD JSON landing pages (nvd_handler.py:"
    "99-115) — multi-file read, vulnerabilities[] explode, {id, nvd} "
    "projection (OP-PROJ). The HTTP pagination itself stays ingestion-"
    "side, exactly as in the reference.",
)
def src_nvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.formats import normalize_nvd, read_nvd_json

    pages_dir = landing.gen_nvd_pages(sf_dir)
    nvd = normalize_nvd(read_nvd_json(spark, pages_dir))
    return nvd.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("id").alias("n_ids"),
        F.max("nvd.vendor").alias("max_vendor"),
    ).orderBy("n_rows", "n_ids", "max_vendor")


# ------------------------------------------------------------ SRC-2
@REG.add(
    "src_redhat",
    f"""
    SELECT severity, CAST(count(*) AS BIGINT) AS n_rows, min(id) AS min_id
    FROM (
        SELECT ['low', 'moderate', 'important', 'critical'][s_suppkey % 4 + 1]
                   AS severity,
               'CVE-2020-' || CAST(s_suppkey AS VARCHAR) AS id
        FROM (SELECT s_suppkey FROM supplier ORDER BY s_suppkey
              LIMIT {landing.REDHAT_LIMIT})
    )
    GROUP BY severity
    ORDER BY severity, n_rows, min_id
    """,
    doc="SRC-2: RedHat hydra securitydata pages (redhat_handler.py:62-101) "
    "— NVD-style paginated envelope, RedHat-specific payload "
    "(severity/public_date), multi-page read + vulnerabilities[] explode, "
    "{id, redhat} projection. Retry/rate-limit stays ingestion-side as in "
    "the reference (threads + ratelimit decorators).",
)
def src_redhat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.formats import normalize_redhat, read_redhat_json

    pages_dir = landing.gen_redhat_pages(sf_dir)
    rh = normalize_redhat(read_redhat_json(spark, pages_dir))
    return (
        rh.groupBy(F.col("redhat.severity").alias("severity"))
        .agg(F.count("*").alias("n_rows"), F.min("id").alias("min_id"))
        .orderBy("severity", "n_rows", "min_id")
    )


# --------------------------------------------- OP-JOIN-ENRICH (cve ↔ cwe)
@REG.add(
    "cwe_enrich",
    f"""
    WITH nvd AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 4 = 3 THEN 0.0
                    ELSE (o_orderkey % 101) / 10.0 END AS base
        FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey
              LIMIT {landing.NVD_LIMIT})
    ),
    refs AS (
        SELECT 'CVE-2020-' || CAST(k AS VARCHAR) AS id,
               CAST(k % 25 AS VARCHAR) AS cwe_id, base
        FROM nvd
        UNION ALL
        SELECT 'CVE-2020-' || CAST(k AS VARCHAR),
               CAST(k % 5 AS VARCHAR), base
        FROM nvd WHERE k % 7 = 0
    )
    SELECT r.cwe_id AS cwe_id, n.n_name AS cwe_name,
           CAST(count(*) AS BIGINT) AS n_refs,
           CAST(count(DISTINCT r.id) AS BIGINT) AS n_cves,
           min(r.base) AS min_base, max(r.base) AS max_base
    FROM refs r JOIN nation n ON CAST(n.n_nationkey AS VARCHAR) = r.cwe_id
    GROUP BY 1, 2
    ORDER BY cwe_id, cwe_name, n_refs, n_cves, min_base, max_base
    """,
    doc="OP-JOIN-ENRICH, reference-shaped: the parsed CWE catalog "
    "dimension (SRC-9, cwe_handler.py:114 key_field='ID') broadcast-joined "
    "against the nvd weaknesses[].description[].value CWE refs — the "
    "cve.nvd.weaknesses ↔ cwe.ID enrichment the prioritizer consumes. "
    "Per-CWE: ref count, distinct CVEs (exact count-distinct), min/max "
    "presence-gated CVSS base (OP-AGG-MIN/MAX). The CWE dimension is "
    "thousands of rows at ANY corpus scale — the canonical broadcast "
    "side, pinned as BroadcastHashJoin in tests/test_plans.py.",
)
def cwe_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scoring import cvss_base_score
    from ..sources.formats import normalize_nvd, read_nvd_json

    nvd = normalize_nvd(read_nvd_json(spark, landing.gen_nvd_pages(sf_dir)))
    cwe = read_cwe_xml(spark, landing.gen_cwe_xml(sf_dir))
    refs = (
        nvd.select(
            "id",
            cvss_base_score(F.col("nvd")).alias("base"),
            F.explode("nvd.weaknesses").alias("w"),
        )
        .select("id", "base", F.explode("w.description").alias("d"))
        .select(
            "id",
            "base",
            F.regexp_extract("d.value", r"CWE-([0-9]+)", 1).alias("cwe_id"),
        )
    )
    dim = cwe.select(
        F.col("ID").alias("cwe_dim_id"), F.col("Name").alias("cwe_name")
    )
    return (
        refs.join(F.broadcast(dim), refs["cwe_id"] == dim["cwe_dim_id"])
        .groupBy("cwe_id", "cwe_name")
        .agg(
            F.count("*").alias("n_refs"),
            F.countDistinct("id").alias("n_cves"),
            F.min("base").alias("min_base"),
            F.max("base").alias("max_base"),
        )
        .orderBy("cwe_id", "cwe_name", "n_refs", "n_cves", "min_base", "max_base")
    )


# ------------------------------------------------------------ SRC-5
@REG.add(
    "src_exploitdb",
    f"""
    SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_exploits,
           CAST(sum(CASE WHEN p_partkey % 3 = 0 THEN 2 ELSE 1 END)
                AS BIGINT) AS n_cve_refs
    FROM (SELECT p_partkey FROM part ORDER BY p_partkey LIMIT {landing.EXPLOITDB_LIMIT})
    ORDER BY n_exploits, n_cve_refs
    """,
    doc="SRC-5: ExploitDB CSV — header scan, ';'-split + explode of the "
    "codes column (OP-EXPL-1), CVE prefix filter (OP-FILT-1), codes "
    "column dropped from the nested payload (OP-PROJ). n_rows counts "
    "exploded (exploit, CVE) pairs; the oracle rebuilds the fan-out "
    "arithmetic from `part`.",
)
def src_exploitdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.formats import normalize_exploitdb

    path = landing.gen_exploitdb_csv(sf_dir)
    raw = spark.read.csv(path, header=True)
    edb = normalize_exploitdb(raw)
    return edb.agg(
        F.countDistinct("exploitdb.id").alias("n_exploits"),
        F.count("*").alias("n_cve_refs"),
    ).orderBy("n_exploits", "n_cve_refs")


# ------------------------------------------- custom Python DataSource
@REG.add(
    "src_pyds",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT 'CVE-2020-' || CAST(o_orderkey AS VARCHAR))
                AS BIGINT) AS n_ids,
           CAST(count(DISTINCT o_orderkey % {landing.NVD_PAGES}) AS BIGINT)
               AS n_pages,
           max(o_orderstatus) AS max_vendor
    FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT {landing.NVD_LIMIT})
    ORDER BY n_rows, n_ids, n_pages, max_vendor
    """,
    doc="Custom Python DataSource (Spark 4 Data Source API): the "
    "paginated-feed connector as a first-class `spark.read.format(...)` "
    "source — partitions() enumerates the pages, so page parallelism "
    "belongs to the cluster scheduler (the Spark-native form of the "
    "reference's per-page thread pool, nvd_handler.py:50,102). Reads "
    "the same NVD landing pages as src_nvd; n_pages proves rows "
    "arrived from every partition.",
)
def src_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import pyds

    pages_dir = landing.gen_nvd_pages(sf_dir)
    pyds.register(spark)
    df = spark.read.format(pyds.FORMAT_NAME).option("path", pages_dir).load()
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("id").alias("n_ids"),
        F.countDistinct("page").alias("n_pages"),
        F.max("vendor").alias("max_vendor"),
    ).orderBy("n_rows", "n_ids", "n_pages", "max_vendor")


# ------------------------------------------------------------ ORC
@REG.add(
    "src_binary",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 9 + 1 AS INT) AS width,
           CAST(octet_length(encode(text)) % 5 + 1 AS INT) AS height
    FROM documents
    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200)
    ORDER BY doc_id, width, height
    """,
    doc="Object-store media ingestion: Spark's built-in binaryFile "
    "source over a directory of REAL standalone PNG files "
    "(landing.gen_png_files — one object per doc, the shape a 100-TB "
    "multimodal corpus lands in), doc ids parsed from file paths, "
    "payloads decoded by the real codec (png_codec) inside the Arrow "
    "feature stage. At scale this is a parallel file listing + "
    "map-only decode — no shuffle; binaryFile supports "
    "pathGlobFilter/recursiveFileLookup for store-side pruning. "
    "Oracle recomputes the construction rule for the first 200 docs "
    "from the documents table.",
)
def src_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import png_codec

    path = landing.gen_png_files(sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.png$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )

    def decode(it):
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                d = png_codec(bytes(content))
                rows.append(
                    {"doc_id": doc_id, "width": d["width"], "height": d["height"]}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height"])

    return (
        files.mapInPandas(decode, schema="doc_id long, width int, height int")
        .orderBy("doc_id", "width", "height")
    )


@REG.add(
    "src_orc",
    """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang, n_docs, total_chars
    """,
    doc="Columnar-format breadth: the documents table served as ORC "
    "(landing.gen_orc_documents) and read with spark.read.orc — the "
    "same scan surface (column pruning, predicate pushdown, "
    "whole-stage codegen) Spark gives parquet. Oracle reads the "
    "parquet original: a hash match proves the ORC round-trip is "
    "value-exact.",
)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = landing.gen_orc_documents(sf_dir)
    docs = spark.read.orc(path)
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source", "lang", "n_docs", "total_chars")
    )
