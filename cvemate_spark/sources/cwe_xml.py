"""SRC-9: CWE weakness catalog XML → dimension rows.

Two readers, one contract (cwe_handler.py:60-102 semantics: walk
Weakness elements, strip namespaces, flatten Description text with the
xhtml→html rewrite, collect Related_Weaknesses):

- `read_cwe_xml_native` — PRIMARY. Spark 4's built-in XML source
  (`spark.read.format("xml")`, rowTag=Weakness) with an EXPLICIT
  schema whose Description is StringType, which makes the parser hand
  back the element's raw inner XML; the tag-strip, entity decode and
  xhtml→html rewrite then run JVM-side as regexp_replace/replace
  chains inside whole-stage codegen. At scale this is the right
  reader: codegen'd parse, schema-pruned, no Python stage at all.
- `read_cwe_xml_udtf` — FALLBACK. The Arrow-batched mapInPandas
  ElementTree walk (the UDTF shape of the reference's `xml2json`),
  for environments whose Spark lacks the XML source. Per-file stream
  parsing keeps memory bounded: files arrive one per row via
  binaryFile, each parsed independently.

`read_cwe_xml` dispatches native-first and falls back on error; both
paths are oracle-gated to identical output (src_cwe_xml /
src_cwe_xml_native, plus a row-for-row equality pytest).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

CWE_SCHEMA = (
    "ID string, Name string, Abstraction string, Description string, "
    "Related_Weaknesses array<struct<id: string, nature: string>>"
)

_NS_RE = re.compile(r"\{.*?\}")
_XHTML_RE = re.compile(r"<(\/?)xhtml:([a-zA-Z]+)(\/?)>")


def _strip_ns(tag: str) -> str:
    return _NS_RE.sub("", tag)


def _element_text(el: ET.Element) -> str:
    """Recursive text flatten (cwe_handler.py:43-52 semantics: child
    elements — including parsed <xhtml:*> children — contribute only
    their text). One deliberate improvement: inner whitespace is
    preserved instead of per-segment stripped, so words don't fuse."""
    parts = [el.text or ""]
    for child in el:
        parts.append(_element_text(child))
        parts.append(child.tail or "")
    return "".join(parts).strip()


def _xhtml_to_html(s: str) -> str:
    """Literal XHTML-markup rewrite in flattened text, incl. self-closing
    tags (cwe_handler.py:54-57 shape). Deviation: the reference's lambda
    drops the '/' of closing tags ('</xhtml:p>' -> '<p>'); we keep it —
    the output is meant to be HTML."""
    return _XHTML_RE.sub(
        lambda m: f"<{m.group(1)}{m.group(2)}{' />' if m.group(3) else '>'}", s
    )


def parse_weaknesses(xml_bytes: bytes) -> list[dict]:
    """One CWE catalog XML blob → weakness dicts (cwe_handler.py:60-102
    semantics: walk Weakness elements, strip namespaces, flatten text)."""
    root = ET.fromstring(xml_bytes)
    rows = []
    for el in root.iter():
        if _strip_ns(el.tag) != "Weakness":
            continue
        row = {
            "ID": el.get("ID"),
            "Name": el.get("Name"),
            "Abstraction": el.get("Abstraction"),
            "Description": None,
            "Related_Weaknesses": [],
        }
        for child in el:
            tag = _strip_ns(child.tag)
            if tag == "Description":
                row["Description"] = _xhtml_to_html(_element_text(child))
            elif tag == "Related_Weaknesses":
                row["Related_Weaknesses"] = [
                    {
                        "id": rw.get("CWE_ID"),
                        "nature": rw.get("Nature"),
                    }
                    for rw in child
                    if _strip_ns(rw.tag) == "Related_Weakness"
                ]
        rows.append(row)
    return rows


def read_cwe_xml_udtf(spark: SparkSession, path: str) -> DataFrame:
    """XML files → CWE dimension DataFrame (broadcast-join side),
    via the mapInPandas ElementTree walk (fallback path)."""
    blobs = spark.read.format("binaryFile").load(path)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for content in pdf["content"]:
                out.extend(parse_weaknesses(bytes(content)))
            yield pd.DataFrame(
                out,
                columns=[
                    "ID",
                    "Name",
                    "Abstraction",
                    "Description",
                    "Related_Weaknesses",
                ],
            )

    return blobs.select("content").mapInPandas(batches, schema=CWE_SCHEMA)


# Explicit read schema for the native XML source. Description is
# declared StringType ON PURPOSE: the parser then returns the raw
# inner XML of the element (child tags + entities intact) instead of
# a lossy mixed-content struct, and the reference's flatten/rewrite
# becomes a JVM-side expression chain.
_NATIVE_XML_SCHEMA = (
    "Description string, "
    "Related_Weaknesses struct<"
    "Related_Weakness: array<struct<_CWE_ID: string, _Nature: string>>>, "
    "_Abstraction string, _ID string, _Name string"
)


def _flatten_description(col):
    """JVM-side equivalent of `_element_text(el)` on the native
    reader's StringType projection of a mixed-content element.

    The native parser hands back the element's inner content with
    child tags intact as markup and XML entities decoded ONCE (so
    '&amp;amp;' arrives as '&amp;', '&amp;lt;' as '&lt;' — exactly the
    single decode ElementTree applies). The flatten therefore only
    drops the real xhtml child tags — their text contributes, the
    markup doesn't (cwe_handler.py:43-52 semantics) — and trims.

    Known boundary (documented, tested): markup that was XML-ESCAPED
    in the source ('&lt;xhtml:p&gt;') is indistinguishable from real
    child markup after the parser's entity decode, so the native path
    strips it too, where ElementTree keeps it as text for the
    xhtml→html rewrite. Catalogs that escape xhtml markup inside
    Description must use the UDTF reader; the real CWE catalog carries
    xhtml as actual child elements, where both readers agree."""
    import pyspark.sql.functions as F  # local: keep module import light

    c = F.regexp_replace(col, r"</?xhtml:[a-zA-Z]+\s*/?>", "")
    return F.trim(c)


def read_cwe_xml_native(spark: SparkSession, path: str) -> DataFrame:
    """XML files → CWE dimension DataFrame through Spark 4's built-in
    XML source: codegen'd parse, no Python stage (the scale-preferred
    SRC-9 path; SURVEY §2.1 notes Spark 4 ships `spark.read.xml`).
    Output is column-for-column identical to the UDTF reader."""
    import pyspark.sql.functions as F

    raw = (
        spark.read.format("xml")
        .option("rowTag", "Weakness")
        .option("ignoreSurroundingSpaces", "false")
        .schema(_NATIVE_XML_SCHEMA)
        .load(path)
    )
    return raw.select(
        F.col("_ID").alias("ID"),
        F.col("_Name").alias("Name"),
        F.col("_Abstraction").alias("Abstraction"),
        _flatten_description(F.col("Description")).alias("Description"),
        F.coalesce(
            F.transform(
                F.col("Related_Weaknesses.Related_Weakness"),
                lambda rw: F.struct(
                    rw["_CWE_ID"].alias("id"), rw["_Nature"].alias("nature")
                ),
            ),
            F.array().cast("array<struct<id: string, nature: string>>"),
        ).alias("Related_Weaknesses"),
    )


def read_cwe_xml(spark: SparkSession, path: str) -> DataFrame:
    """SRC-9 dispatcher: the native XML source when this Spark has it
    (Spark 4 does), else the mapInPandas ElementTree fallback. Both
    readers are gated to identical output, so callers are agnostic."""
    try:
        return read_cwe_xml_native(spark, path)
    except Exception:
        return read_cwe_xml_udtf(spark, path)
