"""SRC-9: CWE weakness catalog XML → dimension rows, via mapInPandas.

The one custom reader (SURVEY §4.2): PySpark has no core XML source
pre-Spark-4 `spark.read.xml`, and the container may lack the spark-xml
package, so the weakness walk runs as an Arrow-batched mapInPandas
stage wrapping ElementTree — one XML blob in, N weakness rows out (the
UDTF shape of the reference's `xml2json`, cwe_handler.py:60-102).

Per-file stream parsing keeps memory bounded on huge blobs: files
arrive one per row via binaryFile, each parsed independently, so a
partition never holds more than its files' trees.
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


def read_cwe_xml(spark: SparkSession, path: str) -> DataFrame:
    """XML files → CWE dimension DataFrame (broadcast-join side)."""
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
