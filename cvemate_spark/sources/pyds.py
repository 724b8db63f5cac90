"""Custom Python DataSource: the paginated-feed connector as a
first-class Spark source (Spark 4 Python Data Source API).

The reference fetches paginated REST feeds with a thread pool — one
thread per page (nvd_handler.py:50,102; redhat_handler.py:119-130).
The idiomatic Spark 4 form of that connector is a custom DataSource
whose `partitions()` enumerates the pages: every page becomes an
InputPartition, so the cluster scheduler (not a driver-side thread
pool) owns the parallelism, and a 1000-executor cluster pulls 1000
pages at once with retry/locality/speculation for free. The reader
yields plain tuples per record; Spark batches them through Arrow.

This is an ingestion connector for BOUNDED per-page payloads (API
pages are capped at a few thousand records), so the Python-side
per-record yield is not a hot scan path — the parquet/JSON readers
remain the bulk path. The page files here are the deterministic
landing pages (`landing.gen_nvd_pages`), standing in for the HTTP
responses exactly as in the file-based readers.
"""

from __future__ import annotations

import glob
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "cvemate_paged_feed"


class PagedFeedDataSource(DataSource):
    """`spark.read.format("cvemate_paged_feed").option("path", dir)`:
    each page-*.json file is one input partition."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "id string, vendor string, page int"

    def reader(self, schema) -> "PagedFeedReader":
        return PagedFeedReader(self.options)


class PagedFeedReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("cvemate_paged_feed requires option('path', ...)")
        self.path = path

    def partitions(self):
        # one InputPartition per page file — the cluster-side analog of
        # the reference's page thread pool; (page_index, file) pairs so
        # the reader is self-contained per task
        pages = sorted(glob.glob(f"{self.path}/page-*.json"))
        if not pages:
            raise FileNotFoundError(f"no page-*.json under {self.path}")
        return [InputPartition((i, p)) for i, p in enumerate(pages)]

    def read(self, partition):
        page_idx, page_file = partition.value
        with open(page_file) as f:
            page = json.load(f)
        for v in page.get("vulnerabilities", []):
            cve = v.get("cve", {})
            if cve.get("id") is not None:
                yield (cve["id"], cve.get("vendor"), page_idx)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(PagedFeedDataSource)
