"""Source-normalizer tests over the CveMate-shaped fixtures (SRC-1..10)."""

from __future__ import annotations

from cvemate_spark.sources import formats
from cvemate_spark.sources.archive import unzip_to_landing
from cvemate_spark.sources.cwe_xml import read_cwe_xml


def test_nvd_normalize(spark, fixture_dir):
    raw = formats.read_nvd_json(spark, str(fixture_dir / "nvd_page.json"))
    out = formats.normalize_nvd(raw)
    rows = out.collect()
    assert len(rows) == 40
    assert rows[0]["id"].startswith("CVE-2024-")
    assert "nvd" in out.columns and out.schema["nvd"].dataType.typeName() == "struct"


def test_epss_read_and_normalize(spark, fixture_dir):
    path = str(fixture_dir / "epss.csv.gz")
    raw = formats.read_epss_csv(spark, path)
    assert dict(raw.dtypes)["epss"] == "string"  # cast-at-use semantics
    out = formats.normalize_epss(raw).collect()
    ids = {r["id"] for r in out}
    assert "CVE-2024-00998" not in ids  # empty epss dropped (OP-FILT-2)
    assert "CVE-2024-00999" in ids  # id absent from nvd still flows (upsert path)
    assert len(out) == 25
    meta = formats.read_epss_metadata(spark, path).first()
    assert meta["model_version"] == "v2025.03.14"
    assert meta["score_date"] == "2025-08-12T00:00:00Z"


def test_redhat_normalize(spark, fixture_dir):
    raw = formats.read_redhat_json(spark, str(fixture_dir / "redhat_page.json"))
    out = formats.normalize_redhat(raw)
    rows = {r["id"]: r["redhat"] for r in out.collect()}
    assert len(rows) == 3
    assert rows["CVE-2024-00001"]["severity"] == "important"
    assert rows["CVE-2024-00050"]["severity"] == "critical"
    # payload keyed + nested under its source name, like every feed
    assert out.columns == ["id", "redhat"]


def test_exploitdb_normalize(spark, fixture_dir):
    raw = spark.read.csv(str(fixture_dir / "files_exploits.csv"), header=True)
    out = formats.normalize_exploitdb(raw).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["exploitdb"])
    # codes exploded + only CVE codes kept; exploit 3 (no CVE) vanished
    assert set(by_id) == {"CVE-2024-00007", "CVE-2024-00009"}
    assert len(by_id["CVE-2024-00009"]) == 2  # two exploits share one CVE
    assert "codes" not in out[0]["exploitdb"].asDict()  # OP-PROJ drop


def test_kev_normalize(spark, fixture_dir):
    out = formats.normalize_kev(spark, str(fixture_dir / "kev.json")).collect()
    assert {r["id"] for r in out} == {"CVE-2024-00001", "CVE-2024-00005"}
    assert out[0]["kev"]["vulnerabilityName"].startswith("vuln")
    assert (
        formats.kev_release_date(spark, str(fixture_dir / "kev.json"))
        == "2024-01-01T12:00:00Z"
    )


def test_metasploit_normalize(spark, fixture_dir):
    out = formats.normalize_metasploit(
        spark, str(fixture_dir / "modules_metadata.json")
    ).collect()
    ids = sorted(r["id"] for r in out)
    assert ids == ["CVE-2024-00003", "CVE-2024-00003", "CVE-2024-00011"]
    keys = {r["metasploit"]["key"] for r in out}
    assert keys == {"exploit/linux/a", "exploit/windows/b"}


def test_debian_normalize(spark, fixture_dir):
    out = formats.normalize_debian(spark, str(fixture_dir / "debian.json")).collect()
    pairs = sorted((r["id"], r["debian"]["package"]) for r in out)
    assert pairs == [
        ("CVE-2024-00002", "pkg1"),
        ("CVE-2024-00002", "pkg2"),
        ("CVE-2024-00004", "pkg1"),
    ]


def test_cveorg_delta(spark, fixture_dir):
    out = formats.normalize_cveorg_delta(
        spark, str(fixture_dir / "deltaLog.json")
    )
    rows = out.collect()
    assert len(rows) == 4  # new + updated across both entries
    # OP-AGG-MIN: oldest fetchTime drives the reload-vs-delta decision
    oldest = out.agg({"fetch_time": "min"}).first()[0]
    assert str(oldest).startswith("2024-01-02")


def test_cveorg_zip_landing(spark, fixture_dir, tmp_path):
    landing = tmp_path / "landing"
    extracted = unzip_to_landing(str(fixture_dir / "cves.zip"), str(landing))
    assert len(extracted) == 2  # readme.txt filtered out
    df = formats.read_cveorg_landing(spark, str(landing))
    rows = df.collect()
    assert {r["file_id"] for r in rows} == {"CVE-2024-00030", "CVE-2024-00031"}
    assert {r["cveMetadata"]["cveId"] for r in rows} == {
        "CVE-2024-00030",
        "CVE-2024-00031",
    }


def test_cwe_xml(spark, fixture_dir):
    out = read_cwe_xml(spark, str(fixture_dir / "cwec.xml")).collect()
    by_id = {r["ID"]: r for r in out}
    assert set(by_id) == {"79", "89"}
    # recursive text flatten: parsed xhtml children contribute text only,
    # exactly like the reference's get_element_text (cwe_handler.py:43-52)
    assert by_id["79"]["Description"] == "Improper neutralization of input"
    assert [tuple(rw) for rw in by_id["79"]["Related_Weaknesses"]] == [
        ("20", "ChildOf")
    ]
    assert by_id["89"]["Related_Weaknesses"] == []


def test_xhtml_rewrite_regex():
    # literal markup in flattened text is rewritten (cwe_handler.py:54-57)
    from cvemate_spark.sources.cwe_xml import _xhtml_to_html

    assert _xhtml_to_html("a <xhtml:p>b</xhtml:p> <xhtml:br/>") == "a <p>b</p> <br />"


def test_malformed_feed_rows_are_quarantined_not_fatal(spark, tmp_path):
    """Feed robustness: a landing file with a corrupt page must not
    abort the batch (the reference's fetch loop skips bad pages and
    carries on — utils retry/except paths). PERMISSIVE JSON parsing
    quarantines the bad record under _corrupt_record; good pages parse
    fully; counts reconcile (nothing silently dropped)."""
    import json as _json

    from pyspark.sql import functions as F, types as T

    p = tmp_path / "pages"
    p.mkdir()
    good = {
        "vulnerabilities": [
            {"cve": {"id": "CVE-2024-1", "sourceIdentifier": "a"}},
            {"cve": {"id": "CVE-2024-2", "sourceIdentifier": "b"}},
        ]
    }
    (p / "page0.json").write_text(_json.dumps(good))
    (p / "page1.json").write_text('{"vulnerabilities": [ TRUNCATED')
    schema = T.StructType(
        [
            T.StructField(
                "vulnerabilities",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "cve",
                                T.StructType(
                                    [
                                        T.StructField("id", T.StringType()),
                                        T.StructField(
                                            "sourceIdentifier", T.StringType()
                                        ),
                                    ]
                                ),
                            )
                        ]
                    )
                ),
            ),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    pages = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    ).cache()  # Spark refuses raw-record queries on an uncached corrupt frame
    bad = pages.filter(F.col("_corrupt_record").isNotNull())
    ok = pages.filter(F.col("_corrupt_record").isNull()).select(
        F.explode("vulnerabilities").alias("v")
    )
    assert bad.count() == 1  # quarantined, inspectable
    assert [r["v"]["cve"]["id"] for r in ok.collect()] == [
        "CVE-2024-1",
        "CVE-2024-2",
    ]
    pages.unpersist()


def test_python_datasource_partition_per_page(spark):
    """The custom paginated-feed DataSource maps one page file to one
    input partition — page parallelism owned by the task scheduler (the
    Spark-native form of the reference's page thread pool)."""
    from cvemate_spark.sources import landing, pyds

    pages_dir = landing.gen_nvd_pages("/root/testdata/sf0.001")
    pyds.register(spark)
    df = spark.read.format(pyds.FORMAT_NAME).option("path", pages_dir).load()
    assert df.rdd.getNumPartitions() == landing.NVD_PAGES
    per_page = {
        r["page"]: r["n"]
        for r in df.groupBy("page").count().withColumnRenamed("count", "n").collect()
    }
    assert sorted(per_page) == list(range(landing.NVD_PAGES))
    assert all(n > 0 for n in per_page.values())


def test_pyds_writer_roundtrip(spark, tmp_path):
    """The connector's write half: DataFrame -> custom sink -> page
    shards -> read back through the same format gives the same rows,
    and the job commit leaves a _SUCCESS marker (all-or-nothing rule)."""
    import os

    from pyspark.sql import Row

    from cvemate_spark.sources import pyds

    pyds.register(spark)
    rows = [
        Row(id=f"CVE-2026-{i}", vendor=f"v{i % 3}", page=i % 4) for i in range(40)
    ]
    df = spark.createDataFrame(rows).repartition(4)
    out = str(tmp_path / "pages")
    df.write.format(pyds.FORMAT_NAME).option("path", out).mode("append").save()
    assert os.path.exists(f"{out}/_SUCCESS")
    back = (
        spark.read.format(pyds.FORMAT_NAME)
        .option("path", out)
        .load()
        .select("id", "vendor")
    )
    assert {(r["id"], r["vendor"]) for r in back.collect()} == {
        (r.id, r.vendor) for r in rows
    }


def test_pyds_writer_overwrite_replaces_and_empty_commits(spark, tmp_path):
    """mode('overwrite') replaces ALL prior shards — a smaller rewrite
    leaves no stale pages from an earlier, larger run — staging dirs
    are cleaned up, and an all-partitions-empty job still commits (the
    _SUCCESS marker lands even when no task created the directory)."""
    import os

    from pyspark.sql import Row

    from cvemate_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "pages")
    big = spark.createDataFrame(
        [Row(id=f"CVE-2026-{i}", vendor="v", page=0) for i in range(20)]
    ).repartition(8)
    big.write.format(pyds.FORMAT_NAME).option("path", out).mode("overwrite").save()
    small = spark.createDataFrame([Row(id="CVE-2026-X", vendor="w", page=0)])
    small.write.format(pyds.FORMAT_NAME).option("path", out).mode(
        "overwrite"
    ).save()
    back = spark.read.format(pyds.FORMAT_NAME).option("path", out).load()
    assert [(r["id"], r["vendor"]) for r in back.collect()] == [("CVE-2026-X", "w")]
    assert not [d for d in os.listdir(out) if d.startswith("_staging-")]

    empty = spark.createDataFrame([], "id string, vendor string, page int")
    out2 = str(tmp_path / "empty")
    empty.write.format(pyds.FORMAT_NAME).option("path", out2).mode("append").save()
    assert os.path.exists(f"{out2}/_SUCCESS")


def test_cwe_xml_native_equals_udtf_and_stays_jvm_side(spark):
    """SRC-9 primary/fallback parity: the Spark 4 native XML reader and
    the mapInPandas ElementTree walk produce identical rows on the
    generated catalog (incl. the mixed-content Description flatten),
    and the native plan has NO Python stage — the whole parse is
    codegen'd scan + expressions."""
    from cvemate_spark.sources import landing
    from cvemate_spark.sources.cwe_xml import (
        read_cwe_xml_native,
        read_cwe_xml_udtf,
    )

    p = landing.gen_cwe_xml("/root/testdata/sf0.001")
    native = read_cwe_xml_native(spark, p)
    udtf = read_cwe_xml_udtf(spark, p)
    # same names and types (nullability flags differ: the native
    # coalesce-to-empty-array is provably non-null)
    assert native.schema.simpleString() == udtf.schema.simpleString()
    n_rows = sorted(map(tuple, native.collect()))
    u_rows = sorted(map(tuple, udtf.collect()))
    assert n_rows == u_rows and len(n_rows) == 25

    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "XmlScan" in plan or "xml" in plan.lower()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_cwe_xml_native_entity_and_markup_flatten(spark, tmp_path):
    """The JVM-side Description flatten matches ElementTree semantics on
    the catalog-realistic cases: real xhtml child tags contribute only
    their text, single-decoded entities survive literally ('&amp;amp;'
    → '&amp;', '&amp;lt;script&amp;gt;' → '<script>' text — NOT
    stripped, the tag-strip is xhtml-scoped)."""
    from cvemate_spark.sources.cwe_xml import (
        read_cwe_xml_native,
        read_cwe_xml_udtf,
    )

    xml = (
        '<?xml version="1.0"?>'
        '<Weakness_Catalog xmlns="http://cwe.mitre.org/cwe-6" '
        'xmlns:xhtml="http://www.w3.org/1999/xhtml"><Weaknesses>'
        '<Weakness ID="9" Name="N" Abstraction="Base">'
        "<Description>a <xhtml:b>bold</xhtml:b> 1 &lt; 2 "
        "&amp;amp; x &lt;script&gt;alert&lt;/script&gt; tail"
        "</Description>"
        "<Related_Weaknesses>"
        '<Related_Weakness Nature="ChildOf" CWE_ID="R1"/>'
        "</Related_Weaknesses></Weakness>"
        "</Weaknesses></Weakness_Catalog>"
    )
    d = tmp_path / "xml"
    d.mkdir()
    (d / "cwec.xml").write_text(xml)
    native = read_cwe_xml_native(spark, str(d)).collect()
    udtf = read_cwe_xml_udtf(spark, str(d)).collect()
    assert sorted(map(tuple, native)) == sorted(map(tuple, udtf))
    assert (
        native[0]["Description"]
        == "a bold 1 < 2 &amp; x <script>alert</script> tail"
    )


def test_pyds_stream_reader_incremental_with_checkpoint_restart(spark, tmp_path):
    """The streaming half of the Python data source: pages drained
    through availableNow, offsets persisted in the stream checkpoint,
    and a restarted query resumes after the last committed page —
    processing ONLY pages that landed since (the engine-managed form of
    the reference's per-source watermark poll loop)."""
    import json

    from cvemate_spark.sources import pyds

    pyds.register(spark)
    pages = tmp_path / "pages"
    pages.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_page(n: int, ids: list[str]) -> None:
        payload = {
            "vulnerabilities": [
                {"cve": {"id": i, "vendor": f"v{n}"}} for i in ids
            ]
        }
        (pages / f"page-{n}.json").write_text(json.dumps(payload))

    out = str(tmp_path / "out")

    def drain() -> list[tuple]:
        # parquet sink: the fault-tolerant (exactly-once) sink that
        # supports checkpoint recovery — the memory sink does not
        q = (
            spark.readStream.format(pyds.FORMAT_NAME)
            .option("path", str(pages))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.id, r.vendor, r.page) for r in spark.read.parquet(out).collect()
        )

    write_page(0, ["CVE-1", "CVE-2"])
    write_page(1, ["CVE-3"])
    assert drain() == [
        ("CVE-1", "v0", 0), ("CVE-2", "v0", 0), ("CVE-3", "v1", 1),
    ]

    # two more pages land; the restarted query (same checkpoint) must
    # process ONLY the new pages — committed offsets survive, already-
    # drained pages are neither replayed nor duplicated
    write_page(2, ["CVE-4"])
    write_page(3, ["CVE-5", "CVE-6"])
    assert drain() == [
        ("CVE-1", "v0", 0), ("CVE-2", "v0", 0), ("CVE-3", "v1", 1),
        ("CVE-4", "v2", 2), ("CVE-5", "v3", 3), ("CVE-6", "v3", 3),
    ]

    # nothing new: a third restart appends nothing (no replay)
    assert len(drain()) == 6


# ------------------------------------- connector rate limit / retry
def test_rate_limiter_bounds_request_cadence():
    """The @limits(calls, period) law with a FAKE clock: no window of
    `period` seconds ever admits more than `calls` acquisitions, and
    under-budget acquisitions never sleep."""
    from cvemate_spark.sources.ratelimit import RateLimiter

    t = {"now": 0.0}
    slept = []

    def clock():
        return t["now"]

    def sleep(s):
        slept.append(s)
        t["now"] += s

    rl = RateLimiter(calls=2, period=10.0, clock=clock, sleep=sleep)
    stamps = []
    for _ in range(6):
        rl.acquire()
        stamps.append(t["now"])
        t["now"] += 1.0  # 1s of work between requests
    # cadence bound: any 10s window holds <= 2 request stamps
    for s in stamps:
        in_window = [x for x in stamps if s <= x < s + 10.0]
        assert len(in_window) <= 2
    # the first two were free; later ones had to wait
    assert slept and all(s > 0 for s in slept)
    # total elapsed >= (ceil(6/2) - 1) * period = 20s
    assert t["now"] >= 20.0


def test_fetch_retry_recovers_and_bounds():
    """The reference's bounded 403/503 loop: two transient failures
    recover under retry_limit=3 (sleeping retry_delay between), a
    third consecutive failure under retry_limit=2 re-raises, and a
    non-retryable error propagates immediately with no sleep."""
    import pytest

    from cvemate_spark.sources.ratelimit import (
        RetryableFeedError, fetch_with_retry,
    )

    calls = {"n": 0}
    slept = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RetryableFeedError(status=503)
        return {"ok": True}

    out = fetch_with_retry(flaky, retries=3, delay=7.0, sleep=slept.append)
    assert out == {"ok": True} and calls["n"] == 3
    assert slept == [7.0, 7.0]

    calls["n"] = -10  # 12 failures ahead — exhausts any small bound
    with pytest.raises(RetryableFeedError):
        fetch_with_retry(flaky, retries=2, delay=0.0, sleep=lambda s: None)

    def broken():
        raise ValueError("bad json")

    slept2 = []
    with pytest.raises(ValueError):
        fetch_with_retry(broken, retries=3, delay=1.0, sleep=slept2.append)
    assert slept2 == []  # non-retryable: no backoff, fail now


def test_pyds_reader_retries_injected_503s(spark):
    """End-to-end through the Spark connector: every page partition
    raises the transient 503-class error twice (inject_fail_n=2);
    with retry_limit=3 the read recovers and returns exactly the
    clean-run rows; with retry_limit=2 the job fails loudly."""
    import pytest

    from cvemate_spark.sources import landing, pyds

    pages_dir = landing.gen_nvd_pages("/root/testdata/sf0.001")
    pyds.register(spark)
    clean = sorted(
        tuple(r) for r in spark.read.format(pyds.FORMAT_NAME)
        .option("path", pages_dir).load().collect()
    )
    recovered = sorted(
        tuple(r) for r in spark.read.format(pyds.FORMAT_NAME)
        .option("path", pages_dir)
        .option("inject_fail_n", "2")
        .option("retry_limit", "3")
        .option("retry_delay", "0.01")
        .option("rate_calls", "100")
        .option("rate_period", "1")
        .load().collect()
    )
    assert recovered == clean and len(clean) > 0

    with pytest.raises(Exception):
        spark.read.format(pyds.FORMAT_NAME) \
            .option("path", pages_dir) \
            .option("inject_fail_n", "5") \
            .option("retry_limit", "2") \
            .option("retry_delay", "0.01") \
            .load().collect()


def test_fetch_retry_skips_sleep_before_final_reraise():
    """ADVICE r8: an exhausted retry bound must fail loudly NOW — no
    retry_delay sleep after the last failed attempt (with the
    reference's 30 s delays that wasted one full delay per partition
    before the job could fail)."""
    import pytest

    from cvemate_spark.sources.ratelimit import (
        RetryableFeedError, fetch_with_retry,
    )

    slept = []

    def always_503():
        raise RetryableFeedError(status=503)

    with pytest.raises(RetryableFeedError):
        fetch_with_retry(always_503, retries=3, delay=30.0,
                         sleep=slept.append)
    assert slept == [30.0, 30.0]  # retries-1 sleeps, none after the last

    with pytest.raises(RetryableFeedError):
        fetch_with_retry(always_503, retries=1, delay=30.0,
                         sleep=slept.append)
    assert slept == [30.0, 30.0]  # single attempt: zero sleeps


def test_rate_limiter_shared_across_page_reads():
    """ADVICE r8: the per-worker budget is only real if consecutive
    page fetches in the same Python worker share ONE rolling window.
    reader_hooks must hand back the same process-wide limiter for the
    same (rate_calls, rate_period) budget — a fresh limiter per
    partition read would never throttle first attempts."""
    from cvemate_spark.sources.ratelimit import (
        _SHARED_LIMITERS, reader_hooks, shared_limiter,
    )

    _SHARED_LIMITERS.clear()
    a, _, _ = reader_hooks({"rate_calls": "2", "rate_period": "10"})
    b, _, _ = reader_hooks({"rate_calls": "2", "rate_period": "10"})
    assert a is b is shared_limiter(2, 10.0)
    c, _, _ = reader_hooks({"rate_calls": "5", "rate_period": "10"})
    assert c is not a  # distinct budget, distinct window

    # the shared window actually carries state across "reads": two
    # acquisitions consume the budget, the third (fresh reader_hooks
    # call, same options) must wait
    t = {"now": 0.0}
    waits = []
    lim = shared_limiter(2, 10.0)
    lim._clock = lambda: t["now"]
    lim._sleep = lambda s: (waits.append(s), t.__setitem__("now", t["now"] + s))
    lim.acquire()
    lim.acquire()
    again, _, _ = reader_hooks({"rate_calls": "2", "rate_period": "10"})
    again.acquire()
    assert waits and sum(waits) >= 10.0 - 1e-6
    _SHARED_LIMITERS.clear()
