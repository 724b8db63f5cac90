"""End-to-end pipeline test: fixtures → normalize → merge → score.

The full CveMate job as one flow: every source normalizer feeds the
wide cve table through OP-MERGE, then the priority ladder scores it —
asserting the cross-source document shape and the scoring semantics
of prioritizer_handler.py:22-48.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cvemate_spark import pipeline
from cvemate_spark.functions.scoring import (
    CVSS_THRESHOLD,
    EPSS_THRESHOLD,
    cvss_base_score,
)
from cvemate_spark.sources import formats

T0 = "2024-01-05 00:00:00"


def _sources(spark, fixture_dir):
    nvd = formats.normalize_nvd(
        formats.read_nvd_json(spark, str(fixture_dir / "nvd_page.json"))
    )
    epss = formats.normalize_epss(
        formats.read_epss_csv(spark, str(fixture_dir / "epss.csv.gz"))
    )
    kev = formats.normalize_kev(spark, str(fixture_dir / "kev.json"))
    exploitdb = formats.normalize_exploitdb(
        spark.read.csv(str(fixture_dir / "files_exploits.csv"), header=True)
    ).dropDuplicates(["id"])
    msf = formats.normalize_metasploit(
        spark, str(fixture_dir / "modules_metadata.json")
    ).dropDuplicates(["id"])
    debian = formats.normalize_debian(
        spark, str(fixture_dir / "debian.json")
    ).dropDuplicates(["id"])
    return [nvd, epss, kev, exploitdb, msf, debian]


def test_build_merge_score(spark, fixture_dir, tmp_path):
    cve = pipeline.build_cve_table(_sources(spark, fixture_dir), now=T0)
    scored = pipeline.score(cve)
    rows = {r["id"]: r for r in scored.collect()}

    # wide-document shape: all source columns present
    for col in ("nvd", "epss", "kev", "exploitdb", "metasploit", "debian"):
        assert col in scored.columns

    # KEV rows are priority 1 regardless of scores (ladder rung 1)
    for kev_id in ("CVE-2024-00001", "CVE-2024-00005"):
        assert rows[kev_id]["kev"] is not None
        assert rows[kev_id]["priority"] == 1

    # ladder parity against a Python re-computation on every row
    for r in rows.values():
        if r["kev"] is not None:
            want = 1
        else:
            base = 0.0
            nvd = r["nvd"]
            if nvd is not None:
                m = nvd["metrics"]
                for fam in ("cvssMetricV31", "cvssMetricV30", "cvssMetricV2"):
                    arr = m[fam] if m is not None else None
                    if arr:
                        base = arr[0]["cvssData"]["baseScore"]
                        break
            epss = float(r["epss"]["epss_score"]) if r["epss"] is not None else 0.0
            if base >= CVSS_THRESHOLD and epss >= EPSS_THRESHOLD:
                want = 1
            elif base >= CVSS_THRESHOLD:
                want = 2
            elif epss >= EPSS_THRESHOLD:
                want = 3
            else:
                want = 4
        assert r["priority"] == want, r["id"]

    # epss-only id (absent from nvd) got inserted, not dropped
    assert rows["CVE-2024-00999"]["nvd"] is None
    assert rows["CVE-2024-00999"]["epss"] is not None

    # write hash-partitioned and read back identical
    out = str(tmp_path / "cve_table")
    pipeline.write_cve_table(scored, out, n_buckets=4)
    back = spark.read.parquet(out)
    assert back.count() == len(rows)


def test_cvss_version_selection_is_presence_gated(spark):
    """prioritizer_handler.py:30-36: the first PRESENT metric key wins
    and its missing baseScore defaults to 0 — no fall-through to the
    next version (a V31-present/score-absent record scores 0.0, not
    its V30 score)."""
    metric_t = "array<struct<cvssData:struct<baseScore:double>>>"
    df = spark.sql(
        f"""
        SELECT id, named_struct('metrics', named_struct(
            'cvssMetricV31', CAST(v31 AS {metric_t}),
            'cvssMetricV30', CAST(v30 AS {metric_t}),
            'cvssMetricV2',  CAST(v2  AS {metric_t}))) AS nvd
        FROM VALUES
            ('v31_wins',        array(named_struct('cvssData', named_struct('baseScore', 9.8D))),
                                array(named_struct('cvssData', named_struct('baseScore', 7.0D))), NULL),
            ('v31_score_absent', array(named_struct('cvssData', named_struct('baseScore', CAST(NULL AS DOUBLE)))),
                                array(named_struct('cvssData', named_struct('baseScore', 7.0D))), NULL),
            ('v30_only',        NULL,
                                array(named_struct('cvssData', named_struct('baseScore', 6.5D))), NULL),
            ('v2_only',         NULL, NULL,
                                array(named_struct('cvssData', named_struct('baseScore', 4.2D)))),
            ('none_present',    NULL, NULL, NULL)
            AS t(id, v31, v30, v2)
        """
    )
    got = {
        r["id"]: r["base"]
        for r in df.select("id", cvss_base_score(F.col("nvd")).alias("base")).collect()
    }
    assert got == {
        "v31_wins": 9.8,
        "v31_score_absent": 0.0,  # NOT the 7.0 fall-through
        "v30_only": 6.5,
        "v2_only": 4.2,
        "none_present": 0.0,
    }


def test_cvss_coalesce_chain(spark, fixture_dir):
    nvd = formats.normalize_nvd(
        formats.read_nvd_json(spark, str(fixture_dir / "nvd_page.json"))
    )
    got = nvd.select(
        "id", cvss_base_score(F.col("nvd")).alias("base")
    ).collect()
    for r in got:
        assert r["base"] is not None and 0.0 <= r["base"] <= 10.0
