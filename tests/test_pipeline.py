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


def test_cvss_coalesce_chain(spark, fixture_dir):
    nvd = formats.normalize_nvd(
        formats.read_nvd_json(spark, str(fixture_dir / "nvd_page.json"))
    )
    got = nvd.select(
        "id", cvss_base_score(F.col("nvd")).alias("base")
    ).collect()
    for r in got:
        assert r["base"] is not None and 0.0 <= r["base"] <= 10.0
