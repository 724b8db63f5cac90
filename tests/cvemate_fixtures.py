"""Deterministic CveMate-shaped source fixtures (FIXTURES.md §B).

Shapes mirror the records the reference constructs (citations in
FIXTURES.md); sizes are unit-test scale. Seed 42, fixed base timestamp,
sorted keys — no wall-clock anywhere.
"""

from __future__ import annotations

import gzip
import json
import random
from pathlib import Path

N_CVE = 40
BASE = "2024-01-01T00:00:00+00:00"


def cve_id(i: int) -> str:
    return f"CVE-2024-{i:05d}"


def write_all(root: Path) -> dict[str, Path]:
    rng = random.Random(42)
    paths: dict[str, Path] = {}

    # B1 nvd: JSON pages with a vulnerabilities array (SRC-1 shape)
    vulns = []
    for i in range(N_CVE):
        metrics = {}
        if rng.random() > 0.2:
            metrics["cvssMetricV31"] = [
                {"cvssData": {"baseScore": round(rng.uniform(1, 10), 1)}}
            ]
        if rng.random() > 0.6:
            metrics["cvssMetricV30"] = [
                {"cvssData": {"baseScore": round(rng.uniform(1, 10), 1)}}
            ]
        if rng.random() > 0.4:
            metrics["cvssMetricV2"] = [
                {"cvssData": {"baseScore": round(rng.uniform(1, 10), 1)}}
            ]
        vulns.append(
            {
                "cve": {
                    "id": cve_id(i),
                    "published": BASE,
                    "lastModified": BASE,
                    "description": f"desc {i}",
                    "metrics": metrics,
                    "weaknesses": [
                        {"value": str(rng.choice([79, 89, 120, 416, 9999]))}
                    ],
                }
            }
        )
    p = root / "nvd_page.json"
    p.write_text(json.dumps({"vulnerabilities": vulns}, sort_keys=True))
    paths["nvd"] = p

    # B2 epss: gz CSV with metadata comment line (SRC-6 shape)
    lines = ["#model_version:v2025.03.14,score_date:2025-08-12T00:00:00Z"]
    lines.append("cve,epss,percentile")
    for i in range(0, int(N_CVE * 0.6)):
        lines.append(f"{cve_id(i)},{round(rng.random(), 5)},{round(rng.random(), 5)}")
    lines.append(f"{cve_id(998)},,0.5")  # empty epss -> dropped by OP-FILT-2
    lines.append(f"CVE-2024-00999,{round(rng.random(), 5)},{round(rng.random(), 5)}")
    p = root / "epss.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines))
    paths["epss"] = p

    # B3 exploitdb CSV (SRC-5 shape)
    rows = ["id,file,description,date_published,author,type,platform,codes"]
    rows.append("1,exploits/a,desc,2024-01-01,au,remote,linux,OSVDB-1;" + cve_id(7))
    rows.append("2,exploits/b,desc,2024-01-02,au,local,win," + cve_id(7) + ";" + cve_id(9))
    rows.append("3,exploits/c,desc,2024-01-03,au,dos,linux,OSVDB-2")  # no CVE
    rows.append("4,exploits/d,desc,2024-01-04,au,webapps,php," + cve_id(9))
    p = root / "files_exploits.csv"
    p.write_text("\n".join(rows))
    paths["exploitdb"] = p

    # B4 kev JSON catalog (SRC-7 shape)
    kev = {
        "catalogVersion": "2024.01.01",
        "dateReleased": "2024-01-01T12:00:00Z",
        "vulnerabilities": [
            {
                "cveID": cve_id(i),
                "vendorProject": "v",
                "product": "p",
                "vulnerabilityName": f"vuln {i}",
                "dateAdded": "2024-01-01",
                "knownRansomwareCampaignUse": "Unknown",
            }
            for i in (1, 5)
        ],
    }
    p = root / "kev.json"
    p.write_text(json.dumps(kev, sort_keys=True))
    paths["kev"] = p

    # B5 metasploit modules JSON (SRC-8 one-level dict shape)
    msf = {
        "exploit/linux/a": {
            "name": "A",
            "fullname": "exploit/linux/a",
            "rank": 500,
            "disclosure_date": "2024-01-01",
            "references": ["OSVDB-9", f"{cve_id(3)}", "URL-http://x"],
        },
        "exploit/windows/b": {
            "name": "B",
            "fullname": "exploit/windows/b",
            "rank": 300,
            "disclosure_date": "2024-01-02",
            "references": [f"{cve_id(3)}", f"{cve_id(11)}"],
        },
    }
    p = root / "modules_metadata.json"
    p.write_text(json.dumps(msf, sort_keys=True))
    paths["metasploit"] = p

    # B6 debian tracker JSON (SRC-8 two-level dict shape)
    deb = {
        "pkg1": {
            cve_id(2): {"description": "d2", "scope": "local"},
            cve_id(4): {"description": "d4", "scope": "remote"},
        },
        "pkg2": {cve_id(2): {"description": "d2b", "scope": "remote"}},
    }
    p = root / "debian.json"
    p.write_text(json.dumps(deb, sort_keys=True))
    paths["debian"] = p

    # B7 cwe XML (SRC-9 shape)
    xml = """<?xml version="1.0"?>
<Weakness_Catalog xmlns="http://cwe.mitre.org/cwe-6" xmlns:xhtml="http://www.w3.org/1999/xhtml">
 <Weaknesses>
  <Weakness ID="79" Name="XSS" Abstraction="Base">
   <Description>Improper <xhtml:b>neutralization</xhtml:b> of input</Description>
   <Related_Weaknesses>
    <Related_Weakness Nature="ChildOf" CWE_ID="20"/>
   </Related_Weaknesses>
  </Weakness>
  <Weakness ID="89" Name="SQLi" Abstraction="Base">
   <Description>SQL injection</Description>
  </Weakness>
 </Weaknesses>
</Weakness_Catalog>"""
    p = root / "cwec.xml"
    p.write_text(xml)
    paths["cwe"] = p

    # cveorg delta log (SRC-4 shape)
    delta = [
        {
            "fetchTime": "2024-01-02T00:00:00Z",
            "new": [{"cveId": cve_id(20)}],
            "updated": [{"cveId": cve_id(2)}],
        },
        {
            "fetchTime": "2024-01-03T00:00:00Z",
            "new": [],
            "updated": [{"cveId": cve_id(20)}, {"cveId": cve_id(21)}],
        },
    ]
    p = root / "deltaLog.json"
    p.write_text(json.dumps(delta, sort_keys=True))
    paths["cveorg_delta"] = p

    # B8 redhat hydra securitydata page (SRC-2 shape): NVD-like
    # paginated envelope, RedHat-specific payload fields
    rh = {
        "totalResults": 3,
        "resultsPerPage": 3,
        "vulnerabilities": [
            {
                "cve": {
                    "id": cve_id(i),
                    "severity": sev,
                    "public_date": "2024-01-01T00:00:00Z",
                    "bugzilla": f"bz-{i}",
                }
            }
            for i, sev in ((1, "important"), (5, "moderate"), (50, "critical"))
        ],
    }
    p = root / "redhat_page.json"
    p.write_text(json.dumps(rh, sort_keys=True))
    paths["redhat"] = p

    # cveorg zip of per-CVE JSON files (SRC-3 shape)
    import zipfile

    p = root / "cves.zip"
    with zipfile.ZipFile(p, "w") as zf:
        for i in (30, 31):
            zf.writestr(
                f"cves/2024/{cve_id(i)}.json",
                json.dumps({"cveMetadata": {"cveId": cve_id(i)}, "k": i}),
            )
        zf.writestr("cves/readme.txt", "not json")
    paths["cveorg_zip"] = p

    return paths
