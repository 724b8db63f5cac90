"""Priority scoring (OP-SCORE).

Re-expresses `determine_priority` from the reference
(`handlers/prioritizer_handler.py:22-48`, thresholds at `:18-19`) as a
single Catalyst CASE expression — no cursor loop, no per-row Python.
The reference iterates documents in 500-row batches and writes the
score back row-by-row; here it is one `withColumn` over the table and
Catalyst prunes the scan to exactly the referenced columns.

Ladder (prioritizer_handler.py:40-48):
    kev present                          -> 1
    base >= B and epss >= E              -> 1
    base >= B                            -> 2
    epss >= E                            -> 3
    otherwise                            -> 4
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

CVSS_THRESHOLD = 6.0  # prioritizer_handler.py:18
EPSS_THRESHOLD = 0.2  # prioritizer_handler.py:19


def priority_column(
    kev: Column,
    base_score: Column,
    epss_score: Column,
    base_threshold: float = CVSS_THRESHOLD,
    epss_threshold: float = EPSS_THRESHOLD,
) -> Column:
    """The ladder as one CASE expression.

    `kev` is a boolean column ("row is on the KEV list"); `base_score`
    and `epss_score` may be null (null comparisons are false, exactly
    like the reference's `.get(..., 0)` defaults after the 0-compare).
    """
    base_hit = base_score >= base_threshold
    epss_hit = epss_score >= epss_threshold
    return (
        F.when(kev, 1)
        .when(base_hit & epss_hit, 1)
        .when(base_hit, 2)
        .when(epss_hit, 3)
        .otherwise(4)
    )


def cvss_base_score(nvd: Column) -> Column:
    """CVSS coalesce chain (prioritizer_handler.py:31-36).

    First present of v3.1, v3.0, v2 base score, else 0.0 — on the wide
    `cve` table's `nvd` struct column, where `metrics.cvssMetricV31`
    is an array of structs and the reference reads element [0].
    """
    return F.coalesce(
        F.element_at(nvd["metrics"]["cvssMetricV31"], 1)["cvssData"]["baseScore"],
        F.element_at(nvd["metrics"]["cvssMetricV30"], 1)["cvssData"]["baseScore"],
        F.element_at(nvd["metrics"]["cvssMetricV2"], 1)["cvssData"]["baseScore"],
        F.lit(0.0),
    )


def score_cve_table(cve, kev_col: str = "kev", nvd_col: str = "nvd", epss_col: str = "epss"):
    """Score the wide cve table: adds the `priority` int column.

    epss scores are stored as strings (cast-at-use semantics, SURVEY
    §1.2) and cast to double here, mirroring prioritizer_handler.py:38.
    """
    return cve.withColumn(
        "priority",
        priority_column(
            kev=F.col(kev_col).isNotNull(),
            base_score=cvss_base_score(F.col(nvd_col)),
            epss_score=F.coalesce(
                F.col(f"{epss_col}.epss_score").cast("double"), F.lit(0.0)
            ),
        ),
    )
