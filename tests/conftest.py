"""Shared test fixtures: one local SparkSession + CveMate-shaped inputs."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from cvemate_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> Path:
    """Write the CveMate-shaped source files (FIXTURES.md §B) once."""
    import cvemate_fixtures

    root = tmp_path_factory.mktemp("cvemate_fixtures")
    cvemate_fixtures.write_all(root)
    return root
