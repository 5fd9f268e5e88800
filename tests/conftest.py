"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from python_cdc_postgres_to_clickhouse_spark.session import get_spark

    spark = get_spark(cpus=8)
    yield spark
    spark.stop()
