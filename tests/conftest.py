"""Shared Spark fixture — one JVM for the whole test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from square_etl_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    # tiny test data: 8 shuffle partitions cut per-job task overhead
    # (prod default stays 32 / cluster-overridden; AQE adapts either way)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
