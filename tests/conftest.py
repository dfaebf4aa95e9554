"""Shared test fixtures: one SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from home_credit_data_engineering_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_session(
        app_name="hcde-spark-tests",
        # Small fixed parallelism: test data is tiny; 200 default partitions
        # would dominate runtime with task overhead.
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
