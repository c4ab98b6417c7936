from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_jdbc_limit_spark import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = build_session(
        app_name="tests",
        cpus=8,
        shuffle_partitions=8,
        driver_memory="6g",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT


@pytest.fixture(scope="session")
def sf_large() -> str:
    """The biggest shipped scale factor (the only one with exact-duplicate
    documents); tests needing it skip rather than error where the corpus
    isn't generated."""
    path = "/root/testdata/sf0.1"
    if not os.path.isdir(path):
        pytest.skip(f"{path} not generated on this machine")
    return path
