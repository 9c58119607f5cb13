from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from singer_spark.session import get_spark

    spark = get_spark("singer_spark_tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark_sess(spark):
    """Alias usable inside @given-decorated tests (hypothesis forbids
    function-scoped fixtures; the session-scoped spark is fine)."""
    return spark
