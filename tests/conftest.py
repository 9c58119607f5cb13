from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pytest_collection_modifyitems(config, items):
    """Default-skip @pytest.mark.soak tests (VERDICT r13 next #3: the
    full suite outgrew the driver's verify window — the r13 VERIFY
    artifact was cut off mid-suite with zero failures).  The tests stay
    in the suite and the release gate runs them (SPARK_GRAFT_FULL_TESTS=1
    in tools/release_gate.py); the default `pytest tests/` run targets
    <25 min."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="soak test — run with SPARK_GRAFT_FULL_TESTS=1")
    for item in items:
        if "soak" in item.keywords:
            item.add_marker(skip)


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
