from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_mapreduce_search_engine_information_retrieval__spark.session import (  # noqa: E402
    get_spark,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("smse-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


def physical_plan(df) -> str:
    """Shared executed-plan stringifier for plan-shape assertions (one
    definition so a future capture change — e.g. AQE final plans — lands
    everywhere at once)."""
    return df._jdf.queryExecution().executedPlan().toString()
