"""Every registered QuerySpec must match its DuckDB oracle at sf0.001 —
the in-repo replica of the driver's t2 gate (which runs at sf0.01; run
``SMSE_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``
for the full-size check)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from simple_mapreduce_search_engine_information_retrieval__spark.oracle import (
    check_query,
)

REGISTRY = entrymod._registry()
SF = os.environ.get("SMSE_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    issues = check_query(spark, SF, name, REGISTRY[name])
    assert not issues, issues


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["docno", "score", "rank"]
