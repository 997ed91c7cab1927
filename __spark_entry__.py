"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the
``simple_mapreduce_search_engine_information_retrieval__spark`` package;
each plans-module exposes ``QUERIES: dict[str, QuerySpec]`` pairing the
Spark callable with its DuckDB oracle SQL (generated from the same
constants so the two renderings cannot drift).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from simple_mapreduce_search_engine_information_retrieval__spark.plans import (
        indexing,
        search,
    )

    modules = [indexing, search]
    for name in ("relational", "textstats", "dedup", "similarity", "streaming_batch"):
        try:
            mod = __import__(
                "simple_mapreduce_search_engine_information_retrieval__spark.plans."
                + name,
                fromlist=[name],
            )
            modules.append(mod)
        except ImportError:
            pass
    out = {}
    for mod in modules:
        for qname, spec in mod.QUERIES.items():
            assert qname not in out, f"duplicate query name {qname}"
            out[qname] = spec
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    interactive-search shape — tokenize → postings lookup → tf-idf
    score → top-10 (SURVEY.md §3.3)."""
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.search import (
        search,
    )

    return search(spark, "/root/testdata/sf0.001", "spark join")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
