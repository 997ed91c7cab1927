"""Query plans. Each module exposes ``QUERIES: dict[str, QuerySpec]``;
`__spark_entry__` merges them for the driver harness.

A QuerySpec pairs the Spark implementation with its DuckDB oracle SQL.
Two authoring styles:
- dual rendering: Spark DataFrame code + DuckDB SQL generated from the
  SAME constants (tokenizer queries — dialects genuinely differ);
- shared SQL: one ANSI string executed by both Spark SQL and DuckDB
  (relational pack — dialect subset is common).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    note: str = ""


def shared_sql(sql: str, note: str = "") -> QuerySpec:
    """One ANSI-SQL string runnable by both Spark SQL and DuckDB."""
    from ..sources.tables import register_views

    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    return QuerySpec(fn=fn, oracle=sql, note=note)
