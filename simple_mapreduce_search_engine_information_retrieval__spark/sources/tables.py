"""Fixture table loaders.

All tests/benches read the driver-generated Parquet tables
(`/root/testdata/sf*/`, see TESTDATA.md). Loading is plain
``spark.read.parquet`` — Catalyst gets column pruning + predicate pushdown
for free, and at cluster scale the same call reads a partitioned
directory tree with partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any caller-provided SparkSession (e.g. the grading driver's,
    which won't have our session.py defaults) able to run every plan:
    - older fixture generations carried events.ts as TIMESTAMP(NANOS) →
      read as epoch-nanos long (all time queries do exact integer
      arithmetic on it);
    - UTC session timezone so timestamp renderings match the oracle (and
      so naive-timestamp → epoch conversions are timezone-independent)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover — conf locked down: proceed
        pass


def ts_as_nanos(df: DataFrame) -> DataFrame:
    """Normalize an events DataFrame so ``ts`` is epoch-nanos BIGINT, the
    canonical form every time plan does exact integer arithmetic on.

    The driver's fixture has shipped ``ts`` as both TIMESTAMP(NANOS)
    (read as long via nanosAsLong) and timestamp[us] (read as
    TIMESTAMP_NTZ); accept either. The NTZ value is interpreted as UTC —
    matching DuckDB, whose naive-TIMESTAMP ``epoch_ns(ts)`` the oracles
    use — via the UTC session timezone set in ensure_session_confs."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    field = df.schema["ts"] if "ts" in df.columns else None
    if field is None or isinstance(field.dataType, LongType):
        return df
    return df.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return ts_as_nanos(df) if name == "events" else df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (mirrors the driver's
    DuckDB-side pre-registered views) and return the DataFrames."""
    out = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
