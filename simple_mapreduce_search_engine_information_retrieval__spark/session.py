"""SparkSession factory.

Defaults are chosen for the test harness (local[32], 128 GiB box) but the
knobs mirror what a 1000-executor cluster run would set: AQE on (runtime
partition coalescing + skew-join splitting), explicit shuffle partitions,
Arrow for the few pandas-UDF paths, UTC session timezone so results are
byte-identical to the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "smse-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE size the output partitioning of CACHED plans by bytes
        # (guide §2.2: fewer, larger partitions): the warm memo caches
        # (postings, shingles, bands, embeddings) otherwise pin the
        # shuffle-partition count at cache-build time, and every
        # InMemoryTableScan consumer pays that task count forever —
        # measured r17: search_two_term 164→40 tasks (1.10→0.66 s),
        # dedup_incremental_minhash 657→94 tasks (2.80→1.24 s),
        # graph_pagerank_terms 397→25 tasks (1.23→0.72 s) at sf0.1.
        # Scale-adaptive, not a local tune: partitions follow
        # advisoryPartitionSizeInBytes, so a 100 TB cached relation
        # keeps thousands of partitions while a dictionary-sized memo
        # collapses to a handful.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # older fixture generations carried events.ts as TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects — read those as
        # epoch-nanos long; sources/tables.py::ts_as_nanos normalizes the
        # current timestamp[us] generation to the same canonical long.
        # DuckDB side uses epoch_ns() for the same integer value.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def tune_for_scale(spark: SparkSession, target_partitions: int) -> None:
    """At 100 TB, shuffle partition count must track data volume
    (~128-256 MB per post-shuffle partition); AQE coalesces down but the
    initial number bounds parallelism. Call-site override for big jobs."""
    spark.conf.set("spark.sql.shuffle.partitions", str(target_partitions))
