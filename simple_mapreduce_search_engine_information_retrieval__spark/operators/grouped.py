"""Grouped-map analytics via ``applyInPandas`` (SURVEY.md §2.10: the
grouped-map UDF surface; the scalar pandas UDF lives in
functions/fidelity.py, the iterator form in operators/multimodal.py).

Operator: per-user event z-scores — each user's events normalized by the
user's own mean/std. The kernel sees one user's events as a pandas frame;
Spark handles the hash partition by user_id (one shuffle), the kernel is
Arrow-batched per group.

Scale: state is one group in memory at a time; skewed users (millions of
events) are the applyInPandas hazard — cap group size upstream or switch
to the window-function formulation (which the DuckDB oracle uses, and
which is also the better Spark plan when the kernel is expressible in
SQL — this operator exists to exercise the API for kernels that are NOT).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ZSCORE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("z", DoubleType()),
    ]
)


def user_value_zscores(events: DataFrame) -> DataFrame:
    """(user_id, event_id, z) for users with >= 2 events and nonzero
    spread; z = (value - mean) / std_pop, rounded to 6."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["user_id", "event_id", "z"])
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=0)
        if s == 0:
            return pd.DataFrame(columns=["user_id", "event_id", "z"])
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "z": ((pdf["value"] - m) / s).round(6),
            }
        )

    # pin the grouped-map exchange at cluster parallelism (r17): the
    # per-group pandas kernel cost is OPAQUE to AQE's byte-based
    # coalescing, which squeezed the ~1.5k fixture groups onto 3-4
    # tasks and serialized the Python work (guide §4: Python compute is
    # heavy per byte). An explicit keyed repartition is reused by the
    # groupBy (same key, same width — no extra shuffle) and is exempt
    # from AQE coalescing. Measured 4.2 s -> ~0.6 s at sf0.1, 32 cores;
    # at cluster scale the byte-based width would under-provision the
    # Python stage the same way.
    par = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("user_id", "event_id", "value")
        .repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(kernel, ZSCORE_SCHEMA)
    )


def user_value_zscores_window(events: DataFrame) -> DataFrame:
    """Window-function formulation of the same operator — the default
    plan: one shuffle on user_id like the grouped-map form, but the
    whole computation stays JVM-side inside whole-stage codegen (no
    Arrow transfer, no Python workers), and a skewed user is a streamed
    window partition rather than one giant pandas frame in memory."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    return (
        events.select("user_id", "event_id", "value")
        .withColumn("m", F.avg("value").over(w))
        .withColumn("s", F.stddev_pop("value").over(w))
        .withColumn("c", F.count("*").over(w))
        .where((F.col("c") >= 2) & (F.col("s") > 0))
        .select(
            "user_id",
            "event_id",
            F.round((F.col("value") - F.col("m")) / F.col("s"), 6).alias("z"),
        )
    )


def value_gmean_by_type(events: DataFrame) -> DataFrame:
    """Grouped-agg pandas UDF — the UDAF surface (SURVEY.md §2.10): one
    scalar per group from an arbitrary Python body. Geometric mean of
    positive event values per event_type; the kernel SORTS its input so
    the float reduction is a pure function of the group's multiset (the
    shuffle's arrival order can't change the answer)."""
    import numpy as np
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def gmean(v: pd.Series) -> float:  # Series→scalar hint = GROUPED_AGG
        import math

        arr = np.sort(v[v > 0].to_numpy(dtype=np.float64))
        if arr.size == 0:
            return 0.0
        # explicit half-up emit (floor(v*1e4+0.5)/1e4): Python round() is
        # banker's, DuckDB's round() is half-up — same cross-engine
        # rounding divergence class that bit the audio-duration kernel
        g = float(np.exp(np.log(arr).mean()))
        return math.floor(g * 1e4 + 0.5) / 1e4

    # pre-filter so a group with no positive values vanishes in BOTH
    # renderings (the oracle's WHERE runs before GROUP BY)
    return (
        events.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(gmean(F.col("value")).alias("gmean_value"))
    )


# avg(ln) in DuckDB reduces in scan order, numpy's mean pairwise over the
# sorted array — agreement at 4 decimals holds with ~1e-12 headroom on
# these magnitudes (same tolerance argument as the percentile queries)
DUCK_VALUE_GMEAN = """
SELECT event_type, round(exp(avg(ln(value))), 4) AS gmean_value
FROM events WHERE value > 0
GROUP BY event_type
"""


DUCK_USER_ZSCORES = """
SELECT user_id, event_id, round((value - m) / s, 6) AS z
FROM (
  SELECT user_id, event_id, value,
         avg(value)        OVER (PARTITION BY user_id) AS m,
         stddev_pop(value) OVER (PARTITION BY user_id) AS s,
         count(*)          OVER (PARTITION BY user_id) AS c
  FROM events
) t
WHERE c >= 2 AND s > 0
"""
