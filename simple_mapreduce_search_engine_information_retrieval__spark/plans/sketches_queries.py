"""Driver-checked sketch operators: Count-Min and Bloom, built as plain
aggregations over an engine-portable hash family.

The py4j-bridged Spark sketches (operators/sketches.py) are the
JVM-native tool; these formulations exist because their hash families
are portable (md5 with an integer salt prefix, the same trick as
MinHash in plans/dedup.py) so build AND probe are exactly
reproducible in DuckDB — which turns "approximate" sketches into
oracle-checkable queries: the sketch table, the point estimates, and
the membership answers are all deterministic functions of the data.

Scale: a CMS build is ONE map-side-combinable aggregate over the token
stream (d x w cells of state per partition); a Bloom build is a
distinct over d_hashes x vocab bit indices. Probes broadcast the tiny
query side. This is the shape that survives 100 TB — no driver-side
loops, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .indexing import doc_terms, duck_doc_terms

CMS_ROWS = 4
CMS_WIDTH = 64
BLOOM_BITS = 512
BLOOM_HASHES = 3

# probe workloads: present terms, stopword-absent, and never-present
CMS_PROBES = ("spark", "join", "window", "merge", "zzz_absent", "qqq_absent")
BLOOM_PROBES = ("spark", "data", "vector", "zzz_absent", "the", "qqq_absent")


def _h(col: Column, salt: int, modulus: int) -> Column:
    """First 8 md5 nibbles of 'salt:term' as a BIGINT bucket (< 2^32, no
    overflow/sign issues in either engine)."""
    hx = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 8)
    return F.conv(hx, 16, 10).cast("long") % modulus


def _duck_h(expr: str, salt: str, modulus: int) -> str:
    return f"(('0x' || substr(md5({salt} || ':' || {expr}), 1, 8))::BIGINT % {modulus})"


def cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, est): Count-Min point estimates for the probe workload over
    the 1-gram token stream. est >= true count always; equality unless a
    bucket collision in every row — with the same hash family on both
    engines, the estimate itself is deterministic and oracle-checked."""
    stream = doc_terms(spark, sf_dir, 1)
    cells = stream.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _h(F.col("term"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    cms = cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], "term string")
    probe_cells = probes.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        _h(F.col("term"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_ROWS)
                ]
            )
        ).alias("c"),
    ).select("term", "c.row", "c.bucket")
    return (
        probe_cells.join(cms, ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _duck_cms_estimates() -> str:
    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    return f"""
WITH stream AS MATERIALIZED ({duck_doc_terms(1)}),
     rows(r) AS (SELECT unnest(generate_series(0, {CMS_ROWS - 1}))),
     cms AS MATERIALIZED (
       SELECT CAST(r AS BIGINT) AS row,
              {_duck_h('term', 'CAST(r AS VARCHAR)', CMS_WIDTH)} AS bucket,
              count(*) AS cnt
       FROM stream, rows
       GROUP BY 1, 2
     ),
     probes(term) AS (VALUES {probes}),
     probe_cells AS (
       SELECT term, CAST(r AS BIGINT) AS row,
              {_duck_h('term', 'CAST(r AS VARCHAR)', CMS_WIDTH)} AS bucket
       FROM probes, rows
     )
SELECT p.term, min(coalesce(c.cnt, 0)) AS est
FROM probe_cells p LEFT JOIN cms c USING (row, bucket)
GROUP BY p.term
"""


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, maybe_present): Bloom-filter membership for the probe
    workload against the 1-gram vocabulary. No false negatives by
    construction; false positives are a deterministic function of the
    hash family, hence oracle-checkable."""
    vocab = doc_terms(spark, sf_dir, 1).select("term").distinct()
    bits = (
        vocab.select(
            F.explode(
                F.array(*[_h(F.col("term"), 100 + j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
            ).alias("bit")
        )
        .distinct()
    )
    probes = spark.createDataFrame([(t,) for t in BLOOM_PROBES], "term string")
    probe_bits = probes.select(
        "term",
        F.explode(
            F.array(*[_h(F.col("term"), 100 + j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
        ).alias("bit"),
    )
    return (
        probe_bits.join(bits.withColumn("set", F.lit(1)), "bit", "left")
        .groupBy("term")
        .agg((F.count("set") == F.lit(BLOOM_HASHES)).alias("maybe_present"))
    )


def _duck_bloom_membership() -> str:
    probes = ", ".join(f"('{t}')" for t in BLOOM_PROBES)
    hashes = ", ".join(str(100 + j) for j in range(BLOOM_HASHES))
    return f"""
WITH vocab AS MATERIALIZED (SELECT DISTINCT term FROM ({duck_doc_terms(1)})),
     js(j) AS (SELECT unnest([{hashes}])),
     bits AS MATERIALIZED (
       SELECT DISTINCT {_duck_h('term', 'CAST(j AS VARCHAR)', BLOOM_BITS)} AS bit
       FROM vocab, js
     ),
     probes(term) AS (VALUES {probes}),
     probe_bits AS (
       SELECT term, {_duck_h('term', 'CAST(j AS VARCHAR)', BLOOM_BITS)} AS bit
       FROM probes, js
     )
SELECT p.term, count(b.bit) = {BLOOM_HASHES} AS maybe_present
FROM probe_bits p LEFT JOIN bits b USING (bit)
GROUP BY p.term
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_cms_estimates": QuerySpec(
        fn=cms_estimates,
        oracle=_duck_cms_estimates(),
        note="Count-Min point estimates with a portable md5-salted hash "
        "family — build is one combinable aggregate, probes broadcast",
    ),
    "sketch_bloom_membership": QuerySpec(
        fn=bloom_membership,
        oracle=_duck_bloom_membership(),
        note="Bloom membership over the vocabulary, same portable hash "
        "family — deterministic, so even false positives oracle-match",
    ),
}
