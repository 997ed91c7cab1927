"""CDC-style MERGE (upsert) — the batch-ingestion primitive.

Spark SQL has no MERGE INTO without a table format (Delta/Iceberg); the
engine-level shape behind every such MERGE is exactly this: full-outer
join of base and change-set on the key, change columns coalesced over
base columns, each row tagged insert/update/keep. This module runs that
shape as an oracle-checked query over a deterministic change-set derived
from the documents table itself (updates = every 7th doc rewritten,
inserts = every 13th doc re-keyed above UPSERT_OFFSET), then folds the
merged relation into a per-op audit profile (row counts, key ranges,
char totals, min/max content md5) so the driver hash pins both the merge
logic AND the merged payloads.

Scale: ONE shuffle on the merge key — or zero when base and changes are
co-bucketed on it (plans/index_store.py discipline); AQE splits skewed
keys. The change-set is usually << base, so the planner broadcasts it
when small — no hint needed (round-3 lesson: never hint a relation whose
cardinality scales with the corpus). The audit rollup is
five-group-tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table
from . import QuerySpec

UPSERT_OFFSET = 100_000_000  # insert keys live far above any fixture doc_id


def _change_set(base: DataFrame) -> DataFrame:
    """Deterministic CDC batch: rewrites for doc_id % 7 == 0, brand-new
    rows (re-keyed above UPSERT_OFFSET) for doc_id % 13 == 0."""
    updates = base.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.upper(F.substring("text", 1, 80)).alias("c_text")
    )
    inserts = base.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + UPSERT_OFFSET).alias("doc_id"),
        F.concat(F.lit("NEW "), F.substring("text", 1, 40)).alias("c_text"),
    )
    return updates.unionByName(inserts)


def merge_upsert_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    merged = base.join(_change_set(base), "doc_id", "full_outer")
    op = (
        F.when(F.col("text").isNull(), F.lit("insert"))
        .when(F.col("c_text").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    rows = merged.select(
        "doc_id",
        op.alias("op"),
        F.coalesce("c_text", "text").alias("text"),
    )
    return rows.groupBy("op").agg(
        F.count("*").alias("n_rows"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min(F.md5("text")).alias("min_md5"),
        F.max(F.md5("text")).alias("max_md5"),
    )


DUCK_MERGE_UPSERT = f"""
WITH base AS (SELECT doc_id, text FROM documents),
ch AS (
  SELECT doc_id, upper(substring(text, 1, 80)) AS c_text
  FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {UPSERT_OFFSET} AS doc_id,
         'NEW ' || substring(text, 1, 40) AS c_text
  FROM base WHERE doc_id % 13 = 0
),
merged AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'insert'
              WHEN c.doc_id IS NULL THEN 'keep'
              ELSE 'update' END AS op,
         COALESCE(c.c_text, b.text) AS text
  FROM base b FULL OUTER JOIN ch c ON c.doc_id = b.doc_id
)
SELECT op, count(*) AS n_rows, min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
FROM merged GROUP BY op
"""


QUERIES: dict[str, QuerySpec] = {
    "merge_upsert_documents": QuerySpec(
        fn=merge_upsert_documents,
        oracle=DUCK_MERGE_UPSERT,
        note="CDC MERGE shape (full-outer coalesce + op tagging) with a "
        "content-pinned audit rollup",
    ),
}
