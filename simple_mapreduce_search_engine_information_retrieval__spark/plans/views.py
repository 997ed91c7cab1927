"""SQL surface (SURVEY.md Phase 4): register the engine's derived tables
as temp views so every query the reference REPL could answer — and all
the relational extensions — are expressible in plain Spark SQL.

    register_engine_views(spark, sf_dir)
    spark.sql("SELECT * FROM inverted_index WHERE term = 'spark'")
    spark.sql(SEARCH_SQL_TEMPLATE.format(terms="'spark','join'", top_k=10))
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.tables import register_views
from .indexing import (
    chargram_flat,
    corpus_stats,
    docno_mapping,
    postings_arrays,
    postings_flat,
    term_stats,
)


def register_engine_views(spark: SparkSession, sf_dir: str, *, k: int = 1) -> None:
    register_views(spark, sf_dir)
    postings_flat(spark, sf_dir, k).createOrReplaceTempView("inverted_index")
    postings_arrays(spark, sf_dir, k).createOrReplaceTempView("inverted_index_arrays")
    term_stats(spark, sf_dir, k).createOrReplaceTempView("term_stats")
    chargram_flat(spark, sf_dir, 3).createOrReplaceTempView("chargram_index")
    docno_mapping(spark, sf_dir).createOrReplaceTempView("docno_map")
    corpus_stats(spark, sf_dir).createOrReplaceTempView("corpus_stats")


SEARCH_SQL_TEMPLATE = """
SELECT p.docno,
       round(sum((1 + ln(p.tf)) * log10(c.n_docs / s.df)), 6) AS score
FROM inverted_index p
JOIN term_stats s USING (term)
CROSS JOIN corpus_stats c
WHERE p.term IN ({terms})
GROUP BY p.docno
ORDER BY score DESC, p.docno
LIMIT {top_k}
"""
