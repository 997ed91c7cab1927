"""End-to-end reference parity (SURVEY.md §5): TREC XML file → fidelity
(stemmed) index → fixed query workload → top-10 under both df modes —
the full pipeline a reference user would run, through every layer of
this engine (source, tokenizer UDF, index build, scoring)."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.functions.fidelity import (
    tokenize_text,
)
from simple_mapreduce_search_engine_information_retrieval__spark.functions.fidelity import (
    tokenize_udf,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.trec import (
    read_trec,
    write_trec_fixture,
)


def _python_reference_scores(docs: dict[str, str], query: str, df_mode: str):
    """Pure-Python model of the reference pipeline (tokenize → tf → df →
    mixed-log tf-idf), independent of any Spark code path."""
    index: dict[str, dict[str, int]] = {}
    for docid, text in docs.items():
        for t in tokenize_text(text):
            index.setdefault(t, {}).setdefault(docid, 0)
            index[t][docid] += 1
    n = len(docs)
    scores: dict[str, float] = {}
    for term in set(tokenize_text(query)):
        postings = index.get(term, {})
        df = 1 if df_mode == "compat_df1" else len(postings)
        for docid, tf in postings.items():
            scores[docid] = scores.get(docid, 0.0) + (
                (1 + math.log(tf)) * math.log10(n / df)
            )
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), int(kv[0])))
    return [(int(d), round(s, 6)) for d, s in ranked[:10]]


def test_trec_to_stemmed_search_both_df_modes(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        path = write_trec_fixture(spark, sf_dir, f"{tmp}/corpus.trec")
        docs_df = read_trec(spark, path)
        docs = {r.doc_id: r.text for r in docs_df.collect()}

        post = (
            docs_df.select(
                F.col("doc_id").cast("long").alias("docno"),
                F.explode(tokenize_udf(F.col("text"))).alias("term"),
            )
            .groupBy("term", "docno")
            .agg(F.count("*").alias("tf"))
            .cache()
        )
        stats = post.groupBy("term").agg(F.count("*").alias("df"))
        n_docs = docs_df.count()

        for df_mode in ("correct", "compat_df1"):
            for query in ("merges sorting", "vectors", "the windows"):
                terms = sorted(set(tokenize_text(query)))
                qdf = spark.createDataFrame([(t,) for t in terms], "term string")
                df_expr = (
                    F.lit(1) if df_mode == "compat_df1" else F.col("df")
                )
                contrib = (1 + F.log(F.col("tf"))) * F.log10(
                    F.lit(n_docs) / df_expr
                )
                got = [
                    (r.docno, r.score)
                    for r in (
                        post.join(F.broadcast(qdf), "term")
                        .join(F.broadcast(stats), "term")
                        .groupBy("docno")
                        .agg(F.round(F.sum(contrib), 6).alias("score"))
                        .orderBy(F.desc("score"), F.asc("docno"))
                        .limit(10)
                        .collect()
                    )
                ]
                want = _python_reference_scores(docs, query, df_mode)
                assert got == want, (df_mode, query, got[:3], want[:3])
