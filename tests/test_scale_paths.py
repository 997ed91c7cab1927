"""The 100 TB alternates must equal their simple formulations and show
the right plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
    postings_arrays,
    postings_arrays_salted,
)
from simple_mapreduce_search_engine_information_retrieval__spark.plans.similarity import (
    QUERY_VEC_ID,
    knn_ivf_bucketed,
    query_ivf_store,
    write_ivf_store,
)
from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import table


def test_salted_arrays_equal_plain(spark, sf_dir):
    plain = postings_arrays(spark, sf_dir, 1)
    salted = postings_arrays_salted(spark, sf_dir, 1)
    a = {(r.term, r.df, tuple((p.tf, p.docno) for p in r.postings)) for r in plain.collect()}
    b = {(r.term, r.df, tuple((p.tf, p.docno) for p in r.postings)) for r in salted.collect()}
    assert a == b


def test_ivf_store_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_store(spark, sf_dir, path)
    emb = table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    qvec = list(qrow.embedding)
    df = query_ivf_store(spark, path, qvec)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.{0,200}", plan)
    assert m and "cell" in m.group(0), plan[:2000]
    # pruned path must agree with the in-memory multi-probe IVF query
    # modulo the self-vector which the in-memory variant excludes
    got = {r.vec_id: r.cos for r in df.collect() if r.vec_id != QUERY_VEC_ID}
    want = {r.vec_id: r.cos for r in knn_ivf_bucketed(spark, sf_dir).collect()}
    for vid, cos in want.items():
        if vid in got:
            assert got[vid] == cos
    assert len(set(got) & set(want)) >= len(want) - 1


def test_sharded_unsplittable_sources_layout(spark, sf_dir):
    """The r8 sharded-ingest contract for unsplittable formats: the
    sharded writes produce SOURCE_SHARDS shard files, and on re-read no
    file is ever split across partitions (gzip/multiLine are stream-
    per-file; Spark may PACK small files together, the benign
    direction). Parallelism at 100 TB therefore = shard count."""
    import os

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.sinks_sources import (
        SOURCE_SHARDS,
        _out_path,
        csv_documents_sharded_roundtrip,
        trec_gzip_sharded_roundtrip,
    )

    n_docs = table(spark, sf_dir, "documents").count()

    # --- gzip TREC shards
    df = trec_gzip_sharded_roundtrip(spark, sf_dir)
    gz_dir = _out_path("trec_gz_shards", sf_dir)
    gz_files = [f for f in os.listdir(gz_dir) if f.endswith(".gz")]
    assert len(gz_files) == SOURCE_SHARDS
    assert df.count() == n_docs
    raw = spark.read.text(gz_dir, lineSep="</DOC>")
    placement = (
        raw.select(
            F.input_file_name().alias("f"), F.spark_partition_id().alias("p")
        )
        .groupBy("f")
        .agg(F.count_distinct("p").alias("np"))
        .collect()
    )
    assert placement and all(r["np"] == 1 for r in placement)

    # --- sharded CSV
    df = csv_documents_sharded_roundtrip(spark, sf_dir)
    csv_dir = _out_path("csv_docs_sharded", sf_dir)
    csv_files = [f for f in os.listdir(csv_dir) if f.endswith(".csv")]
    assert len(csv_files) == SOURCE_SHARDS
    assert df.count() == n_docs
    placement = (
        df.select(
            F.input_file_name().alias("f"), F.spark_partition_id().alias("p")
        )
        .groupBy("f")
        .agg(F.count_distinct("p").alias("np"))
        .collect()
    )
    assert placement and all(r["np"] == 1 for r in placement)
