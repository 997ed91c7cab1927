"""Approximate/sketch operators (SURVEY §2.4 'free in Spark'): bounded
error vs exact, plus the streaming rate source smoke (§2.9 sources)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import table


def test_approx_count_distinct_bounds(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_vs_exact(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10_000)
    ).collect()[0][0]
    exact = li.selectExpr("median(l_extendedprice)").collect()[0][0]
    assert abs(approx - exact) / exact < 0.02


def test_rate_source_smoke(spark):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .withColumn("bucket", F.col("value") % 10)
        .groupBy("bucket")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        rows = 0
        while time.time() < deadline:
            rows = spark.table("rate_smoke").count()
            if rows > 0:
                break
            time.sleep(1)
        assert rows > 0
    finally:
        q.stop()


def test_repl_scriptable(spark, sf_dir, monkeypatch, capsys):
    import io

    from simple_mapreduce_search_engine_information_retrieval__spark import repl

    monkeypatch.setattr("sys.stdin", io.StringIO("spark join\nthree word query\n\n"))
    rc = repl.main([sf_dir])
    out = capsys.readouterr().out
    assert rc == 0
    assert "doc" in out and "score" in out
    assert "1-2 words" in out  # 3-word warning, not termination


def test_term_bloom_filter_membership(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.operators.sketches import (
        term_bloom_filter,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
        postings_flat,
    )

    post = postings_flat(spark, sf_dir, 1)
    bf = term_bloom_filter(post, expected=100_000, fpp=0.01)
    vocab = [r.term for r in post.select("term").distinct().collect()]
    assert all(bf.might_contain(t) for t in vocab)  # no false negatives
    misses = sum(bf.might_contain(f"zz-missing-{i}") for i in range(1000))
    assert misses < 50  # fpp holds loosely


def test_docno_count_min_estimates(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.operators.sketches import (
        docno_count_min,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
        postings_flat,
    )
    from pyspark.sql import functions as F

    post = postings_flat(spark, sf_dir, 1)
    cms = docno_count_min(post)
    truth = {
        r.docno: r.n
        for r in post.groupBy("docno").agg(F.count("*").alias("n")).limit(20).collect()
    }
    for docno, n in truth.items():
        est = cms.estimate(docno)
        assert est >= n  # CMS never underestimates
        assert est <= n + 0.01 * post.count()  # eps bound (loose)
