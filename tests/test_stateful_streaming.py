from __future__ import annotations

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import table
from simple_mapreduce_search_engine_information_retrieval__spark.streaming import jobs


def test_apply_in_pandas_with_state_matches_batch(spark, sf_dir):
    stream = jobs.user_running_stats(jobs.read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final state per user (last emitted row) must equal the batch agg
    got_df = spark.table("user_stats_stream")
    got = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in got_df.orderBy("n_events").collect()  # later rows overwrite
    }
    want = {
        r.user_id: (r.n, round(r.s, 2), r.m)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u, (n, s, m) in want.items():
        gn, gs, gm = got[u]
        assert gn == n and gm == m
        assert abs(gs - s) < 0.02  # running float sum vs agg sum, both 2dp
