"""Structured Streaming correctness: a finite stream replay must equal
the batch query over the same data."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import table
from simple_mapreduce_search_engine_information_retrieval__spark.streaming import jobs


def _collect_sorted(df, cols):
    return sorted([tuple(r) for r in df.select(*cols).collect()])


def test_hourly_counts_stream_equals_batch(spark, sf_dir):
    stream = jobs.hourly_counts(jobs.read_events_stream(spark, sf_dir))
    jobs.run_to_memory(stream, "hourly_stream")
    got = spark.table("hourly_stream")
    want = jobs.hourly_counts(table(spark, sf_dir, "events"))
    cols = ["hour_bucket", "event_type", "n_events", "total_value"]
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)


def test_sessions_stream_equals_batch(spark, sf_dir):
    stream = jobs.user_sessions(jobs.read_events_stream(spark, sf_dir))
    jobs.run_to_memory(stream, "sessions_stream")
    got = spark.table("sessions_stream")
    want = jobs.user_sessions(table(spark, sf_dir, "events"), watermark=False)
    cols = ["user_id", "session_start_us", "n_events", "total_value"]
    assert _collect_sorted(got, cols) == _collect_sorted(want, cols)


def test_dedup_stream(spark, sf_dir):
    stream = jobs.dedup_stream(jobs.read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream")
    n = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_incremental_index_equals_batch(spark, sf_dir):
    from simple_mapreduce_search_engine_information_retrieval__spark.plans.indexing import (
        postings_flat,
    )
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    docs_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs_stream = (
            spark.readStream.schema(docs_schema)
            .option("pathGlobFilter", "documents.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(sf_dir)
        )
        jobs.incremental_index(spark, docs_stream, f"{tmp}/index")
        got = jobs.read_incremental_index(spark, f"{tmp}/index")
        want = postings_flat(spark, sf_dir, 1)
        assert (
            got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0
        )


def test_parquet_sink_checkpoint_exactly_once(spark, sf_dir):
    """Durable-sink surface: a checkpointed parquet-sink stream drained
    with availableNow, then RESTARTED from the same checkpoint, must not
    re-emit rows (the file source+sink exactly-once contract a 100 TB
    pipeline relies on across restarts)."""
    import tempfile

    from simple_mapreduce_search_engine_information_retrieval__spark.streaming.jobs import (
        read_events_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"

        def run_once():
            q = (
                read_events_stream(spark, sf_dir)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        n1 = spark.read.parquet(out).count()
        run_once()  # restart: checkpoint marks the input processed
        n2 = spark.read.parquet(out).count()
        want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert n1 == n2 == want


def test_near_dup_store_checkpoint_resume(spark, sf_dir):
    """Kill-and-resume contract for the streaming LSH maintenance
    (VERDICT r5 directive #6): drain part of the corpus, 'die', resume
    from the checkpoint with the remaining files, then restart once more
    with nothing new — the accumulated pair store must equal the
    one-shot batch LSH answer exactly, with no re-applied appends."""
    import os
    import shutil
    import tempfile

    from simple_mapreduce_search_engine_information_retrieval__spark.plans.dedup import (
        minhash_near_dups,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.sources.tables import (
        table,
    )
    from simple_mapreduce_search_engine_information_retrieval__spark.streaming.jobs import (
        incremental_near_dups,
    )

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        staged, watched = f"{tmp}/staged", f"{tmp}/watched"
        store, ckpt = f"{tmp}/store", f"{tmp}/ckpt"
        (
            table(spark, sf_dir, "documents")
            .repartitionByRange(4, "doc_id")
            .write.parquet(staged)
        )
        parts = sorted(
            f for f in os.listdir(staged) if f.endswith(".parquet")
        )
        assert len(parts) == 4
        os.makedirs(watched)

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(watched)
            )
            incremental_near_dups(
                spark, stream, store, checkpoint_path=ckpt
            )

        def pairs_df():
            return spark.read.parquet(f"{store}/pairs").select(
                "doc_a", "doc_b", "jaccard"
            )

        # batches 1-2 land, then the job "dies"
        for f in parts[:2]:
            shutil.copy(f"{staged}/{f}", f"{watched}/{f}")
        run()
        # resume from the checkpoint with the late-arriving files
        for f in parts[2:]:
            shutil.copy(f"{staged}/{f}", f"{watched}/{f}")
        run()
        # pure restart with nothing new: must change nothing
        n_before = pairs_df().count()
        run()
        assert pairs_df().count() == n_before
        # MID-BATCH kill: forge the crash window where the last batch's
        # store partitions are written but its checkpoint commit marker
        # is not — delete the marker so resume REPLAYS that batch over
        # its own half/fully-committed output. Batch-scoped overwrite +
        # the batch< filter must make the replay idempotent.
        commits = sorted(
            f
            for f in os.listdir(f"{ckpt}/commits")
            if not f.startswith(".")
        )
        os.remove(f"{ckpt}/commits/{commits[-1]}")
        crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # Hadoop local-FS shadow
        if os.path.exists(crc):
            os.remove(crc)
        run()
        got = pairs_df()
        assert got.count() == n_before
        want = minhash_near_dups(spark, sf_dir)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
