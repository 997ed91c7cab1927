"""Structured Streaming over the events fixture (SURVEY.md §2.9 — the
reference is batch-only; this is the north-star streaming surface).

Every job is readStream → the SAME transformations the batch plans use →
writeStream; tests run them with ``trigger(availableNow=True)`` and
assert equality with the batch result (the Structured Streaming
correctness contract: a stream replay of a finite input must equal the
batch query over it).

Time handling: events.ts arrives as epoch-nanos long (see session.py);
streams convert to a proper timestamp column once
(``timestamp_micros(ts div 1000)``) because watermarks/windows need
TimestampType.

Scale notes: file-source streams at 100 TB are driven by maxFilesPerTrigger
(bounded state per micro-batch); watermarks bound the window state store;
session windows + dropDuplicatesWithinWatermark keep state O(active keys),
not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),  # physical fixture type; see below
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


SESSION_GAP = "30 minutes"
NS_PER_HOUR = 3_600_000_000_000


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture, normalized so ``ts``
    is epoch-nanos long (the canonical form, see sources/tables.py) no
    matter whether the fixture generation wrote TIMESTAMP(NANOS) or
    timestamp[us]. The stream schema must match the file's physical type,
    so probe it once with a driver-side batch schema read (metadata only,
    no scan)."""
    from ..sources.tables import ensure_session_confs, ts_as_nanos

    ensure_session_confs(spark)
    physical = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    stream = (
        spark.readStream.schema(_events_schema(physical))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return ts_as_nanos(stream)


def with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 10-minute watermark: the streaming
    twin of the batch events_hourly plan (hour bucket = window start)."""
    return (
        with_event_time(events)
        .withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            # exact integer µs→hour bucket (float math would lose ulps at 1e18)
            F.expr(f"unix_micros(window.start) div {NS_PER_HOUR // 1000}")
            .cast("long")
            .alias("hour_bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes."""
    return (
        with_event_time(events)
        .withWatermark("event_time", "10 minutes")
        .groupBy(F.window("event_time", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n_events",
        )
    )


def user_sessions(events: DataFrame, *, watermark: bool = True) -> DataFrame:
    """Session windows per user (gap 30 min) — the stateful operator the
    reference has no analogue for. ``watermark=False`` gives the batch
    twin (withWatermark is streaming-only)."""
    df = with_event_time(events)
    if watermark:
        df = df.withWatermark("event_time", "10 minutes")
    return (
        df.groupBy(F.session_window("event_time", SESSION_GAP), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Stateful exact dedup on event_id within the watermark."""
    return (
        with_event_time(events)
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def dedup_keys_stream(events: DataFrame) -> DataFrame:
    """Stateful dedup on a COMPOSITE key (user_id, event_type), projecting
    only the key columns — which row of a duplicate group survives depends
    on arrival order, so emitting just the keys makes the output the
    deterministic distinct-key set (batch twin: SELECT DISTINCT)."""
    return (
        with_event_time(events)
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


INTERVAL_JOIN_HOURS = 24


def click_purchase_joins(events: DataFrame) -> DataFrame:
    """Stream-stream interval self-join: each click pairs with the same
    user's purchases that land within the following 24 h. Both sides carry
    watermarks and the join condition bounds purchase_time relative to
    click_time in BOTH directions, so Spark can expire join state (state
    per side is O(watermark window), not O(history) — the required shape
    for an unbounded 100 TB stream)."""
    e = with_event_time(events)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", "1 hour")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", "1 hour")
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_time") >= F.col("click_time"))
            & (
                F.col("purchase_time")
                <= F.col("click_time")
                + F.expr(f"INTERVAL {INTERVAL_JOIN_HOURS} HOURS")
            ),
            "inner",
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.unix_micros("click_time").alias("click_us"),
            F.unix_micros("purchase_time").alias("purchase_us"),
        )
    )


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment — the standard streaming
    pattern Spark gets for free: each micro-batch joins against the
    static dim with NO streaming state (the dim is broadcast per batch;
    at scale, a slowly-changing dim is re-read per trigger). Output:
    per-(segment, event_type) running aggregate."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        # bounded: customer dim table (dimension, not corpus)
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) maintained in explicit GroupState across
    micro-batches — the escape hatch for stateful logic the built-in
    windowed aggregations cannot express (reference has no analogue;
    north-star §2.9). Emits the updated stats row per user per batch."""
    import pandas as pd

    def update(key, pdfs, state):
        n, total, mx = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
            }
        )

    return (
        with_event_time(events)
        .withWatermark("event_time", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drain a finite stream into an in-memory table (test/demo sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_index(
    spark: SparkSession, docs_stream: DataFrame, out_path: str
) -> None:
    """Streaming index maintenance: micro-batches of documents upsert
    into a postings store via foreachBatch (the Spark twin of rebuilding
    the reference's SequenceFile index incrementally).

    Each batch computes its local (term, docno, tf) and appends; readers
    aggregate tf by (term, docno) on load — an LSM-style layout that
    avoids rewriting the index per batch (at scale: compact periodically,
    bucketBy(term) on compaction)."""
    from ..functions.tokenize import tokens_col

    def upsert(batch: DataFrame, batch_id: int) -> None:
        (
            batch.select(
                F.col("doc_id").alias("docno"),
                F.explode(tokens_col(F.col("text"))).alias("term"),
            )
            .groupBy("term", "docno")
            .agg(F.count("*").alias("tf"))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        docs_stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_incremental_index(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.parquet(path)
        .groupBy("term", "docno")
        .agg(F.sum("tf").alias("tf"))
    )


def incremental_vector_ingest(
    spark: SparkSession, emb_stream: DataFrame, store_path: str
) -> None:
    """Streaming ANN-index maintenance: micro-batches of new vectors
    assign against the PERSISTED frozen codebook (never retrained per
    batch) and land under (cell, ingest=epoch) partitions of an
    existing `write_ivf_store` layout — the streaming twin of
    `append_ivf_store` (plans/similarity.py), completing the
    maintenance triad (index, dedup, vectors). EXACTLY-ONCE: the
    checkpoint replays a failed epoch with the same epoch_id, and
    dynamic partition overwrite rewrites that epoch's partitions
    instead of duplicating them (epoch+1 keeps ingest=0 reserved for
    the base build). Base partitions are never read or rewritten.
    Like the batch twin, each epoch ends with the post-commit orphan
    sweep (r7 ADVICE): deterministic assignment against the frozen
    codebook makes a replay normally land on the same cells, but a
    codebook file swapped between attempts would re-cell the epoch and
    strand the first attempt's partitions — the sweep closes that the
    same way append_ivf_store does, and ordering (sweep AFTER commit)
    carries the same crash-window argument."""
    from ..plans.similarity import (
        _ivf_cells,
        _ivf_pairs,
        sweep_orphan_ingest_partitions,
    )

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        cents = spark.read.parquet(f"{store_path}/centroids")
        # strict: a wrong-dim streamed vector fails the epoch (and the
        # checkpoint replays it) instead of silently poisoning the
        # store under the smallest cent_id (r17, same as the batch twin)
        cells = _ivf_cells(
            _ivf_pairs(batch, cents), strict=True
        ).localCheckpoint()
        (
            batch.join(cells, "vec_id")
            .withColumn("ingest", F.lit(int(epoch_id) + 1))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "ingest")
            .parquet(f"{store_path}/vectors")
        )
        written = {
            int(r.cell) for r in cells.select("cell").distinct().collect()
        }
        sweep_orphan_ingest_partitions(
            spark, store_path, int(epoch_id) + 1, written
        )

    q = (
        emb_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", f"{store_path}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # deregister promptly: Spark 4's checkpoint-in-use guard flags a
        # follow-up resume as "multiple queries concurrently using" the
        # location if the drained query lingers in streams.active
        q.stop()


def incremental_near_dups(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    *,
    checkpoint_path: str | None = None,
) -> None:
    """Streaming near-dup maintenance: each micro-batch of documents is
    shingled and MinHash-banded, PROBED against the persisted band
    store (within-batch self-probe included), verified with exact
    Jaccard against the persisted shingle store, and then appended to
    the store — the streaming twin of plans/dedup.py's
    dedup_incremental_minhash, where the "increment" is a micro-batch.

    Discovered pairs land in <store>/pairs; bands and shingles
    accumulate in <store>/bands and <store>/shingles (LSM-style
    batch=<id> partitions, one per micro-batch — each batch overwrites
    only its own partition, so a replayed batch is idempotent).
    A pair is discovered exactly once —
    in the first batch where both members exist (probe side is always
    the batch; store-store pairs never re-form) — so the accumulated
    pair set equals the one-shot batch LSH answer in ANY delivery
    order. Scale: per batch the
    probe broadcasts the batch-sized band/candidate relations; the
    stored corpus index is only ever scanned, never reshuffled — and
    the exact-verify stage scans the shingle store ONCE, restricted to
    the candidate doc ids (r12; it previously aggregated the whole
    store's shingle counts every batch, an O(corpus)-per-ingest cost
    no 100 TB maintenance job could pay)."""
    import os

    from ..functions.tokenize import filter_stopwords, kgrams_col, tokens_col
    from ..plans.dedup import (
        JACCARD_THRESHOLD,
        _bands,
        _signatures_of,
    )

    bands_p = os.path.join(store_path, "bands")
    sh_p = os.path.join(store_path, "shingles")
    pairs_p = os.path.join(store_path, "pairs")

    def probe_and_append(batch: DataFrame, batch_id: int) -> None:
        # a micro-batch arrives as one file -> one input split; spread
        # it before the tokenizer or the whole shingle pass runs on a
        # single core (the same single-split hazard as replicated
        # fixture reads — see bench.py's index build)
        batch = batch.repartition(spark.sparkContext.defaultParallelism)
        sh_b = (
            batch.select(
                "doc_id",
                F.explode(
                    kgrams_col(
                        filter_stopwords(
                            tokens_col(F.col("text"), stopworded=False)
                        ),
                        3,
                    )
                ).alias("shingle"),
            )
            .distinct()
            .localCheckpoint()  # shingles feed 4 consumers below
        )
        bands_b = _bands(_signatures_of(sh_b))
        # store detection goes through the Hadoop FileSystem resolved
        # from the path's own scheme, not driver-local os.path — on
        # HDFS/S3 store paths a local-FS check is always false and every
        # batch would silently skip probing the accumulated index
        # (ADVICE r4)
        jpath = spark._jvm.org.apache.hadoop.fs.Path(bands_p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        have_store = fs.exists(jpath)
        if have_store:
            # exclude the CURRENT batch's partition: after a mid-batch
            # crash the store may hold this batch's partially-committed
            # output, and replaying against it would double-count the
            # batch's own shingles in the size lookups (wrong Jaccard).
            # Committed batches are strictly smaller ids.
            prev = F.col("batch") < batch_id
            bands_all = bands_b.unionByName(
                spark.read.parquet(bands_p)
                .where(prev)
                .select("doc_id", "band_key")
            )
            sh_all = sh_b.unionByName(
                spark.read.parquet(sh_p).where(prev).select("doc_id", "shingle")
            )
        else:
            bands_all, sh_all = bands_b, sh_b
        cand = (
            # bounded: probe side is the micro-batch's own bands
            F.broadcast(
                bands_b.select(
                    F.col("doc_id").alias("probe_doc"), "band_key"
                )
            )
            .join(bands_all, "band_key")
            .filter(F.col("doc_id") != F.col("probe_doc"))
            .select(
                F.least("probe_doc", "doc_id").alias("doc_a"),
                F.greatest("probe_doc", "doc_id").alias("doc_b"),
            )
            .distinct()
            # every candidate has >=1 batch member (the probe side is
            # bands_b) and store-store pairs never appear, so each pair
            # is discovered in exactly one batch — the first where both
            # members exist — regardless of delivery order
            .cache()  # collision residue, reused by the verify probe
            # and the doc-id restriction below; unpersisted post-write
        )
        cand_docs = cand.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        ).distinct()
        # Exact-verify reads ONLY the candidate docs' shingles (r12):
        # sizes/a/b previously scanned the FULL accumulated shingle
        # store three times per batch — O(corpus) per ingest batch, the
        # one scale-killer this job still carried. The collision
        # residue is batch-bounded, so the store scan restricts to its
        # doc ids (value-identical: every downstream join keys on
        # cand's doc ids) and caches for its three readers.
        sh_cand = sh_all.join(
            # bounded: distinct doc ids of the batch collision residue
            F.broadcast(cand_docs),
            "doc_id",
        ).cache()
        try:
            _verify_and_write(
                spark, cand, sh_cand, bands_b, sh_b, batch_id,
                pairs_p, bands_p, sh_p,
            )
        finally:
            # release the batch residue even when a mid-batch write
            # fails (r12 ADVICE) — the replayed batch re-caches its own
            cand.unpersist()
            sh_cand.unpersist()

    def _verify_and_write(
        spark, cand, sh_cand, bands_b, sh_b, batch_id, pairs_p, bands_p, sh_p
    ):
        sizes = sh_cand.groupBy("doc_id").agg(F.count("*").alias("n"))
        a = sh_cand.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh_cand.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            # bounded: cand is the batch-probe collision residue
            F.broadcast(cand)
            .join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
        na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
        nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
        pairs = (
            inter.join(na, "doc_a")
            .join(nb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("n_inter")
                    / (
                        F.col("n_a") + F.col("n_b") - F.col("n_inter")
                    ).cast("double"),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        )
        # batch-sized writes: coalesce so the store stays a few files
        # per batch instead of spraying 32 shards each (the store is
        # re-read every subsequent batch; at cluster scale size the
        # coalesce to the increment's real volume). Each batch OVERWRITES
        # its own batch=<id> partition instead of appending to a flat
        # dir: replaying a killed half-committed batch rewrites exactly
        # its own partition, which together with the `batch < batch_id`
        # store-read filter above makes the foreachBatch idempotent by
        # batch id — the exactly-once contract, not just at-least-once.
        pairs.coalesce(1).write.mode("overwrite").parquet(
            f"{pairs_p}/batch={batch_id}"
        )
        bands_b.coalesce(2).write.mode("overwrite").parquet(
            f"{bands_p}/batch={batch_id}"
        )
        sh_b.coalesce(2).write.mode("overwrite").parquet(
            f"{sh_p}/batch={batch_id}"
        )

    # ``checkpoint_path`` makes the maintenance restartable: a killed
    # job resumes at the first uncommitted batch, and because every
    # batch (re)writes only its own batch=<id> store partition and the
    # probe reads only strictly-earlier partitions, a replayed
    # half-committed batch converges to the same store — exactly-once,
    # including mid-batch kills (tested in tests/test_streaming.py::
    # test_near_dup_store_checkpoint_resume, which also replays a batch
    # by deleting its checkpoint commit marker)
    writer = docs_stream.writeStream.foreachBatch(probe_and_append)
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
