"""Driver-checked multimodal queries.

The media table is derived deterministically from the documents fixture
(media_id = doc_id, size from doc_id arithmetic, payload from the fake
codec), so the ENTIRE binary round-trip — encode kernel -> Spark binary
column -> Arrow batch -> decode kernel -> numeric features — is
oracle-checkable: DuckDB recomputes the expected features from the same
doc_id arithmetic without ever touching bytes.

Scale shape (operators/multimodal.py): payloads stay out of shuffles
(features extracted via mapInPandas before any wide op), metadata-only
queries never read the payload column (columnar pruning — asserted in
tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    extract_features,
    media_stats,
    perceptual_hashes,
    sample_frames,
)
from ..sources.tables import table
from . import QuerySpec

# sizes derived from the id so every engine can recompute them
_W = "(8 + doc_id % 5)"
_H = "(6 + doc_id % 3)"


def media_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fake image per fixture doc: payload encoded in an
    Arrow-batched kernel (binary construction is Python-side by nature —
    this is the ingest/encode stage of a media pipeline)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 5, 6 + d % 3
                rows.append(
                    {
                        "media_id": d,
                        "kind": "image",
                        "format": "fake",
                        "payload": encode_fake_image(d, w, h),
                        "width": w,
                        "height": h,
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    # deliberately NOT repartitioned (r17, measured): widening the
    # encode chain to cluster parallelism looked right on paper
    # (guide §2.5) but each of these lines chains TWO Python stages, so
    # 32-way width needs 64 simultaneous workers — and Spark reaps idle
    # Python workers after a hardcoded 1 minute, so mid-workload the
    # line pays a 64-fork+import storm that dwarfs the kernel (bench:
    # family total 3.7 s -> 14.6 s with the repartition). At fixture
    # scale the narrow chain is already sub-second; a real media ingest
    # arrives as many splits and gets its width from the scan.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(kernel, MEDIA_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_from_docs(spark, sf_dir))


# body[i] = (media_id + i) % 251 for i in range(w*h) — recomputed in SQL
DUCK_MULTIMODAL_FEATURES = f"""
WITH m AS (SELECT doc_id AS media_id, {_W} AS w, {_H} AS h FROM documents)
SELECT media_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       round(list_aggregate(
           list_transform(range(0, w * h), i -> CAST((media_id + i) % 251 AS DOUBLE)),
           'avg'), 6) AS mean_px,
       CAST(list_aggregate(
           list_transform(range(0, w * h), i -> (media_id + i) % 251),
           'max') AS BIGINT) AS max_px,
       CAST(w * h AS BIGINT) AS n_bytes
FROM m
"""


def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats(media_from_docs(spark, sf_dir))


DUCK_MULTIMODAL_STATS = f"""
SELECT 'image' AS kind, 'fake' AS format, count(*) AS n,
       CAST(sum({_W} * {_H}) AS BIGINT) AS total_px
FROM documents
"""


# video geometry from the id so every engine can recompute it
_NF = "(2 + doc_id % 4)"


def video_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fake video per fixture doc (same w/h family as the images,
    2-5 frames)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, n = 8 + d % 5, 6 + d % 3, 2 + d % 4
                rows.append(
                    {
                        "media_id": d,
                        "kind": "video",
                        "format": "fake",
                        "payload": encode_fake_video(d, w, h, n),
                        "width": w,
                        "height": h,
                        "n_frames": n,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    # deliberately NOT repartitioned (r17, measured): widening the
    # encode chain to cluster parallelism looked right on paper
    # (guide §2.5) but each of these lines chains TWO Python stages, so
    # 32-way width needs 64 simultaneous workers — and Spark reaps idle
    # Python workers after a hardcoded 1 minute, so mid-workload the
    # line pays a 64-fork+import storm that dwarfs the kernel (bench:
    # family total 3.7 s -> 14.6 s with the repartition). At fixture
    # scale the narrow chain is already sub-second; a real media ingest
    # arrives as many splits and gets its width from the scan.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(kernel, MEDIA_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(video_from_docs(spark, sf_dir), every_k=2)


# frame f pixel i = (media_id + 7*f + i) % 251, frames 0, 2, 4, ...
DUCK_MULTIMODAL_FRAME_SAMPLE = f"""
WITH m AS (SELECT doc_id AS media_id, {_W} AS w, {_H} AS h, {_NF} AS n
           FROM documents),
f AS (SELECT media_id, w, h, unnest(range(0, n, 2)) AS frame_no FROM m)
SELECT media_id,
       CAST(frame_no AS BIGINT) AS frame_no,
       round(list_aggregate(
           list_transform(range(0, w * h),
                          i -> CAST((media_id + 7 * frame_no + i) % 251 AS DOUBLE)),
           'avg'), 6) AS mean_px,
       CAST(list_aggregate(
           list_transform(range(0, w * h),
                          i -> (media_id + 7 * frame_no + i) % 251),
           'max') AS BIGINT) AS max_px
FROM f
"""


# audio geometry from the id: rate in {8k, 12k, 16k}, 1000-1499 samples
_RATE = "(8000 + (doc_id % 3) * 4000)"
_NSAMP = "(1000 + doc_id % 500)"


def audio_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fake audio clip per fixture doc."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MEDIA_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                rate, n = 8000 + (d % 3) * 4000, 1000 + d % 500
                rows.append(
                    {
                        "media_id": d,
                        "kind": "audio",
                        "format": "fake",
                        "payload": encode_fake_audio(d, rate, n),
                        "width": 0,
                        "height": 0,
                        "n_frames": n,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    # deliberately NOT repartitioned (r17, measured): widening the
    # encode chain to cluster parallelism looked right on paper
    # (guide §2.5) but each of these lines chains TWO Python stages, so
    # 32-way width needs 64 simultaneous workers — and Spark reaps idle
    # Python workers after a hardcoded 1 minute, so mid-workload the
    # line pays a 64-fork+import storm that dwarfs the kernel (bench:
    # family total 3.7 s -> 14.6 s with the repartition). At fixture
    # scale the narrow chain is already sub-second; a real media ingest
    # arrives as many splits and gets its width from the scan.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(kernel, MEDIA_SCHEMA)


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(audio_from_docs(spark, sf_dir))


# sample i = (media_id*13 + i) % 256 - 128 — recomputed in SQL
DUCK_MULTIMODAL_AUDIO = f"""
WITH m AS (SELECT doc_id AS media_id, {_RATE} AS rate, {_NSAMP} AS n
           FROM documents)
SELECT media_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT)    AS n_samples,
       CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
       round(sqrt(list_aggregate(
           list_transform(range(0, n),
                          i -> pow(CAST((media_id * 13 + i) % 256 - 128 AS DOUBLE), 2)),
           'sum') / n), 6) AS rms,
       CAST(list_aggregate(
           list_transform(range(0, n), i -> abs((media_id * 13 + i) % 256 - 128)),
           'max') AS BIGINT) AS peak
FROM m
"""


def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(phash, n_images, min_media_id): aHash buckets over the media
    table — the image-dedup analogue of the text fingerprint groups.
    Decode + hash run in the kernel (payload never shuffles); the
    bucket aggregation moves 16-bit hashes only."""
    hashes = perceptual_hashes(media_from_docs(spark, sf_dir))
    return hashes.groupBy("phash").agg(
        F.count("*").alias("n_images"),
        F.min("media_id").alias("min_media_id"),
    )


# the oracle recomputes the aHash from id arithmetic: pixel j of image
# media_id is (media_id + j) % 251; bit i samples the nearest-neighbor
# pixel of the 4x4 grid and compares px * n > sum(px) in pure integers
DUCK_MULTIMODAL_PHASH = f"""
WITH m AS (SELECT doc_id AS media_id, {_W} AS w, {_H} AS h FROM documents),
px AS (SELECT media_id, w, h,
              list_transform(range(0, w * h),
                             j -> (media_id + j) % 251) AS body
       FROM m),
hs AS (SELECT media_id,
              CAST(list_aggregate(list_transform(range(0, 16), i ->
                CASE WHEN body[(((i // 4) * h) // 4) * w
                              + (((i % 4) * w) // 4) + 1] * (w * h)
                          > list_aggregate(body, 'sum')
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END), 'sum')
                   AS BIGINT) AS phash
       FROM px)
SELECT phash, count(*) AS n_images, min(media_id) AS min_media_id
FROM hs GROUP BY phash
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_phash_clusters": QuerySpec(
        fn=multimodal_phash_clusters,
        oracle=DUCK_MULTIMODAL_PHASH,
        note="perceptual-hash (aHash) image-dedup buckets: integer-exact "
        "bit derivation, hashes shuffle but payloads never do",
    ),
    "multimodal_audio_features": QuerySpec(
        fn=multimodal_audio_features,
        oracle=DUCK_MULTIMODAL_AUDIO,
        note="audio waveform-feature kernel (decode → duration/RMS/peak); "
        "oracle recomputes from id arithmetic",
    ),
    "multimodal_features": QuerySpec(
        fn=multimodal_features,
        oracle=DUCK_MULTIMODAL_FEATURES,
        note="binary payload round-trip (encode kernel -> mapInPandas "
        "decode -> features); oracle recomputes features from id "
        "arithmetic — checks schema, batching and codec end-to-end",
    ),
    "multimodal_stats": QuerySpec(
        fn=multimodal_stats,
        oracle=DUCK_MULTIMODAL_STATS,
        note="metadata-only media aggregate — payload column must be "
        "pruned from the scan (asserted in tests/test_multimodal.py)",
    ),
    "multimodal_frame_sample": QuerySpec(
        fn=multimodal_frame_sample,
        oracle=DUCK_MULTIMODAL_FRAME_SAMPLE,
        note="video frame-sampling kernel (decode → every-2nd-frame → "
        "per-frame features); oracle recomputes sampled-frame stats "
        "from id arithmetic",
    ),
}
