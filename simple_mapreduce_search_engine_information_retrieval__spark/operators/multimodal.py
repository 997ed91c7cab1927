"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
kernel signatures — is real and tested. Codecs are layered behind a
feature probe at each decode site:

1. the deterministic FAKE codec (oracle path — every engine can
   recompute its stats, so driver checks stay portable);
2. real libraries when installed (PIL for images, soundfile for audio,
   pyav for video — probed with try-import, absent in this container);
3. stdlib fallbacks where the format allows: grayscale non-interlaced
   PNG decodes via zlib (the PNG spec's DEFLATE + per-scanline filters),
   PCM WAV via the stdlib ``wave`` module — both real formats, tested
   in-container without any third-party codec;
4. anything else raises ``NotImplementedError`` at the disclosed
   plug-in point.

Scale notes (100 TB of media):
- payloads dominate row size → keep them OUT of shuffles: derive features
  first (mapInPandas, narrow), shuffle only the small feature columns;
- maxPartitionBytes governs rows-per-task for fat binary rows; the
  kernels are per-batch vectorized and never hold more than one Arrow
  batch of payloads in memory;
- metadata lives in plain columns so Catalyst prunes/pushes down without
  touching bytes (a scan counting JPEGs must not read payloads — columnar
  Parquet gives that for free).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),  # fake | jpeg | png | wav | mp4
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)

_MAGIC = b"FAKE"


def encode_fake_image(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake codec: FAKE | w | h | w*h bytes of a fixed
    pattern. Stands in for a real encoder so plumbing tests have bytes
    whose decoded stats are predictable."""
    body = bytes(((media_id + i) % 251) for i in range(width * height))
    return _MAGIC + struct.pack("<II", width, height) + body


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """A small deterministic media table for tests/demos."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 5), 6 + (i % 3)
        rows.append((i, "image", "fake", encode_fake_image(i, w, h), w, h, 1))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_stdlib(payload: bytes) -> tuple[int, int, bytes]:
    """Minimal real PNG decoder (public spec, stdlib only): 8-bit
    grayscale, non-interlaced. Chunk walk → concatenated IDAT → zlib
    inflate → per-scanline unfilter (all five spec filter types; for
    grayscale bpp=1 so 'left' is the previous byte)."""
    import zlib

    pos, width, height, idat = len(_PNG_SIG), None, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or color_type != 0 or interlace != 0:
                raise NotImplementedError(
                    "stdlib PNG fallback handles 8-bit grayscale "
                    "non-interlaced only — install PIL for the rest"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    raw = zlib.decompress(idat)
    stride = width + 1
    out = bytearray()
    prev = bytearray(width)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, cur = line[0], bytearray(line[1:])
        for x in range(width):
            a = cur[x - 1] if x else 0  # left (already reconstructed)
            b = prev[x]  # up
            c = prev[x - 1] if x else 0  # upper-left
            if ftype == 0:
                pass
            elif ftype == 1:
                cur[x] = (cur[x] + a) & 0xFF
            elif ftype == 2:
                cur[x] = (cur[x] + b) & 0xFF
            elif ftype == 3:
                cur[x] = (cur[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:  # Paeth predictor
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            else:
                raise NotImplementedError(f"PNG filter type {ftype}")
        out += cur
        prev = cur
    return width, height, bytes(out)


def _decode(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:4] == _MAGIC:
        w, h = struct.unpack("<II", payload[4:12])
        return w, h, payload[12 : 12 + w * h]
    try:  # real codec when installed (converted to 8-bit grayscale)
        from PIL import Image  # type: ignore
        import io

        img = Image.open(io.BytesIO(payload)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError:
        pass
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png_stdlib(payload)
    raise NotImplementedError(
        "real image decoding beyond grayscale PNG requires PIL/libvips — "
        "not installed; plug the codec in here"
    )

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("max_px", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas kernel: payload -> numeric features. Output carries no
    binary, so everything downstream shuffles cheaply."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = _decode(bytes(payload))
                out.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "mean_px": round(sum(body) / len(body), 6) if body else 0.0,
                        "max_px": max(body) if body else 0,
                        "n_bytes": len(body),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURES_SCHEMA)


PHASH_GRID = 4  # aHash grid — 4x4 = 16-bit hash


def phash_bits(width: int, height: int, body: bytes) -> int:
    """Average-hash (aHash) of a decoded grayscale image: nearest-
    neighbor downsample to PHASH_GRID x PHASH_GRID, one bit per cell set
    iff the sampled pixel exceeds the image mean. The mean compare is
    kept in INTEGER arithmetic (px * n_pixels > sum_pixels) so every
    engine computing it — including the SQL oracle recomputing from id
    arithmetic — lands on identical bits with no float-epsilon edge."""
    n, total = width * height, sum(body)
    h = 0
    for i in range(PHASH_GRID * PHASH_GRID):
        rr = ((i // PHASH_GRID) * height) // PHASH_GRID
        cc = ((i % PHASH_GRID) * width) // PHASH_GRID
        if body[rr * width + cc] * n > total:
            h |= 1 << i
    return h


PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """mapInPandas kernel: payload -> (media_id, phash). Like
    extract_features, the binary column dies inside the kernel — only
    the 16-bit hash shuffles, which is what makes hash-bucket image
    dedup workable at billions of images."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = _decode(bytes(payload))
                out.append({"media_id": int(mid), "phash": phash_bits(w, h, body)})
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.select("media_id", "payload").mapInPandas(kernel, PHASH_SCHEMA)


def resize_stub(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """mapInPandas kernel returning re-encoded payloads (fake codec:
    nearest-neighbor crop/pad; a real pipeline swaps in PIL.resize)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = _decode(bytes(payload))
                px = [
                    body[min(int(y * h / new_h), h - 1) * w + min(int(x * w / new_w), w - 1)]
                    for y in range(new_h)
                    for x in range(new_w)
                ]
                rows.append(
                    {
                        "media_id": int(mid),
                        "payload": _MAGIC + struct.pack("<II", new_w, new_h) + bytes(px),
                        "width": new_w,
                        "height": new_h,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(kernel, schema)


_MAGIC_VIDEO = b"FAKV"


def encode_fake_video(
    media_id: int, width: int, height: int, n_frames: int
) -> bytes:
    """Deterministic fake video codec: FAKV | w | h | n | frame bytes,
    where frame ``f`` pixel ``i`` = (media_id + 7*f + i) % 251 — every
    engine can recompute per-frame stats from the ids alone."""
    frames = b"".join(
        bytes(((media_id + 7 * f + i) % 251) for i in range(width * height))
        for f in range(n_frames)
    )
    return _MAGIC_VIDEO + struct.pack("<III", width, height, n_frames) + frames


def _decode_video(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:4] == _MAGIC_VIDEO:
        w, h, n = struct.unpack("<III", payload[4:16])
        return w, h, n, payload[16 : 16 + w * h * n]
    try:  # real codec when installed — grayscale frame planes
        import io

        import av  # type: ignore

        with av.open(io.BytesIO(payload)) as container:
            frames = [
                f.to_ndarray(format="gray") for f in container.decode(video=0)
            ]
        if frames:
            h, w = frames[0].shape
            return w, h, len(frames), b"".join(f.tobytes() for f in frames)
    except ImportError:
        pass
    raise NotImplementedError(
        "real video decoding (mp4/webm) requires ffmpeg/pyav — "
        "not installed; plug the codec in here"
    )


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("mean_px", DoubleType()),
        StructField("max_px", LongType()),
    ]
)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """mapInPandas kernel: decode video payload → keep every k-th frame →
    per-frame features. The frame-sampling stage of a video training
    pipeline: payload bytes never leave the kernel (only small typed
    rows shuffle), and sampling happens at decode so dropped frames are
    never materialized."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, n, frames = _decode_video(bytes(payload))
                fsz = w * h
                for f in range(0, n, every_k):
                    body = frames[f * fsz : (f + 1) * fsz]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_no": f,
                            "mean_px": round(sum(body) / len(body), 6),
                            "max_px": max(body),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        kernel, FRAME_FEATURES_SCHEMA
    )


_MAGIC_AUDIO = b"FAKA"


def encode_fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic fake audio codec: FAKA | rate | n | signed-byte
    waveform, sample ``i`` = (media_id*13 + i) % 256 - 128 — every engine
    can recompute waveform stats from the ids alone."""
    wave = bytes(((media_id * 13 + i) % 256) for i in range(n_samples))
    return _MAGIC_AUDIO + struct.pack("<II", sample_rate, n_samples) + wave


def _decode_audio(payload: bytes) -> tuple[int, int, bytes]:
    """→ (rate, n_samples, unsigned-8-bit mono waveform bytes)."""
    if payload[:4] == _MAGIC_AUDIO:
        rate, n = struct.unpack("<II", payload[4:12])
        return rate, n, payload[12 : 12 + n]
    try:  # real codec when installed (any format soundfile reads)
        import io

        import soundfile as sf  # type: ignore

        data, rate = sf.read(io.BytesIO(payload), dtype="float64")
        if getattr(data, "ndim", 1) > 1:
            data = data.mean(axis=1)
        wave_u8 = bytes(int(max(-1.0, min(1.0, s)) * 127) + 128 for s in data)
        return rate, len(wave_u8), wave_u8
    except ImportError:
        pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # stdlib fallback: PCM WAV via the wave module (real format, no
        # third-party codec); 8-bit stays as-is, 16-bit downscales
        import io
        import wave as wave_mod

        with wave_mod.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            width, nch = wf.getsampwidth(), wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
        if nch != 1 or width not in (1, 2):
            raise NotImplementedError(
                "stdlib WAV fallback handles mono 8/16-bit PCM only — "
                "install soundfile for the rest"
            )
        if width == 1:
            wave_u8 = frames
        else:
            s16 = struct.unpack(f"<{len(frames) // 2}h", frames)
            wave_u8 = bytes((s >> 8) + 128 for s in s16)
        return rate, len(wave_u8), wave_u8
    raise NotImplementedError(
        "real audio decoding beyond PCM WAV requires soundfile/ffmpeg — "
        "not installed; plug the codec in here"
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_us", LongType()),  # exact integer micros — no float rounding at engine boundaries
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas kernel: audio payload → waveform features (duration,
    RMS, peak) — the feature-extraction stage an audio training pipeline
    runs before filtering/bucketing; payload bytes never leave the
    kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n, wave = _decode_audio(bytes(payload))
                samples = [b - 128 for b in wave]
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": rate,
                        "n_samples": n,
                        "duration_us": n * 1_000_000 // rate,
                        "rms": round((sum(s * s for s in samples) / n) ** 0.5, 6),
                        "peak": max(abs(s) for s in samples),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only scan: must never touch payload bytes (column
    pruning) — the 100 TB 'count by format' query."""
    return media.groupBy("kind", "format").agg(
        F.count("*").alias("n"),
        F.sum(F.col("width") * F.col("height")).alias("total_px"),
    )
