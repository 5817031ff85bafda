"""Multimodal payload operators: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing here is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` partitioned decode, feature extraction — while the
codec itself is the deterministic engine codec from
:mod:`heritrix_spark.functions.imagecodec` (this container ships no image
library; a PIL/ffmpeg-backed decode drops into ``_decode_one`` behind
``HAVE_PIL`` with zero changes to the Spark plan).  Audio/video decode is
real over the deterministic engine A/V codec
(:mod:`heritrix_spark.functions.avcodec`) with the same external-codec
seams (``HAVE_SOUNDFILE`` / ``HAVE_AV``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from heritrix_spark.functions import avcodec, imagecodec

IMAGE_FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, "
    "mean_g double, mean_b double, phash long, decode_ok boolean")

THUMB_SCHEMA = "image_id string, tw int, th int, thumb binary"


def _decode_one(data: bytes) -> np.ndarray:
    if imagecodec.HAVE_PIL:  # real-codec path (absent in this container)
        raise NotImplementedError("PIL decode path: wire Image.open here")
    return imagecodec.decode(data)


def image_features(images: DataFrame) -> DataFrame:
    """Per-image decoded features via Arrow-batched mapInPandas: channel
    means + average-hash.  Bytes never leave the executor; the driver sees
    only scalar features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Decode is inherently per-image; the batch loop iterates plain
        # numpy/object arrays (zip), never pandas row objects, and the
        # per-image math is vectorized numpy.
        def one(image_id, data, fmt):
            try:
                px = _decode_one(bytes(data))
                m = px.reshape(-1, 3).mean(axis=0)
                return (image_id, px.shape[1], px.shape[0], fmt,
                        float(m[0]), float(m[1]), float(m[2]),
                        imagecodec.phash(px), True)
            except Exception:
                return (image_id, None, None, fmt,
                        None, None, None, None, False)

        for pdf in batches:
            out = [one(i, d, f) for i, d, f in
                   zip(pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(),
                       pdf["fmt"].to_numpy())]
            yield pd.DataFrame(out, columns=[
                "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "phash", "decode_ok"])

    return images.select("image_id", "bytes", "fmt").where(
        F.col("bytes").isNotNull()).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def thumbnails(images: DataFrame, tw: int = 8, th: int = 8) -> DataFrame:
    """Resize via block mean (pure numpy) → re-encoded engine-codec bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(image_id, data):
            px = _decode_one(bytes(data))
            h, w, _ = px.shape
            ys = (np.arange(th + 1) * h) // th
            xs = (np.arange(tw + 1) * w) // tw
            tiny = np.zeros((th, tw, 3), dtype=np.uint8)
            for i in range(th):
                for j in range(tw):
                    tiny[i, j] = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                                    xs[j]:max(xs[j + 1], xs[j] + 1)
                                    ].reshape(-1, 3).mean(axis=0)
            return (image_id, tw, th, imagecodec.encode(tiny, "png"))

        for pdf in batches:
            out = [one(i, d) for i, d in
                   zip(pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy())]
            yield pd.DataFrame(out, columns=["image_id", "tw", "th",
                                             "thumb"])

    return images.select("image_id", "bytes").where(
        F.col("bytes").isNotNull()).mapInPandas(run, THUMB_SCHEMA)


def phash_near_dup_pairs(features: DataFrame,
                         max_hamming: int = 6,
                         max_bucket: int | None = 2000) -> DataFrame:
    """Near-duplicate images by perceptual-hash Hamming distance, blocked
    on 16-bit phash chunks (pigeonhole: ≤6 differing bits over 4 chunks →
    at least one chunk equal) — the image-side MinHash-LSH analog.
    Chunk buckets are bounded by ``max_bucket`` (degenerate-bucket O(B²)
    guard, see pipeline.dedup.cap_buckets)."""
    from heritrix_spark.pipeline.dedup import cap_buckets

    chunk_cols = [F.struct(
        F.lit(i).alias("chunk"),
        F.shiftrightunsigned("phash", i * 16)
        .bitwiseAND(F.lit(0xFFFF)).alias("key")) for i in range(4)]
    e = features.select("image_id", "phash",
                        F.explode(F.array(*chunk_cols)).alias("c")
                        ).select("image_id", "phash",
                                 F.col("c.chunk").alias("chunk"),
                                 F.col("c.key").alias("key"))
    e = cap_buckets(e, ["chunk", "key"], "image_id", max_bucket)
    a, b = e.alias("a"), e.alias("b")
    pairs = (a.join(b, ["chunk", "key"])
             .where(F.col("a.image_id") < F.col("b.image_id"))
             .select(F.col("a.image_id").alias("id_a"),
                     F.col("b.image_id").alias("id_b"),
                     F.col("a.phash").alias("ph_a"),
                     F.col("b.phash").alias("ph_b"))
             .distinct())
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (pairs.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


AUDIO_FEATURE_SCHEMA = ("clip_id string, sample_rate int, n_samples long, "
                        "rms double, decode_ok boolean")
FRAME_SAMPLE_SCHEMA = ("video_id string, frame_idx int, ts_ms long, "
                       "frame binary")


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip decoded audio features via Arrow-batched mapInPandas:
    sample rate, sample count, RMS amplitude.  Real over the deterministic
    engine audio codec (:mod:`heritrix_spark.functions.avcodec`); a
    soundfile/ffmpeg decode drops into ``one`` behind ``HAVE_SOUNDFILE``
    with zero changes to the Spark plan.  Same distribution contract as
    image_features: bytes never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(clip_id, data):
            try:
                if avcodec.HAVE_SOUNDFILE:  # absent in this container
                    raise NotImplementedError(
                        "soundfile decode path: wire sf.read here")
                samples, sr = avcodec.decode_audio(bytes(data))
                return (clip_id, sr, int(samples.shape[0]),
                        avcodec.rms(samples), True)
            except Exception:
                return (clip_id, None, None, None, False)

        for pdf in batches:
            out = [one(i, d) for i, d in
                   zip(pdf["clip_id"].to_numpy(), pdf["bytes"].to_numpy())]
            yield pd.DataFrame(out, columns=[
                "clip_id", "sample_rate", "n_samples", "rms", "decode_ok"])

    return clips.select("clip_id", "bytes").where(
        F.col("bytes").isNotNull()).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def video_frame_sample(videos: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample one frame per ``every_ms`` window (the first frame whose
    timestamp lands in the window) from each video container.  Real over
    the engine video container (length-prefixed engine-image frames at a
    fixed interval); an ffmpeg/PyAV path drops in behind ``HAVE_AV``.
    Sampled frames stay ENCODED in the output — the container walk is
    cheap, pixel decode is the expensive step and is deferred to whatever
    consumes the sampled frame (e.g. image_features over the result)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(video_id, data):
            if avcodec.HAVE_AV:  # absent in this container
                raise NotImplementedError(
                    "PyAV decode path: wire container demux here")
            frames, interval_ms = avcodec.decode_video(bytes(data))
            rows, last_bucket = [], -1
            for idx, blob in enumerate(frames):
                ts = idx * interval_ms
                bucket = ts // every_ms
                if bucket != last_bucket:
                    rows.append((video_id, idx, ts, blob))
                    last_bucket = bucket
            return rows

        for pdf in batches:
            out = [r for i, d in zip(pdf["video_id"].to_numpy(),
                                     pdf["bytes"].to_numpy())
                   for r in one(i, bytes(d))]
            yield pd.DataFrame(out, columns=["video_id", "frame_idx",
                                             "ts_ms", "frame"])

    return videos.select("video_id", "bytes").where(
        F.col("bytes").isNotNull()).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
