"""Audio/video payload codec — deterministic encode/decode for A/V columns.

Companion to :mod:`heritrix_spark.functions.imagecodec`: this container
ships NO audio or video codec library (no soundfile, no ffmpeg bindings —
verified at build time), so the engine defines self-contained deterministic
formats with the same design as the image codec.  The Spark-side plumbing
in :mod:`heritrix_spark.pipeline.multimodal` (binary column in, Arrow
batches, typed schema out) is identical whether the codec is this one or a
real library behind the ``HAVE_SOUNDFILE`` / ``HAVE_AV`` seams.

* audio  — ``HXAU`` magic + sample_rate:uint32 + n_samples:uint32 +
  zlib-compressed int16 mono PCM.  Lossless.
* video  — ``HXVI`` magic + n_frames:uint16 + frame_interval_ms:uint32 +
  length-prefixed engine-image frames (each an ``HXIM`` payload from
  :func:`imagecodec.encode`).  A container, not a temporal codec: frames
  are independently decodable, which is exactly the property frame
  sampling needs.

Reference anchor (parity, not port): Heritrix treats non-HTML payloads as
opaque bytes written through the writer chain
[H: org/archive/crawler/writer/ARCWriterProcessor.java]; decode/feature
extraction is downstream-analytics territory, which this engine expresses
as mapInPandas over the fetched-payload tables.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from heritrix_spark.functions import imagecodec

try:  # real-codec seams, absent in this container
    import soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except ImportError:
    HAVE_SOUNDFILE = False

try:
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False

_AU_MAGIC = b"HXAU"
_VI_MAGIC = b"HXVI"


# ---------------------------------------------------------------- audio

def gen_samples(k: int, n: int, sample_rate: int = 16_000) -> np.ndarray:
    """Deterministic int16 mono PCM for clip k — a PCG64(7000+k)-phased
    sine mixed with uniform noise, full-scale/4.  Same role as
    imagecodec.gen_pixels: test/bench fixtures with no external data."""
    rng = np.random.Generator(np.random.PCG64(7000 + k))
    t = np.arange(n, dtype=np.float64) / sample_rate
    freq = float(rng.uniform(80.0, 2000.0))
    phase = float(rng.uniform(0.0, 2 * np.pi))
    wave = 0.20 * np.sin(2 * np.pi * freq * t + phase)
    noise = 0.05 * rng.uniform(-1.0, 1.0, size=n)
    return np.clip((wave + noise) * 32767.0, -32768, 32767).astype(np.int16)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono PCM losslessly."""
    pcm = np.ascontiguousarray(samples, dtype=np.int16)
    payload = zlib.compress(pcm.tobytes(), level=6)
    return (_AU_MAGIC + struct.pack("<II", sample_rate, pcm.shape[0])
            + payload)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (int16 samples, sample_rate)."""
    if data[:4] != _AU_MAGIC:
        raise ValueError("bad magic — not an engine-encoded audio payload")
    sample_rate, n = struct.unpack("<II", data[4:12])
    raw = zlib.decompress(data[12:])
    samples = np.frombuffer(raw, dtype=np.int16)
    if samples.shape[0] != n:
        raise ValueError("audio payload truncated")
    return samples, sample_rate


def rms(samples: np.ndarray) -> float:
    """Root-mean-square amplitude on the [-1, 1] float scale."""
    x = samples.astype(np.float64) / 32768.0
    return float(np.sqrt(np.mean(x * x))) if x.size else 0.0


# ---------------------------------------------------------------- video

def encode_video(frames: list[np.ndarray], frame_interval_ms: int) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames at a fixed frame interval.
    Each frame is an independently-decodable engine-image payload."""
    if len(frames) > 0xFFFF:
        raise ValueError("too many frames for container header")
    out = [_VI_MAGIC,
           struct.pack("<HI", len(frames), frame_interval_ms)]
    for px in frames:
        blob = imagecodec.encode(px, "png")
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def decode_video(data: bytes) -> tuple[list[bytes], int]:
    """Decode to (list of per-frame engine-image payloads, interval_ms).

    Frames stay encoded: frame sampling only needs the container walk, and
    the caller decides which sampled frames to pixel-decode (that is the
    expensive step at scale)."""
    if data[:4] != _VI_MAGIC:
        raise ValueError("bad magic — not an engine-encoded video payload")
    n_frames, interval_ms = struct.unpack("<HI", data[4:10])
    frames: list[bytes] = []
    off = 10
    for _ in range(n_frames):
        (ln,) = struct.unpack("<I", data[off:off + 4])
        off += 4
        frames.append(data[off:off + ln])
        off += ln
    if off != len(data):
        raise ValueError("video payload has trailing bytes")
    return frames, interval_ms


def gen_video(k: int, n_frames: int, w: int = 16, h: int = 12,
              frame_interval_ms: int = 200) -> bytes:
    """Deterministic test video: frame i of video k is
    imagecodec.gen_pixels(1000*k + i)."""
    frames = [imagecodec.gen_pixels(1000 * k + i, w, h)
              for i in range(n_frames)]
    return encode_video(frames, frame_interval_ms)
