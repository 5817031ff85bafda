"""Image payload codec — deterministic encode/decode for the ``images`` table.

The input contract (BASELINE.json ``input_hint``) is an Iceberg-style table
``images(image_id, bytes, w, h, fmt, caption, phash)`` whose ``bytes`` column
holds an encoded image payload, and a per-row invariant on fetched payloads:
decoded-pixel equality (lossless) / PSNR >= 40 dB (lossy) + caption equality.

This container ships NO image codec library (no Pillow, no cv2 — verified at
build time), so the engine defines a self-contained deterministic codec:

* ``fmt='png'``  — lossless: zlib-compressed raw RGB behind a tiny header.
* ``fmt='jpeg'`` — lossy: pixels quantized to step 4 (max abs error 2 =>
  PSNR ~ 10*log10(255^2 / (16/12)) ~ 46.9 dB, comfortably above the 40 dB
  gate), then zlib-compressed.  A deterministic stand-in for DCT loss.

If Pillow materializes later, ``HAVE_PIL`` gates a real-codec path with the
same function signatures; the Spark-side plumbing (binary column, pandas-UDF
batch decode, PSNR check) is identical either way and is the part under test.

Reference anchor (parity, not port): Heritrix writes fetched payloads via
``org/archive/crawler/writer/ARCWriterProcessor.java``; payload fidelity
there is byte-identity inside ARC records.  The PSNR form of the invariant
comes from BASELINE.json:15.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real-codec path, absent in this container
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_MAGIC = b"HXIM"
_QUANT = 4  # lossy quantization step


def gen_pixels(k: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel array for image k — PCG64(42+k), uint8."""
    rng = np.random.Generator(np.random.PCG64(42 + k))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt in {'png' (lossless), 'jpeg'}."""
    h, w, _ = pixels.shape
    if fmt == "jpeg":
        px = (pixels.astype(np.uint16) // _QUANT * _QUANT + _QUANT // 2).clip(
            0, 255
        ).astype(np.uint8)
        code = b"J"
    elif fmt == "png":
        px = pixels
        code = b"P"
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    payload = zlib.compress(px.tobytes(), level=6)
    return _MAGIC + code + struct.pack("<HH", w, h) + payload


def decode(data: bytes) -> np.ndarray:
    """Decode back to an (h, w, 3) uint8 array."""
    if data[:4] != _MAGIC:
        raise ValueError("bad magic — not an engine-encoded image payload")
    w, h = struct.unpack("<HH", data[5:9])
    raw = zlib.decompress(data[9:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash(pixels: np.ndarray) -> int:
    """64-bit average-hash of the pixels (signed, Spark LongType range).

    Gray 8x8 block means vs global mean -> 64 bits.  Public aHash algorithm;
    deterministic, codec-independent (computed on decoded pixels).
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                               xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v
