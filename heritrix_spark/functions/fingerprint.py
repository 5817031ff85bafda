"""URL fingerprints — the already-seen key space.

Reference anchor: ``org/archive/crawler/util/BdbUriUniqFilter.java#createKey``
fingerprints canonical URLs to 64-bit keys (via the Rabin fingerprints in
``st/ata/util/FPGenerator.java``), packing an authority hash into the top
bits for B-tree page locality.

Engine-normative choice: ``url_fp = xxhash64(canon_url)`` (Spark built-in,
seed 42).  Equivalence with the reference is defined on the *URL-seen set*
(the set of canonical URLs), not on hash values — the hash function is an
implementation detail in both systems.  The reference's locality trick maps
to hash-bucket partitioning of the ``seen`` table by ``url_fp`` (and of the
frontier by ``class_key``), which makes the seen anti-join a co-partitioned
join instead of a B-tree locality hack.

The pure-Python XXH64 below is bit-exact with Spark's ``xxhash64`` for
string inputs (UTF-8 bytes, seed 42, signed-long output) — verified in
tests/test_fingerprint.py.  It exists so the ordering oracle and fixture
generator share the engine's key space without a JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (public algorithm, Yann Collet) — unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            lane = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl((v1 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl((v2 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl((v3 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl((v4 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def url_fp_py(canon_url: str) -> int:
    """Signed-64 fingerprint of a canonical URL — matches Spark xxhash64."""
    return _signed(xxh64(canon_url.encode("utf-8"), seed=42))


def hash_str_py(*parts: str) -> int:
    """Deterministic signed-64 hash of ':'-joined parts (Spark-parity).

    Mirrors ``F.xxhash64(F.concat_ws(':', *cols))`` — the engine's
    general-purpose derivation hash (fetch_ms jitter, synthetic link graph,
    simulated DNS).
    """
    return _signed(xxh64(":".join(parts).encode("utf-8"), seed=42))


def url_fp_expr(canon_url: Column) -> Column:
    return F.xxhash64(canon_url)


def hash_str_expr(*cols: Column) -> Column:
    return F.xxhash64(F.concat_ws(":", *cols))
