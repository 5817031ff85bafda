"""Queue-assignment policies (F8) — classKey as config.

Heritrix parity (class anchors; reference dir empty at build time):
``org/archive/crawler/frontier/HostnameQueueAssignmentPolicy.java``
(default: lowercase host, ":port" when nonstandard),
``IPQueueAssignmentPolicy.java`` (key by resolved IP — here the
deterministic sandbox DNS answer, the same function FetchDNS T1 lands in
``host_state.ip``), ``SurtAuthorityQueueAssignmentPolicy.java`` (the SURT
authority — reversed host labels, comma-joined, trailing comma, port kept
when nonstandard), and the hash-bucket policy
(``BucketQueueAssignmentPolicy`` analog: a fixed number of queues,
host-hashed so one host never splits across queues).

Every policy is a pure function of the URL's HOST (hostname keeps the
nonstandard port, per the reference), so a host's dns:/robots
prerequisites always co-locate with its real URLs.  Each policy exists
twice — a pure-Python form (oracle) and a Spark Column form (engine) —
built from the same parts, golden-tested for agreement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from heritrix_spark.functions.canonicalize import (
    class_key_expr,
    class_key_py,
    host_expr,
    host_of_py,
)
from heritrix_spark.functions.fingerprint import hash_str_py

QUEUE_POLICIES = ("hostname", "ip", "surt", "bucket")


def ip_of_host_py(host: str) -> str:
    """Deterministic simulated DNS answer (FetchDNS T1) — the value
    CrawlStateUpdater lands in host_state.ip, and the IP policy's key."""
    h = hash_str_py("ip", host)
    return f"10.{(h >> 16) % 256}.{(h >> 8) % 256}.{h % 256}"


def ip_of_host_expr(host: Column) -> Column:
    """Column mirror of :func:`ip_of_host_py` (floored %/>> == pmod/
    shiftright on signed longs)."""
    h = F.xxhash64(F.concat_ws(":", F.lit("ip"), host))
    return F.format_string(
        "10.%d.%d.%d",
        F.pmod(F.shiftright(h, 16), F.lit(256)),
        F.pmod(F.shiftright(h, 8), F.lit(256)),
        F.pmod(h, F.lit(256)))


def surt_authority_py(class_key: str) -> str:
    """SURT authority of a hostname classKey: reversed labels +
    trailing comma (+ ":port" when the classKey carried one)."""
    host, _, port = class_key.partition(":")
    rev = ",".join(reversed(host.split("."))) + ","
    return rev + (":" + port if port else "")


def surt_authority_expr(class_key: Column) -> Column:
    host = F.split(class_key, ":").getItem(0)
    port = F.regexp_extract(class_key, r":(\d+)$", 1)
    rev = F.concat(F.concat_ws(",", F.reverse(F.split(host, r"\."))),
                   F.lit(","))
    return F.when(port == F.lit(""), rev).otherwise(
        F.concat(rev, F.lit(":"), port))


def queue_key_py(url: str, policy: str = "hostname",
                 buckets: int = 64) -> str:
    """classKey of a URL under the configured assignment policy."""
    if policy == "hostname":
        return class_key_py(url)
    if policy == "ip":
        return ip_of_host_py(host_of_py(url))
    if policy == "surt":
        return surt_authority_py(class_key_py(url))
    if policy == "bucket":
        return "bucket-%03d" % (hash_str_py("bk", host_of_py(url))
                                % buckets)
    raise ValueError(f"unknown queue_assignment policy: {policy}")


def queue_key_expr(url: Column, policy: str = "hostname",
                   buckets: int = 64) -> Column:
    """Column mirror of :func:`queue_key_py`."""
    if policy == "hostname":
        return class_key_expr(url)
    if policy == "ip":
        return ip_of_host_expr(host_expr(url))
    if policy == "surt":
        return surt_authority_expr(class_key_expr(url))
    if policy == "bucket":
        h = F.xxhash64(F.concat_ws(":", F.lit("bk"), host_expr(url)))
        return F.format_string("bucket-%03d",
                               F.pmod(h, F.lit(buckets)))
    raise ValueError(f"unknown queue_assignment policy: {policy}")
