"""SURT — Sort-friendly URI Reordering Transform, and prefix-set scoping.

Reference anchors: ``org/archive/util/SURT.java`` (the transform) and
``org/archive/util/SurtPrefixSet.java`` (prefix membership used by
SurtPrefixedDecideRule / SurtPrefixScope).

Form: ``http://(tld,domain,sub,)/path`` — host labels reversed and
comma-joined inside parens, so that a lexicographic sort groups URLs by
registrable domain and prefix-matching expresses "this domain and below".

Two membership implementations:

* ``surt_prefix_member_expr`` — for small prefix sets (seeds-derived, the
  common case): an OR-fold of ``startswith`` columns; Catalyst constant-folds
  and codegen's it.  Broadcast-free, shuffle-free.
* ``surt_prefix_member_udf`` — for large sets: a vectorized Arrow/pandas UDF
  doing ``np.searchsorted`` against a broadcast sorted prefix array (binary
  search per row, batch-at-a-time).  This is the "SurtPrefix scope rules as
  vectorized Arrow UDFs" path named by the north star.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .canonicalize import _HOST_RE, host_of_py  # noqa: F401  (shared regex)


def surt_py(url: str) -> str:
    """Pure-Python SURT of an absolute http(s) URL."""
    s = url.strip()
    low = s.lower()
    if low.startswith("dns:"):
        return s  # dns URIs are not SURT-transformed (reference behavior)
    import re

    m = re.match(_HOST_RE, s)
    if not m:
        return low
    scheme = low.split(":", 1)[0]
    host = m.group(1).lower().rstrip(".")
    port = m.group(2) or ""
    rest = s[m.end():]
    labels = host.split(".")[::-1]
    return f"{scheme}://({','.join(labels)},){port}{rest}"


def surt_prefix_py(url: str) -> str:
    """Seed → SURT *prefix* (host-level scope, implied-path truncation).

    Mirrors SurtPrefixSet.prefixFromPlain: a seed ``http://h/p/x`` scopes
    the whole host ⇒ prefix ``http://(labels,)/`` when path is non-trivial.
    """
    s = surt_py(url)
    i = s.find(")")
    if i == -1:
        return s
    # keep through ")" plus optional port, then a single "/"
    j = i + 1
    while j < len(s) and s[j] != "/":
        j += 1
    return s[: j] + "/"


def surt_expr(url: Column) -> Column:
    """Column SURT — reverse host labels with built-in array functions."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"\.$", "")
    scheme = F.lower(F.regexp_extract(url, r"(?i)^([a-z][a-z0-9+.\-]*):", 1))
    port = F.regexp_extract(url, _HOST_RE, 2)
    # remainder after authority
    prefix_len = F.length(F.regexp_extract(url, r"(?i)^([a-z][a-z0-9+.\-]*://[^/?#]*)", 1))
    rest = url.substr(prefix_len + F.lit(1), F.lit(2**31 - 1))
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    return F.when(F.lower(url).startswith("dns:"), url).otherwise(
        F.concat(scheme, F.lit("://("), rev, F.lit(",)"), port, rest)
    )


def surt_prefix_member_expr(surt: Column, prefixes: Iterable[str]) -> Column:
    """Small-set membership: OR-fold of startswith (constant-folded)."""
    out = F.lit(False)
    for p in sorted(set(prefixes)):
        out = out | surt.startswith(p)
    return out


def make_surt_prefix_member_udf(spark: SparkSession, prefixes: Iterable[str]):
    """Large-set membership: broadcast sorted array + searchsorted probe.

    Returns a pandas UDF ``surt:string -> bool``.  A SURT ``s`` matches iff
    the greatest prefix ≤ s under lexicographic order is a prefix of ``s``
    — the classic sorted-prefix-set probe (SurtPrefixSet.containsPrefixOf).
    """
    arr = np.array(sorted(set(prefixes)), dtype=object)
    bc = spark.sparkContext.broadcast(arr)

    @F.pandas_udf(T.BooleanType())
    def member(surts: pd.Series) -> pd.Series:
        ps = bc.value
        if len(ps) == 0:
            return pd.Series(np.zeros(len(surts), dtype=bool))
        idx = np.searchsorted(ps, surts.fillna("").to_numpy(dtype=object), side="right")
        out = np.zeros(len(surts), dtype=bool)
        vals = surts.fillna("").to_numpy(dtype=object)
        nz = idx > 0
        cand = np.where(nz, idx - 1, 0)
        for i in range(len(vals)):  # vectorized startswith over object array
            if nz[i]:
                out[i] = vals[i].startswith(ps[cand[i]])
        return pd.Series(out)

    return member


def surt_prefix_member_py(surt: str, sorted_prefixes: list[str]) -> bool:
    """Oracle-side mirror of the sorted-prefix probe."""
    if not sorted_prefixes:
        return False
    i = bisect.bisect_right(sorted_prefixes, surt)
    return i > 0 and surt.startswith(sorted_prefixes[i - 1])
