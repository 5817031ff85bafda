"""Hop-path ops — the ``pathFromSeed`` grammar.

Reference anchors: ``org/archive/crawler/datamodel/CandidateURI.java``
(pathFromSeed over alphabet ``L E X R P``) and
``org/archive/crawler/extractor/Link.java`` (hop types: L navlink, E embed,
X speculative, R redirect, P prerequisite).  A child's path is the parent's
path plus one hop char.

All ops are single regex/length expressions — fully JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

HOP_LINK = "L"
HOP_EMBED = "E"
HOP_SPECULATIVE = "X"
HOP_REDIRECT = "R"
HOP_PREREQ = "P"


def link_hops_py(hops_path: str) -> int:
    """Count of L hops (TooManyHopsDecideRule counts only navlinks)."""
    return hops_path.count("L")


def link_hops_expr(hops_path: Column) -> Column:
    return F.length(F.regexp_replace(hops_path, "[^L]", ""))


def total_hops_py(hops_path: str) -> int:
    return len(hops_path)


def trans_tail_py(hops_path: str) -> int:
    """Length of the trailing run of non-L hops (E/X/R/P) — the
    "transclusion tail" tested by TransclusionDecideRule."""
    m = re.search(r"[EXRP]*$", hops_path)
    return len(m.group(0)) if m else 0


def trans_tail_expr(hops_path: Column) -> Column:
    return F.length(F.regexp_extract(hops_path, "[EXRP]*$", 0))
