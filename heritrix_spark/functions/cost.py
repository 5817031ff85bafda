"""Cost-assignment policies — per-URI cost charged against queue budgets.

Reference anchors (class-level; reference dir was empty at build time):

* ``org/archive/crawler/frontier/CostAssignmentPolicy.java`` — abstract
  ``int costOf(CrawlURI)``; cost is folded into the queue insert key (lower
  cost sorts earlier) and expended against the queue's session balance.
* ``UnitCostAssignmentPolicy.java`` — cost ≡ 1.
* ``WagCostAssignmentPolicy.java`` — "wild-ass guess" heuristic growing with
  path depth and query-string presence/size.
* ``AntiCalendarCostAssignmentPolicy.java`` — penalizes calendar-trap URLs
  (date-like path segments) so crawler-trap date lattices sink in priority.

The exact Wag/AntiCalendar formulas below are ENGINE-NORMATIVE (documented,
golden-tested in tests/test_cost.py against cost_golden.tsv) pending
reconciliation with the reference source; the structural behavior — unit
baseline, depth+query growth, calendar penalty — matches the published
semantics.

Each policy is a pure-Python function plus an equivalent Spark Column
expression (built-ins only; parity golden-tested).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

CALENDAR_RE = r"/\d{4}/\d{1,2}(/\d{1,2})?(/|$)"
_CALENDAR_PENALTY = 7


def unit_cost_py(url: str) -> int:
    return 1


def unit_cost_expr(url: Column) -> Column:
    return F.lit(1)


def _path_query(url: str) -> tuple[str, str]:
    m = re.match(r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*", url.strip())
    rest = url.strip()[m.end():] if m else url.strip()
    if "?" in rest:
        path, query = rest.split("?", 1)
    else:
        path, query = rest, ""
    return path or "/", query


def wag_cost_py(url: str) -> int:
    """cost = 1 + path-segment-count + (query ? 2 + len(query)//32 : 0)."""
    path, query = _path_query(url)
    segs = [s for s in path.split("/") if s]
    cost = 1 + len(segs)
    if query:
        cost += 2 + len(query) // 32
    return cost


def wag_cost_expr(url: Column) -> Column:
    path = F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    nsegs = F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))
    qcost = F.when(
        query == F.lit(""), F.lit(0)
    ).otherwise(F.lit(2) + F.floor(F.length(query) / F.lit(32)).cast("int"))
    return (F.lit(1) + nsegs + qcost).cast("int")


def anticalendar_cost_py(url: str) -> int:
    """Wag cost + flat penalty when a calendar-shaped path segment appears."""
    cost = wag_cost_py(url)
    path, _ = _path_query(url)
    if re.search(CALENDAR_RE, path):
        cost += _CALENDAR_PENALTY
    return cost


def anticalendar_cost_expr(url: Column) -> Column:
    path = F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1)
    pen = F.when(path.rlike(CALENDAR_RE), F.lit(_CALENDAR_PENALTY)).otherwise(F.lit(0))
    return (wag_cost_expr(url) + pen).cast("int")


POLICIES_PY = {
    "unit": unit_cost_py,
    "wag": wag_cost_py,
    "anticalendar": anticalendar_cost_py,
}

POLICIES_EXPR = {
    "unit": unit_cost_expr,
    "wag": wag_cost_expr,
    "anticalendar": anticalendar_cost_expr,
}
