"""Post-fetch decide rules (SURVEY §2.S S10).

Heritrix gates its post-fetch processor chains (extractors, writers) on
DecideRules evaluated against the fetched CrawlURI:

* FetchStatusDecideRule — accept/reject by response status
  [H: org/archive/crawler/deciderules/FetchStatusDecideRule.java]
* ContentTypeMatchesRegExpDecideRule / ContentTypeNotMatchesRegExpDecideRule
  — accept/reject by response Content-Type
  [H: org/archive/crawler/deciderules/ContentTypeMatchesRegExpDecideRule.java]
* ContentLengthDecideRule — accept while content-length under a cap
  [H: org/archive/crawler/deciderules/ContentLengthDecideRule.java]

This module is the Spark-first re-expression: ONE boolean column
expression per configured rule set, evaluated over the bounded per-step
burst (never the frontier).  A rule set is a plain dict so it serializes
into CrawlConfig:

    {"status_in":   [200],          # accept only these statuses
     "mime_accept": r"^image/",     # Content-Type must match
     "mime_reject": r"/gif$",       # ...and must NOT match
     "max_bytes":   1 << 20}        # content-length cap

Criteria compose conjunctively (the normative DecideRuleSequence for the
gate: every configured rule must land ACCEPT).  Omitted keys don't
constrain.  ``gate_expr`` is the JVM-side column form; ``gate_py`` is the
row-at-a-time mirror the pure-Python ordering oracle uses — both are
golden-tested against each other.

Regex dialect note: patterns cross Spark's Java regex (`rlike`) and
Python's ``re.search``; stick to the shared subset (no lookbehind
differences arise for the anchored/literal patterns crawl configs use).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_KEYS = {"status_in", "mime_accept", "mime_reject", "max_bytes"}


def validate_rules(rules: dict) -> dict:
    unknown = set(rules) - _KEYS
    if unknown:
        raise ValueError(f"unknown post-fetch rule keys: {sorted(unknown)}")
    return rules


def gate_expr(rules: dict, status: Column, mime: Column,
              nbytes: Column) -> Column:
    """Boolean accept expression for one configured rule set."""
    validate_rules(rules)
    out = F.lit(True)
    if rules.get("status_in") is not None:
        out = out & status.isin([int(s) for s in rules["status_in"]])
    if rules.get("mime_accept") is not None:
        out = out & mime.rlike(rules["mime_accept"])
    if rules.get("mime_reject") is not None:
        out = out & ~mime.rlike(rules["mime_reject"])
    if rules.get("max_bytes") is not None:
        out = out & (nbytes <= F.lit(int(rules["max_bytes"])))
    return out


def gate_py(rules: dict, status: int, mime: str, nbytes: int) -> bool:
    """Pure-Python mirror of :func:`gate_expr` (oracle side)."""
    validate_rules(rules)
    if rules.get("status_in") is not None:
        if status not in {int(s) for s in rules["status_in"]}:
            return False
    if rules.get("mime_accept") is not None:
        if not re.search(rules["mime_accept"], mime):
            return False
    if rules.get("mime_reject") is not None:
        if re.search(rules["mime_reject"], mime):
            return False
    if rules.get("max_bytes") is not None:
        if nbytes > int(rules["max_bytes"]):
            return False
    return True
