"""Scalar function layer: canonicalization, SURT, fingerprints, cost, hops.

Every function here exists in two forms with golden-tested parity:

* a pure-Python mirror (used by the ordering oracle ``oracle/heritrix_sim.py``
  and by fixture generation), and
* a Spark Column expression built only from ``pyspark.sql.functions``
  (JVM-side, whole-stage-codegen'd — the engine hot path).

Pandas-UDF variants exist only where an expression cannot express the
semantics (large SURT prefix-set probes).
"""
