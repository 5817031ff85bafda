#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every ``__spark_entry__.queries()`` key, run the Spark query and the
DuckDB ``oracle_sql()`` side-by-side at sf0.01 and compare row count,
schema (column-name set) and values (columns sorted by name, rows sorted
by all columns — the driver hashes in that order).  Exact compare for
ints/strings/bools; float columns use ``np.isclose`` (the driver hashes
canonicalized reprs, so a float mismatch here flags a risk even when
close).

Usage: python tools/check_correctness.py [key ...]
"""
from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            ignore_index=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if set(a.columns) != set(b.columns):
        return f"schema: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    for col in a.columns:
        x, y = a[col], b[col]
        if (np.issubdtype(x.dtype, np.floating)
                or np.issubdtype(y.dtype, np.floating)):
            xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            ok = np.isclose(xv, yv, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not ok.all():
                i = int(np.argmax(~ok))
                return f"value[{col}][{i}]: {xv[i]!r} != {yv[i]!r} (float)"
        else:
            xs = x.map(lambda v: repr(sorted(v)) if isinstance(v, (list,
                       np.ndarray)) else repr(v))
            ys = y.map(lambda v: repr(sorted(v)) if isinstance(v, (list,
                       np.ndarray)) else repr(v))
            bad = xs.to_numpy() != ys.to_numpy()
            if bad.any():
                i = int(np.argmax(bad))
                return f"value[{col}][{i}]: {xs.iloc[i]} != {ys.iloc[i]}"
    return None


def main() -> None:
    import __spark_entry__ as E
    from heritrix_spark.session import get_spark

    spark = get_spark()
    qs = E.queries()
    oracles = E.oracle_sql()
    keys = sys.argv[1:] or list(qs)
    out: dict[str, dict] = {}
    for k in keys:
        rec: dict = {}
        try:
            sdf = qs[k](spark, SF_DIR).toPandas()
            if k not in oracles:
                rec = {"rows": len(sdf), "oracle": "absent (rows-only)"}
            else:
                odf = duck_run(oracles[k])
                err = compare(sdf, odf)
                rec = {"rows": len(sdf), "oracle_rows": len(odf),
                       "match": err is None, "err": err}
        except Exception as exc:  # noqa: BLE001 — report, keep going
            rec = {"match": False, "err": f"{type(exc).__name__}: {exc}"}
        out[k] = rec
        status = ("OK" if rec.get("match") else
                  "--" if "oracle" in rec else "FAIL")
        print(f"{status:4s} {k}: {json.dumps(rec)[:300]}", flush=True)
    bad = [k for k, r in out.items()
           if not r.get("match") and "oracle" not in r]
    print(f"\n{len(keys) - len(bad)}/{len(keys)} green", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
