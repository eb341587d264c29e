#!/usr/bin/env python
"""Local mimic of the driver's t2 gate: run every __spark_entry__
query at sf0.01 (or $SF_DIR) against its DuckDB oracle and compare
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all cols,
    numerics normalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def dtype_drift(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Columns where one side fetches integer and the other float.

    The external driver's value-hash is representation-sensitive, so a
    DuckDB HUGEINT (sum of INTEGER) rendered as float64 fails its hash
    against a Spark int64 even when values are exactly equal. Surface
    that here so it never reaches the driver.
    """
    drift = []
    for c in a.columns:
        if c not in b.columns:
            continue
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            drift.append(f"{c}: spark={a[c].dtype} oracle={b[c].dtype}")
    return drift


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} oracle={len(b)}"
    drift = dtype_drift(a, b)
    if drift:
        return False, f"dtype drift (driver-hash risk): {'; '.join(drift)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return False, f"value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
    return True, "ok"


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as e
    from mr_mpi_blast_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. the synthesized sf1.0): a
            # directory of part files, not a single parquet
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue    # absent table: only queries that touch it fail
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures, weak = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {ex}")
            continue
        ok, msg = frames_equal(sdf, odf)
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name}: rows={len(sdf)} {msg if not ok else ''} [{time.time()-t0:.1f}s]")

    # count only what actually RAN: with a name filter the old
    # len(qs)-based line printed "68/68 pass" after checking 2 queries
    n_checked = len([n for n in qs if not only or n in only])
    print(f"\n{n_checked - len(failures)}/{n_checked} pass "
          f"({len(weak)} rows-only)"
          + (f" [filtered: {n_checked} of {len(qs)}]" if only else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
