"""Deterministic sampling / dataset splitting (beyond-reference).

A training-data pipeline must split and sample REPRODUCIBLY: the same
document lands in the same split on every run, on any cluster size,
regardless of partitioning — so the bucket is a pure function of the
row's id (md5, which Spark and DuckDB implement bit-identically; cf.
functions/hashing.py), never rand()/sample() whose results depend on
seed plumbing and partition layout. All column expressions — no
shuffle at all: split/sample are narrow maps a scan fuses into.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4-decimal-digit bucket space: fractions resolve to 0.01%
_BUCKETS = 10_000


def id_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, 10000) from the id's md5 (first 8 hex
    chars -> int). Uniform over ids; identical in any engine with md5
    + base conversion."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
            .cast("long") % _BUCKETS)


def id_bucket_sql(expr: str) -> str:
    """DuckDB rendering of id_bucket (same arithmetic)."""
    return (f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"
            f" % {_BUCKETS}")


def deterministic_split(df: DataFrame, id_col: str,
                        splits: dict[str, float] | None = None,
                        out_col: str = "split") -> DataFrame:
    """Assign each row to a named split by id bucket. ``splits`` maps
    name -> fraction (must sum to <= 1; remainder is unassigned and
    labeled '_rest'). Default 80/10/10 train/val/test."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if sum(splits.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions sum to > 1")
    b = id_bucket(F.col(id_col))
    expr, lo = None, 0
    for name, frac in splits.items():
        hi = lo + int(round(frac * _BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn(out_col, expr.otherwise(F.lit("_rest")))


def deterministic_sample(df: DataFrame, id_col: str,
                         fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id bucket — stable across
    runs and cluster layouts (a row is in the sample or not, forever).
    Samples at different fractions nest: sample(0.01) ⊆ sample(0.1)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(id_bucket(F.col(id_col))
                     < F.lit(int(round(fraction * _BUCKETS))))
