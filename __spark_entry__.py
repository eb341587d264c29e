"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 (or the
beyond-reference training-data surface) expressed over the driver's
synthetic tables; ``oracle_sql()`` carries the DuckDB-equivalent SQL.
Column names and rounding are aligned on both sides so the driver's
order-insensitive value-hash matches.

Cross-engine determinism rules used throughout:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are wrapped in round(x, 4) on both sides (summation
  order differs between engines; 1e-4 granularity absorbs ulp noise);
- timestamps are rendered to strings via date_format/strftime;
- hash-dependent ops (minhash/simhash/fingerprints) use md5, which both
  engines implement identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mr_mpi_blast_spark.entry_queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted only for
    genuinely non-SQL-expressible ops, e.g. the alignment kernel)."""
    return dict(ORACLES)
