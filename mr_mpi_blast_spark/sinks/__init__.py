"""Sinks (SURVEY §2.9): the reference writes per-rank packed binary hit
files (W1, mrblast.cpp:1216-1242) that offline converters turn into
CSV / SQLite / HDF5 (W2-W5, tools/converter/load_{csv,sql,hd5}.py).

Spark-first translation: parquet IS the native columnar sink (W1+W4 in
one), per-task files standing in for per-rank files. The legacy packed
format survives only as a compatibility codec so golden outputs of the
reference remain readable/writable.
"""

from mr_mpi_blast_spark.sinks.legacy_bin import (
    read_legacy_bin,
    write_legacy_bin,
)
from mr_mpi_blast_spark.sinks.writers import (
    write_csv,
    write_parquet,
    write_sqlite,
    write_duckdb,
)

__all__ = [
    "read_legacy_bin", "write_legacy_bin",
    "write_csv", "write_parquet", "write_sqlite", "write_duckdb",
]
