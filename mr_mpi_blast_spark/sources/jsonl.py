"""JSONL (newline-delimited JSON) source/sink — the interchange format
of large-scale text-corpus pipelines (beyond-reference surface; the
reference's converters cover CSV/SQLite/HDF5, a modern training-data
exchange adds JSONL).

100 TB shape:
- READ with an EXPLICIT schema, always: ``inferSchema`` costs a full
  extra pass over the corpus before the real scan, and a drifted field
  on row 10^11 silently widens a column for everyone. With a schema,
  Spark's JSON reader prunes parsing to the requested fields (column
  pruning reaches the parser, not just the projection).
- Line-delimited means SPLITTABLE: every task parses its own byte
  range (records never span lines by construction), so a single
  multi-TB .jsonl shards across the cluster like any text file. The
  multiline=true mode is the opposite — one task per file — and is
  deliberately not exposed here.
- Corrupt-record policy is explicit: PERMISSIVE + a named rescue
  column, so a torn line on a petabyte ingest lands in a quarantine
  column instead of killing the job (FAILFAST is the right mode only
  for the write-side round-trip tests below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write one JSON object per line (Spark's json sink IS JSONL).
    Values round-trip exactly: strings are JSON-escaped, integers are
    unquoted, and the reader below restores them under the explicit
    schema."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str,
               mode: str = "PERMISSIVE") -> DataFrame:
    """Read JSONL under an EXPLICIT schema (never inference — see
    module docstring). In PERMISSIVE mode unparseable lines surface in
    the CORRUPT_COL quarantine column (added to the schema here, so a
    caller's schema string stays the clean record shape)."""
    mode = mode.upper()          # Spark matches the option case-
    # insensitively; matching case-sensitively here would silently
    # drop the quarantine column for mode='permissive'
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"read_jsonl: unknown mode {mode!r}")
    rdr = spark.read
    if mode == "PERMISSIVE":
        full = f"{schema}, {CORRUPT_COL} string"
        rdr = (rdr.option("mode", "PERMISSIVE")
               .option("columnNameOfCorruptRecord", CORRUPT_COL)
               .schema(full))
    else:
        rdr = rdr.option("mode", mode).schema(schema)
    return rdr.json(path)
