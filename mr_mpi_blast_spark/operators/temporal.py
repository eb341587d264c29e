"""Temporal operators (beyond-reference): batch sessionization and
as-of join.

Spark has no native SESSION or ASOF primitive for batch DataFrames;
both are expressed here as single-shuffle window compositions — the
shuffle key is the entity key, so at 100 TB each is one exchange on
(key) followed by a per-partition sorted pass, never a range join or
per-row subquery. The streaming analogs (true session windows with
watermarks) live in streaming/events.py; these are the batch-parity
forms a backfill pipeline runs over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def epoch_us(df: DataFrame, ts_col: str):
    """Exact integer epoch-microseconds for a timestamp column of either
    flavor, interpreting TIMESTAMP_NTZ wall-clocks as UTC regardless of
    the session timezone.

    TIMESTAMP_NTZ (what plain ``timestamp[us]`` parquet reads as) has no
    direct unix_micros, and every implicit NTZ->TIMESTAMP cast goes
    through the SESSION zone — including inside to_utc_timestamp, whose
    'UTC' shift would then be a no-op on non-UTC clusters. The
    tz-independent form: convert_timezone('UTC', session_tz, ntz)
    renders the wall-clock (read as UTC) in the session zone, so the
    subsequent session-zone cast lands on exactly the UTC instant —
    the two session-zone applications cancel for every session
    timezone, including across DST transitions (modulo the rare
    ambiguous-wall instants of the session zone itself).

    The column's type is resolved through the analyzer
    (``df.select(ts_col)``), not a string dtype table, so
    case-insensitive column resolution works the same here as in every
    other Spark expression.
    """
    resolved = df.select(ts_col).schema[0].dataType
    if isinstance(resolved, TimestampNTZType):
        return F.unix_micros(
            F.convert_timezone(F.lit("UTC"), F.current_timezone(),
                               F.col(ts_col)).cast("timestamp"))
    return F.unix_micros(F.col(ts_col))


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap from the key's previous event exceeds ``gap_minutes``.

    Adds ``session_seq`` (1-based per key). Gap arithmetic runs on
    unix microseconds (exact integers — no float/timezone ambiguity,
    and bit-identical to an oracle's epoch_us). One shuffle on
    ``key_col``; both windows share the same (key, ts, tiebreak) sort
    so Catalyst plans a single Window node over one exchange.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    ts_us = epoch_us(events, ts_col)
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (ts_us - prev_us > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(running).cast("long"))


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, right_value_cols: list[str],
              prefix: str = "r_") -> DataFrame:
    """As-of (most-recent-at-or-before) join: for every left row,
    attach the right row of the same key with the greatest right.ts
    <= left.ts; left rows with no prior right row get nulls.

    Implemented as the union-window form: tag both inputs, union,
    and carry the right columns forward with last(ignorenulls) over
    (key ORDER BY ts, side) — right rows sort before left rows at
    equal ts, so ties are inclusive (ts_r == ts_l matches), matching
    DuckDB/pandas ASOF semantics. This is ONE shuffle on the key over
    rows(left)+rows(right) — at scale it beats the naive range-join
    (which explodes to |L|x|R| per key before filtering) and needs no
    per-key collect. Right rows sharing (key, ts) are deduplicated to
    the max tiebreak first so the result is deterministic.

    Right value columns are exposed as ``{prefix}{col}``; the right
    timestamp as ``{prefix}{ts_col}``.
    """
    r_sorted = Window.partitionBy(key_col, ts_col).orderBy(
        *[F.col(c).desc() for c in right_value_cols])
    r = (right.select(key_col, ts_col, *right_value_cols)
         .withColumn("_rn", F.row_number().over(r_sorted))
         .filter(F.col("_rn") == 1).drop("_rn")
         .select(
             F.col(key_col), F.col(ts_col),
             F.col(ts_col).alias(f"{prefix}{ts_col}"),
             *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols])
         .withColumn("_side", F.lit(0)))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(key_col).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in right_value_cols]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")
