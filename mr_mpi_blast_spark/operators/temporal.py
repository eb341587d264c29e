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


def funnel(events: DataFrame, stages: list[str],
           key_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: per key, the earliest time each stage was
    reached STRICTLY after the previous stage (the conversion-path
    question every event warehouse answers: of the users who viewed,
    who then clicked, who then purchased?).

    Stage k is min(ts) over events of stages[k] with ts > t_{k-1} —
    strictly-after is the stated tie policy (a same-microsecond pair
    does not count as progression; exact and engine-independent).
    Shape: one filtered aggregate + one key-equi-join per stage, so
    each round shuffles only THAT stage's rows (the type filter is
    pushed to the scan) and per-key state is one timestamp — no
    per-key event collection, no corpus window, robust to a key with
    millions of events. Keys that never reach stages[0] don't appear.

    Output: (key, t1..tn timestamps nullable, depth 1..n).
    """
    if len(stages) < 2:
        raise ValueError(f"need >= 2 stages, got {stages!r}")
    out = (events.filter(F.col(type_col) == stages[0])
           .groupBy(key_col).agg(F.min(ts_col).alias("t1")))
    for k in range(2, len(stages) + 1):
        nxt = (events.filter(F.col(type_col) == stages[k - 1])
               .join(out.select(key_col, f"t{k - 1}"), key_col)
               .filter(F.col(ts_col) > F.col(f"t{k - 1}"))
               .groupBy(key_col).agg(F.min(ts_col).alias(f"t{k}")))
        out = out.join(nxt.select(key_col, f"t{k}"), key_col, "left")
    depth = F.lit(1)
    for k in range(2, len(stages) + 1):
        depth = F.when(F.col(f"t{k}").isNotNull(), F.lit(k)).otherwise(depth)
    # the when-chain resolves to the DEEPEST non-null stage: t_k can
    # only be non-null if t_{k-1} is, so later whens win correctly
    cols = [key_col] + [f"t{k}" for k in range(1, len(stages) + 1)]
    return out.select(*cols, depth.cast("int").alias("depth"))


def resample_locf(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  tiebreak_col: str = "event_id",
                  step: str = "1 hour") -> DataFrame:
    """Regular time-grid resample with last-observation-carried-forward
    — the gap-filling step that turns an irregular event stream into
    the fixed-cadence series a feature pipeline consumes.

    Per key: a dense grid from date_trunc(step-unit, min ts) to
    date_trunc(step-unit, max ts); per cell, n_events and the LAST
    raw value in the cell (deterministic tie-break on
    ``tiebreak_col``), carried forward across empty cells with
    last(ignorenulls) over (key ORDER BY cell). Values pass through
    untouched (no arithmetic), so engine parity is exact.

    Shape: ONE aggregate on (key, cell) — corpus-sized input reduced
    to cell-sized — then the grid explode and the LOCF window run on
    CELL-sized data (per-key fan-out = the key's time span in steps,
    not its event count). A bot key with 1e9 events in one hour costs
    the same downstream as a key with one event.

    ``step`` must be exactly '1 <unit>' of a date_trunc unit: cells
    are assigned by truncating to the unit, so a multi-unit stride
    ('2 hour') would put events in cells the grid never visits —
    silently dropping them — and a sub-unit stride can't be expressed
    by truncation at all. Rejected loudly here.
    """
    parts = step.split()
    allowed = {"year", "quarter", "month", "week", "day",
               "hour", "minute", "second"}
    if len(parts) != 2 or parts[0] != "1" or parts[1] not in allowed:
        raise ValueError(
            f"step must be '1 <unit>' with unit in {sorted(allowed)}; "
            f"got {step!r} (cells truncate to the unit, so any other "
            f"stride would desynchronize cells from the grid)")
    unit = parts[1]
    cell = F.date_trunc(unit, F.col(ts_col))
    # spread before the (key, cell) aggregate: a single-row-group
    # event table scans as ONE task and the partial aggregate is the
    # query's dominant stage (guide §2.5); hash on the key keeps
    # routing deterministic under retry
    from mr_mpi_blast_spark.session import spread_for_compute
    events = spread_for_compute(events, key_col)
    per_cell = (events.groupBy(F.col(key_col), cell.alias("cell"))
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.max_by(value_col, F.struct(ts_col, tiebreak_col))
                     .alias("last_value")))
    spans = per_cell.groupBy(key_col).agg(F.min("cell").alias("lo"),
                                          F.max("cell").alias("hi"))
    grid = spans.select(
        key_col,
        F.explode(F.sequence("lo", "hi",
                             F.expr(f"interval {step}"))).alias("cell"))
    w = (Window.partitionBy(key_col).orderBy("cell")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    j = grid.join(per_cell, [key_col, "cell"], "left")
    return j.select(
        key_col, "cell",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("last_value", ignorenulls=True).over(w).alias("value_locf"))


def retention_matrix(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention: keys grouped by first-activity day, counted
    on each later day-offset they were active (the engagement matrix
    behind every 'day-N retention' dashboard).

    Two hash aggregates (first day per key; distinct key-days) and a
    key-equi-join — all shuffles on the key, offsets by exact date
    arithmetic. Output: (cohort_day, day_offset, n_active).
    """
    day = F.to_date(F.col(ts_col))
    first = (events.groupBy(key_col)
             .agg(F.min(day).alias("cohort_day")))
    active = events.select(key_col, day.alias("day")).distinct()
    return (active.join(first, key_col)
            .groupBy("cohort_day",
                     F.datediff("day", "cohort_day").alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_active")))
