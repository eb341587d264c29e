"""Streaming operators over the events table.

Batch/stream parity is the design rule: every aggregate here has the
same shape as its batch twin in entry_queries (events_hourly), so a
pipeline can be validated in batch and deployed on the stream.

Scale notes (100 TB/day): all aggregates are keyed on
(window, event_type) or (window, user_id) — state is bounded by
watermark horizon x key cardinality, never by input volume. The
stateful operator keeps O(1) state per user and emits in update mode;
late data beyond the watermark is dropped by Spark, matching the
declared correctness contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType, TimestampType, DoubleType)

EVENTS = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over an events parquet directory.

    The schema is pinned (streams cannot infer), with the same
    TIMESTAMP(NANOS) accommodation as the batch loader: if the files
    carry int64 nanos (spark.sql.legacy.parquet.nanosAsLong), convert
    via integer division to micros."""
    nanos = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    schema = (StructType([f if f.name != "ts" else StructField("ts", LongType())
                          for f in EVENTS.fields])
              if nanos else EVENTS)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if nanos:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed counts per event type — the streaming
    twin of the batch events_hourly query. Watermark bounds state and
    defines the late-data cutoff."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("hour"),
                    "event_type", "n", "total_value"))


def sliding_value_stats(events: DataFrame, watermark: str = "2 hours",
                        length: str = "30 minutes",
                        slide: str = "10 minutes") -> DataFrame:
    """Sliding-window value stats (overlapping windows: each event
    lands in length/slide windows)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", length, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 4).alias("avg_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("w_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm").alias("w_end"),
                    "event_type", "n", "avg_value"))


def session_aggregate(events: DataFrame, gap: str = "5 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Per-user sessions via the declarative session window (gap-based,
    merges as events arrive). Spark-first: no hand-rolled state."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "total_value"))


_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])
_TOTALS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update_user_totals(key: tuple[Any, ...],
                        pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 4)]})


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-user event count + value total, emitted in update mode each
    micro-batch. The pattern to copy for operators the built-in
    windows can't express (running models, CUSUM detectors, custom
    eviction). State is O(1) per user."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=_TOTALS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_stream(events: DataFrame, watermark: str = "2 hours",
                 keys: tuple[str, ...] = ("event_id",)) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    dedup_exact operator (operators/dedup.py). A batch hash-groupBy
    can see the whole corpus; a stream must declare a horizon:
    ``dropDuplicatesWithinWatermark`` keeps the seen-key set bounded
    by watermark span x key arrival rate, and drops the state as the
    watermark passes — the only form that survives an unbounded
    stream."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def dedup_content_stream(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Content-digest streaming dedup: md5 over the payload columns
    (the same digest-not-text rule as the batch exact dedup — state
    stores 32 hex chars per distinct payload, never the payload).
    Training-data shape: replace the concat with md5(text) on a
    document stream."""
    digest = F.md5(F.concat_ws(
        "\x1f", F.col("user_id").cast("string"), "event_type",
        F.format_number(F.col("value"), 6), "props"))
    return (events.withColumn("content_md5", digest)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_md5"]))


def click_error_interval_join(clicks: DataFrame, errors: DataFrame,
                              horizon: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each click pairs with the same
    user's errors in the preceding ``horizon`` (the streaming
    counterpart of the batch as-of family — here ALL in-horizon
    matches, not just the latest, because a stream can't know a later
    error won't arrive until the watermark passes).

    Both sides carry watermarks and the join condition time-bounds the
    match window, so Spark can evict buffered rows once the watermark
    clears them — state is O(arrival rate x horizon) per side, finite
    on an unbounded stream. Works identically on batch DataFrames
    (watermarks are no-ops there): the parity test runs the same
    function both ways and compares."""
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
    e = errors.select(F.col("user_id").alias("e_user"),
                      F.col("event_id").alias("err_id"),
                      F.col("ts").alias("e_ts"))
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    cond = ((F.col("c_user") == F.col("e_user"))
            & (F.col("e_ts") <= F.col("c_ts"))
            & (F.col("e_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}")))
    return (c.join(e, cond)
            .select("click_id", F.col("c_user").alias("user_id"),
                    "c_ts", "err_id", "e_ts"))


def click_error_asof_join(clicks: DataFrame, errors: DataFrame,
                          horizon: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Stream-stream AS-OF join (r11): each click gets the same
    user's LATEST error at-or-before it within the trailing
    ``horizon`` — nulls when none (left semantics) — the streaming
    twin of operators/temporal.asof_join / events_asof_join.

    Two watermarked stateful operators chained in append mode:
    (1) a time-interval LEFT OUTER join (bounded buffer per side —
    rows evict once the watermark clears them), then (2) a per-click
    max(struct(e_ts, err_id)) aggregation grouped on the click's
    event-time column, which emits a click's single answer only once
    the watermark passes its timestamp — i.e. once no earlier error
    can still arrive. A null-field struct sorts below any real match,
    so the unmatched-left row never beats one.

    The UNBOUNDED batch as-of cannot be bounded-state on a stream (a
    click might match an error arbitrarily far back); the horizon IS
    the streaming contract, so batch parity is against the
    horizon-bounded batch twin: this same function on batch frames
    (watermarks are no-ops; the aggregation emits immediately).
    Ties (several errors at one (user, ts)) resolve to the max
    err_id in both forms — asof_join's dedup rule.

    OPERATIONAL CAVEAT: the global watermark is the MIN across both
    watermarked inputs (Spark's multipleWatermarkPolicy default), so
    a click's answer flushes only once the ERROR stream's event time
    has also advanced past it — an idle error topic stalls emission
    (not correctness). The parity test advances both sides with
    sentinel rows for exactly this reason.
    """
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
    e = errors.select(F.col("user_id").alias("e_user"),
                      F.col("event_id").alias("err_id"),
                      F.col("ts").alias("e_ts"))
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    cond = ((F.col("c_user") == F.col("e_user"))
            & (F.col("e_ts") <= F.col("c_ts"))
            & (F.col("e_ts")
               >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}")))
    j = c.join(e, cond, "leftOuter")
    best = F.max(F.struct(F.col("e_ts"), F.col("err_id"))).alias("best")
    return (j.groupBy("click_id", "c_user", "c_ts").agg(best)
            .select("click_id", F.col("c_user").alias("user_id"),
                    "c_ts", F.col("best.err_id").alias("err_id"),
                    F.col("best.e_ts").alias("e_ts")))


def hdr_sketch_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/profile.hdr_sketch over the events
    value column (integer cents): the same bit-length bucket ladder as
    a streaming aggregation, maintained in complete/update mode. The
    sketch IS the state — at most a few thousand bucket rows however
    long the stream runs (no watermark needed: the state is bounded by
    the VALUE DOMAIN, not by time, which is the whole point of a
    mergeable sketch as a streaming aggregate). Drained result equals
    the batch sketch row-for-row (stream==batch parity test); the
    NULL/negative guard is the SAME rendering the batch sketch uses
    (r11 review — a guardless twin silently bucketed values the batch
    path rejects loudly)."""
    from mr_mpi_blast_spark.operators.profile import \
        hdr_guarded_bucket_spark
    cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    return (events
            .select(F.expr(hdr_guarded_bucket_spark(cents))
                    .alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def stream_to_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str,
                      timeout_s: int = 120) -> None:
    """Durable streaming sink: drain all available input into a
    parquet directory with exactly-once file-sink semantics. The
    checkpoint directory carries source offsets AND the file-sink
    manifest (_spark_metadata), so a stopped/restarted query neither
    re-reads input it already committed nor double-writes output —
    restart with the SAME checkpoint_dir and only new input appears.
    This is the production shape of every batch sink in sinks/ when
    the input is unbounded; memory-sink draining (run_available_now)
    is the test harness."""
    q = (df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True).start())
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # a hung drain must fail loudly, not return with a partial
        # directory the caller then treats as complete; the checkpoint
        # makes the retry safe (exactly-once resume)
        q.stop()
        raise TimeoutError(
            f"stream_to_parquet: drain did not finish within "
            f"{timeout_s}s (checkpoint {checkpoint_dir!r} preserved; "
            f"rerun to resume exactly-once)")


def run_available_now(df: DataFrame, query_name: str,
                      output_mode: str = "complete",
                      timeout_s: int = 120) -> DataFrame:
    """Drain all available input through the streaming query into an
    in-memory table and return it as a DataFrame (test/validation
    harness; production sinks are parquet/kafka via writeStream)."""
    q = (df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"run_available_now({query_name!r}): drain did not finish "
            f"within {timeout_s}s")
    return df.sparkSession.table(query_name)
