"""Structured Streaming surface (SURVEY §2.10).

The reference has no streaming — its closest construct is NUMITER batch
iteration (mrblast.cpp:199-222, doc/USERGUIDE:508-517), which the batch
pipeline keeps as a driver loop. This package is the beyond-reference
streaming layer a training-data platform needs: file-source event
streams, watermarked windowed aggregates, declarative session windows,
and a custom stateful operator via applyInPandasWithState — plus
kernel_stream: the reference's real operational mode (query-file parts
arriving over time against fixed DB volumes) as a foreachBatch stream
through the SAME block kernel as the batch pipeline, exactly-once by
per-batch output directories.
"""

from mr_mpi_blast_spark.streaming.kernel_stream import (  # noqa: F401
    read_stream_hits,
    search_query_stream,
)
from mr_mpi_blast_spark.streaming.events import (
    click_error_interval_join,
    click_error_asof_join,
    hdr_sketch_stream,
    read_event_stream,
    hourly_counts,
    sliding_value_stats,
    session_aggregate,
    stateful_user_totals,
    dedup_stream,
    dedup_content_stream,
    run_available_now,
    stream_to_parquet,
)

__all__ = [
    "read_event_stream", "hourly_counts", "sliding_value_stats",
    "session_aggregate", "stateful_user_totals", "dedup_stream",
    "dedup_content_stream", "run_available_now",
    "click_error_interval_join", "click_error_asof_join",
    "hdr_sketch_stream",
    "stream_to_parquet",
    "search_query_stream", "read_stream_hits",
]
