"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming engine — its streaming-shaped behaviors are
daily idempotent snapshots and whole-world re-snapshots (derivatives
derivatives_snapshot_etl.py:48-56, live_data_pipeline.py:100-137). Here:

- ``windowed_agg``: tumbling/sliding event-time aggregation with watermark —
  works identically on a batch DataFrame (F.window is a plain function) and a
  streaming one, so batch queries double as the streaming oracle.
- ``sessionize_batch``: gap-based sessionization via lag+cumsum (batch) —
  the Window-function form of ``session_window`` for bounded data.
- ``run_stream_to_memory``: drive a streaming query from a bounded source to
  completion (availableNow semantics) for tests.

Scale: watermarks bound state; ``foreachBatch`` + idempotent partition
overwrite gives exactly-once daily sinks (the S10 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_agg(df: DataFrame, ts_col: str, window_len: str,
                 slide: str | None = None, keys: list[str] | None = None,
                 watermark: str | None = None) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation: count + sum(value).

    On a streaming df pass ``watermark`` (e.g. '10 minutes') to bound late
    data state; on batch it is ignored semantically but kept for parity.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_len, slide) if slide else F.window(F.col(ts_col), window_len)
    group = [win] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def sessionize_batch(df: DataFrame, entity_col: str, ts_col: str,
                     gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization on bounded data: a new session starts when
    the gap to the previous event exceeds ``gap_minutes``. One shuffle on
    the entity key; session ids are cumulative sums of boundary flags.

    Returns per-session rows: entity, session_id, session_start, session_end,
    n_events, sum_value.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_s)
    ).cast("long")
    with_id = df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_id.groupBy(entity_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "append"):
    """Drive a (bounded-source) streaming DataFrame to completion into an
    in-memory table; returns the StreamingQuery (stopped). Test harness for
    the streaming path."""
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return q
