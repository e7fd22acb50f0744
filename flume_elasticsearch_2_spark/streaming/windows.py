"""Event-time windowed aggregation with a watermark — the Structured
Streaming late-data contract (brief: "watermarks + windowed aggs for late
data").

The ingest pipeline (streaming/ingest.py) moves documents; operational
monitoring over the SAME stream needs per-window rollups that are correct
under out-of-order arrival: a count emitted per (event-time window, key),
finalized exactly once when the watermark passes the window end, with
too-late rows dropped — never silently double-counted into an
already-emitted window. Reference analog: the Flume pipeline's only
time-based behavior is arrival-order batching (FileSource.java:176 rises a
watermark on file EOF but nothing consumes event time); this operator is
the event-time-correct form.

Scale shape (10^12 events): state is bounded by (active windows × keys) —
the watermark both drops late rows AND evicts finalized window state, so a
skewed key costs one state row per window, not per event. The aggregation
is a standard partial-agg shuffle per micro-batch keyed (window, key).
Append output mode = emit-once-on-finalize (the mode a downstream
idempotent sink wants); the numRowsDroppedByWatermark counter in query
progress is the observability hook (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Per-(event-time window, key) rollup of a STREAMING frame: count plus
    (optionally) the sum of ``value_col``. Tumbling by default; pass
    ``slide`` for sliding windows. The ``watermark`` delay is the lateness
    contract: rows older than (max seen event time − watermark) are dropped,
    and a window's row is final once the watermark passes its end.

    Returns a streaming DataFrame with columns ``(window_start, window_end,
    <key_col>, count[, sum_value])`` — run it with ``outputMode("append")``
    so each window emits exactly once."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("count")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("sum_value"))
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *(["count"] if value_col is None else ["count", "sum_value"]),
        )
    )


def dropped_late_rows(query) -> int:
    """Rows dropped by the watermark across the query's RETAINED progress
    history — the late-data observability counter. Spark keeps only the
    last ``spark.sql.streaming.numRecentProgressUpdates`` entries (default
    100), so for queries longer than that this is a recent-window count,
    not a lifetime total; a long-lived deployment should accumulate the
    same counter from a StreamingQueryListener instead."""
    total = 0
    for p in query.recentProgress:
        for op in p.get("stateOperators", []) if isinstance(p, dict) else []:
            total += int(op.get("numRowsDroppedByWatermark", 0))
    return total
