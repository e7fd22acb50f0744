"""Watermarked event-time windowed aggregation (streaming/windows.py):
late rows drop, finalized windows emit exactly once, counters observable."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.streaming.windows import (
    dropped_late_rows,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, path: str, rows: list[tuple]):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def _t(h: int, m: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, h, m, 0)


def test_windowed_counts_drop_late_rows(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("swin")
    src = str(base / "src")
    ckpt = str(base / "ckpt")

    sink = str(base / "out")

    def run(name):
        stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
        out = windowed_event_counts(
            stream, window="10 minutes", watermark="20 minutes", value_col="value"
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(sink)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    # batch 1: three events in [10:00, 10:10) + one at 11:00 that advances
    # the watermark to 10:40 (persisted in the checkpoint) before batch 2
    _write_batch(spark, os.path.join(src, "b1"), [
        (1, _t(10, 0), "view", 1.0),
        (2, _t(10, 2), "view", 2.0),
        (3, _t(10, 9), "click", 3.0),
        (4, _t(11, 0), "view", 4.0),
    ])
    run("swin_counts_a")
    # batch 2 (separate restart on the same checkpoint): one LATE event at
    # 10:02 — older than the 10:40 watermark, must be dropped, not
    # re-opened into the finalized window — and one fresh event at 10:45
    _write_batch(spark, os.path.join(src, "b2"), [
        (5, _t(10, 2), "view", 9.0),
        (6, _t(10, 45), "view", 5.0),
    ])
    q2 = run("swin_counts_b")

    rows = {
        (r.window_start, r.event_type): (r["count"], r.sum_value)
        for r in spark.read.parquet(sink).collect()
    }
    # the 10:00-10:10 window finalized with batch-1 data ONLY: the late
    # batch-2 duplicate at 10:02 (value 9.0) is absent
    assert rows[(_t(10, 0), "view")] == (2, 3.0)
    assert rows[(_t(10, 0), "click")] == (1, 3.0)
    # unfinalized windows (10:40+, 11:00) never emitted in append mode
    assert all(ws < _t(10, 40) for ws, _ in rows)
    # and the drop is observable in the progress counters
    assert dropped_late_rows(q2) >= 1


def test_windowed_counts_sliding(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("swin2")
    src = str(base / "src")
    _write_batch(spark, os.path.join(src, "b1"), [
        (1, _t(10, 4), "view", 1.0),
        (2, _t(12, 0), "view", 0.0),  # watermark pusher finalizes everything
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    out = windowed_event_counts(
        stream, window="10 minutes", slide="5 minutes", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("swin_slide")
        .outputMode("append")
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    starts = sorted(
        r.window_start
        for r in spark.sql(
            "select * from swin_slide where window_start < timestamp'2026-01-01 11:00:00'"
        ).collect()
    )
    # a 10-min window sliding by 5: the 10:04 event lands in [10:00, 10:10)
    # and [09:55, 10:05)
    assert starts == [_t(9, 55), _t(10, 0)]
