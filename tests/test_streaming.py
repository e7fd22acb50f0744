from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.sources.webpages import write_webpages
from flume_elasticsearch_2_spark.streaming.ingest import (
    ingest_metrics,
    staged_docs,
    start_ingest,
)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "in")
    write_webpages(spark, 600, d, n_partitions=6)
    return d


def test_stream_ingest_available_now(spark, stream_input, tmp_path_factory):
    base = tmp_path_factory.mktemp("ingest")
    stage, ckpt = str(base / "stage"), str(base / "ckpt")

    from flume_elasticsearch_2_spark.functions.text import extract_text_col

    def transform(df):
        return df.withColumn("extracted", extract_text_col("html"))

    q = start_ingest(
        spark, stream_input, stage, ckpt, max_files_per_trigger=2, transform=transform
    )
    q.awaitTermination(120)

    docs = staged_docs(spark, stage)
    assert docs.count() == 600
    # transform applied and invariant held through the stream
    assert docs.where(F.col("extracted") != F.col("text")).count() == 0
    m = ingest_metrics(stage)
    assert m["docs"] == 600 and m["chunks"] >= 2

    # restart with same checkpoint: no new batches, no duplicates (S4)
    q2 = start_ingest(spark, stream_input, stage, ckpt, max_files_per_trigger=2)
    q2.awaitTermination(60)
    assert staged_docs(spark, stage).count() == 600


def test_stateful_stream_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState first-write-wins: a url seen in batch N is
    dropped in every later batch (state survives micro-batch boundaries)."""
    base = tmp_path_factory.mktemp("stateful")
    src, ckpt, out = str(base / "src"), str(base / "ckpt"), str(base / "out")

    from flume_elasticsearch_2_spark.sources.webpages import WEBPAGES_SCHEMA
    from flume_elasticsearch_2_spark.streaming.stateful import dedup_stream_first_wins

    # two input files -> (maxFilesPerTrigger=1) two micro-batches; url u1
    # appears in both, u2 only in the first, u3 only in the second
    import datetime as dt
    import os

    os.makedirs(src, exist_ok=True)
    ts = dt.datetime(2025, 1, 1)
    rows_a = [("u1", ts, b"<p>a</p>", "a", "en"), ("u2", ts, b"<p>b</p>", "b", "en")]
    rows_b = [("u1", ts, b"<p>c</p>", "c", "fr"), ("u3", ts, b"<p>d</p>", "d", "de")]
    spark.createDataFrame(rows_a, WEBPAGES_SCHEMA).coalesce(1).write.parquet(f"{src}/a")
    spark.createDataFrame(rows_b, WEBPAGES_SCHEMA).coalesce(1).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    deduped = dedup_stream_first_wins(stream, key_col="url", out_cols=("url", "lang"))
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.url, r.lang) for r in spark.read.parquet(out).collect()}
    assert ("u1", "en") in got or ("u1", "fr") in got
    assert sum(1 for u, _ in got if u == "u1") == 1  # exactly one u1 admitted
    assert ("u2", "en") in got and ("u3", "de") in got
    assert len(got) == 3
