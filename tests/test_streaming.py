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
