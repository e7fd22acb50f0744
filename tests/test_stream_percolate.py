"""streaming/percolate.py — percolating a document stream against the
registered-query table: the declarative OR form and the batch-drain
foreachBatch form both match the STATIC percolation kernel exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.percolate import (
    mpercolate,
    register_queries,
)
from flume_elasticsearch_2_spark.streaming.percolate import (
    percolate_matches_stream,
    percolate_stream_foreach,
)


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("percstream") / "docs")
    rows = [
        (1, "a dup row with batch scan"),
        (2, "slow join over the window"),
        (3, "batch scan and filter"),
        (4, "nothing relevant here"),
        (5, "dup dup dup"),
        (6, "scan filter join"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        3
    ).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def rules_or(spark):
    return register_queries(
        spark.createDataFrame(
            [(10, "dup", "or"), (11, "batch scan", "or"), (12, "window slow", "or")],
            "query_id long, query string, mode string",
        )
    ).cache()


@pytest.fixture(scope="module")
def rules_mixed(spark):
    return register_queries(
        spark.createDataFrame(
            [(10, "dup", "or"), (11, "batch scan", "and"), (12, "scan filter join", "and")],
            "query_id long, query string, mode string",
        )
    ).cache()


def _stream(spark, doc_dir):
    return spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(doc_dir)


def test_declarative_or_stream_matches_static(spark, doc_dir, rules_or, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("p1") / "ckpt")
    out = percolate_matches_stream(_stream(spark, doc_dir), rules_or)
    q = (
        out.writeStream.format("memory")
        .queryName("perc_or")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table("perc_or").select("doc_id", "query_id").collect()
    )
    docs = spark.read.parquet(doc_dir)
    want = sorted(tuple(r) for r in mpercolate(rules_or, docs).collect())
    assert got == want and got


def test_declarative_stream_is_stateless_across_batches(spark, rules_or, tmp_path_factory):
    """Round-5 advice fix: the declarative plan must hold ZERO cross-batch
    state — a doc re-ingested in a later micro-batch (an update) re-matches
    and is emitted AGAIN, not suppressed by a global streaming dedup; and
    the physical plan contains no stateful dedup operator."""
    d = str(tmp_path_factory.mktemp("p3") / "docs")
    spark.createDataFrame(
        [(1, "a dup row")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(
        [(1, "a dup row updated")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(d)
    out = percolate_matches_stream(_stream(spark, d), rules_or)
    # plan hygiene: no dedup/aggregate state operator anywhere in the plan
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Deduplicate" not in plan and "Aggregate" not in plan
    ckpt = str(tmp_path_factory.mktemp("p3") / "ckpt")
    q = (
        out.writeStream.format("memory")
        .queryName("perc_restate")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r)
        for r in spark.table("perc_restate").select("doc_id", "query_id").collect()
    )
    # doc 1 matches rule 10 in BOTH batches -> two emissions
    assert got == [(1, 10), (1, 10)]
    # and the state store really is empty
    prog = q.lastProgress
    if prog and prog.get("stateOperators") is not None:
        assert all(
            op.get("numRowsTotal", 0) == 0 for op in prog["stateOperators"]
        )


def test_declarative_refuses_and_rules_and_batch_input(spark, doc_dir, rules_mixed):
    with pytest.raises(ValueError, match="and-mode"):
        percolate_matches_stream(_stream(spark, doc_dir), rules_mixed)
    with pytest.raises(ValueError, match="streaming"):
        percolate_matches_stream(spark.read.parquet(doc_dir), rules_mixed)


def test_foreach_batch_drain_full_semantics(spark, doc_dir, rules_mixed, tmp_path_factory):
    """The batch-drain form runs the full kernel per micro-batch (both rule
    modes) and the union over batches equals static batch percolation; the
    maxFilesPerTrigger=1 source guarantees >= 2 micro-batches actually ran."""
    ckpt = str(tmp_path_factory.mktemp("p2") / "ckpt")
    seen: list[tuple[int, int]] = []
    batches: list[int] = []

    def sink(matches, batch_id):
        batches.append(batch_id)
        seen.extend((r.doc_id, r.query_id) for r in matches.collect())

    q = percolate_stream_foreach(
        _stream(spark, doc_dir), rules_mixed, sink, ckpt
    )
    q.awaitTermination(120)
    docs = spark.read.parquet(doc_dir)
    want = sorted(tuple(r) for r in mpercolate(rules_mixed, docs).collect())
    assert sorted(seen) == want and want
    assert len(batches) >= 2  # really streamed, not one collapsed batch
    # and-mode semantics held through the stream: doc 3 ("batch scan and
    # filter") matches rule 11 (batch AND scan) but doc 1 does too; doc 6
    # matches rule 12 (all three terms), doc 3 does not (no join)
    assert (6, 12) in seen and (3, 12) not in seen
