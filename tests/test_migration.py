"""Capstone migration path: what a reference-deployment user actually runs,
end to end on this engine — TRS record files (FileSource.java's format) →
IR_SID upsert dedup (ElasticsearchSink.java:67 semantics) → inverted-index
build → the very JSON search bodies their ES clients send (query DSL),
answered rank-identically to the declarative engine and the DuckDB oracle.

Every stage is unit-tested elsewhere; this test pins the COMPOSITION."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.dsl import (
    dsl_search,
    dsl_search_index,
    dsl_search_sql,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
from flume_elasticsearch_2_spark.sources.trs import read_trs, trs_dedup_by_sid

BODIES = [
    {"query": {"match": {"text": "dup batch scan"}}},
    {"query": {"query_string": {"query": "batch scan -slow"}}},
    {"query": {"bool": {"must": [{"match": {"text": "batch small"}}],
                        "filter": [{"range": {"n_chars": {"gte": 10}}}]}}},
]


@pytest.fixture(scope="module")
def migrated(spark, documents, tmp_path_factory):
    """Render the sf corpus as TRS files (with one redelivered record to
    exercise the upsert), read it back through the compat source, and build
    the index from the parsed records."""
    d = tmp_path_factory.mktemp("mig")
    rows = documents.select("doc_id", "text", "lang", "n_chars").collect()
    # two files; record a1 redelivered in the second with updated text wins
    def rec(r, text=None):
        return (
            f"<REC>\n<IR_SID>={r.doc_id}\n<IR_CONTENT>={text if text is not None else r.text}\n"
            f"<IR_LANG>={r.lang}\n"
        )

    half = len(rows) // 2
    (d / "part1.trs").write_text("".join(rec(r) for r in rows[:half]), encoding="utf-8")
    (d / "part2.trs").write_text(
        "".join(rec(r) for r in rows[half:]) + rec(rows[0], text="superseded text gone"),
        encoding="utf-8",
    )
    parsed = trs_dedup_by_sid(read_trs(spark, str(d)), ["IR_CONTENT", "IR_LANG"])
    docs = parsed.select(
        F.col("IR_SID").cast("long").alias("doc_id"),
        F.col("IR_CONTENT").alias("text"),
        F.col("IR_LANG").alias("lang"),
        F.length("IR_CONTENT").cast("long").alias("n_chars"),
    )
    idx = str(tmp_path_factory.mktemp("migidx") / "segidx")
    build_segments_partial(
        spark, docs, idx, n_shards=4,
        orig_ids=docs.select("doc_id", "lang", "n_chars", "text"),
    )
    return docs, IndexSearcher(spark, idx)


def test_upsert_applied_before_index(migrated):
    docs, searcher = migrated
    row = docs.where("doc_id = 0").collect()[0]
    assert row.text == "superseded text gone"  # redelivery won
    assert docs.count() == docs.select("doc_id").distinct().count()
    # and the index serves the superseded content, not the original
    hits = searcher.search("superseded gone", k=5).collect()
    assert any(r.doc_id == 0 for r in hits)


@pytest.mark.parametrize("body", BODIES, ids=["match", "query_string", "bool_range"])
def test_client_bodies_rank_identical_across_paths(spark, migrated, body):
    docs, searcher = migrated
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(docs, body).collect()]
    assert got == want and got


def test_client_body_matches_duckdb_on_migrated_corpus(migrated):
    docs, searcher = migrated
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    body = BODIES[0]
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in con.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got
