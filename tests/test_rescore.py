"""ES rescore API (phrase rescorer over the top-N window) vs the DuckDB
oracle and serving-vs-declarative.

Reference analog: the ES 1.x rescore surface (ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.rescore import (
    bm25_rescore,
    bm25_rescore_sql,
    rescore_serving,
)
from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

CASES = [
    dict(query="dup batch scan", rescore_phrase="part filter"),
    dict(query="batch small scan", rescore_phrase="batch small", window_size=25),
    dict(query="dup", rescore_phrase="zzzznotaterm zzz"),  # rescorer matches nothing
    dict(query="the fast", rescore_phrase="the fast", query_weight=0.5, rescore_weight=2.0),
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rsidx") / "segidx")
    build_index(spark, documents, d, n_shards=4, store_positions=True)
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("case", CASES, ids=[c["query"] for c in CASES])
def test_rescore_matches_duckdb(documents, duck, case):
    got = [tuple(r) for r in bm25_rescore(documents, k=10, **case).collect()]
    want = [tuple(r) for r in duck.execute(bm25_rescore_sql(k=10, **case)).fetchall()]
    assert got == want and got


@pytest.mark.parametrize("case", CASES, ids=[c["query"] for c in CASES])
def test_rescore_serving_equals_declarative(documents, searcher, case):
    got = [tuple(r) for r in rescore_serving(searcher, k=10, **case).collect()]
    want = [tuple(r) for r in bm25_rescore(documents, k=10, **case).collect()]
    assert got == want


def test_rescore_actually_reorders(documents):
    """The phrase rescorer must move phrase-bearing docs up inside the
    window (otherwise the test asserts nothing)."""
    base = [r.doc_id for r in bm25_rescore(documents, "batch small scan", "zzz zz", k=10).collect()]
    resc = [
        r.doc_id
        for r in bm25_rescore(
            documents, "batch small scan", "batch small", k=10, rescore_weight=5.0
        ).collect()
    ]
    assert base != resc


def test_rescore_never_leaves_window(documents):
    """Docs outside the base window can never appear, however strong the
    rescorer (ES contract)."""
    window = {
        r.doc_id
        for r in bm25_rescore(
            documents, "dup batch scan", "the fast", k=50, window_size=50, rescore_weight=100.0
        ).collect()
    }
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk

    base_ids = {r.doc_id for r in bm25_topk(documents, "dup batch scan", k=50).collect()}
    assert window <= base_ids
