"""span_or / span_not (operators/topk.py, plans/query_index.py, DSL routes):
declarative vs DuckDB oracle vs serving kernel, pinned span semantics
(summed-idf union spans; pre/post forbidden window; include-only scoring),
refusal surface, repartition invariance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.dsl import (
    dsl_search,
    dsl_search_index,
    dsl_search_sql,
)
from flume_elasticsearch_2_spark.operators.topk import (
    bm25_span_not_topk,
    bm25_span_not_topk_sql,
    bm25_span_or_topk,
    bm25_span_or_topk_sql,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def pos_searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spanidx") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=4, store_positions=True)
    return IndexSearcher(spark, d)


@pytest.fixture(scope="module")
def freq_searcher(spark, documents, tmp_path_factory):
    # span_or never needs positions — pin that a freq-only index serves it
    d = str(tmp_path_factory.mktemp("spanfreq") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=4)
    return IndexSearcher(spark, d)


@pytest.mark.parametrize(
    "terms",
    [["dup", "merge", "vector"], ["batch"], ["dup", "zzzznotaterm"]],
)
def test_span_or_matches_duckdb(documents, duck, terms):
    got = [tuple(r) for r in bm25_span_or_topk(documents, terms, k=10).collect()]
    want = duck.execute(bm25_span_or_topk_sql(terms, k=10)).fetchall()
    assert got == [tuple(r) for r in want] and got


def test_span_or_duplicate_clauses_collapse(documents):
    a = [tuple(r) for r in bm25_span_or_topk(documents, ["dup", "merge"], k=10).collect()]
    b = [
        tuple(r)
        for r in bm25_span_or_topk(documents, ["merge", "dup", "dup"], k=10).collect()
    ]
    assert a == b


def test_span_or_serving_rank_identical(documents, freq_searcher):
    for terms in (["dup", "merge", "vector"], ["dup", "zzzznotaterm"]):
        decl = [tuple(r) for r in bm25_span_or_topk(documents, terms, k=10).collect()]
        serv = [tuple(r) for r in freq_searcher.search_span_or(terms, k=10).collect()]
        assert serv == decl


@pytest.mark.parametrize("pre,post", [(0, 0), (2, 2), (0, 3), (5, 0)])
def test_span_not_matches_duckdb(documents, duck, pre, post):
    got = [
        tuple(r)
        for r in bm25_span_not_topk(
            documents, "batch", "scan", pre=pre, post=post, k=10
        ).collect()
    ]
    want = duck.execute(
        bm25_span_not_topk_sql("batch", "scan", pre=pre, post=post, k=10)
    ).fetchall()
    assert got == [tuple(r) for r in want] and got


def test_span_not_window_actually_excludes(documents, duck):
    """Widening the window can only shrink sf: total score mass at (5,5)
    must be <= at (0,0), and on this fixture strictly less (batch/scan
    co-occur)."""
    tight = {r[0]: r[1] for r in bm25_span_not_topk(documents, "batch", "scan").collect()}
    wide = {
        r[0]: r[1]
        for r in bm25_span_not_topk(documents, "batch", "scan", pre=5, post=5).collect()
    }
    assert sum(wide.values()) < sum(tight.values())


def test_span_not_missing_exclude_is_plain_term(documents):
    """exclude absent from the corpus -> every include span survives."""
    a = [
        tuple(r)
        for r in bm25_span_not_topk(documents, "batch", "zzzznotaterm", k=10).collect()
    ]
    b = [
        tuple(r)
        for r in bm25_span_not_topk(documents, "batch", "zzzznotaterm", pre=9, post=9, k=10).collect()
    ]
    assert a == b and a


def test_span_not_serving_rank_identical(documents, pos_searcher):
    for pre, post, exc in ((2, 2, "scan"), (0, 0, "scan"), (3, 0, "zzzznotaterm")):
        decl = [
            tuple(r)
            for r in bm25_span_not_topk(
                documents, "batch", exc, pre=pre, post=post, k=10
            ).collect()
        ]
        serv = [
            tuple(r)
            for r in pos_searcher.search_span_not(
                "batch", exc, pre=pre, post=post, k=10
            ).collect()
        ]
        assert serv == decl


def test_span_not_serving_needs_positions(freq_searcher):
    with pytest.raises(ValueError, match="store_positions"):
        freq_searcher.search_span_not("batch", "scan", k=10)


_B_OR = {
    "query": {"span_or": {"clauses": [
        {"span_term": {"text": "dup"}},
        {"span_term": {"text": "merge"}},
    ]}},
    "size": 10,
}
_B_NOT = {
    "query": {"span_not": {
        "include": {"span_term": {"text": "batch"}},
        "exclude": {"span_term": {"text": "scan"}},
        "dist": 2,
    }},
    "size": 10,
}


def test_dsl_three_engine_parity(documents, duck, pos_searcher):
    for body in (_B_OR, _B_NOT):
        a = [tuple(r) for r in dsl_search(documents, body).collect()]
        b = duck.execute(dsl_search_sql(body)).fetchall()
        c = [tuple(r) for r in dsl_search_index(pos_searcher, body).collect()]
        assert a == [tuple(r) for r in b] == c and a


def test_dsl_dist_equals_pre_post(documents):
    by_dist = [tuple(r) for r in dsl_search(documents, _B_NOT).collect()]
    explicit = {
        "query": {"span_not": {
            "include": {"span_term": {"text": "batch"}},
            "exclude": {"span_term": {"text": "scan"}},
            "pre": 2, "post": 2,
        }},
        "size": 10,
    }
    assert by_dist == [tuple(r) for r in dsl_search(documents, explicit).collect()]


def test_repartition_invariant(documents):
    a = [tuple(r) for r in bm25_span_not_topk(documents, "batch", "scan", pre=1, post=1).collect()]
    b = [
        tuple(r)
        for r in bm25_span_not_topk(
            documents.repartition(7), "batch", "scan", pre=1, post=1
        ).collect()
    ]
    assert a == b


def test_refusals(documents):
    with pytest.raises(ValueError, match="single analyzed token"):
        bm25_span_or_topk(documents, ["two words"])
    with pytest.raises(ValueError, match="span_or needs"):
        bm25_span_or_topk(documents, [])
    with pytest.raises(ValueError, match="must differ"):
        bm25_span_not_topk(documents, "batch", "batch")
    with pytest.raises(ValueError, match="pre/post"):
        bm25_span_not_topk(documents, "batch", "scan", pre=-1)
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"span_not": {
            "include": {"span_term": {"text": "a1"}},
            "exclude": {"span_term": {"text": "b1"}},
            "dist": 1, "pre": 1,
        }}})
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"span_or": {"clauses": [
            {"term": {"text": "dup"}}]}}})
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents.withColumnRenamed("lang", "l2"), {
            "query": {"span_or": {"clauses": [{"span_term": {"title": "dup"}}]}}})
