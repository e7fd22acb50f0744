"""Facets / aggregations (ES 1.x facets; delegation site
ElasticsearchSink.java:54) — declarative path vs DuckDB, serving path vs
declarative path (identity over the same match scope)."""

from __future__ import annotations

import os

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.facets import (
    histogram_facet,
    histogram_facet_sql,
    stats_facet,
    stats_facet_sql,
    terms_facet,
    terms_facet_sql,
)

CASES = [
    ("dup batch scan", "or"),
    ("join filter window", "and"),
    (None, "or"),  # match_all
    ("zzzznotaterm", "or"),  # empty match set
]


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("query,mode", CASES)
def test_terms_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in terms_facet(documents, query, "lang", size=10, mode=mode).collect()]
    want = _duck(sf_dir, terms_facet_sql(query, "lang", size=10, mode=mode))
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:2])
def test_stats_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in stats_facet(documents, query, "n_chars", mode=mode).collect()]
    want = _duck(sf_dir, stats_facet_sql(query, "n_chars", mode=mode))
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:3])
def test_histogram_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [
        tuple(r)
        for r in histogram_facet(documents, query, "n_chars", 100, mode=mode).collect()
    ]
    want = _duck(sf_dir, histogram_facet_sql(query, "n_chars", 100, mode=mode))
    assert got == want


# -- serving path ≡ declarative path ----------------------------------------


@pytest.fixture(scope="module")
def facet_searcher(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = os.path.join(str(tmp_path_factory.mktemp("facet_idx")), "idx")
    build_segments_partial(
        spark,
        documents,
        d,
        n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars"),
    )
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_terms_facet_identical(facet_searcher, documents, query, mode):
    got = [tuple(r) for r in facet_searcher.facet(query, "lang", size=10, mode=mode).collect()]
    want = [tuple(r) for r in terms_facet(documents, query, "lang", size=10, mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:2])
def test_serving_stats_facet_identical(facet_searcher, documents, query, mode):
    got = [tuple(r) for r in facet_searcher.facet(query, "n_chars", kind="stats", mode=mode).collect()]
    want = [tuple(r) for r in stats_facet(documents, query, "n_chars", mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:3])
def test_serving_histogram_facet_identical(facet_searcher, documents, query, mode):
    got = [
        tuple(r)
        for r in facet_searcher.facet(
            query, "n_chars", kind="histogram", interval=100, mode=mode
        ).collect()
    ]
    want = [
        tuple(r)
        for r in histogram_facet(documents, query, "n_chars", 100, mode=mode).collect()
    ]
    assert got == want


def test_serving_stats_empty_match_set(facet_searcher):
    row = facet_searcher.facet("zzzznotaterm", "n_chars", kind="stats").collect()[0]
    assert row["count"] == 0 and row["min"] is None and row["sum"] is None


def test_facet_rejects_unknown_kind(facet_searcher):
    with pytest.raises(ValueError):
        facet_searcher.facet(None, "lang", kind="percentiles")
    with pytest.raises(ValueError):
        facet_searcher.facet(None, "n_chars", kind="histogram", interval=0)
