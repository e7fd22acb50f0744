"""ES _explain API (SURVEY §2.5): per-term BM25 breakdown, checked against
the DuckDB oracle, against the match query's own scores (sum(partial) ==
score), and serving path vs declarative.

Reference analog: the ES 1.x explain surface behind the sink
(ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.explain import explain_score, explain_score_sql
from flume_elasticsearch_2_spark.operators.topk import bm25_topk
from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

QUERY = "dup batch scan"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("expidx") / "segidx")
    build_index(spark, documents, d, n_shards=4)
    return IndexSearcher(spark, d)


@pytest.fixture(scope="module")
def top_ids(documents):
    return [r.doc_id for r in bm25_topk(documents, QUERY, k=5).collect()]


def test_explain_matches_duckdb(documents, duck, top_ids):
    for did in top_ids[:3]:
        got = [tuple(r) for r in explain_score(documents, QUERY, did).collect()]
        want = [tuple(r) for r in duck.execute(explain_score_sql(QUERY, did)).fetchall()]
        assert got == want and got, f"doc_id={did}"


def test_explain_partials_sum_to_match_score(documents, top_ids):
    hits = {r.doc_id: r.score for r in bm25_topk(documents, QUERY, k=5).collect()}
    for did in top_ids:
        rows = explain_score(documents, QUERY, did).collect()
        assert abs(sum(r.partial for r in rows) - hits[did]) < 2e-6, did


def test_explain_serving_equals_declarative(documents, searcher, top_ids):
    for did in top_ids[:3]:
        got = [tuple(r) for r in searcher.explain(QUERY, did).collect()]
        want = [tuple(r) for r in explain_score(documents, QUERY, did).collect()]
        assert got == want and got, f"doc_id={did}"


def test_explain_boosts_scale_partials(documents, top_ids):
    did = top_ids[0]
    base = {r.term: r.partial for r in explain_score(documents, QUERY, did).collect()}
    boosted = {
        r.term: r.partial
        for r in explain_score(documents, QUERY, did, boosts={"scan": 3.0}).collect()
    }
    if "scan" in base:
        assert abs(boosted["scan"] - round(base["scan"] * 3.0, 6)) < 2e-6
    for t in base:
        if t != "scan":
            assert boosted[t] == base[t]


def test_explain_empty_cases(documents, searcher):
    assert explain_score(documents, "", 0).count() == 0
    assert explain_score(documents, "zzzznotaterm", 0).count() == 0
    assert explain_score(documents, QUERY, 10**9).count() == 0
    assert searcher.explain("zzzznotaterm", 0).count() == 0
    assert searcher.explain(QUERY, 10**9).count() == 0


def test_explain_omits_absent_terms(documents, duck):
    """A term in the query but not in the doc contributes no row."""
    rows = explain_score(documents, "dup zzzznotaterm batch", 0).collect()
    assert all(r.term != "zzzznotaterm" for r in rows)
