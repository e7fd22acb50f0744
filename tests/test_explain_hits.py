"""ES search with "explain": true (SURVEY §2.5 Q20 companion): per-hit
per-term breakdown, oracle-checked + serving≡declarative + the Σpartial
identity per hit."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.explain_hits import (
    search_explain,
    search_explain_index,
    search_explain_sql,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

Q = "dup batch scan"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("exhidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars", "text"),
    )
    return IndexSearcher(spark, d)


def test_search_explain_matches_duckdb(documents, duck):
    got = [tuple(r) for r in search_explain(documents, Q, k=5).collect()]
    want = [tuple(r) for r in duck.execute(search_explain_sql(Q, k=5)).fetchall()]
    assert got == want
    assert len({r[0] for r in got}) == 5  # five hits, each with rows


def test_sum_partial_equals_score_per_hit(documents):
    rows = search_explain(documents, Q, k=5).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        assert abs(sum(r["partial"] for r in rs) - rs[0]["score"]) < 5e-6, doc_id


def test_serving_equals_declarative(documents, searcher):
    got = [tuple(r) for r in search_explain_index(searcher, Q, k=5).collect()]
    want = [tuple(r) for r in search_explain(documents, Q, k=5).collect()]
    assert got == want


def test_boosts_and_mode_thread_through(documents, duck):
    got = [
        tuple(r)
        for r in search_explain(
            documents, "dup batch", k=4, mode="and", boosts={"dup": 2.0}
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            search_explain_sql("dup batch", k=4, mode="and", boosts={"dup": 2.0})
        ).fetchall()
    ]
    assert got == want
    assert all(r[3] == 2.0 for r in got if r[2] == "dup")  # qw carries the boost


def test_empty_query_returns_empty(documents):
    assert search_explain(documents, "", k=5).count() == 0


# -- DSL front door: "explain": true ---------------------------------------------


def test_dsl_explain_flag_all_three_executors(documents, searcher, duck):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_index,
        dsl_search_sql,
    )

    body = {"query": {"match": {"text": Q}}, "size": 5, "explain": True}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want
    serving = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    assert serving == got
    assert {len(r) for r in got} == {9}  # the 9-column breakdown contract


def test_dsl_explain_composition_refused(documents, searcher):
    import pytest as _pt

    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_index,
        dsl_search_sql,
    )

    bodies = [
        {"query": {"match": {"text": Q}}, "explain": True,
         "sort": [{"n_chars": "desc"}]},
        {"query": {"bool": {"must": [{"match": {"text": Q}}],
                            "filter": [{"term": {"lang": "en"}}]}},
         "explain": True},
        {"query": {"match_phrase": {"text": "part filter"}}, "explain": True},
        {"query": {"match": {"text": Q}}, "explain": True, "from": 3},
        {"query": {"match": {"text": {"query": Q, "minimum_should_match": 2}}},
         "explain": True},
    ]
    for body in bodies:
        with _pt.raises(ValueError, match="explain"):
            dsl_search(documents, body)
        with _pt.raises(ValueError, match="explain"):
            dsl_search_sql(body)
        with _pt.raises(ValueError, match="explain"):
            dsl_search_index(searcher, body)
