"""Multi-field analyzed search (SURVEY §2.5 Q28): per-field BM25 match,
multi_match best_fields, dis_max — declarative vs DuckDB oracle, serving vs
declarative, and the DSL routing.

Reference analog: ES indexes every record-map field (SystemUtil.java:23-32);
1.x clients send {"match": {"<field>": ...}} / multi_match / dis_max
(delegation site ElasticsearchSink.java:54,66).

The second analyzed field is derived identically in both engines: ``title``
= the first five analyzed tokens of ``text`` joined by spaces.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col
from flume_elasticsearch_2_spark.operators.multifield import (
    bm25_dismax_topk,
    bm25_multi_match_topk,
    dismax_topk_sql,
    multi_match_topk_sql,
)
from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

TITLE_SQL = "array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:5], ' ')"
FIELD_EXPRS = {"title": TITLE_SQL}


def title_col():
    return F.array_join(F.slice(tokens_col("text"), 1, 5), " ")


@pytest.fixture(scope="module")
def fdocs(documents):
    return documents.withColumn("title", title_col())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_field_match_matches_duckdb(fdocs, duck):
    """match on a non-default analyzed field == bm25_topk over that column;
    the oracle tokenizes the identical derived expression."""
    got = [tuple(r) for r in bm25_topk(fdocs, "dup batch", k=10, text_col="title").collect()]
    want = duck.execute(
        bm25_topk_sql("dup batch", k=10, text_expr=TITLE_SQL)
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert got, "field match must hit (title carries leading tokens)"


@pytest.mark.parametrize(
    "mode,tb",
    [("or", 0.0), ("and", 0.0), ("or", 0.3)],
    ids=["or_tb0", "and_tb0", "or_tb03"],
)
def test_multi_match_matches_duckdb(fdocs, duck, mode, tb):
    got = [
        tuple(r)
        for r in bm25_multi_match_topk(
            fdocs, "dup batch scan", ["title", "text"], k=10, mode=mode, tie_breaker=tb
        ).collect()
    ]
    want = duck.execute(
        multi_match_topk_sql(
            "dup batch scan", ["title", "text"], k=10, mode=mode, tie_breaker=tb,
            field_exprs=FIELD_EXPRS,
        )
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert got


def test_dismax_mixed_clauses_matches_duckdb(fdocs, duck):
    clauses = [("title", "dup batch", "or"), ("text", "join filter window", "and")]
    got = [
        tuple(r)
        for r in bm25_dismax_topk(fdocs, clauses, k=10, tie_breaker=0.2).collect()
    ]
    want = duck.execute(
        dismax_topk_sql(clauses, k=10, tie_breaker=0.2, field_exprs=FIELD_EXPRS)
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert got


def test_single_field_multi_match_equals_plain_match(fdocs):
    """multi_match over exactly [text] degenerates to the plain match (same
    docs, same round6 scores; ordering contract identical on this fixture)."""
    mm = [tuple(r) for r in bm25_multi_match_topk(fdocs, "dup batch scan", ["text"], k=10).collect()]
    plain = [tuple(r) for r in bm25_topk(fdocs, "dup batch scan", k=10).collect()]
    assert mm == plain


def test_dismax_absent_and_empty_clauses(fdocs):
    """AND clause with an absent term can never match; a dis_max of only such
    clauses is empty; mixing keeps the live clause's ranking."""
    dead = [("text", "zzzznotaterm dup", "and")]
    assert bm25_dismax_topk(fdocs, dead, k=10).count() == 0
    live = [("text", "dup batch", "or")]
    mixed = [tuple(r) for r in bm25_dismax_topk(fdocs, dead + live, k=10).collect()]
    only = [tuple(r) for r in bm25_dismax_topk(fdocs, live, k=10).collect()]
    assert mixed == only


# -- serving path -------------------------------------------------------------


@pytest.fixture(scope="module")
def mf_searcher(spark, fdocs, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_multifield_index
    from flume_elasticsearch_2_spark.plans.query_index import MultiFieldIndexSearcher

    d = str(tmp_path_factory.mktemp("mfidx") / "mfidx")
    build_multifield_index(
        spark, fdocs, d, fields=["text", "title"], n_shards=4,
        orig_ids=fdocs.select("doc_id", "lang", "n_chars", "text"),
    )
    return MultiFieldIndexSearcher(spark, d)


def test_serving_field_match_equals_declarative(fdocs, mf_searcher):
    got = [
        tuple(r)
        for r in mf_searcher.search("dup batch", field="title", k=10).collect()
    ]
    want = [tuple(r) for r in bm25_topk(fdocs, "dup batch", k=10, text_col="title").collect()]
    assert got == want and got


def test_serving_default_field_equals_single_field_index(fdocs, mf_searcher):
    got = [tuple(r) for r in mf_searcher.search("dup batch scan", k=10).collect()]
    want = [tuple(r) for r in bm25_topk(fdocs, "dup batch scan", k=10).collect()]
    assert got == want and got


@pytest.mark.parametrize("mode", ["or", "and"])
def test_serving_multi_match_equals_declarative(fdocs, mf_searcher, mode):
    got = [
        tuple(r)
        for r in mf_searcher.multi_match(
            "dup batch scan", ["title", "text"], k=10, mode=mode
        ).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_multi_match_topk(
            fdocs, "dup batch scan", ["title", "text"], k=10, mode=mode
        ).collect()
    ]
    assert got == want and got


def test_serving_dismax_mixed_clauses_equals_declarative(fdocs, mf_searcher):
    clauses = [("title", "dup batch", "or"), ("text", "join filter window", "and")]
    got = [tuple(r) for r in mf_searcher.dis_max(clauses, k=10).collect()]
    want = [tuple(r) for r in bm25_dismax_topk(fdocs, clauses, k=10).collect()]
    assert got == want and got


def test_serving_dismax_rejects_tie_breaker(mf_searcher):
    """tie_breaker > 0 breaks the per-clause top-k union bound; the serving
    combiner must refuse rather than silently under-rank."""
    with pytest.raises(ValueError, match="tie_breaker"):
        mf_searcher.dis_max([("text", "dup", "or")], k=10, tie_breaker=0.5)


def test_multifield_manifest_and_field_pruning(mf_searcher):
    """The field dimension is a directory partition: a match on one field
    reads only that field's postings tree (sub-searchers point inside
    field=<f>/), and per-field stats are per-field."""
    import os

    assert sorted(mf_searcher.fields) == ["text", "title"]
    for f in mf_searcher.fields:
        sub = mf_searcher.field_searcher(f)
        assert f"field={f}" in sub.index_dir
        assert os.path.isdir(os.path.join(sub.index_dir, "postings"))
    # per-field avgdl differs (title is 5 tokens, text is hundreds)
    assert (
        mf_searcher.field_searcher("title").avgdl
        < mf_searcher.field_searcher("text").avgdl / 2
    )


# -- DSL routing --------------------------------------------------------------


def test_dsl_field_match_and_multi_match(fdocs, duck, mf_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_index,
        dsl_search_sql,
    )

    analyzed = ["text", "title"]
    bodies = [
        {"query": {"match": {"title": "dup batch"}}},
        {
            "query": {
                "multi_match": {
                    "query": "dup batch scan",
                    "fields": ["title", "text"],
                }
            }
        },
        {
            "query": {
                "dis_max": {
                    "queries": [
                        {"match": {"title": "dup batch"}},
                        {"match": {"text": {"query": "join filter window", "operator": "and"}}},
                    ],
                    "tie_breaker": 0.2,
                }
            }
        },
        # most_fields = per-field SUM = dis_max with tie_breaker pinned to 1
        {
            "query": {
                "multi_match": {
                    "query": "dup batch scan",
                    "fields": ["title", "text"],
                    "type": "most_fields",
                }
            }
        },
        # 1.x multi-field query_string == dis_max over per-field queries
        {
            "query": {
                "query_string": {
                    "query": "dup batch scan",
                    "fields": ["title", "text"],
                }
            }
        },
        {
            "query": {
                "query_string": {
                    "query": "dup batch",
                    "fields": ["title", "text"],
                    "default_operator": "and",
                    "tie_breaker": 0.2,
                }
            }
        },
        # use_dis_max=false == per-field sum == tie_breaker 1
        {
            "query": {
                "query_string": {
                    "query": "dup batch scan",
                    "fields": ["title", "text"],
                    "use_dis_max": False,
                }
            }
        },
    ]
    for body in bodies:
        got = [
            tuple(r)
            for r in dsl_search(fdocs, body, analyzed_fields=analyzed).collect()
        ]
        want = duck.execute(
            dsl_search_sql(body, analyzed_fields=analyzed, field_exprs=FIELD_EXPRS)
        ).fetchall()
        assert got == [tuple(r) for r in want] and got, body
        q = body["query"]
        tb = q.get("dis_max", {}).get("tie_breaker", 0.0) or q.get(
            "query_string", {}
        ).get("tie_breaker", 0.0)
        if q.get("multi_match", {}).get("type") == "most_fields":
            tb = 1.0  # pinned by the parse; serving refuses it loudly
        if q.get("query_string", {}).get("use_dis_max") is False:
            tb = 1.0
        if tb == 0.0:  # serving combiner supports tie_breaker=0 only
            srv = [
                tuple(r)
                for r in dsl_search_index(
                    mf_searcher, body, analyzed_fields=analyzed
                ).collect()
            ]
            assert srv == got, body


def test_dsl_rejects_unknown_fields_and_tb_on_serving(mf_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search_index, parse_body

    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"match": {"title": "x"}}})  # title not analyzed by default
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body(
            {"query": {"multi_match": {"query": "x", "fields": ["text", "nosuch"]}}},
            analyzed_fields=["text", "title"],
        )
    with pytest.raises(ValueError, match="tie_breaker"):
        dsl_search_index(
            mf_searcher,
            {
                "query": {
                    "multi_match": {
                        "query": "dup",
                        "fields": ["text", "title"],
                        "tie_breaker": 0.4,
                    }
                }
            },
            analyzed_fields=["text", "title"],
        )
