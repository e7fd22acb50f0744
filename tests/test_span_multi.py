"""span_multi (operators/multiterm.py, plans/query_index.py, DSL routes):
the SpanMultiTermQueryWrapper rewrite — multi-term expansion scored as
span_or. Declarative vs DuckDB oracle vs serving, cap semantics, empty
rewrite, refusal surface."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.dsl import (
    dsl_search,
    dsl_search_index,
    dsl_search_sql,
)
from flume_elasticsearch_2_spark.operators.multiterm import (
    bm25_span_multi_topk,
    bm25_span_multi_topk_sql,
    expand_pattern,
)
from flume_elasticsearch_2_spark.operators.topk import bm25_span_or_topk
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def freq_searcher(spark, documents, tmp_path_factory):
    # span_multi rewrites to span_or -> a freq-only index serves it
    d = str(tmp_path_factory.mktemp("spanmulti") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=4)
    return IndexSearcher(spark, d)


@pytest.mark.parametrize(
    "pattern,kind,kw",
    [
        ("ve", "prefix", {}),
        ("me*e", "wildcard", {}),
        ("batc", "fuzzy", {"fuzziness": 1}),
        ("du[pm]", "regexp", {}),
    ],
)
def test_span_multi_matches_duckdb(documents, duck, pattern, kind, kw):
    got = [
        tuple(r)
        for r in bm25_span_multi_topk(documents, pattern, kind, k=10, **kw).collect()
    ]
    want = duck.execute(bm25_span_multi_topk_sql(pattern, kind, k=10, **kw)).fetchall()
    assert got == [tuple(r) for r in want] and got


def test_span_multi_is_span_or_over_expansion(documents):
    terms = expand_pattern(documents, "ve", "prefix")
    assert terms  # the corpus has ve* terms
    a = [tuple(r) for r in bm25_span_multi_topk(documents, "ve", "prefix").collect()]
    b = [tuple(r) for r in bm25_span_or_topk(documents, terms).collect()]
    assert a == b


def test_span_multi_cap_is_df_desc_term_asc(documents, duck):
    capped = expand_pattern(documents, "s", "prefix", max_expansions=2)
    full = expand_pattern(documents, "s", "prefix", max_expansions=10_000)
    assert len(capped) == 2 < len(full) and set(capped) <= set(full)
    a = [
        tuple(r)
        for r in bm25_span_multi_topk(
            documents, "s", "prefix", max_expansions=2
        ).collect()
    ]
    b = [tuple(r) for r in bm25_span_or_topk(documents, capped).collect()]
    assert a == b
    # and the SQL oracle applies the identical cap
    want = duck.execute(
        bm25_span_multi_topk_sql("s", "prefix", max_expansions=2)
    ).fetchall()
    assert a == [tuple(r) for r in want]


def test_span_multi_empty_rewrite_zero_hits(documents, duck, freq_searcher):
    body = {"query": {"span_multi": {"match": {"prefix": {"text": "zzzzqq"}}}}}
    assert dsl_search(documents, body).count() == 0
    assert duck.execute(dsl_search_sql(body)).fetchall() == []
    assert dsl_search_index(freq_searcher, body).count() == 0


def test_span_multi_three_engines(documents, duck, freq_searcher):
    body = {
        "query": {"span_multi": {"match": {"prefix": {"text": "ve"}}}},
        "size": 10,
    }
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(freq_searcher, body).collect()]
    assert got == want == srv and got


def test_span_multi_fuzzy_three_engines(documents, duck, freq_searcher):
    body = {
        "query": {
            "span_multi": {
                "match": {"fuzzy": {"text": {"value": "batc", "fuzziness": 1}}}
            }
        },
        "size": 10,
    }
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(freq_searcher, body).collect()]
    assert got == want == srv and got


def test_span_multi_refusals(documents):
    for body in [
        {"query": {"span_multi": {"match": {"span_term": {"text": "x"}}}}},
        {"query": {"span_multi": {"match": {"prefix": {"lang": "e"}}}}},
        {"query": {"span_multi": {"match": {"prefix": {"text": "x"}}, "boost": 2}}},
        {"query": {"span_multi": {"match": {"prefix": {"text": {"value": "x", "rewrite": "top_terms_10"}}}}}},
    ]:
        with pytest.raises(ValueError, match="unsupported DSL"):
            dsl_search(documents, body)
