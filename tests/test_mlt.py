"""ES more_like_this (SURVEY §2.5): Lucene MoreLikeThis term selection +
OR-query scoring, checked three ways — declarative vs the full-pipeline
DuckDB oracle, serving path (dictionary-backed selection, zero corpus
passes) vs declarative, and selection-contract unit checks.

Reference analog: the ES 1.x MLT query surface behind the sink
(ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.mlt import (
    interestingness,
    more_like_this,
    more_like_this_sql,
    select_mlt_terms,
)
from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

LIKE_IDS = [0, 7, 123, 411]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mltidx") / "segidx")
    build_index(spark, documents, d, n_shards=4)
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("like_id", LIKE_IDS)
def test_mlt_matches_duckdb(documents, duck, like_id):
    got = [tuple(r) for r in more_like_this(documents, like_id=like_id, k=10).collect()]
    want = [tuple(r) for r in duck.execute(more_like_this_sql(like_id, k=10)).fetchall()]
    assert got == want and got, f"like_id={like_id}"


def test_mlt_include_keeps_source_doc(documents, duck):
    """include=True keeps the source doc in the candidate set (it matches
    its own MLT query; BM25 dl-normalization means it need not rank FIRST),
    include=False (default) never returns it."""
    got = more_like_this(documents, like_id=0, include=True, k=500).collect()
    assert 0 in {r.doc_id for r in got}
    want = [
        tuple(r) for r in duck.execute(more_like_this_sql(0, k=500, include=True)).fetchall()
    ]
    assert [tuple(r) for r in got] == want
    excl = more_like_this(documents, like_id=0, k=500).collect()
    assert 0 not in {r.doc_id for r in excl}


def test_mlt_floors_respected(documents):
    """min_term_freq/min_doc_freq floors restrict the selection (tf=1 terms
    of the source doc never make the query at min_term_freq=2)."""
    from collections import Counter

    from flume_elasticsearch_2_spark.functions.tokenizer import tokenize

    text = documents.where("doc_id = 0").collect()[0].text
    tf = Counter(tokenize(text))
    singletons = {t for t, c in tf.items() if c < 2}
    sel = select_mlt_terms(tf, {t: 100 for t in tf}, 500, min_term_freq=2, min_doc_freq=1)
    assert sel and not (set(sel) & singletons)


def test_mlt_like_text_equals_like_id(documents):
    """like_text with the source doc's text + manual exclusion == like_id
    (the two ES input forms agree)."""
    import pyspark.sql.functions as F

    text = documents.where("doc_id = 7").collect()[0].text
    by_id = [tuple(r) for r in more_like_this(documents, like_id=7, k=10).collect()]
    by_text = [
        tuple(r)
        for r in more_like_this(
            documents.where(F.col("doc_id") != 7), like_text=text, k=10
        ).collect()
    ]
    # NOTE: not identical by construction — like_text computes dfs over the
    # 499-doc view; assert rank agreement only on the shared contract: both
    # exclude doc 7 and return the same candidate universe ordering is not
    # guaranteed, so compare ids loosely (>= 8 of 10 shared).
    assert all(d != 7 for d, _ in by_text)
    assert len({d for d, _ in by_id} & {d for d, _ in by_text}) >= 8


@pytest.mark.parametrize("like_id", LIKE_IDS)
def test_mlt_serving_rank_identical(documents, searcher, like_id):
    """Serving path (terms/-dictionary selection + BMW scatter + docs-table
    exclusion pushdown) == declarative path."""
    text = documents.where(f"doc_id = {like_id}").collect()[0].text
    got = [
        tuple(r)
        for r in searcher.more_like_this(text, k=10, exclude_id=like_id).collect()
    ]
    want = [tuple(r) for r in more_like_this(documents, like_id=like_id, k=10).collect()]
    assert got == want


def test_mlt_selection_is_interestingness_ranked():
    src = {"rare": 3, "mid": 3, "hot": 3, "alpha": 3}
    dfreq = {"rare": 2, "mid": 50, "hot": 400, "alpha": 50}
    sel = select_mlt_terms(src, dfreq, 500, max_query_terms=2, min_term_freq=1, min_doc_freq=1)
    # rare has highest tf*(ln(n/(df+1))+1); alpha vs mid tie broken by term ASC
    assert interestingness(3, 2, 500) > interestingness(3, 50, 500)
    assert sel == sorted(["rare", "alpha"])


def test_mlt_input_validation(documents):
    with pytest.raises(ValueError):
        more_like_this(documents)
    with pytest.raises(ValueError):
        more_like_this(documents, like_id=1, like_text="x")
    assert more_like_this(documents, like_id=10**9).count() == 0


def test_mlt_field_and_1x_like_text_aliases(documents):
    # 1.x more_like_this_field / like_text parse to the same mlt execution
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search
    from flume_elasticsearch_2_spark.operators.mlt import more_like_this

    # repeat each term so it clears the ES min_term_freq=2 floor — a
    # single-occurrence like_text selects zero terms and the comparison
    # would be vacuously 0 == 0
    like = "batch batch scan scan merge merge"
    direct = [
        tuple(r) for r in more_like_this(documents, like_text=like).collect()
    ]
    assert direct  # non-vacuous
    for body in [
        {"query": {"more_like_this_field": {"text": {"like_text": like}}}},
        {"query": {"more_like_this": {"like_text": like}}},
        {"query": {"more_like_this": {"like": like}}},
    ]:
        assert [tuple(r) for r in dsl_search(documents, body).collect()] == direct
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"more_like_this_field": {
            "lang": {"like_text": "x"}}}})


def test_flt_field_alias(documents):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search
    from flume_elasticsearch_2_spark.operators.flt import fuzzy_like_this_topk

    direct = [
        tuple(r)
        for r in fuzzy_like_this_topk(documents, like_text="batc scan").collect()
    ]
    body = {"query": {"fuzzy_like_this_field": {"text": {"like_text": "batc scan"}}}}
    assert [tuple(r) for r in dsl_search(documents, body).collect()] == direct
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"fuzzy_like_this_field": {
            "text": {"like_text": "x", "fields": ["text"]}}}})
