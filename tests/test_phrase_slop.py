"""match_phrase ``slop`` (ordered-window contract, SURVEY §2.5 Q29):
declarative vs DuckDB oracle vs serving kernel, plus the pinned semantics —
slop=0 == exact phrase, displacement telescopes to q_m - q_1 - (m-1), and
reordering is never admitted (documented divergence from Lucene's
SloppyPhraseScorer, operators/topk.py)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.topk import (
    bm25_phrase_topk,
    bm25_phrase_topk_sql,
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
    d = str(tmp_path_factory.mktemp("slopidx") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=4, store_positions=True)
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("slop", [0, 1, 3])
@pytest.mark.parametrize("phrase", ["part filter", "batch small scan"])
def test_slop_matches_duckdb(documents, duck, phrase, slop):
    got = [
        tuple(r)
        for r in bm25_phrase_topk(documents, phrase, k=10, slop=slop).collect()
    ]
    want = duck.execute(bm25_phrase_topk_sql(phrase, k=10, slop=slop)).fetchall()
    assert got == [tuple(r) for r in want]
    if phrase == "part filter" and slop >= 1:
        # hits at slop 0 already — widened windows must keep them
        assert got, f"{phrase!r} slop={slop} should hit on the fixture"


@pytest.mark.parametrize("phrase", ["part filter", "batch small scan"])
def test_slop_zero_equals_exact_phrase(documents, phrase):
    exact = [tuple(r) for r in bm25_phrase_topk(documents, phrase, k=10).collect()]
    slop0 = [tuple(r) for r in bm25_phrase_topk(documents, phrase, k=10, slop=0).collect()]
    assert slop0 == exact


@pytest.mark.parametrize("slop", [1, 2])
@pytest.mark.parametrize("phrase", ["part filter", "batch small scan"])
def test_serving_slop_equals_declarative(documents, pos_searcher, phrase, slop):
    got = [
        tuple(r)
        for r in pos_searcher.search_phrase(phrase, k=10, slop=slop).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_phrase_topk(documents, phrase, k=10, slop=slop).collect()
    ]
    assert got == want
    if phrase == "part filter":
        assert got


def test_slop_semantics_on_crafted_corpus(spark):
    """Pin the ordered-window contract: gaps within budget match, total
    displacement (not per-gap) is what counts, reorders never match."""
    rows = [
        (0, "a b c"),          # exact
        (1, "a x b c"),        # disp 1
        (2, "a x b y c"),      # disp 2
        (3, "a x x b c"),      # disp 2 (single big gap)
        (4, "c b a"),          # reversed — never matches any slop here
        (5, "a c b"),          # b,c swapped — ordered chain fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def hit_ids(slop):
        return sorted(
            r.doc_id for r in bm25_phrase_topk(df, "a b c", k=10, slop=slop).collect()
        )

    assert hit_ids(0) == [0]
    assert hit_ids(1) == [0, 1]
    assert hit_ids(2) == [0, 1, 2, 3]   # total displacement <= 2, any split
    assert hit_ids(5) == [0, 1, 2, 3]   # reorders still excluded
    # the identical crafted corpus through the oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for slop in (0, 1, 2, 5):
        want = sorted(
            r[0] for r in con.execute(bm25_phrase_topk_sql("a b c", k=10, slop=slop)).fetchall()
        )
        assert want == hit_ids(slop), slop


def test_dsl_slop_routes_both_paths(documents, duck, pos_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_index,
        dsl_search_sql,
    )

    body = {"query": {"match_phrase": {"text": {"query": "part filter", "slop": 2}}}}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = duck.execute(dsl_search_sql(body)).fetchall()
    assert got == [tuple(r) for r in want] and got
    srv = [tuple(r) for r in dsl_search_index(pos_searcher, body).collect()]
    assert srv == got
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"match_phrase": {"text": {"query": "a", "slop": -1}}}})
