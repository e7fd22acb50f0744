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


# -- round-5 opt-in Lucene rank-parity mode ------------------------------------


def test_lucene_sloppy_kernel_hand_checked():
    """lucene_sloppy_freq pinned on hand-computable position lists: exact
    adjacency weighs 1, reversed adjacency needs width 2 and weighs 1/3,
    ordered gap g weighs 1/(1+g), matches sum."""
    import numpy as np

    from flume_elasticsearch_2_spark.operators.topk import lucene_sloppy_freq

    f = lucene_sloppy_freq
    assert f([np.array([0]), np.array([1])], 0) == 1.0
    assert f([np.array([1]), np.array([0])], 2) == pytest.approx(1 / 3)
    assert f([np.array([1]), np.array([0])], 1) == 0.0
    assert f([np.array([0, 4]), np.array([1, 5])], 0) == 2.0
    assert f([np.array([0]), np.array([3])], 4) == pytest.approx(1 / 3)
    # 3-term: 'a c b' for query 'a b c' -> adjusted (0, 0, -1)? positions
    # a=0, b=2, c=1 -> adj = [0-0, 2-1, 1-2] = [0, 1, -1] -> width 2 -> 1/3
    assert f([np.array([0]), np.array([2]), np.array([1])], 2) == pytest.approx(1 / 3)


def test_lucene_mode_rank_parity_fixture(spark):
    """The opt-in slop_mode='lucene' on hand-checkable docs: reordered
    phrases match (ordered mode gives them zero), nearer matches outrank
    farther ones via the 1/(1+width) weight, and the default mode is
    unchanged."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gap gap gap pad"),     # exact adjacent: w=0
            (2, "beta alpha gap gap gap pad"),     # reversed: w=2
            (3, "alpha gap beta gap gap pad"),     # ordered gap 1: w=1
            (4, "alpha gap gap gap beta pad"),     # ordered gap 3: w=4 > slop
            (5, "no phrase terms here at all"),
        ],
        "doc_id long, text string",
    )
    got = bm25_phrase_topk(docs, "alpha beta", k=10, slop=2, slop_mode="lucene")
    rows = [(r.doc_id, r.score) for r in got.collect()]
    # rank: exact (pf=1) > gap1 (pf=1/2) > reversed (pf=1/3); doc4/5 absent
    assert [d for d, _ in rows] == [1, 3, 2]
    assert rows[0][1] > rows[1][1] > rows[2][1] > 0
    # ordered-window default: the reversed doc must NOT match
    ordered = {r.doc_id for r in bm25_phrase_topk(docs, "alpha beta", k=10, slop=2).collect()}
    assert 2 not in ordered and {1, 3} <= ordered
    # wider slop admits doc 4 in lucene mode, below doc 2
    wide = [r.doc_id for r in bm25_phrase_topk(
        docs, "alpha beta", k=10, slop=4, slop_mode="lucene"
    ).collect()]
    assert wide == [1, 3, 2, 4]


def test_lucene_mode_refusals(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="repeated phrase terms"):
        bm25_phrase_topk(docs, "gap alpha gap", slop=1, slop_mode="lucene")
    with pytest.raises(ValueError, match="slop_mode"):
        bm25_phrase_topk(docs, "a b", slop_mode="nope")
