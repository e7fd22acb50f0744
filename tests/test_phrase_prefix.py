"""match_phrase_prefix (SURVEY §2.5 Q35): the search-as-you-type phrase whose
last analyzed term is a prefix class. Pinned contract (operators/topk.py
bm25_phrase_prefix_topk): last slot = any token with the prefix
(max_expansions=None exact form; capped form uses the engine's deterministic
df DESC, term ASC dictionary cap — documented divergence from Lucene's
term-ascending expansion), idf adds ONE prefix-class term (df_class = docs
with ≥1 class token), chain/slop semantics identical to Q29.

Checked three ways: declarative vs DuckDB oracle, serving vs declarative
(incl. the capped form, which has no SQL oracle by design), and semantic
pins (slop=0 ≡ adjacency, single-term degenerate, cap changes results)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.topk import (
    bm25_phrase_prefix_topk,
    bm25_phrase_prefix_topk_sql,
    bm25_phrase_topk,
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
    d = str(tmp_path_factory.mktemp("ppfxidx") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=4, store_positions=True)
    return IndexSearcher(spark, d)


CASES = [
    ("batch s", 0),
    ("batch s", 1),
    ("part fil", 0),
    ("part fil", 2),
    ("s", 0),       # single-term degenerate: pf = class-token count
    ("s", 2),       # slop has no effect at m=1 (no chain steps)
    ("dup ba", 0),  # matching terms, no adjacent occurrence
    ("the zz", 0),  # absent prefix class -> empty
]


@pytest.mark.parametrize("phrase,slop", CASES)
def test_phrase_prefix_matches_duckdb(documents, duck, phrase, slop):
    got = [
        tuple(r)
        for r in bm25_phrase_prefix_topk(documents, phrase, k=10, slop=slop).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(bm25_phrase_prefix_topk_sql(phrase, k=10, slop=slop)).fetchall()
    ]
    assert got == want, (phrase, slop)


@pytest.mark.parametrize("phrase,slop", CASES)
def test_phrase_prefix_serving_equals_declarative(documents, pos_searcher, phrase, slop):
    got = [
        tuple(r)
        for r in pos_searcher.search_phrase_prefix(phrase, k=10, slop=slop).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_phrase_prefix_topk(documents, phrase, k=10, slop=slop).collect()
    ]
    assert got == want, (phrase, slop)


@pytest.mark.parametrize("cap", [1, 2, 3])
def test_phrase_prefix_capped_serving_parity(documents, pos_searcher, cap):
    """The capped class has no SQL oracle — declarative≡serving parity IS
    its correctness pin (both caps resolve df DESC, term ASC from the same
    corpus/dictionary)."""
    got = [
        tuple(r)
        for r in pos_searcher.search_phrase_prefix(
            "batch s", k=10, max_expansions=cap
        ).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_phrase_prefix_topk(
            documents, "batch s", k=10, max_expansions=cap
        ).collect()
    ]
    assert got == want, cap


def test_phrase_prefix_cap_changes_results(documents):
    full = [tuple(r) for r in bm25_phrase_prefix_topk(documents, "batch s", k=10).collect()]
    capped = [
        tuple(r)
        for r in bm25_phrase_prefix_topk(documents, "batch s", k=10, max_expansions=2).collect()
    ]
    assert full != capped  # 6 s-terms at sf0.001; the cap must bite


def test_phrase_prefix_whole_term_prefix_covers_exact_phrase(documents):
    """With a prefix equal to a whole dictionary term that has no other
    expansions, the match SET equals the exact phrase's (scores differ only
    through the class-df idf when other prefixed terms exist)."""
    ppfx = {r.doc_id for r in bm25_phrase_prefix_topk(documents, "part filter", k=100).collect()}
    exact = {r.doc_id for r in bm25_phrase_topk(documents, "part filter", k=100).collect()}
    assert exact <= ppfx  # "filter" class ⊇ the exact term


def test_phrase_prefix_negative_slop_raises(documents, pos_searcher):
    with pytest.raises(ValueError):
        bm25_phrase_prefix_topk(documents, "batch s", slop=-1)
    with pytest.raises(ValueError):
        pos_searcher.search_phrase_prefix("batch s", slop=-1)


def test_phrase_prefix_dsl_routes(documents, duck, pos_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_index,
        dsl_search_sql,
    )

    body = {"query": {"match_phrase_prefix": {"text": {"query": "batch s", "slop": 1}}}, "size": 8}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(pos_searcher, body).collect()]
    assert got == want == srv and got
    capped = {"query": {"match_phrase_prefix": {"text": {"query": "batch s", "max_expansions": 2}}}}
    with pytest.raises(ValueError):
        dsl_search_sql(capped)  # capped form has no SQL oracle, refuses loudly
    assert [tuple(r) for r in dsl_search_index(pos_searcher, capped).collect()] == [
        tuple(r) for r in dsl_search(documents, capped).collect()
    ]


def test_new_serving_paths_stable_across_shard_counts(
    spark, documents, pos_searcher, tmp_path_factory
):
    """Shard count is an execution detail: the phrase-prefix class-df
    sentinel SUM and the common-terms low-term masks must be partitioning-
    invariant (docs live in exactly one shard, so per-shard unions sum)."""
    d = str(tmp_path_factory.mktemp("ppfx7") / "segidx")
    build_segments_partial(spark, documents, d, n_shards=7, store_positions=True)
    s7 = IndexSearcher(spark, d)
    for phrase, slop in [("batch s", 0), ("batch s", 2), ("s", 0)]:
        a = [tuple(r) for r in s7.search_phrase_prefix(phrase, k=10, slop=slop).collect()]
        b = [
            tuple(r)
            for r in pos_searcher.search_phrase_prefix(phrase, k=10, slop=slop).collect()
        ]
        assert a == b, (phrase, slop)
    for q, cutoff, op in [("dup batch scan", 0.1, "or"), ("dup small batch", 0.77, "and")]:
        a = [tuple(r) for r in s7.search_common(q, k=30, cutoff_frequency=cutoff,
                                                low_freq_operator=op).collect()]
        b = [tuple(r) for r in pos_searcher.search_common(q, k=30, cutoff_frequency=cutoff,
                                                          low_freq_operator=op).collect()]
        assert a == b, (q, cutoff, op)


def test_phrase_prefix_class_df_counts_first_less_shards(spark, tmp_path_factory):
    """Review regression: the global prefix-class df must include shards
    that hold EXPANSION docs but lack a first term — skipping them inflated
    idf and made scores shard-layout-dependent."""
    rows = [(i, "hello world common") for i in range(50)] + [
        (i, "worldly common filler") for i in range(50, 100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("ppfxdf") / "segidx")
    build_segments_partial(spark, docs, d, n_shards=4, store_positions=True)
    s = IndexSearcher(spark, d)
    got = [tuple(r) for r in s.search_phrase_prefix("hello wor", k=10).collect()]
    want = [
        tuple(r) for r in bm25_phrase_prefix_topk(docs, "hello wor", k=10).collect()
    ]
    assert got == want and got
