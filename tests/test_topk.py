from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.functions.tokenizer import tokenize
from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

from .oracle import brute_force_bm25

QUERIES = [
    ("the fast scan", "or"),
    ("spark", "or"),
    ("join filter window", "and"),
    ("zzzznotaterm", "or"),
    ("the the fast", "or"),  # duplicate-term accumulation
    ("Customer ORDER", "or"),  # case normalization
]


def test_tokenize_contract():
    assert tokenize("Hello, World-42!") == ["hello", "world", "42"]
    assert tokenize("") == []
    # ASCII-only token alphabet: non-ASCII splits tokens (pinned contract)
    assert tokenize("ÀÉ straße 東京 a1") == ["stra", "e", "a1"]


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("query,mode", QUERIES)
def test_bm25_matches_numpy_oracle(spark, documents, query, mode):
    rows = documents.select("doc_id", "text").collect()
    expected = brute_force_bm25([(r.doc_id, r.text) for r in rows], query, k=10, mode=mode)
    got = bm25_topk(documents, query, k=10, mode=mode).collect()
    assert [r.doc_id for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert abs(r.score - s) < 1e-5


@pytest.mark.parametrize("query,mode", QUERIES)
def test_bm25_matches_duckdb_oracle(spark, documents, sf_dir, query, mode):
    got = [(r.doc_id, r.score) for r in bm25_topk(documents, query, k=10, mode=mode).collect()]
    exp = _duck(sf_dir, bm25_topk_sql(query, k=10, mode=mode))
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[1] - e[1]) < 1e-6


PHRASES = ["part filter", "order fast", "the zzznope", "dup"]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_matches_duckdb_oracle(spark, documents, sf_dir, phrase):
    from flume_elasticsearch_2_spark.operators.topk import (
        bm25_phrase_topk,
        bm25_phrase_topk_sql,
    )

    got = [(r.doc_id, r.score) for r in bm25_phrase_topk(documents, phrase, k=10).collect()]
    exp = _duck(sf_dir, bm25_phrase_topk_sql(phrase, k=10))
    assert [g[0] for g in got] == [e[0] for e in exp], phrase
    for g, e in zip(got, exp):
        assert abs(g[1] - e[1]) < 1e-6


def test_phrase_overlapping_occurrences_count():
    """Sliding-window phrase freq: 'a a a' contains 'a a' twice (Lucene
    ExactPhraseScorer semantics), and the idf sum counts duplicate terms."""
    import math

    from flume_elasticsearch_2_spark.operators.topk import bm25_phrase_topk
    from flume_elasticsearch_2_spark.session import get_spark

    spark = get_spark(app_name="phrase-test", master="local[2]", shuffle_partitions=2)
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "a b a"), (2, "b b b")], "doc_id long, text string"
    )
    got = bm25_phrase_topk(docs, "a a", k=10).collect()
    assert [r.doc_id for r in got] == [0]
    # pf=2, dl=3, n=3, df(a)=2, avgdl=3; idf = 2*ln(1+(3-2+0.5)/(2+0.5))
    idf = 2 * math.log1p((3 - 2 + 0.5) / (2 + 0.5))
    expected = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    assert abs(got[0].score - expected) < 1e-6


def test_stopword_analyzer_matches_duckdb(spark, documents, sf_dir):
    """Analyzer stopwords option: dl/tf/df/avgdl all shift consistently and
    still match the DuckDB list_filter formulation exactly."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk as bt

    stop = ["the", "and", "a", "fast"]
    got = [
        (r.doc_id, r.score)
        for r in bt(documents, "the fast scan dup", k=10, stopwords=stop).collect()
    ]
    exp = _duck(sf_dir, bm25_topk_sql("the fast scan dup", k=10, stopwords=stop))
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[1] - e[1]) < 1e-6
    # stopword-only query -> empty
    assert bt(documents, "the and a", k=10, stopwords=stop).count() == 0
    # differs from the unfiltered analysis (dl changed -> scores changed)
    base = [(r.doc_id, r.score) for r in bt(documents, "scan dup", k=10).collect()]
    assert got != base


# -- ES bool must_not + _count ------------------------------------------------


@pytest.mark.parametrize(
    "query,mode,mn",
    [
        ("dup batch scan", "or", "slow"),
        ("batch small scan", "or", "slow window"),
        ("join filter window", "and", "dup"),
        ("spark", "or", "spark"),  # must_not knocks out every match
    ],
)
def test_must_not_matches_duckdb(spark, documents, sf_dir, query, mode, mn):
    got = [
        (r.doc_id, r.score)
        for r in bm25_topk(documents, query, k=10, mode=mode, must_not=mn).collect()
    ]
    exp = _duck(sf_dir, bm25_topk_sql(query, k=10, mode=mode, must_not=mn))
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[1] - e[1]) < 1e-9


def test_must_not_is_filter_context(spark, documents):
    """Scores of surviving docs are IDENTICAL to the unfiltered query's
    scores for the same ids (idf/avgdl/N index-wide — the ES contract)."""
    base = {r.doc_id: r.score for r in bm25_topk(documents, "dup batch scan", k=1000).collect()}
    mn = bm25_topk(documents, "dup batch scan", k=1000, must_not="slow").collect()
    assert mn and all(abs(base[r.doc_id] - r.score) < 1e-12 for r in mn)


def test_must_not_excludes_matching_docs(spark, documents):
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col

    bad = {
        r.doc_id
        for r in documents.where(F.array_contains(tokens_col("text"), "slow"))
        .select("doc_id")
        .collect()
    }
    got = bm25_topk(documents, "dup batch scan", k=100, must_not="slow").collect()
    assert got and not ({r.doc_id for r in got} & bad)


@pytest.mark.parametrize(
    "query,mode",
    [("dup batch scan", "or"), ("join filter window", "and"), ("zzzznotaterm", "or")],
)
def test_match_count_matches_duckdb(spark, documents, sf_dir, query, mode):
    from flume_elasticsearch_2_spark.operators.topk import match_count, match_count_sql

    got = match_count(documents, query, mode=mode).collect()[0].n_matching
    exp = _duck(sf_dir, match_count_sql(query, mode=mode))[0][0]
    assert got == exp


@pytest.mark.parametrize(
    "query,mode,cap",
    [("dup batch scan", "or", 1), ("dup batch scan", "or", 10),
     ("join filter window", "and", 3), ("zzzznotaterm", "or", 5)],
)
def test_match_count_terminated_matches_duckdb(spark, documents, sf_dir, query, mode, cap):
    from flume_elasticsearch_2_spark.operators.topk import (
        match_count_terminated,
        match_count_terminated_sql,
    )

    got = match_count_terminated(
        documents, query, terminate_after=cap, n_shards=4, mode=mode
    ).collect()[0]
    exp = _duck(
        sf_dir, match_count_terminated_sql(query, terminate_after=cap, n_shards=4, mode=mode)
    )[0]
    assert (got.n_matching, got.terminated_early) == exp


# -- common terms query (ES 1.x `common`: df-split selection) ----------------

COMMON_CASES = [
    # (query, cutoff, low_op): 0.1 -> only 'dup' (df 25/500) selects;
    # 0.77 -> {dup, small} low; absolute 2.0 -> nothing low (plain OR match)
    ("dup batch scan", 0.1, "or"),
    ("dup small batch", 0.77, "or"),
    ("dup small batch", 0.77, "and"),
    ("batch scan", 2.0, "or"),
    ("zzznope batch", 0.1, "or"),  # absent low term
]


@pytest.mark.parametrize("query,cutoff,low_op", COMMON_CASES)
def test_common_terms_matches_duckdb(spark, documents, sf_dir, query, cutoff, low_op):
    from flume_elasticsearch_2_spark.operators.topk import (
        bm25_common_topk,
        bm25_common_topk_sql,
    )

    got = [
        tuple(r)
        for r in bm25_common_topk(
            documents, query, k=30, cutoff_frequency=cutoff, low_freq_operator=low_op
        ).collect()
    ]
    want = _duck(
        sf_dir,
        bm25_common_topk_sql(query, k=30, cutoff_frequency=cutoff, low_freq_operator=low_op),
    )
    assert got == [tuple(w) for w in want], (query, cutoff, low_op)


def test_common_terms_selection_semantics(spark, documents):
    """Low-freq terms SELECT, high-freq only score: every hit contains the
    rare term; plain match at the same k admits high-only docs."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_common_topk

    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col

    hits = bm25_common_topk(documents, "dup batch scan", k=30, cutoff_frequency=0.1)
    ids = [r.doc_id for r in hits.collect()]
    dup_docs = {
        r.doc_id
        for r in documents.where(F.array_contains(tokens_col("text"), "dup"))
        .select("doc_id")
        .collect()
    }
    assert ids and set(ids) <= dup_docs
    match_ids = [r.doc_id for r in bm25_topk(documents, "dup batch scan", k=30).collect()]
    assert len(match_ids) > len(ids)  # match admits high-freq-only docs


def test_common_terms_all_high_degrades_to_match(spark, documents):
    from flume_elasticsearch_2_spark.operators.topk import bm25_common_topk

    got = [tuple(r) for r in bm25_common_topk(documents, "batch scan", k=10,
                                              cutoff_frequency=2.0).collect()]
    want = [tuple(r) for r in bm25_topk(documents, "batch scan", k=10).collect()]
    assert got == want


def test_common_terms_bad_operator_raises(spark, documents):
    from flume_elasticsearch_2_spark.operators.topk import (
        bm25_common_topk,
        bm25_common_topk_sql,
    )

    with pytest.raises(ValueError):
        bm25_common_topk(documents, "dup", low_freq_operator="xor")
    with pytest.raises(ValueError):
        bm25_common_topk_sql("dup", low_freq_operator="xor")


@pytest.mark.parametrize(
    "query,mode,want",
    [("dup batch scan", "or", 1), ("zzzznotaterm", "or", 0), ("", "or", 0)],
)
def test_search_exists_semantics_and_parity(documents, sf_dir, query, mode, want):
    """ES 1.4 _search/exists: 1 iff any doc matches; empty/absent query is
    0, matching _count's all-absent contract; DuckDB twin agrees."""
    from flume_elasticsearch_2_spark.operators.topk import (
        search_exists,
        search_exists_sql,
    )

    got = search_exists(documents, query, mode=mode).collect()[0]["exists"]
    assert got == want
    exp = _duck(sf_dir, search_exists_sql(query, mode=mode))[0][0]
    assert got == exp


def test_match_count_terminated_composed_analyzer(spark, documents, sf_dir):
    """Review regression: the oracle must compose the full analyzer chain
    (s-stem here) exactly as the Spark side's tokens_col does."""
    from flume_elasticsearch_2_spark.operators.topk import (
        match_count,
        match_count_sql,
        match_count_terminated,
        match_count_terminated_sql,
    )

    got = match_count_terminated(
        documents, "dup batches scans", terminate_after=7, n_shards=4,
        analyzer="ascii_sstem",
    ).collect()[0]
    exp = _duck(
        sf_dir,
        match_count_terminated_sql(
            "dup batches scans", terminate_after=7, n_shards=4, analyzer="ascii_sstem"
        ),
    )[0]
    assert (got.n_matching, got.terminated_early) == exp and got.n_matching > 0
    # plain _count under the composed chain stays oracle-exact too
    got_c = match_count(documents, "scans", analyzer="ascii_sstem").collect()[0]
    exp_c = _duck(sf_dir, match_count_sql("scans", analyzer="ascii_sstem"))[0][0]
    assert got_c.n_matching == exp_c > 0  # 'scans' unifies with corpus 'scan'
