"""Harman S-stemmer analyzer option: three-engine parity + BM25 oracle."""

import duckdb
import pandas as pd
import pytest

from flume_elasticsearch_2_spark.functions.tokenizer import (
    duckdb_stem_case,
    s_stem,
    tokenize,
    tokens_col,
)


@pytest.mark.parametrize(
    "word,want",
    [
        ("queries", "query"),    # ies -> y
        ("movies", "movy"),      # ies -> y (raw S-stemmer, pinned)
        ("aies", "aie"),         # aies blocks rule 1, rule 2 drops the s
        ("batches", "batche"),   # es -> e
        ("trees", "tree"),       # ees blocks rule 2, rule 3 drops s
        ("oboes", "oboe"),       # oes blocks rule 2, rule 3 drops s
        ("dogs", "dog"),         # s dropped
        ("pass", "pass"),        # ss keeps
        ("bus", "bus"),          # us keeps
        ("is", "is"),            # len <= 2 skipped
        ("s", "s"),
        ("analysis", "analysi"), # raw S-stemmer has no -is exception; pinned
    ],
)
def test_stem_rules(word, want):
    assert s_stem(word) == want


def test_aies_falls_through_to_rule3():
    # "aies" blocks rule 1; rule 2 needs "es" not preceded by a/e/o-vowel
    # exceptions — "aies" ends "es" and none of aes/ees/oes match, so the
    # ELSE-IF chain lands in rule 2 and drops to "aie".
    assert s_stem("aies") == "aie"


def test_three_engine_token_parity(spark):
    words = (
        "batches queries ties dogs pass bus goes is as s aies eies movies "
        "aes trees oboes axes classes us analysis scan9s 12s"
    )
    py = tokenize(words, analyzer="ascii_sstem")
    sp = (
        spark.createDataFrame([(words,)], "text string")
        .select(tokens_col("text", analyzer="ascii_sstem").alias("t"))
        .collect()[0]["t"]
    )
    con = duckdb.connect()
    dk = con.execute(
        "SELECT list_transform(regexp_extract_all(lower(?), '[a-z0-9]+'), "
        f"t -> {duckdb_stem_case('t')})",
        [words],
    ).fetchone()[0]
    assert py == sp == dk


def test_stopwords_compose_before_stemming():
    # chain order pinned: tokenize -> stopwords -> stem (so a stopword list
    # written against surface forms still applies)
    toks = tokenize("the dogs the cats", stopwords=["the"], analyzer="ascii_sstem")
    assert toks == ["dog", "cat"]


@pytest.fixture(scope="module")
def plural_docs(spark):
    rows = [
        (0, "batches of batch jobs run scans over tables"),
        (1, "a batch scan of one table"),
        (2, "windows and tables and queries"),
        (3, "nothing relevant here at all"),
        (4, "query the window for batches"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_stemmed_matches_duckdb(plural_docs):
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

    pdf = plural_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for q in ("scans tables", "query batches", "windows"):
        got = [
            tuple(r)
            for r in bm25_topk(plural_docs, q, k=5, analyzer="ascii_sstem").collect()
        ]
        want = [
            tuple(r)
            for r in con.execute(
                bm25_topk_sql(q, k=5, analyzer="ascii_sstem")
            ).fetchall()
        ]
        assert got == want and got, q


def test_query_plural_unifies_with_singular(plural_docs):
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk

    # without stemming the plural query misses the singular-only doc 1
    plain = {r["doc_id"] for r in bm25_topk(plural_docs, "scans tables", k=5).collect()}
    stemmed = {
        r["doc_id"]
        for r in bm25_topk(
            plural_docs, "scans tables", k=5, analyzer="ascii_sstem"
        ).collect()
    }
    assert 1 not in plain and 1 in stemmed
