"""ES 1.x edge_ngram token filter + search_analyzer — the index-time
autocomplete recipe (functions/tokenizer.py edge family).

Lucene 4.x EdgeNGramTokenFilter contract pinned in three engines: each
token emits prefixes of length min..min(max, len); tokens shorter than
min_gram emit nothing; tokens longer than max_gram lose their full form.
"""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.functions.tokenizer import (
    duckdb_edge_transform,
    duckdb_token_pattern,
    edge_params,
    tokenize,
    tokens_col,
)


def test_edge_params_parsing():
    assert edge_params("ascii_edge2_4") == ("ascii", 2, 4)
    assert edge_params("unicode_edge1_8") == ("unicode", 1, 8)
    assert edge_params("ascii_sstem_edge1_3") == ("ascii_sstem", 1, 3)
    assert edge_params("ascii") is None
    with pytest.raises(ValueError, match="edge_ngram"):
        edge_params("ascii_edge0_4")
    with pytest.raises(ValueError, match="edge_ngram"):
        edge_params("ascii_edge5_2")
    with pytest.raises(KeyError, match="base analyzer"):
        edge_params("klingon_edge1_4")


def test_edge_tokenize_contract():
    # min=2: the 1-char token "a" emits nothing; "batch" capped at 4
    assert tokenize("a batch Scan", analyzer="ascii_edge2_4") == [
        "ba", "bat", "batc", "sc", "sca", "scan",
    ]
    # min=1 keeps everything; duplicates across tokens preserved (tf)
    assert tokenize("bb ba", analyzer="ascii_edge1_2") == ["b", "bb", "b", "ba"]
    # composes after stemming: dogs -> dog -> d, do, dog
    assert tokenize("dogs", analyzer="ascii_sstem_edge1_3") == ["d", "do", "dog"]


def test_edge_three_engine_parity(spark):
    samples = [
        "a batch Scan order-fast 42",
        "bb ba  x",
        "",
        "supercalifragilistic",
    ]
    df = spark.createDataFrame(list(enumerate(samples)), "i int, text string")
    got_spark = {
        r.i: r.t
        for r in df.select(
            "i", tokens_col("text", analyzer="ascii_edge2_5").alias("t")
        ).collect()
    }
    con = duckdb.connect()
    tok = f"regexp_extract_all(lower(?::VARCHAR), '{duckdb_token_pattern('ascii_edge2_5')}')"
    expr = duckdb_edge_transform(tok, 2, 5)
    for i, s in enumerate(samples):
        py = tokenize(s, analyzer="ascii_edge2_5")
        duck = con.sql(f"SELECT {expr}", params=[s]).fetchone()[0]
        assert got_spark[i] == py, (s, got_spark[i], py)
        assert duck == py, (s, duck, py)


def test_autocomplete_bm25_matches_duckdb(spark, documents, sf_dir):
    """The full recipe: docs analyzed under ascii_edge1_6 (grams indexed),
    query analyzed PLAIN (search_analyzer) so the typed prefix is one exact
    gram term — scored BM25 over gram statistics, vs the DuckDB oracle."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for prefix in ["bat", "sca", "dup"]:
        got = [
            (r.doc_id, r.score)
            for r in bm25_topk(
                documents, prefix, k=10,
                analyzer="ascii_edge1_6", search_analyzer="ascii",
            ).collect()
        ]
        want = con.sql(
            bm25_topk_sql(
                prefix, k=10, analyzer="ascii_edge1_6", search_analyzer="ascii"
            )
        ).fetchall()
        assert got == [(d, s) for d, s in want] and got, prefix


def test_autocomplete_prefix_set_equals_wildcard_match(spark, documents):
    """Sanity anchor: docs matched by the gram term == docs containing a
    token with that prefix (the wildcard-scan the recipe replaces)."""
    from pyspark.sql import functions as F

    prefix = "bat"
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk

    got = {
        r.doc_id
        for r in bm25_topk(
            documents, prefix, k=10_000,
            analyzer="ascii_edge1_6", search_analyzer="ascii",
        ).collect()
    }
    want = {
        r.doc_id
        for r in documents.where(
            F.exists(
                tokens_col("text"), lambda t: t.startswith(prefix)
            )
        ).collect()
    }
    assert got == want and got
