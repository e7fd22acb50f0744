"""Porter stemmer three-engine parity (functions/porter.py) + the ES-1.x
``english`` analyzer chain (tokenizer.py): Python ground truth vs the
closed-form DuckDB SQL twin vs the Spark Arrow-batched column."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.functions.porter import (
    duckdb_porter_case,
    porter_stem,
)
from flume_elasticsearch_2_spark.functions.tokenizer import (
    ENGLISH_STOPWORDS,
    duckdb_tokens_expr,
    tokenize,
    tokens_col,
)

# Vectors from the paper's worked examples (Porter 1980 §3) plus the
# departure-sensitive cases (bli/logi rules, length<=2 passthrough).
PAPER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # departures: bli->ble (not abli->able), logi->log, len<=2 unchanged
    "possibli": "possibl", "apologi": "apolog", "a": "a", "ab": "ab",
    # y-classification: runs and leading y
    # "spy" stays: step 1c's *v* tests the stem "sp", which has no vowel
    "syzygy": "syzygi", "dying": "dy", "spy": "spy",
}


def test_paper_vectors():
    got = {w: porter_stem(w) for w in PAPER_VECTORS}
    assert got == PAPER_VECTORS


def test_conflation_classes():
    """The point of the analyzer gap: running/runs conflate with run (ran
    does not — Porter is suffix-only, documented)."""
    assert porter_stem("running") == porter_stem("runs") == porter_stem("run") == "run"
    assert porter_stem("ran") == "ran"
    assert porter_stem("queries") == porter_stem("query") == "queri"
    assert porter_stem("merged") == porter_stem("merges") == porter_stem("merge") == "merg"


def _sql_stems(words: list[str]) -> list[str]:
    con = duckdb.connect()
    return con.execute(
        f"select list_transform(?, t -> {duckdb_porter_case('t')})", [words]
    ).fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdeyiouslmnzt013", min_size=1, max_size=14)
    | st.text(alphabet="ye", min_size=1, max_size=10)
)
def test_python_sql_parity_fuzz(w):
    # batch-of-one keeps the property readable; the batch path is covered
    # by test_three_engine_parity_batch
    assert _sql_stems([w]) == [porter_stem(w)]


def test_three_engine_parity_batch(spark):
    suffixes = ["", "s", "es", "ies", "ed", "eed", "ing", "ational", "tional",
                "ization", "fulness", "iviti", "biliti", "logi", "icate",
                "ative", "ement", "ion", "e", "ll", "y"]
    stems = ["run", "tri", "happ", "abil", "rat", "feed", "d", "sk", "controv",
             "relat", "gener", "yy", "syzyg", "x2"]
    words = sorted({s + suf for s in stems for suf in suffixes})
    py = [porter_stem(w) for w in words]
    assert _sql_stems(words) == py
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.porter import porter_col

    row = (
        spark.createDataFrame([(words,)], "toks array<string>")
        .select(porter_col(F.col("toks")).alias("stems"))
        .collect()[0]
    )
    assert list(row.stems) == py


def test_english_analyzer_chain(spark):
    """english = ascii tokens -> Lucene classic stop set -> Porter, in that
    order (EnglishAnalyzer), identical in all three engines."""
    text = "The queries WERE merged: running tables and values!"
    want = ["queri", "were", "merg", "run", "tabl", "valu"]
    assert tokenize(text, analyzer="english") == want
    assert "the" in ENGLISH_STOPWORDS and "and" in ENGLISH_STOPWORDS
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(tokens_col("text", analyzer="english").alias("t"))
        .collect()[0]
    )
    assert list(got.t) == want
    con = duckdb.connect()
    sql = duckdb_tokens_expr("english", text_expr="?::VARCHAR")
    assert con.execute(f"select {sql}", [text]).fetchone()[0] == want


def test_english_extra_stopwords_merge():
    """User stopwords union with the built-in english set; removal happens
    BEFORE stemming (a stopword is matched in surface form)."""
    toks = tokenize("the running ran fast", stopwords=["fast"], analyzer="english")
    assert toks == ["run", "ran"]
    # 'running' as a stopword removes the surface form, not the stem
    toks = tokenize("the running run", stopwords=["running"], analyzer="english")
    assert toks == ["run"]


def test_porter_composes_with_edge_ngrams():
    """analyzer names compose: english_edge2_4 stems then emits edge grams
    (the autocomplete recipe over stemmed vocab)."""
    assert tokenize("queries", analyzer="english_edge2_4") == ["qu", "que", "quer"]
    con = duckdb.connect()
    sql = duckdb_tokens_expr("english_edge2_4", text_expr="'queries'")
    assert con.execute(f"select {sql}").fetchone()[0] == ["qu", "que", "quer"]
