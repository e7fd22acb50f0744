"""Property fuzz over the C4 rules and CCNet bucketing: hypothesis builds
documents from line fragments (punctuated/unpunctuated, javascript lines,
braces, lorem-ipsum, CRLF vs LF endings, tabs, end quotes incl. U+201D)
and pins Spark == DuckDB on both c4_line_metrics and c4_filter at the
PAPER config, plus ccnet_buckets parity and its per-language bucket-size
invariant. The driver gate checks one fixed corpus; this explores the rule
space where the engines' regex/translate/length semantics could drift.

Alphabet is kept to BMP/ASCII-plus-” deliberately: astral characters hit
the documented Spark-UTF-16 vs DuckDB-code-point length divergence, which
the charlm/gopher modules neutralize by run-collapse but raw line metrics
would expose — out of the pinned contract."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.operators.c4 import (
    c4_filter,
    c4_filter_sql,
    c4_line_metrics,
    c4_line_metrics_sql,
)
from flume_elasticsearch_2_spark.operators.ccnet import (
    ccnet_buckets,
    ccnet_buckets_sql,
)

word_st = st.sampled_from(
    ["the", "quick", "web", "page", "content", "javascript", "Lorem", "ipsum",
     "data", "x9", "a"]
)
ending_st = st.sampled_from(["", ".", "!", "?", '"', "”", ". ", ".\t", " "])


@st.composite
def line_st(draw):
    words = draw(st.lists(word_st, min_size=0, max_size=6))
    sep = draw(st.sampled_from([" ", "  ", "\t"]))
    body = sep.join(words)
    if draw(st.booleans()) and body:
        body = "{ " + body + " }" if draw(st.booleans()) else body + " {}"
    return body + draw(ending_st)


@st.composite
def doc_st(draw):
    lines = draw(st.lists(line_st(), min_size=0, max_size=6))
    eol = draw(st.sampled_from(["\n", "\r\n"]))
    return eol.join(lines)


def _duck_for(rows):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, 'l{i % 2}', '"
        + t.replace("'", "''").replace("\r", "' || chr(13) || '").replace("\n", "' || chr(10) || '")
        + "')"
        for i, t in enumerate(rows)
    )
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) v(doc_id, lang, text)"
    )
    return con


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(doc_st(), min_size=1, max_size=6))
def test_c4_rules_cross_engine(spark, docs):
    df = spark.createDataFrame(
        [(i, f"l{i % 2}", t) for i, t in enumerate(docs)],
        "doc_id long, lang string, text string",
    )
    con = _duck_for(docs)
    gm = sorted(map(tuple, c4_line_metrics(df).collect()))
    wm = sorted(map(tuple, con.sql(c4_line_metrics_sql()).fetchall()))
    assert gm == [tuple(r) for r in wm]
    gf = sorted(map(tuple, c4_filter(df, min_sentences=1).collect()))
    wf = sorted(map(tuple, con.sql(c4_filter_sql(min_sentences=1)).fetchall()))
    assert gf == [tuple(r) for r in wf]


text_st = st.lists(word_st, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(text_st, min_size=1, max_size=8))
def test_ccnet_cross_engine_and_bucket_sizes(spark, texts):
    rows = [(i, t, "de" if i % 3 == 0 else "en") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '" + t.replace("'", "''") + f"', '{lang}')" for i, t, lang in rows
    )
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) v(doc_id, text, lang)"
    )
    got = [tuple(r) for r in ccnet_buckets(df).collect()]
    want = [tuple(r) for r in con.sql(ccnet_buckets_sql()).fetchall()]
    assert got == want
    # per-language invariant: |head| = ceil(n/3), |head|+|middle| = ceil(2n/3)
    import math
    from collections import Counter

    per_lang: dict[str, Counter] = {}
    for _, lang, _, bucket in got:
        per_lang.setdefault(lang, Counter())[bucket] += 1
    for lang, c in per_lang.items():
        n = sum(c.values())
        assert c["head"] == math.ceil(n / 3), (lang, c)
        assert c["head"] + c["middle"] == math.ceil(2 * n / 3), (lang, c)
