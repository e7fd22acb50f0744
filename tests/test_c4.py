"""C4 cleaning rules (Raffel et al. 2020 §2.2): crafted-doc line/page rule
semantics, Spark↔DuckDB parity, corpus-level agreement at the relaxed
driver-entry config, and the single-stage plan shape."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.c4 import (
    c4_filter,
    c4_filter_sql,
    c4_line_metrics,
    c4_line_metrics_sql,
)

CASES = [
    # five clean sentences, one per line -> survives the paper defaults
    (0, "en", "one good line here.\nsecond fine line too!\nthird line is asked?\n"
              'a quoted line ends well."\nfifth line closes it.'),
    # terminal punct missing on every line -> all lines dropped
    (1, "en", "no punctuation here\nstill none\nnothing"),
    # javascript line dropped, others kept; only 2 sentences -> page dropped
    (2, "en", "enable JavaScript to continue.\na real sentence stays here.\n"
              "another keeper line stays."),
    # short lines (<3 words) dropped even with punctuation
    (3, "en", "too short.\nok!\nthis one is long enough.\n"
              "and so is this second one.\nthird keeper line is fine.\n"
              "fourth keeper line is fine.\nfifth keeper line is fine."),
    # curly bracket page -> dropped wholesale
    (4, "en", "function f() { return 1; }\na fine sentence otherwise."),
    # lorem ipsum page -> dropped wholesale (case-insensitive)
    (5, "en", "Lorem Ipsum dolor sit amet.\nreal content would be here."),
    # end quotation marks count as terminal punctuation (ASCII + U+201D)
    (6, "en", 'he said the thing."\nshe said the other thing.”\n'
              "a plain third sentence.\nthe fourth one lands.\nfifth one too."),
    (7, "en", ""),
    # trailing blanks after the terminal mark are allowed
    (8, "en", "ends with trailing blanks.   \nsecond line also ends.\t\n"
              "third line closes now.\nfourth line closes now.\n"
              "fifth line closes now."),
    # badword page (word-level match, lowercased)
    (9, "en", "this page mentions badterm once.\nevery other line is fine.\n"
              "three more sentences follow.\nhere is the fourth.\nand the fifth."),
]


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(CASES, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def crafted_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{lang}', '{t}')".replace("\n", "' || chr(10) || '")
            for i, lang, t in CASES
        )
        + ") v(doc_id, lang, text)"
    )
    return con


def test_metrics_crafted_parity(crafted, crafted_duck):
    got = sorted(map(tuple, c4_line_metrics(crafted).collect()))
    want = sorted(map(tuple, crafted_duck.sql(c4_line_metrics_sql()).fetchall()))
    assert got == [tuple(w) for w in want]


def test_line_rule_semantics(crafted):
    m = {r.doc_id: r for r in c4_line_metrics(crafted).collect()}
    # doc 0: all 5 lines end in terminal punctuation and have >=3 words
    assert m[0].n_lines == 5 and m[0].n_kept_lines == 5 and m[0].n_sentences == 5
    # doc 1: no line has terminal punctuation
    assert m[1].n_kept_lines == 0 and m[1].clean_len == 0
    # doc 2: the javascript line is dropped despite ending in '.'
    assert m[2].n_lines == 3 and m[2].n_kept_lines == 2
    # doc 3: 'too short.' and 'ok!' dropped by the 3-word floor
    assert m[3].n_lines == 7 and m[3].n_kept_lines == 5
    # doc 4/5: page flags fire
    assert m[4].has_brace == 1 and m[5].has_lorem == 1
    # doc 6: both quote forms count as terminal marks
    assert m[6].n_kept_lines == 5
    # doc 7: empty page -> zero everything
    assert tuple(m[7])[1:] == (1, 0, 0, 0, 0, 0)
    # doc 8: trailing blanks after the mark still terminal
    assert m[8].n_kept_lines == 5


def test_filter_applies_every_rule(crafted, crafted_duck):
    kept = sorted(
        r.doc_id for r in c4_filter(crafted, badwords=("badterm",)).collect()
    )
    # doc 0/6/8 survive; 1 (no punct), 2 (<5 sentences after cleaning),
    # 3 survives (5 keeper lines), 4 (brace), 5 (lorem), 7 (empty),
    # 9 (badword) all fall
    assert kept == [0, 3, 6, 8]
    want = sorted(
        r[0]
        for r in crafted_duck.sql(c4_filter_sql(badwords=("badterm",))).fetchall()
    )
    assert kept == want


def test_clean_text_is_kept_lines_joined(crafted):
    rows = {r.doc_id: r.clean_text for r in c4_filter(crafted).collect()}
    assert rows[0].count("\n") == 4  # 5 kept lines re-joined
    assert "javascript" not in rows.get(2, "").lower()


def test_relaxation_lever(crafted):
    # require_terminal_punct=False admits doc 1's unpunctuated first line
    # (the other two fall to the 3-word floor), but the sentence floor
    # still rejects the page
    m = {
        r.doc_id: r
        for r in c4_line_metrics(crafted, require_terminal_punct=False).collect()
    }
    assert m[1].n_kept_lines == 1 and m[1].n_sentences == 0
    kept = [
        r.doc_id
        for r in c4_filter(crafted, require_terminal_punct=False).collect()
    ]
    assert 1 not in kept


def test_corpus_parity_at_entry_config(documents, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = sorted(
        map(
            repr,
            c4_line_metrics(documents, min_line_words=40, require_terminal_punct=False)
            .toPandas()
            .itertuples(index=False, name=None),
        )
    )
    want = sorted(
        map(
            repr,
            con.sql(
                c4_line_metrics_sql(min_line_words=40, require_terminal_punct=False)
            )
            .df()
            .itertuples(index=False, name=None),
        )
    )
    assert got == want
    kept = c4_filter(
        documents, min_line_words=40, min_sentences=0,
        require_terminal_punct=False,
    )
    n_kept = kept.count()
    assert 0 < n_kept < documents.count()  # the relaxed config discriminates
    want_n = con.sql(
        "SELECT count(*) FROM ("
        + c4_filter_sql(
            min_line_words=40, min_sentences=0, require_terminal_punct=False
        )
        + ")"
    ).fetchone()[0]
    assert n_kept == want_n


def test_filter_plan_is_single_stage(documents):
    """The pass must stay one scan+filter — no exchange, no join."""
    plan = (
        c4_filter(documents, min_line_words=40, min_sentences=0,
                  require_terminal_punct=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_crlf_lines_parse_identically(spark):
    """CRLF corpora: the \\r?\\n split must consume the \\r — Java regex $
    (Spark rlike) matches before a trailing \\r while RE2 (DuckDB) does
    not, so a leaked \\r would silently diverge the engines. Both the
    filter verdict and the metrics must match byte-for-byte, and the
    clean_text must carry no \\r."""
    text = (
        "first good line is here.\r\nsecond good line lands too.\r\n"
        "third sentence closes now.\r\nfourth one follows suit.\r\n"
        "fifth one wraps the page.\r\n"
    )
    df = spark.createDataFrame(
        [(0, "en", text)], "doc_id long, lang string, text string"
    )
    con = duckdb.connect()
    lit = text.replace("\r\n", "' || chr(13) || chr(10) || '")
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        f"(0, 'en', '{lit}')) v(doc_id, lang, text)"
    )
    got = [tuple(r) for r in c4_filter(df).collect()]
    want = [tuple(r) for r in con.sql(c4_filter_sql()).fetchall()]
    assert got == want
    assert len(got) == 1  # the page survives in BOTH engines
    assert "\r" not in got[0][2]
    gm = [tuple(r) for r in c4_line_metrics(df).collect()]
    wm = [tuple(r) for r in con.sql(c4_line_metrics_sql()).fetchall()]
    assert gm == wm
