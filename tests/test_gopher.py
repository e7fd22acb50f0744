"""Gopher quality-rule battery (Rae et al. 2021 App. A): crafted-doc rule
semantics, Spark↔DuckDB metric parity, corpus-level filter agreement, and
the single-stage plan shape."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.gopher import (
    GOPHER_STOPWORDS,
    gopher_filter,
    gopher_filter_sql,
    gopher_metrics,
    gopher_metrics_sql,
)

CASES = [
    (0, "the quick brown fox and a dog have fun with all of that to be sure"),
    (1, "- bullet one\n- bullet two\n• third\nnormal line"),
    (2, "trailing dots...\nand more…  \nplain"),
    (3, "#### hash heavy # text # with the of and"),
    (4, "12345 67890 111 222 333 the of"),
    (5, ""),
    (6, "   \t  "),
    (7, "one"),
    (8, "word " * 60 + "the of and that"),
    (9, "a…b...c…d the to"),
]


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


@pytest.fixture(scope="module")
def crafted_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}')".replace("\n", "' || chr(10) || '") for i, t in CASES
        )
        + ") v(doc_id, text)"
    )
    return con


def test_metrics_crafted_parity(crafted, crafted_duck):
    got = sorted(map(tuple, gopher_metrics(crafted).collect()))
    want = sorted(map(tuple, crafted_duck.sql(gopher_metrics_sql()).fetchall()))
    assert got == [tuple(w) for w in want]


def test_metrics_rule_semantics(crafted):
    m = {r.doc_id: r for r in gopher_metrics(crafted).collect()}
    # stop list: doc 0 contains all 8 words
    assert len(GOPHER_STOPWORDS) == 8 and m[0].stop_hits == 8
    # bullets: 3 of 4 lines in doc 1 start with -/•
    assert m[1].bullet_line_frac == 0.75
    # ellipsis lines: 2 of 3 lines in doc 2 end with .../… (trailing blanks ok)
    assert m[2].ellipsis_line_frac == 0.666667
    # symbol ratio: doc 2 has one '...' + one '…' over 5 words
    assert m[2].symbol_ratio == 0.4
    # '#' symbols: doc 3 has 6 hashes over 10 words
    assert m[3].symbol_ratio == 0.6
    # alpha-word fraction: doc 4 = 2 alphabetic of 7 words
    assert m[4].alpha_word_frac == 0.285714
    # empty / whitespace-only docs: all-zero metrics, no div-by-zero
    assert tuple(m[5])[1:] == tuple(m[6])[1:] == (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0)
    # duplicate stop words count ONCE (doc 8 repeats 'word' 60×, 4 stops)
    assert m[8].n_words == 64 and m[8].stop_hits == 4


def test_filter_applies_every_rule(crafted, crafted_duck):
    kept = sorted(r.doc_id for r in gopher_filter(crafted, min_words=5).collect())
    # doc 0: passes all; doc 8: passes all; everything else violates ≥1 rule
    # (bullets≤0.9 passes doc 1 but stop_hits=0 kills it; doc 2 symbol
    # ratio + ellipsis lines; doc 3 symbols; doc 4 alpha frac; 5/6/7 words)
    assert kept == [0, 8]
    want = sorted(
        r[0]
        for r in crafted_duck.sql(
            gopher_filter_sql(min_words=5, select="doc_id")
        ).fetchall()
    )
    assert kept == want


def test_paper_defaults_reject_short_docs(crafted):
    # the canonical 50-word floor: only doc 8 (64 words) survives it, and
    # only with min_stop_hits reachable (it has 4 distinct stop words)
    kept = [r.doc_id for r in gopher_filter(crafted).collect()]
    assert kept == [8]


def test_corpus_metrics_match_oracle(documents, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = sorted(
        map(repr, gopher_metrics(documents).toPandas().itertuples(index=False, name=None))
    )
    want = sorted(
        map(repr, con.sql(gopher_metrics_sql()).df().itertuples(index=False, name=None))
    )
    assert got == want


def test_corpus_filter_matches_oracle_and_splits(documents, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    kept = gopher_filter(documents, min_stop_hits=1)
    n_kept = kept.count()
    n_all = documents.count()
    assert 0 < n_kept < n_all  # the thresholds actually discriminate
    want = con.sql(
        gopher_filter_sql(min_stop_hits=1, select="count(*)")
    ).fetchone()[0]
    assert n_kept == want


def test_filter_plan_is_single_stage(documents):
    """The battery must stay one scan+filter — no exchange, no join."""
    plan = gopher_filter(documents, min_stop_hits=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
