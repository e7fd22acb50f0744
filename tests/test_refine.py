"""Composed refinement pipeline (operators/refine.py): end-to-end parity
with the CTE-composed DuckDB oracle, stage-order semantics, and the plan's
exchange budget."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.refine import (
    refine_corpus,
    refine_corpus_sql,
)

# the synthetic-corpus relaxations the standalone gopher/c4 entries pin
GOPHER_KW = {"min_stop_hits": 1}
C4_KW = {"min_line_words": 40, "min_sentences": 0, "require_terminal_punct": False}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_refine_matches_duckdb(documents, duck):
    got = [
        tuple(r)
        for r in refine_corpus(documents, GOPHER_KW, C4_KW).collect()
    ]
    want = [
        tuple(r)
        for r in duck.sql(refine_corpus_sql(GOPHER_KW, C4_KW)).fetchall()
    ]
    assert got == want and got
    assert {r[3] for r in got} <= {"head", "middle"}


def test_refine_drops_duplicates_before_scoring(spark):
    """An exact duplicate must not survive to the bucketing stage — only
    the lowest-id copy of identical text appears in the output."""
    base = (
        "this is a reasonably long natural language document with more than "
        "enough words to pass the word count floor of the quality battery "
        "and it keeps going with plain english prose for a while longer "
        "so that the mean word length and the alphabetic fraction both "
        "stay inside the gopher thresholds just fine"
    )
    rows = [(i, base + f" variant {i}", "en", "web", 1) for i in range(6)]
    rows.append((100, base + " variant 0", "en", "web", 1))  # dup of id 0
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = refine_corpus(
        df,
        {"min_stop_hits": 1, "min_words": 10},
        {"min_line_words": 3, "min_sentences": 0, "require_terminal_punct": False},
    ).collect()
    ids = [r.doc_id for r in out]
    assert 100 not in ids and 0 in ids
    # 6 unique docs, head+middle = ceil(2/3 * 6) = 4 kept
    assert len(ids) == 4


def test_refine_plan_exchange_budget(documents):
    """The whole recipe adds exactly the documented exchanges: dedup's
    fingerprint hash, charlm's tiny count (collected before this plan), the
    lang window hash, and the final order — no join anywhere."""
    plan = (
        refine_corpus(documents, GOPHER_KW, C4_KW)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
