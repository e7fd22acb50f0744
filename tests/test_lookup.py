"""ES 1.x terms lookup filter (operators/lookup.py): resolve-then-filter
semantics, missing-doc/null-path/duplicate-id edges, the DSL mis-parse
guard, cross-engine parity, and the pushed-down plan shape."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.lookup import (
    resolve_terms_lookup,
    terms_lookup_filter,
    terms_lookup_filter_sql,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_scalar_path_matches_duckdb(documents, duck):
    """Scalar path column = a one-term lookup (the ES GET of a single
    field value): docs sharing doc 7's lang."""
    got = [
        tuple(r)
        for r in terms_lookup_filter(
            documents, documents, "lang", 7, "lang",
            select=["doc_id", "lang", "source"],
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.sql(
            terms_lookup_filter_sql(
                "lang", 7, "lang", select="doc_id, lang, source"
            )
        ).fetchall()
    ]
    assert got == want and got
    langs = {r[1] for r in got}
    assert len(langs) == 1


def test_array_path_resolves_all_elements(spark):
    lookup = spark.createDataFrame(
        [(1, ["en", "de"]), (2, None)],
        "doc_id long, langs array<string>",
    )
    docs = spark.createDataFrame(
        [(10, "en"), (11, "fr"), (12, "de"), (13, None)],
        "doc_id long, lang string",
    )
    assert resolve_terms_lookup(lookup, 1, "langs") == ["en", "de"]
    out = terms_lookup_filter(docs, lookup, "lang", 1, "langs")
    assert [r.doc_id for r in out.collect()] == [10, 12]  # NULL lang drops


def test_missing_doc_and_null_path_match_nothing(spark, documents, duck):
    """ES 1.x: a missing lookup doc (or a null path) yields the empty
    terms list — the filter matches nothing, no error. Parity with the
    SQL empty-subquery form included."""
    lookup = spark.createDataFrame([(2, None)], "doc_id long, langs array<string>")
    docs = spark.createDataFrame([(10, "en")], "doc_id long, lang string")
    assert resolve_terms_lookup(lookup, 999, "langs") == []
    assert resolve_terms_lookup(lookup, 2, "langs") == []
    assert terms_lookup_filter(docs, lookup, "lang", 999, "langs").count() == 0
    got = terms_lookup_filter(
        documents, documents, "lang", -1, "lang", select=["doc_id"]
    ).count()
    want = duck.sql(
        terms_lookup_filter_sql("lang", -1, "lang", select="doc_id")
    ).df()
    assert got == 0 and len(want) == 0


def test_duplicate_lookup_id_raises(spark):
    lookup = spark.createDataFrame(
        [(1, "en"), (1, "de")], "doc_id long, lang string"
    )
    with pytest.raises(ValueError, match="not unique"):
        resolve_terms_lookup(lookup, 1, "lang")


def test_dsl_rejects_lookup_form_loudly(documents):
    """The pure DSL parse cannot fetch the lookup doc; a dict-valued terms
    filter must raise (before this guard it silently matched the dict
    KEYS)."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search

    body = {
        "query": {"filtered": {"query": {"match": {"text": "spark"}}, "filter": {
            "terms": {"lang": {"index": "langs", "id": 1, "path": "langs"}}}}}
    }
    with pytest.raises(ValueError, match="terms lookup"):
        dsl_search(documents, body)
    nbody = {
        "query": {"filtered": {"query": {"match": {"text": "spark"}}, "filter": {
            "not": {"terms": {"lang": {"index": "langs", "id": 1, "path": "langs"}}}}}}
    }
    with pytest.raises(ValueError, match="terms lookup"):
        dsl_search(documents, nbody)


def test_plan_pushes_id_and_inlist(documents):
    """The lookup GET pushes the id equality to its scan; the resolved
    terms land as a literal In() on the corpus scan — no join anywhere."""
    import io
    from contextlib import redirect_stdout

    out = terms_lookup_filter(
        documents, documents, "lang", 7, "lang", select=["doc_id", "lang"]
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "In(lang" in plan or "EqualTo(lang" in plan
