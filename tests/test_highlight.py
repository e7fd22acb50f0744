"""ES highlight API (SURVEY §2.5): byte-exact cross-engine whole-field
markup + deterministic first-fragment mode + serving-path parity.

Reference analog: the ES 1.x highlighting surface behind the sink
(ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.highlight import (
    first_fragment_col,
    first_fragment_sql,
    highlight_col,
    highlight_sql_expr,
    search_highlight,
    search_highlight_sql,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


TERMS = ["scan", "batch", "dup"]


def test_highlight_byte_identical_to_duckdb(documents, duck):
    got = {
        r.doc_id: r.hl
        for r in documents.select(
            "doc_id", highlight_col("text", TERMS).alias("hl")
        ).collect()
    }
    want = dict(
        duck.execute(
            f"SELECT doc_id, {highlight_sql_expr(TERMS, 'text')} FROM documents"
        ).fetchall()
    )
    assert got == want


def test_highlight_adjacent_terms_and_case(spark):
    """Adjacent matched tokens both wrap (the regexp_replace boundary-group
    pitfall this implementation avoids) and original case is preserved."""
    df = spark.createDataFrame([(1, "Scan batch, scan! batch-scan end")], "doc_id int, text string")
    out = df.select(highlight_col("text", ["scan", "batch"]).alias("hl")).collect()[0].hl
    assert out == "<em>Scan</em> <em>batch</em>, <em>scan</em>! <em>batch</em>-<em>scan</em> end"


def test_highlight_no_match_and_empty(spark):
    df = spark.createDataFrame([(1, "nothing here"), (2, "")], "doc_id int, text string")
    rows = {r.doc_id: r.hl for r in df.select("doc_id", highlight_col("text", ["zz"]).alias("hl")).collect()}
    assert rows[1] == "nothing here" and rows[2] == ""


@pytest.mark.parametrize("query,mode", [("dup batch scan", "or"), ("join filter window", "and")])
def test_search_highlight_matches_duckdb(documents, duck, query, mode):
    got = [tuple(r) for r in search_highlight(documents, query, k=10, mode=mode).collect()]
    want = [tuple(r) for r in duck.execute(search_highlight_sql(query, k=10, mode=mode)).fetchall()]
    assert got == want and len(got) == 10


def test_search_highlight_wraps_only_query_terms(documents):
    rows = search_highlight(documents, "dup", k=5).collect()
    assert rows
    for r in rows:
        assert "<em>dup</em>" in r.highlight
        stripped = r.highlight.replace("<em>dup</em>", "dup")
        assert "<em>" not in stripped


def test_first_fragment_matches_duckdb(documents, duck):
    hl_sql = highlight_sql_expr(TERMS, "text")
    got = {
        r.doc_id: r.frag
        for r in documents.select(
            "doc_id",
            first_fragment_col(highlight_col("text", TERMS), 60).alias("frag"),
        ).collect()
    }
    want = dict(
        duck.execute(
            f"SELECT doc_id, {first_fragment_sql(hl_sql, 60)} FROM documents"
        ).fetchall()
    )
    assert got == want


def test_serving_highlight_rank_and_bytes_identical(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = str(tmp_path_factory.mktemp("hlidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4, orig_ids=documents.select("doc_id", "text")
    )
    s = IndexSearcher(spark, d)
    got = [tuple(r) for r in s.search_highlight("dup batch scan", k=10).collect()]
    want = [tuple(r) for r in search_highlight(documents, "dup batch scan", k=10).collect()]
    assert got == want


def test_serving_highlight_requires_stored_text(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_index
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = str(tmp_path_factory.mktemp("hlidx2") / "segidx")
    build_index(spark, documents, d, n_shards=2)
    with pytest.raises(ValueError, match="stored text"):
        IndexSearcher(spark, d).search_highlight("dup", k=5)


def test_search_highlight_fragment_matches_duckdb(documents, duck):
    got = [
        tuple(r)
        for r in search_highlight(
            documents, "dup batch", k=8, fragment_size=60
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            search_highlight_sql("dup batch", k=8, fragment_size=60)
        ).fetchall()
    ]
    assert got == want and got
    # fragments are substrings of the whole-field markup, capped at size
    whole = {
        r["doc_id"]: r["highlight"]
        for r in search_highlight(documents, "dup batch", k=8).collect()
    }
    for doc_id, _score, frag in got:
        assert len(frag) <= 60
        assert frag in whole[doc_id]
        assert frag.startswith("<em>") or "<em>" not in whole[doc_id]


def test_dsl_highlight_fragment_three_paths(documents, duck):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search, dsl_search_sql

    body = {
        "query": {"match": {"text": "dup batch"}},
        "size": 6,
        "highlight": {
            "fields": {"text": {"fragment_size": 50, "number_of_fragments": 1}},
            "pre_tags": ["[H]"],
            "post_tags": ["[/H]"],
        },
    }
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got
    assert all(len(r[2]) <= 50 for r in got)


def test_dsl_highlight_rejects_bad_options():
    from flume_elasticsearch_2_spark.operators.dsl import parse_body

    base = {"query": {"match": {"text": "dup"}}}
    for h in (
        {"fields": {"text": {}}, "encoder": "html"},
        {"fields": {"text": {"fragment_size": 50}}},         # needs nof >= 1
        {"fields": {"text": {"number_of_fragments": -1}}},   # negative
        {"fields": {"text": {"fragment_size": 0,
                             "number_of_fragments": 1}}},    # positive
        {"fields": {"text": {"order": "score"}}},            # unknown field opt
    ):
        with pytest.raises(ValueError, match="unsupported DSL"):
            parse_body({**base, "highlight": h})


# -- number_of_fragments > 1 --------------------------------------------------


def test_fragments_py_contract():
    from flume_elasticsearch_2_spark.operators.highlight import fragments_py

    hl = "aa <em>x</em> bb <em>y</em> cc <em>z</em>"
    # window covers the next tag -> it is skipped (non-overlap rule)
    assert fragments_py(hl, 5, 20, "<em>") == [hl[3:23], hl[31:51]]
    assert fragments_py(hl, 5, 20, "<em>")[1] == "<em>z</em>"
    assert fragments_py(hl, 1, 20, "<em>") == [hl[3:23]]
    assert fragments_py("no tags here", 3, 10, "<em>") == []
    # tiny window: every occurrence becomes its own fragment
    assert fragments_py(hl, 9, 5, "<em>") == ["<em>x", "<em>y", "<em>z"]


def test_multi_fragment_matches_duckdb(documents, duck):
    """nof=3, small window: the pinned non-overlap iteration byte-identical
    between the pandas-UDF twin and the recursive-CTE oracle."""
    from flume_elasticsearch_2_spark.operators.highlight import (
        search_highlight_fragments,
        search_highlight_fragments_sql,
    )

    got = [
        tuple(r)
        for r in search_highlight_fragments(
            documents, "dup batch scan", k=8, number_of_fragments=3,
            fragment_size=24,
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            search_highlight_fragments_sql(
                "dup batch scan", k=8, number_of_fragments=3, fragment_size=24
            )
        ).fetchall()
    ]
    assert got == want and got
    assert any(r[2] > 1 for r in got)  # multiple fragments actually occur
    assert all(len(r[3]) <= 24 for r in got)


def test_multi_fragment_serving_equals_declarative(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.operators.highlight import (
        search_highlight_fragments,
        search_highlight_fragments_index,
    )
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = str(tmp_path_factory.mktemp("hlfrag") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4, orig_ids=documents.select("doc_id", "text")
    )
    s = IndexSearcher(spark, d)
    got = [
        tuple(r)
        for r in search_highlight_fragments_index(
            s, "dup batch scan", k=8, number_of_fragments=3, fragment_size=24
        ).collect()
    ]
    want = [
        tuple(r)
        for r in search_highlight_fragments(
            documents, "dup batch scan", k=8, number_of_fragments=3, fragment_size=24
        ).collect()
    ]
    assert got == want and got


def test_multi_fragment_dsl_routing(documents, duck):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search, dsl_search_sql

    body = {
        "query": {"match": {"text": "dup batch"}},
        "size": 5,
        "highlight": {"fields": {"text": {"fragment_size": 30,
                                          "number_of_fragments": 3}}},
    }
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got
    # composition guard: from_ with multi-fragment refuses
    from flume_elasticsearch_2_spark.operators.dsl import parse_body

    with pytest.raises(ValueError, match="multi-fragment highlight"):
        parse_body({**body, "from": 5})
