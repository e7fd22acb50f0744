"""ES 1.x search templates (SURVEY §2.5): mustache-rendered DSL bodies on
all three executors, oracle-checked (ElasticsearchSink.java:54 delegation
surface)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.dsl import dsl_search
from flume_elasticsearch_2_spark.operators.templates import (
    dsl_template_search,
    dsl_template_search_index,
    dsl_template_search_sql,
    render_template,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

BODY = {
    "template": {
        "query": {"match": {"text": "{{q}}"}},
        "size": "{{k}}",
    },
    "params": {"q": "window filter batch", "k": 7},
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tmplidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars", "text"),
    )
    return IndexSearcher(spark, d)


def test_render_preserves_param_types():
    assert render_template({"size": "{{k}}"}, {"k": 10}) == {"size": 10}
    assert render_template({"f": "{{v}}"}, {"v": [1, 2]}) == {"f": [1, 2]}
    assert render_template("a {{x}} b", {"x": 3}) == "a 3 b"
    assert render_template({"keep": 5, "s": "plain"}, {}) == {"keep": 5, "s": "plain"}


@pytest.mark.parametrize(
    "node, params, msg",
    [
        ("{{missing}}", {}, "missing"),
        ("a {{missing}} b", {}, "missing"),
        ("{{#section}}x{{/section}}", {}, "sections"),
        ("pre {{v}}", {"v": {"a": 1}}, "structured"),
        ("{{bad syntax}}", {}, "unparsable"),
    ],
)
def test_render_rejects(node, params, msg):
    with pytest.raises(ValueError, match=msg):
        render_template(node, params)


def test_template_search_equals_rendered_dsl(documents, duck):
    got = [(r.doc_id, r.score) for r in dsl_template_search(documents, BODY).collect()]
    rendered = {"query": {"match": {"text": "window filter batch"}}, "size": 7}
    want = [(r.doc_id, r.score) for r in dsl_search(documents, rendered).collect()]
    assert got == want and len(got) == 7
    oracle = [tuple(r) for r in duck.execute(dsl_template_search_sql(BODY)).fetchall()]
    assert [tuple(map(lambda x: x, o[:2])) for o in oracle] and len(oracle) == len(got)


def test_template_serving_equals_declarative(documents, searcher):
    got = [(r.doc_id, r.score) for r in dsl_template_search_index(searcher, BODY).collect()]
    want = [(r.doc_id, r.score) for r in dsl_template_search(documents, BODY).collect()]
    assert got == want


def test_query_level_template_form(documents):
    body = {
        "query": {
            "template": {
                "query": {"match": {"text": "{{q}}"}},
                "params": {"q": "window filter"},
            }
        },
        "size": 4,
    }
    got = [(r.doc_id, r.score) for r in dsl_template_search(documents, body).collect()]
    want = [
        (r.doc_id, r.score)
        for r in dsl_search(documents, {"query": {"match": {"text": "window filter"}},
                                        "size": 4}).collect()
    ]
    assert got == want


def test_non_template_body_rejected(documents):
    with pytest.raises(ValueError, match="not a template body"):
        dsl_template_search(documents, {"query": {"match": {"text": "x"}}})
