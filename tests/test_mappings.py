"""ES 1.x mappings (operators/mappings.py): ``index: not_analyzed`` and
the ``field.raw`` multi-field idiom — name resolution + mode checking in
front of the DSL, with the analyzed-vs-not_analyzed difference pinned."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.dsl import (
    dsl_search,
    dsl_search_index,
    dsl_search_sql,
)
from flume_elasticsearch_2_spark.operators.mappings import Mapping, apply_mapping

MAPPING = {
    "properties": {
        "text": {"type": "string",
                 "fields": {"raw": {"type": "string", "index": "not_analyzed"}}},
        "lang": {"type": "string", "index": "not_analyzed"},
        "source": {"type": "string", "index": "not_analyzed"},
        "n_chars": {"type": "long", "index": "not_analyzed"},
        "secret": {"type": "string", "index": "no"},
    }
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_mapping_resolution():
    m = Mapping(MAPPING)
    assert m.resolve("text") == ("text", "analyzed")
    assert m.resolve("text.raw") == ("text", "not_analyzed")
    assert m.resolve("lang") == ("lang", "not_analyzed")
    with pytest.raises(ValueError, match="not in the mapping"):
        m.resolve("nope")
    with pytest.raises(ValueError, match="not in the mapping"):
        m.resolve("lang.raw")  # no multi-field declared on lang
    with pytest.raises(ValueError, match="not searchable"):
        m.resolve("secret")


def test_raw_exact_match_three_engines(documents, duck):
    """term filter on text.raw = exact stored-value match on the text
    column, identical declarative vs DuckDB."""
    txt = documents.where("doc_id = 7").collect()[0].text
    body = {"query": {"filtered": {"filter": {"term": {"text.raw": txt}}}},
            "size": 20}
    got = [tuple(r) for r in dsl_search(documents, body, mapping=MAPPING).collect()]
    want = [tuple(r) for r in duck.execute(
        dsl_search_sql(body, mapping=MAPPING)
    ).fetchall()]
    assert got == want and [d for d, _ in got] == [7]


def test_analyzed_vs_not_analyzed_pinned(documents):
    """THE mapping pin: the same probe behaves differently on the analyzed
    field (match query: token containment, many hits) vs the .raw sub-field
    (exact full-string match: none — no doc's ENTIRE text is 'dup');
    and a term FILTER on the analyzed parent refuses loudly."""
    n_match = dsl_search(
        documents, {"query": {"match": {"text": "dup"}}, "size": 10_000},
        mapping=MAPPING,
    ).count()
    n_raw = dsl_search(
        documents,
        {"query": {"filtered": {"filter": {"term": {"text.raw": "dup"}}}},
         "size": 10_000},
        mapping=MAPPING,
    ).count()
    assert n_match > 0 and n_raw == 0
    with pytest.raises(ValueError, match="ANALYZED field 'text'"):
        dsl_search(
            documents,
            {"query": {"filtered": {"filter": {"term": {"text": "dup"}}}}},
            mapping=MAPPING,
        )


def test_match_on_not_analyzed_refuses(documents):
    with pytest.raises(ValueError, match="not_analyzed field 'lang'"):
        dsl_search(documents, {"query": {"match": {"lang": "en"}}}, mapping=MAPPING)


def test_mapping_composes_with_compound_filters(documents, duck):
    """.raw/not_analyzed references resolve inside and/or/not compounds and
    bool.filter; results equal the DuckDB twin."""
    bodies = [
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch"}},
            "filter": {"or": [{"term": {"lang": "en"}},
                              {"and": [{"range": {"n_chars": {"gte": 900}}},
                                       {"term": {"source": "web"}}]}]}}},
         "size": 10},
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch scan"}},
            "filter": {"not": {"or": [{"term": {"lang": "de"}},
                                      {"prefix": {"source": "ne"}}]}}}},
         "size": 10},
        {"query": {"bool": {"must": [{"match": {"text": "batch scan"}}],
                            "filter": [{"terms": {"lang": ["en", "fr"]}}]}},
         "size": 10},
    ]
    for body in bodies:
        got = [tuple(r) for r in dsl_search(documents, body, mapping=MAPPING).collect()]
        want = [tuple(r) for r in duck.execute(
            dsl_search_sql(body, mapping=MAPPING)
        ).fetchall()]
        assert got == want and got, body


def test_raw_serving_equals_declarative(documents, spark, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = str(tmp_path_factory.mktemp("rawidx") / "idx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "source", "n_chars", "text"),
    )
    searcher = IndexSearcher(spark, d)
    txt = documents.where("doc_id = 7").collect()[0].text
    bodies = [
        {"query": {"filtered": {"filter": {"term": {"text.raw": txt}}}}, "size": 20},
        {"query": {"filtered": {"filter": {"or": [
            {"term": {"lang": "en"}}, {"term": {"source": "web"}}]}}}, "size": 50},
    ]
    for body in bodies:
        got = [tuple(r) for r in dsl_search_index(searcher, body, mapping=MAPPING).collect()]
        want = [tuple(r) for r in dsl_search(documents, body, mapping=MAPPING).collect()]
        assert got == want and got, body


def test_apply_mapping_leaves_unmapped_bodies_untouched():
    body = {"query": {"match": {"text": "dup"}}, "size": 5}
    assert apply_mapping(body, MAPPING) == body
    # and a body without mapping param keeps pre-round-5 behavior: handled
    # by every other DSL test in the suite running mapping-less


# -- property fuzz: random mapped bodies --------------------------------------


def test_mapping_fuzz_random_bodies(documents, duck):
    """Randomized mapped bodies (seeded, no hypothesis dependency needed):
    any combination of .raw / not_analyzed filter references inside
    and/or/not compounds must agree with the DuckDB twin after the same
    rewrite."""
    import random

    rng = random.Random(57)
    langs = ["en", "fr", "de", "zh", "es"]

    def leaf():
        k = rng.choice(["term_lang", "range", "prefix_src", "terms_lang"])
        if k == "term_lang":
            return {"term": {"lang": rng.choice(langs)}}
        if k == "terms_lang":
            return {"terms": {"lang": sorted(rng.sample(langs, 2))}}
        if k == "prefix_src":
            return {"prefix": {"source": rng.choice(["we", "ne", "bo"])}}
        lo = rng.randrange(0, 2500)
        return {"range": {"n_chars": {"gte": lo, "lt": lo + rng.randrange(1, 3000)}}}

    def compound(depth):
        if depth == 0 or rng.random() < 0.4:
            return leaf()
        kind = rng.choice(["and", "or", "not"])
        if kind == "not":
            return {"not": compound(depth - 1)}
        return {kind: [compound(depth - 1) for _ in range(rng.randrange(2, 4))]}

    for _ in range(25):
        body = {
            "query": {"filtered": {
                "query": {"match": {"text": rng.choice(
                    ["dup batch", "batch scan", "join filter window"]
                )}},
                "filter": compound(2),
            }},
            "size": rng.randrange(1, 15),
        }
        got = [tuple(r) for r in dsl_search(documents, body, mapping=MAPPING).collect()]
        want = [tuple(r) for r in duck.execute(
            dsl_search_sql(body, mapping=MAPPING)
        ).fetchall()]
        assert got == want, body
