"""ES 1.x filtered aliases: the `_aliases` actions registry + aliased search
on all three engine paths (the alias filter = the 1.x `filtered` body
rewrite, exactly what the delegated ES does on every aliased request —
delegation site ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.alias import (
    AliasRegistry,
    aliased_body,
    search_alias,
    search_alias_index,
    search_alias_sql,
)
from flume_elasticsearch_2_spark.operators.dsl import dsl_search
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

BODY = {"query": {"match": {"text": "dup batch scan"}}, "size": 6}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def registry():
    reg = AliasRegistry()
    reg.update(
        [
            {"add": {"index": "documents", "alias": "docs_en",
                     "filter": {"term": {"lang": "en"}}}},
            {"add": {"index": "documents", "alias": "all_docs"}},
        ]
    )
    return reg


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aliasidx") / "idx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "source", "n_chars", "text"),
    )
    return IndexSearcher(spark, d)


def test_filtered_alias_matches_duckdb(documents, duck, registry):
    got = [tuple(r) for r in search_alias(registry, "docs_en", documents, BODY).collect()]
    want = [tuple(r) for r in duck.execute(search_alias_sql(registry, "docs_en", BODY)).fetchall()]
    assert got == want and got
    # the filter actually bites: the unfiltered search differs
    plain = [tuple(r) for r in dsl_search(documents, BODY).collect()]
    assert got != plain


def test_filtered_alias_serving_equals_declarative(documents, searcher, registry):
    got = [tuple(r) for r in search_alias_index(registry, "docs_en", searcher, BODY).collect()]
    want = [tuple(r) for r in search_alias(registry, "docs_en", documents, BODY).collect()]
    assert got == want


def test_unfiltered_alias_is_passthrough(documents, registry):
    assert aliased_body(registry, "all_docs", BODY) is BODY
    got = [tuple(r) for r in search_alias(registry, "all_docs", documents, BODY).collect()]
    want = [tuple(r) for r in dsl_search(documents, BODY).collect()]
    assert got == want


def test_alias_actions_and_persistence(tmp_path):
    reg = AliasRegistry()
    reg.update([{"add": {"index": "i1", "alias": "a", "filter": {"term": {"lang": "en"}}}}])
    reg.update([{"add": {"index": "i2", "alias": "b"}}])
    reg.update([{"remove": {"alias": "b"}}])
    assert set(reg.aliases()) == {"a"}
    p = str(tmp_path / "aliases.json")
    reg.save(p)
    assert AliasRegistry.load(p).aliases() == reg.aliases()
    with pytest.raises(KeyError):
        reg.get("b")


def test_alias_action_validation():
    reg = AliasRegistry()
    with pytest.raises(ValueError):
        reg.update([{"add": {"index": "i", "alias": "a", "routing": "1"}}])
    with pytest.raises(ValueError):
        reg.update([{"rename": {"alias": "a"}}])
    with pytest.raises(ValueError):
        reg.update([{"add": {"index": "i", "alias": "a"}, "remove": {"alias": "a"}}])


def test_alias_filter_composes_with_body_filters(documents, duck, registry):
    # the rewrite nests: body already filtered -> alias filter ANDs in
    body = {
        "query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                           "filter": [{"range": {"n_chars": {"gte": 100}}}]}},
        "size": 6,
    }
    got = [tuple(r) for r in search_alias(registry, "docs_en", documents, body).collect()]
    want = [tuple(r) for r in duck.execute(search_alias_sql(registry, "docs_en", body)).fetchall()]
    assert got == want and got
