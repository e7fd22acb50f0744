"""Aggregation trees (operators/subaggs.py): declarative path vs DuckDB
oracle, serving path vs oracle, DSL routing, parse/refusal surface."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.subaggs import (
    agg_tree,
    agg_tree_index,
    agg_tree_sql,
    parse_agg_tree,
    tree_shaped,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).fetchall()


def _norm(rows):
    """Order-insensitive, repr-normalized compare set (NULL-bearing long
    columns surface as float NaN on both engines via pandas)."""
    return sorted(map(repr, rows))


BODIES = {
    "sibling_metrics": {
        "query": {"match": {"text": "dup batch scan"}},
        "aggs": {
            "avg_chars": {"avg": {"field": "n_chars"}},
            "sum_chars": {"sum": {"field": "n_chars"}},
            "min_chars": {"min": {"field": "n_chars"}},
            "max_chars": {"max": {"field": "n_chars"}},
            "n_vals": {"value_count": {"field": "n_chars"}},
        },
    },
    "terms_metrics": {
        "query": {"match": {"text": "dup batch scan"}},
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 5},
            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                     "chars": {"stats": {"field": "n_chars"}}},
        }},
    },
    "nested_terms": {
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 3},
            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                     "by_source": {
                         "terms": {"field": "source", "size": 2},
                         "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}},
                     }},
        }},
    },
    "metric_order": {
        "aggs": {"by_source": {
            "terms": {"field": "source", "size": 4,
                      "order": {"avg_chars": "desc"}},
            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
        }},
    },
    "term_order_asc": {
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 3, "order": {"_term": "asc"}},
            "aggs": {"mx": {"max": {"field": "n_chars"}}},
        }},
    },
    "histogram_child": {
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 3},
            "aggs": {"by_len": {"histogram": {"field": "n_chars",
                                              "interval": 500}}},
        }},
    },
    "histogram_root": {
        "query": {"match": {"text": "dup batch"}},
        "aggs": {"by_len": {
            "histogram": {"field": "n_chars", "interval": 400},
            "aggs": {"langs": {"terms": {"field": "lang", "size": 2}}},
        }},
    },
    "and_scope": {
        "query": {"match": {"text": {"query": "dup batch", "operator": "and"}}},
        "aggs": {"by_source": {
            "terms": {"field": "source", "size": 4},
            "aggs": {"mx": {"max": {"field": "n_chars"}}},
        }},
    },
    "global_tree": {
        "query": {"match": {"text": "dup"}},
        "aggs": {"everything": {
            "global": {},
            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                     "n": {"value_count": {"field": "n_chars"}}},
        }},
    },
}


@pytest.mark.parametrize("name", sorted(BODIES))
def test_agg_tree_matches_duckdb(documents, sf_dir, name):
    body = BODIES[name]
    sdf = agg_tree(documents, body).toPandas()
    odf_rows = _duck(sf_dir, agg_tree_sql(body))
    assert len(sdf) == len(odf_rows)
    assert _norm(sdf.itertuples(index=False, name=None)) == _norm(odf_rows)


def test_nested_row_shape(documents):
    out = agg_tree(documents, BODIES["nested_terms"])
    assert out.columns == [
        "by_lang", "by_lang_count", "avg_chars",
        "by_source", "by_source_count", "sum_chars",
    ]
    rows = out.collect()
    # parent values repeat across their child rows; child count never
    # exceeds its parent's
    for r in rows:
        if r["by_source_count"] is not None:
            assert r["by_source_count"] <= r["by_lang_count"]


def test_parent_counts_include_null_child_keys(spark):
    df = spark.createDataFrame(
        [(1, "a b", "en", None, 10), (2, "a b", "en", "web", 20),
         (3, "a b", "fr", "web", 30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    body = {"aggs": {"by_lang": {
        "terms": {"field": "lang"},
        "aggs": {"by_source": {"terms": {"field": "source"}}},
    }}}
    rows = {(r["by_lang"], r["by_source"]): (r["by_lang_count"], r["by_source_count"])
            for r in agg_tree(df, body).collect()}
    # the NULL-source doc counts in the en parent but forms no child bucket
    assert rows[("en", "web")][0] == 2 and rows[("en", "web")][1] == 1
    assert rows[("fr", "web")] == (1, 1)


def test_all_null_metric_bucket(spark):
    df = spark.createDataFrame(
        [(1, "a", "en", None), (2, "a", "en", None), (3, "a", "fr", 7)],
        "doc_id long, text string, lang string, n_chars long",
    )
    body = {"aggs": {"by_lang": {
        "terms": {"field": "lang"},
        "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                 "sum_chars": {"sum": {"field": "n_chars"}},
                 "n": {"value_count": {"field": "n_chars"}}},
    }}}
    rows = {r["by_lang"]: r for r in agg_tree(df, body).collect()}
    assert rows["en"]["avg_chars"] is None  # ES: no extracted values
    assert rows["en"]["sum_chars"] == 0.0   # ES sum of nothing is 0
    assert rows["en"]["n"] == 0
    assert rows["fr"]["avg_chars"] == 7.0


def test_null_bucket_keys_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a", None, 5), (2, "a", "en", 6)],
        "doc_id long, text string, lang string, n_chars long",
    )
    body = {"aggs": {"by_lang": {"terms": {"field": "lang"},
                                 "aggs": {"n": {"value_count": {"field": "n_chars"}}}}}}
    rows = agg_tree(df, body).collect()
    assert [r["by_lang"] for r in rows] == ["en"]


def test_empty_parent_keeps_row_with_null_child(spark):
    df = spark.createDataFrame(
        [(1, "a", "en", None), (2, "a", "fr", "web")],
        "doc_id long, text string, lang string, source string",
    )
    body = {"aggs": {"by_lang": {"terms": {"field": "lang"},
                                 "aggs": {"by_source": {"terms": {"field": "source"}}}}}}
    rows = {r["by_lang"]: r for r in agg_tree(df, body).collect()}
    assert rows["en"]["by_source"] is None and rows["en"]["by_lang_count"] == 1


# -- serving path ------------------------------------------------------------


@pytest.fixture(scope="module")
def tree_searcher(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = os.path.join(str(tmp_path_factory.mktemp("subagg_idx")), "idx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "source", "n_chars"),
    )
    return IndexSearcher(spark, d)


@pytest.mark.parametrize(
    "name",
    ["sibling_metrics", "terms_metrics", "nested_terms", "metric_order",
     "histogram_child", "and_scope", "global_tree"],
)
def test_serving_matches_oracle(tree_searcher, sf_dir, name):
    body = BODIES[name]
    sdf = agg_tree_index(tree_searcher, body).toPandas()
    odf_rows = _duck(sf_dir, agg_tree_sql(body))
    assert len(sdf) == len(odf_rows)
    assert _norm(sdf.itertuples(index=False, name=None)) == _norm(odf_rows)


def test_serving_zero_match_global_metrics(tree_searcher):
    body = {"query": {"match": {"text": "zzzzunseen"}},
            "aggs": {"n": {"value_count": {"field": "n_chars"}},
                     "avg_chars": {"avg": {"field": "n_chars"}}}}
    rows = agg_tree_index(tree_searcher, body).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 0 and rows[0]["avg_chars"] is None


def test_serving_zero_match_buckets_empty(tree_searcher):
    body = {"query": {"match": {"text": "zzzzunseen"}},
            "aggs": {"by_lang": {"terms": {"field": "lang"},
                                 "aggs": {"n": {"value_count": {"field": "n_chars"}}}}}}
    assert agg_tree_index(tree_searcher, body).count() == 0


# -- DSL routing -------------------------------------------------------------


def test_dsl_routes_tree_bodies(documents, sf_dir):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_sql,
    )

    body = BODIES["terms_metrics"]
    assert tree_shaped(body)
    sdf = dsl_aggregation(documents, body).toPandas()
    odf_rows = _duck(sf_dir, dsl_aggregation_sql(body))
    assert _norm(sdf.itertuples(index=False, name=None)) == _norm(odf_rows)


def test_legacy_shapes_not_tree_routed():
    # single agg, terms>stats (terms_stats), terms>top_hits, global>single
    # stay on the facet path byte-for-byte
    assert not tree_shaped({"aggs": {"a": {"terms": {"field": "lang"}}}})
    assert not tree_shaped({"aggs": {"a": {
        "terms": {"field": "lang"},
        "aggs": {"s": {"stats": {"field": "n_chars"}}}}}})
    assert not tree_shaped({"aggs": {"a": {
        "terms": {"field": "lang"},
        "aggs": {"h": {"top_hits": {"size": 2, "sort": [{"n_chars": "desc"}]}}}}}})
    assert not tree_shaped({"aggs": {"g": {"global": {},
        "aggs": {"s": {"stats": {"field": "n_chars"}}}}}})
    # tree shapes
    assert tree_shaped({"aggs": {"a": {"avg": {"field": "x"}},
                                 "b": {"sum": {"field": "x"}}}})
    assert tree_shaped({"aggs": {"a": {
        "terms": {"field": "lang", "order": {"m": "desc"}},
        "aggs": {"m": {"avg": {"field": "n_chars"}}}}}})
    assert tree_shaped({"aggs": {"a": {
        "terms": {"field": "lang"},
        "aggs": {"b": {"terms": {"field": "source"}}}}}})


# -- parse/refusal surface ---------------------------------------------------


@pytest.mark.parametrize(
    "body,msg",
    [
        ({"aggs": {}}, "non-empty aggs"),
        ({"aggs": {"a": {"terms": {"field": "lang"}},
                   "b": {"terms": {"field": "source"}}}}, "sibling bucket"),
        ({"aggs": {"a": {"avg": {"field": "x"}},
                   "b": {"terms": {"field": "lang"}}}}, "alongside a bucket"),
        ({"aggs": {"a": {"terms": {"field": "lang"},
                         "aggs": {"b": {"terms": {"field": "source"},
                                        "aggs": {"c": {"terms": {"field": "lang"}}}}}}}},
         "grandchild"),
        ({"aggs": {"a": {"terms": {"field": "lang"},
                         "aggs": {"m": {"percentiles": {"field": "x"}}}}}},
         "sub-agg kind"),
        ({"aggs": {"a": {"terms": {"field": "lang",
                                   "order": {"nope": "desc"}},
                         "aggs": {"m": {"avg": {"field": "x"}}}}}},
         "unknown metric"),
        ({"aggs": {"a": {"terms": {"field": "lang",
                                   "order": {"s": "desc"}},
                         "aggs": {"s": {"stats": {"field": "x"}}}}}},
         "stats metric"),
        ({"aggs": {"a": {"histogram": {"field": "x"}}}}, "interval"),
        ({"aggs": {"by_lang": {"terms": {"field": "lang"},
                               "aggs": {"by_lang_count": {"avg": {"field": "x"}}}}}},
         "collide"),
        ({"aggs": {"a": {"terms": {"field": "text"}}}}, "analyzed field"),
        ({"aggs": {"bad name": {"avg": {"field": "x"}},
                   "b": {"sum": {"field": "x"}}}}, "column-safe"),
        ({"query": {"term": {"lang": "en"}},
          "aggs": {"a": {"avg": {"field": "x"}},
                   "b": {"sum": {"field": "x"}}}}, "scope query kind"),
    ],
)
def test_parse_refusals(body, msg):
    with pytest.raises(ValueError, match=msg):
        parse_agg_tree(body)


def test_metric_child_order_refused():
    body = {"aggs": {"a": {"terms": {"field": "lang"},
                           "aggs": {"b": {"terms": {"field": "source",
                                                    "order": {"m": "desc"}},
                                          "aggs": {"m": {"avg": {"field": "x"}}}}}}}}
    with pytest.raises(ValueError, match="CHILD"):
        parse_agg_tree(body)
