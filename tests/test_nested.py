"""ES 1.x nested documents over the array<struct> corpus (SURVEY §2.5):
nested query score modes + nested agg, each vs a DuckDB oracle that builds
the SAME nested corpus in SQL — array semantics cross-checked end to end.

Reference analog: the delegated ES 1.1's nested mapping/query/facets
(delegation site ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.nested import (
    nest_children,
    nested_agg,
    nested_agg_sql,
    nested_corpus_sql,
    nested_query,
    nested_query_sql,
)

CHILD_COLS = ["l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return nest_children(
        orders, lineitem, "o_orderkey", "l_orderkey", CHILD_COLS
    ).persist()


CORPUS_SQL = nested_corpus_sql(child_cols=CHILD_COLS)

CASES = [
    # (filters, score_mode, score_field)
    ([("l_quantity", ">=", 45.0)], "none", None),
    ([("l_quantity", ">=", 30.0)], "sum", None),  # matching-child count
    ([("l_quantity", ">=", 30.0), ("l_returnflag", "==", "R")], "sum",
     "l_extendedprice"),
    ([("l_returnflag", "in", ("A", "R"))], "max", "l_quantity"),
    ([("l_quantity", "<", 10.0)], "avg", "l_extendedprice"),
]


@pytest.mark.parametrize("filters,mode,field", CASES)
def test_nested_query_matches_duckdb(corpus, duck, filters, mode, field):
    got = [
        tuple(r)
        for r in nested_query(corpus, filters, mode, field, k=15).collect()
    ]
    sql = nested_query_sql(filters, mode, field, k=15, corpus_sql=CORPUS_SQL)
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and got


def test_nested_agg_matches_duckdb(corpus, duck):
    scope = [("o_orderpriority", "==", "1-URGENT")]
    got = [tuple(r) for r in nested_agg(corpus, "l_quantity", scope).collect()]
    want = [
        tuple(r)
        for r in duck.execute(
            nested_agg_sql("l_quantity", scope, corpus_sql=CORPUS_SQL)
        ).fetchall()
    ]
    assert got == want and got[0][0] > 0


def test_childless_parent_kept_with_empty_array(spark):
    parents = spark.createDataFrame([(1,), (2,)], "o_orderkey long")
    children = spark.createDataFrame(
        [(1, 1, 5.0, 10.0, "N")],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    )
    c = nest_children(parents, children, "o_orderkey", "l_orderkey", CHILD_COLS)
    rows = {r["o_orderkey"]: r["children"] for r in c.collect()}
    assert rows[2] == [] and len(rows[1]) == 1
    # no nested object matches -> parent 2 never surfaces
    hits = nested_query(c, [("l_quantity", ">", 0.0)], "sum", None, k=10)
    assert [r["o_orderkey"] for r in hits.collect()] == [1]


def test_nested_query_is_joinless_and_shuffle_free(corpus):
    """The co-location claim, pinned on the physical plan: after the corpus
    is shaped, a nested query contains NO join and NO aggregate exchange —
    only the k-row TakeOrdered gather."""
    plan = nested_query(
        corpus, [("l_quantity", ">=", 30.0)], "sum", "l_extendedprice", k=10
    )._jdf.queryExecution().executedPlan().toString()
    # the string embeds the cached corpus's BUILD plan under InMemoryRelation;
    # the query side is everything above it
    query_side = plan.split("InMemoryRelation")[0]
    assert "Join" not in query_side
    assert "TakeOrderedAndProject" in query_side
    assert "InMemoryTableScan" in query_side  # reads the cached nested corpus


def test_nested_rejects_bad_args(corpus):
    with pytest.raises(ValueError):
        nested_query(corpus, [("l_quantity", "~", 1)], "none")
    with pytest.raises(ValueError):
        nested_query(corpus, [], "product")
    with pytest.raises(ValueError):
        nested_query(corpus, [], "max")  # needs score_field
    with pytest.raises(ValueError):
        nested_query_sql([("a", "like", "x")])


def test_dsl_nested_routes_to_nested_query(corpus, duck):
    """A 1.x client's nested body through the DSL front door equals the
    standalone operator and its oracle."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search

    body = {
        "query": {"nested": {
            "path": "children",
            "query": {"bool": {"filter": [
                {"range": {"l_quantity": {"gte": 30.0}}},
                {"term": {"l_returnflag": "R"}},
            ]}},
            "score_mode": "sum",
        }},
        "size": 15,
    }
    got = [
        tuple(r)
        for r in dsl_search(corpus, body, id_col="o_orderkey").collect()
    ]
    sql = nested_query_sql(
        [("l_quantity", ">=", 30.0), ("l_returnflag", "==", "R")],
        "sum", None, k=15, corpus_sql=CORPUS_SQL,
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and got


def test_dsl_nested_rejections(corpus):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_sql,
        parse_body,
    )

    for bad in [
        {"query": {"nested": {"path": "children"}}},  # no query
        {"query": {"nested": {"query": {"term": {"a": 1}}}}},  # no path
        {"query": {"nested": {"path": "c", "query": {"term": {"a": 1}},
                              "score_mode": "avg"}}},  # scored mode
        {"query": {"nested": {"path": "c", "query": {"bool": {
            "must": [{"match": {"text": "x"}}]}}}}},  # scored inner
        {"query": {"nested": {"path": "c", "query": {"term": {"a": 1}},
                              "inner_hits": {}}}},  # unsupported key
    ]:
        with pytest.raises(ValueError):
            parse_body(bad, "text", None)
    with pytest.raises(ValueError):
        dsl_search_sql(
            {"query": {"nested": {"path": "c", "query": {"term": {"a": 1}}}}}
        )


def test_float_fold_is_deterministic(corpus):
    """sort_array pins the fold order: same result under different
    parallelism (the 4-vs-8 partition invariance the suite uses
    elsewhere)."""
    f = [("l_returnflag", "==", "R")]
    a = nested_query(corpus, f, "sum", "l_extendedprice", k=10).collect()
    b = nested_query(
        corpus.repartition(3), f, "sum", "l_extendedprice", k=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_reverse_nested_matches_duckdb(corpus, duck):
    from flume_elasticsearch_2_spark.operators.nested import (
        reverse_nested_agg,
        reverse_nested_agg_sql,
    )

    for filt in (None, [("o_orderpriority", "==", "1-URGENT")]):
        got = [
            tuple(r)
            for r in reverse_nested_agg(
                corpus, "o_orderkey", "l_linenumber", "o_totalprice", filt
            ).collect()
        ]
        want = [
            tuple(r)
            for r in duck.execute(
                reverse_nested_agg_sql(
                    "o_orderkey", "l_linenumber", "o_totalprice", filt,
                    corpus_sql=CORPUS_SQL,
                )
            ).fetchall()
        ]
        assert got == want and got, filt


def test_reverse_nested_parent_semantics(corpus):
    """The construct's point: parent_docs counts DISTINCT parents, never
    nested rows; bucket key=1 exists in every order, so parent_docs there
    equals the corpus size while doc_count >= parent_docs elsewhere too."""
    from flume_elasticsearch_2_spark.operators.nested import reverse_nested_agg

    rows = {r["key"]: r for r in reverse_nested_agg(
        corpus, "o_orderkey", "l_linenumber", "o_totalprice"
    ).collect()}
    assert all(r["doc_count"] >= r["parent_docs"] for r in rows.values())
    # per bucket: parent_docs == independently-counted DISTINCT owners
    for key in sorted(rows)[:3]:
        owners = corpus.where(
            F.exists("children", lambda x: x["l_linenumber"] == F.lit(key))
        ).count()
        assert rows[key]["parent_docs"] == owners, key
    # all buckets together account for every nested row exactly once
    n_nested = corpus.select(
        F.sum(F.size("children")).alias("n")
    ).collect()[0]["n"]
    assert sum(r["doc_count"] for r in rows.values()) == n_nested
