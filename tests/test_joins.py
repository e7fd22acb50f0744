"""ES 1.x parent/child queries (SURVEY §2.5 Q36): has_child / has_parent
over the orders/lineitem parent-child pair, oracle-checked vs DuckDB plus
semantic pins (filter context, score modes, missing-parent exclusion)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.joins import (
    has_child,
    has_child_sql,
    has_parent,
    has_parent_sql,
)

CF = [("l_returnflag", "==", "R"), ("l_quantity", ">=", 30)]
PF = [("o_orderpriority", "==", "1-URGENT"), ("o_totalprice", ">=", 50000)]
IDS = ["l_orderkey", "l_linenumber"]


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize(
    "mode,fld",
    [("none", None), ("sum", None), ("max", "l_extendedprice"), ("sum", "l_quantity")],
)
def test_has_child_matches_duckdb(tables, duck, mode, fld):
    orders, lineitem = tables
    got = [
        tuple(r)
        for r in has_child(
            orders, lineitem, "o_orderkey", "l_orderkey", CF, mode, fld, k=15
        ).collect()
    ]
    want = [tuple(r) for r in duck.execute(has_child_sql(CF, mode, fld, k=15)).fetchall()]
    assert got == want and got, (mode, fld)


def test_has_child_avg_rank_matches(tables, duck):
    """avg sums doubles in engine-dependent order — ids compared exactly,
    scores to 1e-6 (groups are a handful of rows)."""
    orders, lineitem = tables
    got = has_child(
        orders, lineitem, "o_orderkey", "l_orderkey", CF, "avg", "l_extendedprice", k=15
    ).collect()
    want = duck.execute(has_child_sql(CF, "avg", "l_extendedprice", k=15)).fetchall()
    assert [r[0] for r in got] == [w[0] for w in want]
    assert all(abs(r[1] - w[1]) < 1e-6 for r, w in zip(got, want))


def test_has_child_sum_is_matching_child_count(tables):
    """score_mode 'sum' with a filter child query = matching-child count
    (the sum of constant-score children — the ES contract)."""
    orders, lineitem = tables
    row = has_child(orders, lineitem, "o_orderkey", "l_orderkey", CF, "sum", k=1).collect()[0]
    from flume_elasticsearch_2_spark.operators.dsl import _filters_col

    n = lineitem.where(_filters_col(CF)).where(f"l_orderkey = {row['o_orderkey']}").count()
    assert row["score"] == float(n) and n >= 1


def test_has_child_excludes_orphan_children(tables):
    """Children whose parent key is absent from the parents table never
    surface a hit (the inner join IS the ES parent-exists check)."""
    orders, lineitem = tables
    some = has_child(
        orders.where("o_orderkey % 2 = 0"), lineitem, "o_orderkey", "l_orderkey",
        CF, "sum", k=50,
    ).collect()
    assert some and all(r["o_orderkey"] % 2 == 0 for r in some)


@pytest.mark.parametrize("mode,fld", [("none", None), ("score", "o_totalprice")])
def test_has_parent_matches_duckdb(tables, duck, mode, fld):
    orders, lineitem = tables
    got = [
        tuple(r)
        for r in has_parent(
            lineitem, orders, "o_orderkey", "l_orderkey", PF, mode, fld,
            k=15, child_id_cols=IDS,
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(has_parent_sql(PF, mode, fld, k=15, child_id_cols=IDS)).fetchall()
    ]
    assert got == want and got, (mode, fld)


def test_has_parent_inherits_parent_score(tables):
    orders, lineitem = tables
    rows = has_parent(
        lineitem, orders, "o_orderkey", "l_orderkey", PF, "score", "o_totalprice",
        k=5, child_id_cols=IDS,
    ).collect()
    prices = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in orders.where("o_orderpriority = '1-URGENT' AND o_totalprice >= 50000").collect()
    }
    assert rows and all(abs(r["score"] - round(prices[r["l_orderkey"]], 6)) < 1e-9 for r in rows)


def test_bad_modes_raise(tables):
    orders, lineitem = tables
    with pytest.raises(ValueError):
        has_child(orders, lineitem, "o_orderkey", "l_orderkey", CF, "product")
    with pytest.raises(ValueError):
        has_child(orders, lineitem, "o_orderkey", "l_orderkey", CF, "max")  # no field
    with pytest.raises(ValueError):
        has_parent(lineitem, orders, "o_orderkey", "l_orderkey", PF, "score")
    with pytest.raises(ValueError):
        has_child_sql(CF, "product")
    with pytest.raises(ValueError):
        has_parent_sql(PF, "max")


TCQ = "dup batch scan"


@pytest.fixture(scope="module")
def doc_duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.mark.parametrize("mode", ["max", "sum", "avg"])
def test_top_children_matches_duckdb(docs, doc_duck, mode):
    from flume_elasticsearch_2_spark.operators.joins import (
        top_children,
        top_children_sql,
    )

    got = [
        tuple(r)
        for r in top_children(docs, TCQ, "source", mode, k=10).collect()
    ]
    want = [
        tuple(r)
        for r in doc_duck.execute(
            top_children_sql(TCQ, "source", mode, k=10)
        ).fetchall()
    ]
    assert got == want and got, mode


def test_top_children_max_equals_best_child(docs):
    """score_mode=max: a parent's score IS its best child's bm25_topk score
    — the aggregate and the flat ranking agree on the winning child."""
    from flume_elasticsearch_2_spark.operators.joins import top_children
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk

    parents = {r["parent"]: r["score"] for r in
               top_children(docs, TCQ, "source", "max", k=20).collect()}
    flat = bm25_topk(docs, TCQ, k=1).collect()[0]
    best_src = docs.where(f"doc_id = {flat['doc_id']}").collect()[0]["source"]
    assert parents[best_src] == flat["score"]
    assert max(parents.values()) == flat["score"]


def test_top_children_empty_and_bad_mode(docs):
    from flume_elasticsearch_2_spark.operators.joins import top_children

    assert top_children(docs, "zzznotaterm", "source").count() == 0
    assert top_children(docs, "", "source").count() == 0
    with pytest.raises(ValueError, match="score_mode"):
        top_children(docs, TCQ, "source", "none")


@pytest.mark.parametrize(
    "metric",
    [None, ("count", "l_quantity"), ("sum", "l_quantity"),
     ("min", "l_quantity"), ("max", "l_quantity"), ("avg", "l_quantity")],
)
def test_children_agg_matches_duckdb(tables, duck, metric):
    from flume_elasticsearch_2_spark.operators.joins import (
        children_agg, children_agg_sql,
    )

    orders, lineitem = tables
    cf = [("l_returnflag", "==", "R")]
    got = [
        tuple(r)
        for r in children_agg(
            orders, lineitem, "o_orderkey", "l_orderkey",
            "o_orderpriority", metric, child_filters=cf, size=10,
        ).collect()
    ]
    want = [
        tuple(r)
        for r in duck.execute(
            children_agg_sql("o_orderpriority", metric, child_filters=cf, size=10)
        ).fetchall()
    ]
    assert got == want and got, metric


def test_children_agg_counts_childless_parents(spark):
    """ES semantics: the terms bucket is over PARENTS — a parent with zero
    matching children still lands in doc_count, contributing nothing to
    children_count or the metric."""
    from flume_elasticsearch_2_spark.operators.joins import children_agg

    parents = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "pk long, grp string"
    )
    children = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (3, 5.0)], "ck long, v double"
    )
    rows = {
        r.key: (r.doc_count, r.children_count, r.value)
        for r in children_agg(
            parents, children, "pk", "ck", "grp", ("sum", "v")
        ).collect()
    }
    assert rows == {"a": (2, 2, 30.0), "b": (1, 1, 5.0)}


def test_children_agg_child_filter_and_order(spark):
    """child_filters restrict the sub-agg only; buckets order by
    doc_count DESC then key ASC and honor size."""
    from flume_elasticsearch_2_spark.operators.joins import children_agg

    parents = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(9)], "pk long, grp string"
    )
    children = spark.createDataFrame(
        [(i, float(i)) for i in range(9)], "ck long, v double"
    )
    out = children_agg(
        parents, children, "pk", "ck", "grp", ("max", "v"),
        child_filters=[("v", ">=", 6)], size=2,
    ).collect()
    assert [r.key for r in out] == ["g0", "g1"]  # 3-way doc_count tie, key ASC
    assert all(r.doc_count == 3 for r in out)
    assert [r.children_count for r in out] == [1, 1]  # only v in {6,7,8}
    assert [r.value for r in out] == [6.0, 7.0]


def test_children_agg_bad_metric_raises(tables):
    from flume_elasticsearch_2_spark.operators.joins import (
        children_agg, children_agg_sql,
    )

    orders, lineitem = tables
    with pytest.raises(ValueError, match="metric kind"):
        children_agg(orders, lineitem, "o_orderkey", "l_orderkey",
                     "o_orderpriority", ("median", "l_quantity"))
    with pytest.raises(ValueError, match="metric kind"):
        children_agg_sql("o_orderpriority", ("median", "l_quantity"))


def test_children_agg_null_group_and_empty_metric_edges(spark):
    """ES edges: NULL group_field parents are dropped (terms aggs skip
    missing-field docs); sum/count over a childless bucket are 0, min/max/
    avg NULL."""
    from flume_elasticsearch_2_spark.operators.joins import children_agg

    parents = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "pk long, grp string"
    )
    children = spark.createDataFrame([(1, 4.0)], "ck long, v double")
    for kind, want_a, want_b in [
        ("sum", 4.0, 0.0), ("count", 1.0, 0.0),
        ("max", 4.0, None), ("avg", 4.0, None),
    ]:
        rows = {
            r.key: (r.doc_count, r.children_count, r.value)
            for r in children_agg(
                parents, children, "pk", "ck", "grp", (kind, "v")
            ).collect()
        }
        assert set(rows) == {"a", "b"}, kind  # NULL-key parent dropped
        assert rows["a"] == (1, 1, want_a), kind
        assert rows["b"] == (1, 0, want_b), kind
