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
