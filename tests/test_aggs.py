"""Round-3 aggregation kinds (range / filters / cardinality / percentiles /
missing / top_hits / significant_terms; operators/aggs.py) — declarative path
vs DuckDB oracle, serving path vs declarative path, approx paths vs exact."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.aggs import (
    cardinality_facet,
    percentile_ranks_facet,
    cardinality_facet_sql,
    filters_facet,
    filters_facet_sql,
    missing_facet,
    missing_facet_sql,
    percentiles_facet,
    percentiles_facet_sql,
    range_facet,
    range_facet_sql,
    significant_terms_facet,
    significant_terms_facet_sql,
    top_hits_agg,
    top_hits_agg_sql,
)

CASES = [
    ("dup batch scan", "or"),
    ("join filter window", "and"),
    (None, "or"),  # match_all
]

RANGES = [{"to": 200}, {"from": 200, "to": 1000}, {"from": 1000}]
FILTERS = {
    "en_docs": [("lang", "==", "en")],
    "big": [("n_chars", ">=", 1000)],
    "webby": [("source", "in", ["web", "news"])],
    "no_source": [("source", "null", None)],
}


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("query,mode", CASES)
def test_range_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in range_facet(documents, query, "n_chars", RANGES, mode=mode).collect()]
    want = _duck(sf_dir, range_facet_sql(query, "n_chars", RANGES, mode=mode))
    assert got == want and len(got) == len(RANGES)


def test_range_facet_keeps_empty_buckets(documents, sf_dir):
    rs = [{"from": 10**9}, {"to": 10**9, "key": "rest"}]
    got = {r["key"]: r["count"] for r in range_facet(documents, None, "n_chars", rs).collect()}
    assert got["1000000000.0-*"] == 0 and got["rest"] > 0


def test_range_facet_overlapping_buckets_double_count(documents):
    rs = [{"from": 0}, {"from": 0, "key": "again"}]
    got = [r["count"] for r in range_facet(documents, None, "n_chars", rs).collect()]
    assert got[0] == got[1] > 0  # same docs, both buckets


def test_range_facet_rejects_bad_ranges(documents):
    with pytest.raises(ValueError):
        range_facet(documents, None, "n_chars", [{}])
    with pytest.raises(ValueError):
        range_facet(documents, None, "n_chars", [{"to": 5, "key": "a"}, {"to": 9, "key": "a"}])


@pytest.mark.parametrize("query,mode", CASES)
def test_filters_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in filters_facet(documents, FILTERS, query=query, mode=mode).collect()]
    want = _duck(sf_dir, filters_facet_sql(FILTERS, query=query, mode=mode))
    assert got == want and len(got) == len(FILTERS)


@pytest.mark.parametrize("query,mode", CASES)
def test_cardinality_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in cardinality_facet(documents, query, "source", mode=mode).collect()]
    want = _duck(sf_dir, cardinality_facet_sql(query, "source", mode=mode))
    assert got == want


def test_cardinality_approx_within_rsd(documents):
    exact = cardinality_facet(documents, None, "source").collect()[0][0]
    approx = cardinality_facet(documents, None, "source", exact=False, rsd=0.05).collect()[0][0]
    assert abs(approx - exact) <= max(1, 0.15 * exact)


def test_cardinality_ignores_nulls(documents, sf_dir):
    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 3 == 0, F.col("source"))
    )
    got = cardinality_facet(with_nulls, None, "maybe").collect()[0][0]
    exact = with_nulls.where(F.col("maybe").isNotNull()).select("maybe").distinct().count()
    assert got == exact


@pytest.mark.parametrize("query,mode", CASES)
def test_percentiles_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in percentiles_facet(documents, query, "n_chars", mode=mode).collect()]
    want = _duck(sf_dir, percentiles_facet_sql(query, "n_chars", mode=mode))
    assert got == want and len(got) == 7


def test_percentiles_approx_close_to_exact(documents):
    exact = {r["percent"]: r["value"] for r in percentiles_facet(documents, None, "n_chars").collect()}
    approx = {
        r["percent"]: r["value"]
        for r in percentiles_facet(documents, None, "n_chars", exact=False).collect()
    }
    lo, hi = min(exact.values()), max(exact.values())
    for p, v in approx.items():
        assert abs(v - exact[p]) <= 0.05 * (hi - lo) + 1e-9


def test_percentiles_rejects_bad_percent(documents):
    with pytest.raises(ValueError):
        percentiles_facet(documents, None, "n_chars", percents=(150.0,))


def test_missing_facet_matches_duckdb(documents, sf_dir):
    got = [tuple(r) for r in missing_facet(documents, "batch scan", "source").collect()]
    want = _duck(sf_dir, missing_facet_sql("batch scan", "source"))
    assert got == want


def test_missing_facet_counts_synthesized_nulls(documents):
    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 4 == 0, F.col("source"))
    )
    got = missing_facet(with_nulls, None, "maybe").collect()[0][0]
    assert got == with_nulls.where(F.col("maybe").isNull()).count() > 0


@pytest.mark.parametrize("query,mode", CASES)
def test_top_hits_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in top_hits_agg(documents, query, "lang", 3, "n_chars", mode=mode).collect()]
    want = _duck(sf_dir, top_hits_agg_sql(query, "lang", 3, "n_chars", mode=mode))
    assert got == want


def test_top_hits_ascending_and_k1(documents, sf_dir):
    got = [
        tuple(r)
        for r in top_hits_agg(documents, None, "lang", 1, "n_chars", ascending=True).collect()
    ]
    want = _duck(sf_dir, top_hits_agg_sql(None, "lang", 1, "n_chars", ascending=True))
    assert got == want
    assert all(r[3] == 1 for r in got)  # exactly one hit per bucket


@pytest.mark.parametrize("query,mode", [("dup batch scan", "or"), ("join filter window", "and")])
def test_significant_terms_matches_duckdb(documents, sf_dir, query, mode):
    got = [
        tuple(r)
        for r in significant_terms_facet(documents, query, size=10, mode=mode).collect()
    ]
    want = _duck(sf_dir, significant_terms_facet_sql(query, size=10, mode=mode))
    assert got == want and len(got) == 10


def test_significant_terms_query_terms_rank_first(documents):
    # the foreground's own terms are maximally significant (fg% >> bg%
    # unless the term saturates the corpus) — they should surface
    rows = significant_terms_facet(documents, "dup", size=5).collect()
    assert rows and rows[0]["term"] == "dup"
    assert all(r["fg_count"] <= r["bg_count"] for r in rows)
    assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(len(rows) - 1))


def test_significant_terms_empty_foreground(documents):
    assert significant_terms_facet(documents, "zzzznotaterm").count() == 0


def test_significant_terms_needs_query(documents):
    with pytest.raises(ValueError):
        significant_terms_facet(documents, "")


# -- serving path ≡ declarative path ------------------------------------------


@pytest.fixture(scope="module")
def agg_searcher(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = os.path.join(str(tmp_path_factory.mktemp("agg_idx")), "idx")
    build_segments_partial(
        spark,
        documents,
        d,
        n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "source", "n_chars"),
    )
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_range_identical(agg_searcher, documents, query, mode):
    got = [
        tuple(r)
        for r in agg_searcher.facet(
            query, "n_chars", kind="range", ranges=RANGES, mode=mode
        ).collect()
    ]
    want = [tuple(r) for r in range_facet(documents, query, "n_chars", RANGES, mode=mode).collect()]
    assert got == want


def test_serving_range_empty_match_set(agg_searcher):
    got = {r["key"]: r["count"] for r in agg_searcher.facet(
        "zzzznotaterm", "n_chars", kind="range", ranges=RANGES
    ).collect()}
    assert len(got) == len(RANGES) and all(v == 0 for v in got.values())


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_filters_identical(agg_searcher, documents, query, mode):
    got = [
        tuple(r)
        for r in agg_searcher.facet(
            query, None, kind="filters", filters=FILTERS, mode=mode
        ).collect()
    ]
    want = [tuple(r) for r in filters_facet(documents, FILTERS, query=query, mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_cardinality_identical(agg_searcher, documents, query, mode):
    got = [tuple(r) for r in agg_searcher.facet(query, "source", kind="cardinality", mode=mode).collect()]
    want = [tuple(r) for r in cardinality_facet(documents, query, "source", mode=mode).collect()]
    assert got == want


def test_serving_missing_identical(agg_searcher, documents):
    got = [tuple(r) for r in agg_searcher.facet("batch scan", "source", kind="missing").collect()]
    want = [tuple(r) for r in missing_facet(documents, "batch scan", "source").collect()]
    assert got == want


# -- extended_stats / value_count ---------------------------------------------


@pytest.mark.parametrize("query,mode", CASES)
def test_extended_stats_matches_duckdb(documents, sf_dir, query, mode):
    from flume_elasticsearch_2_spark.operators.aggs import (
        extended_stats_facet,
        extended_stats_facet_sql,
    )

    got = [tuple(r) for r in extended_stats_facet(documents, query, "n_chars", mode=mode).collect()]
    want = _duck(sf_dir, extended_stats_facet_sql(query, "n_chars", mode=mode))
    assert got == want and got[0][0] > 0


def test_extended_stats_variance_sane(documents):
    """Population variance cross-check against a driver-side NumPy compute."""
    import numpy as np

    from flume_elasticsearch_2_spark.operators.aggs import extended_stats_facet

    row = extended_stats_facet(documents, None, "n_chars").collect()[0]
    vals = np.array([r.n_chars for r in documents.select("n_chars").collect()], dtype=float)
    assert abs(row["variance"] - vals.var()) < 1e-4
    assert abs(row["std_deviation"] - vals.std()) < 1e-6


@pytest.mark.parametrize("query,mode", CASES)
def test_value_count_matches_duckdb(documents, sf_dir, query, mode):
    from flume_elasticsearch_2_spark.operators.aggs import (
        value_count_facet,
        value_count_facet_sql,
    )

    got = [tuple(r) for r in value_count_facet(documents, query, "source", mode=mode).collect()]
    want = _duck(sf_dir, value_count_facet_sql(query, "source", mode=mode))
    assert got == want


def test_value_count_excludes_nulls(documents):
    from flume_elasticsearch_2_spark.operators.aggs import value_count_facet

    total = documents.count()
    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 5 == 0, F.col("n_chars"))
    )
    got = value_count_facet(with_nulls, None, "maybe").collect()[0]["count"]
    assert got == with_nulls.where("maybe IS NOT NULL").count() < total


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_extended_stats_identical(agg_searcher, documents, query, mode):
    from flume_elasticsearch_2_spark.operators.aggs import extended_stats_facet

    got = [tuple(r) for r in agg_searcher.facet(query, "n_chars", kind="extended_stats", mode=mode).collect()]
    want = [tuple(r) for r in extended_stats_facet(documents, query, "n_chars", mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_value_count_identical(agg_searcher, documents, query, mode):
    from flume_elasticsearch_2_spark.operators.aggs import value_count_facet

    got = [tuple(r) for r in agg_searcher.facet(query, "source", kind="value_count", mode=mode).collect()]
    want = [tuple(r) for r in value_count_facet(documents, query, "source", mode=mode).collect()]
    assert got == want


def test_serving_extended_stats_empty_scope(agg_searcher, documents):
    """Review regression: count must be 0 (not NULL) when nothing matches,
    exactly like the declarative twin."""
    from flume_elasticsearch_2_spark.operators.aggs import extended_stats_facet

    got = [tuple(r) for r in agg_searcher.facet(
        "zzzznotaterm", "n_chars", kind="extended_stats"
    ).collect()]
    want = [tuple(r) for r in extended_stats_facet(
        documents, "zzzznotaterm", "n_chars"
    ).collect()]
    assert got == want and got[0][0] == 0


# -- round-5 mergeable-partial serving forms ----------------------------------


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_percentiles_identical(agg_searcher, documents, query, mode):
    """facet_percentiles (per-shard value-stream partials + exact merge)
    must equal the declarative exact form bit-for-bit."""
    got = [tuple(r) for r in agg_searcher.facet_percentiles(
        query, "n_chars", percents=(5.0, 50.0, 95.0), mode=mode
    ).collect()]
    want = [tuple(r) for r in percentiles_facet(
        documents, query, "n_chars", percents=(5.0, 50.0, 95.0), mode=mode
    ).collect()]
    assert got == want and (got or query == "zzzznotaterm")


def test_filters_agg_with_or_node_three_engines(documents, sf_dir, agg_searcher):
    """Round 5: the general OR/NOT filter nodes flow through the FILTERS
    aggregation on all three engines (declarative Column, DuckDB SQL,
    serving pandas mask) — the same parse tree feeds all of them."""
    import duckdb as _d

    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_index,
        dsl_aggregation_sql,
    )

    body = {
        "query": {"match": {"text": "batch scan"}},
        "aggs": {"byf": {"filters": {"filters": {
            "en_or_big": {"or": [{"term": {"lang": "en"}},
                                 {"range": {"n_chars": {"gte": 1500}}}]},
            "not_small_web": {"not": {"or": [
                {"range": {"n_chars": {"lt": 300}}},
                {"term": {"source": "web"}}]}},
        }}}},
    }
    got = [tuple(r) for r in dsl_aggregation(documents, body).collect()]
    con = _d.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [tuple(r) for r in con.execute(dsl_aggregation_sql(body)).fetchall()]
    assert got == want and all(c > 0 for _, c in got), got
    srv = [tuple(r) for r in dsl_aggregation_index(agg_searcher, body).collect()]
    assert srv == got


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_percentile_ranks_identical(agg_searcher, documents, query, mode):
    """facet_percentile_ranks (per-shard (n, count<=v) partials) must equal
    the declarative empirical-CDF form bit-for-bit, including the
    empty-match zero-row contract."""
    vs = (100.0, 800.0, 3000.0)
    got = [tuple(r) for r in agg_searcher.facet_percentile_ranks(
        query, "n_chars", vs, mode=mode
    ).collect()]
    want = [tuple(r) for r in percentile_ranks_facet(
        documents, query, "n_chars", vs, mode=mode
    ).collect()]
    assert got == want and got, (query, mode)
    empty = [tuple(r) for r in agg_searcher.facet_percentile_ranks(
        "zzzznotaterm", "n_chars", vs
    ).collect()]
    assert empty == [tuple(r) for r in percentile_ranks_facet(
        documents, "zzzznotaterm", "n_chars", vs
    ).collect()] == []


def test_serving_percentiles_empty_match(agg_searcher, documents):
    got = [tuple(r) for r in agg_searcher.facet_percentiles(
        "zzzznotaterm", "n_chars"
    ).collect()]
    want = [tuple(r) for r in percentiles_facet(
        documents, "zzzznotaterm", "n_chars"
    ).collect()]
    assert got == want == []


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_top_hits_identical(agg_searcher, documents, query, mode):
    """facet_top_hits (per-shard ≤k rank windows, final re-rank) must equal
    the declarative window form, both sort directions."""
    from flume_elasticsearch_2_spark.operators.aggs import top_hits_agg

    for asc in (False, True):
        got = [tuple(r) for r in agg_searcher.facet_top_hits(
            query, "lang", 2, "n_chars", ascending=asc, mode=mode
        ).collect()]
        want = [tuple(r) for r in top_hits_agg(
            documents, query, "lang", 2, "n_chars", ascending=asc, mode=mode
        ).collect()]
        assert got == want, (query, mode, asc)


@pytest.mark.parametrize("query,mode", [c for c in CASES if c[0]])
def test_serving_significant_terms_identical(agg_searcher, documents, query, mode):
    """facet_significant_terms (per-shard postings sweep + metadata bg
    join) must equal the declarative exploded-distinct pass: same JLH
    scores, same ordering, same fg/bg counts."""
    got = [tuple(r) for r in agg_searcher.facet_significant_terms(
        query, size=10, mode=mode
    ).collect()]
    want = [tuple(r) for r in significant_terms_facet(
        documents, query, size=10, mode=mode
    ).collect()]
    assert got == want, (query, mode)


def test_serving_significant_terms_empty_and_min_count(agg_searcher, documents):
    got = [tuple(r) for r in agg_searcher.facet_significant_terms(
        "zzzznotaterm"
    ).collect()]
    assert got == []
    got2 = [tuple(r) for r in agg_searcher.facet_significant_terms(
        "dup batch", min_doc_count=3
    ).collect()]
    want2 = [tuple(r) for r in significant_terms_facet(
        documents, "dup batch", min_doc_count=3
    ).collect()]
    assert got2 == want2 and all(r[1] >= 3 for r in got2)


# -- deterministic HLL cardinality ----------------------------------------------


@pytest.mark.parametrize("query,mode", CASES)
def test_hll_cardinality_matches_duckdb_exactly(documents, sf_dir, query, mode):
    """The SAME HLL registers in both engines -> the IDENTICAL estimate
    (not approximately: bit-for-bit, which is what makes a sketch
    oracle-checkable at all)."""
    from flume_elasticsearch_2_spark.operators.aggs import (
        hll_cardinality,
        hll_cardinality_sql,
    )

    got = [tuple(r) for r in hll_cardinality(documents, query, "text", mode=mode).collect()]
    want = _duck(sf_dir, hll_cardinality_sql(query, "text", mode=mode))
    assert got == want


@pytest.mark.parametrize("field,p", [("text", 12), ("doc_id", 12), ("lang", 12),
                                     ("n_chars", 10), ("source", 8)])
def test_hll_cardinality_accuracy(documents, sf_dir, field, p):
    """The estimate is a REAL HLL: within ~5σ of exact (σ = 1.04/√m) —
    loose enough to never flake, tight enough to catch a broken register
    path (which is off by orders of magnitude)."""
    from flume_elasticsearch_2_spark.operators.aggs import hll_cardinality

    est = hll_cardinality(documents, None, field, p=p).collect()[0][0]
    exact = _duck(sf_dir, f"SELECT count(DISTINCT {field}) FROM documents")[0][0]
    tol = 5 * 1.04 / (1 << p) ** 0.5
    assert abs(est - exact) <= max(tol * exact, 3.0), (field, p, est, exact)


def test_hll_cardinality_partition_invariant(documents):
    """BIGINT register sums: partition order cannot change the estimate
    (the float trap a naive sum(2^-rho) would step into)."""
    from flume_elasticsearch_2_spark.operators.aggs import hll_cardinality

    a = hll_cardinality(documents.repartition(32), None, "text").collect()
    b = hll_cardinality(documents.coalesce(1), None, "text").collect()
    assert a == b
    with pytest.raises(ValueError, match="p must be"):
        hll_cardinality(documents, None, "text", p=20)


def test_hll_registers_shuffle_is_tiny_and_partial(documents):
    """Plan shape: the ONLY exchange before the scalar agg hashes on idx and
    is fed by a partial aggregate — at 10^12 docs the shuffle is ≤2^p rows."""
    from flume_elasticsearch_2_spark.operators.aggs import hll_cardinality

    plan = hll_cardinality(documents, None, "text")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(idx") == 1
    # partial max before the exchange (map-side combine)
    head = plan.split("Exchange hashpartitioning(idx")[1]
    assert "partial_max(rho)" in head or "partial_max" in head


def test_dsl_cardinality_hll_route(documents, sf_dir):
    """precision_threshold=0 routes to the deterministic HLL on declarative
    + oracle; the serving path refuses rather than silently computing
    exact."""
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_sql,
    )

    body = {"query": {"match": {"text": "dup batch scan"}},
            "aggs": {"n": {"cardinality": {"field": "text",
                                           "precision_threshold": 0}}}}
    got = [tuple(r) for r in dsl_aggregation(documents, body).collect()]
    want = _duck(sf_dir, dsl_aggregation_sql(body))
    assert got == want and got[0][0] > 0


def test_dsl_cardinality_hll_serving_refuses(agg_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation_index

    body = {"aggs": {"n": {"cardinality": {"field": "lang",
                                           "precision_threshold": 0}}}}
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_aggregation_index(agg_searcher, body)


# -- scripted_metric -------------------------------------------------------------


@pytest.mark.parametrize("reduce", ["sum", "min", "max", "avg"])
def test_scripted_metric_matches_duckdb(documents, sf_dir, reduce):
    from flume_elasticsearch_2_spark.operators.aggs import (
        scripted_metric_facet,
        scripted_metric_facet_sql,
    )

    script = "log1p(doc['n_chars'].value) * 2 + 1"
    got = [
        tuple(r)
        for r in scripted_metric_facet(
            documents, "dup batch scan", script, reduce=reduce
        ).collect()
    ]
    want = _duck(sf_dir, scripted_metric_facet_sql("dup batch scan", script, reduce=reduce))
    assert got == want and got[0][0] is not None


def test_scripted_metric_validation(documents):
    from flume_elasticsearch_2_spark.operators.aggs import scripted_metric_facet

    with pytest.raises(ValueError, match="_score"):
        scripted_metric_facet(documents, None, "_score + 1")
    with pytest.raises(ValueError, match="reduce"):
        scripted_metric_facet(documents, None, "doc['n_chars'].value", reduce="median")
    with pytest.raises(ValueError, match="unknown doc fields"):
        scripted_metric_facet(documents, None, "doc['nope'].value")


def test_dsl_scripted_metric_route(documents, sf_dir, agg_searcher):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_index,
        dsl_aggregation_sql,
    )

    body = {"query": {"match": {"text": "dup batch scan"}},
            "aggs": {"m": {"scripted_metric": {
                "map_script": "sqrt(doc['n_chars'].value)", "reduce": "avg"}}}}
    got = [tuple(r) for r in dsl_aggregation(documents, body).collect()]
    want = _duck(sf_dir, dsl_aggregation_sql(body))
    assert got == want and got[0][0] > 0
    # round 5: the serving path runs the same contract through the script
    # AST's NumPy engine — identical scalar
    srv = [tuple(r) for r in dsl_aggregation_index(agg_searcher, body).collect()]
    assert srv == got
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql({"aggs": {"m": {"scripted_metric": {
            "map_script": "1", "combine_script": "x"}}}})


def test_statistical_facet_three_engines(documents, sf_dir, agg_searcher):
    # ES 1.x statistical facet = extended_stats under the 1.x names
    # (total/mean), resolved at parse time on all three paths
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_index,
        dsl_aggregation_sql,
    )

    body = {"query": {"match": {"text": "dup batch scan"}},
            "facets": {"s": {"statistical": {"field": "n_chars"}}}}
    got = dsl_aggregation(documents, body)
    assert got.columns == ["count", "total", "min", "max", "mean",
                           "sum_of_squares", "variance", "std_deviation"]
    rows = [tuple(r) for r in got.collect()]
    want = _duck(sf_dir, dsl_aggregation_sql(body))
    srv = [tuple(r) for r in dsl_aggregation_index(agg_searcher, body).collect()]
    assert rows == want == srv and rows[0][0] > 0
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql({"facets": {"s": {"statistical": {
            "field": "n_chars", "script": "x"}}}})


def test_ip_range_facet_three_cases(spark, documents, sf_dir, agg_searcher):
    # dotted-quad buckets: from inclusive / to exclusive on the 32-bit value
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.aggs import (
        ip_range_facet,
        ip_range_facet_sql,
    )
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation_index

    df = spark.createDataFrame(
        [(1, "10.0.0.5", "x"), (2, "10.0.0.64", "x"), (3, "10.0.1.2", "x"),
         (4, None, "x"), (5, "bogus", "x")],
        "doc_id long, ip string, text string",
    )
    ranges = [{"to": "10.0.0.64"}, {"from": "10.0.0.64", "to": "10.0.1.0"},
              {"from": "10.0.0.0"}]
    rows = {r.key: r["count"] for r in ip_range_facet(df, None, "ip", ranges).collect()}
    # .5 below 64; .64 lands in the second (from inclusive); NULL/bogus drop
    assert rows == {"*-10.0.0.64": 1, "10.0.0.64-10.0.1.0": 1, "10.0.0.0-*": 3}
    # refusals: CIDR masks + duplicate keys + empty bucket
    for bad in ([{"mask": "10.0.0.0/24"}], [{"key": "k"}],
                [{"to": "10.0.0.1"}, {"to": "10.0.0.1"}]):
        with pytest.raises(ValueError):
            ip_range_facet(df, None, "ip", bad)
    with pytest.raises(ValueError, match="dotted-quad"):
        ip_range_facet_sql(None, "ip", [{"to": "10.0.999.1"}])
    # serving refuses loudly (no stored index carries an ip column)
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_aggregation_index(agg_searcher, {"aggs": {"r": {"ip_range": {
            "field": "ip", "ranges": [{"to": "10.0.0.1"}]}}}})


def test_ip_range_invalid_values_drop_in_both_engines(spark):
    # review-found: short quads crashed ANSI element_at; out-of-range octets
    # silently miscounted in BOTH engines (oracle-invisible). All invalid
    # forms must now parse to NULL and drop.
    import duckdb as _dd

    from flume_elasticsearch_2_spark.operators.aggs import (
        ip_range_facet,
        ip_range_facet_sql,
    )

    vals = ["10.0.0.5", "42", "1.2.3", "10.0.0.300", "10.0.0.-6",
            "1.2.3.4.5", None, "bogus", "010.0.0.1"]
    df = spark.createDataFrame(
        [(i, v, "x") for i, v in enumerate(vals)],
        "doc_id long, ip string, text string",
    )
    ranges = [{"from": "0.0.0.0"}]
    rows = {r.key: r["count"] for r in ip_range_facet(df, None, "ip", ranges).collect()}
    assert rows == {"0.0.0.0-*": 1}  # only the well-formed quad counts
    con = _dd.connect()
    con.sql(
        "create view t as select * from (values "
        + ", ".join(
            f"({i}, {('NULL' if v is None else chr(39)+v+chr(39))}, 'x')"
            for i, v in enumerate(vals)
        )
        + ") v(doc_id, ip, text)"
    )
    odf = con.sql(ip_range_facet_sql(None, "ip", ranges, table="t")).df()
    assert list(odf.itertuples(index=False, name=None)) == [("0.0.0.0-*", 1)]


def test_range_bucket_keys_never_sql_parsed(spark):
    # a backslash-bearing user key must come out verbatim (Column literal,
    # not a selectExpr string that processes escapes)
    from flume_elasticsearch_2_spark.operators.aggs import ip_range_facet, range_facet

    df = spark.createDataFrame([(1, 5.0, "10.0.0.1", "x")],
                               "doc_id long, v double, ip string, text string")
    r1 = range_facet(df, None, "v", [{"key": "a\\tb'c", "from": 0}]).collect()
    assert r1[0].key == "a\\tb'c" and r1[0]["count"] == 1
    r2 = ip_range_facet(df, None, "ip", [{"key": "a\\tb'c", "from": "0.0.0.0"}]).collect()
    assert r2[0].key == "a\\tb'c" and r2[0]["count"] == 1


def test_ip_range_dsl_refuses_extra_options(documents):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation

    with pytest.raises(ValueError, match="ip_range options"):
        dsl_aggregation(documents, {"aggs": {"r": {"ip_range": {
            "field": "ip", "ranges": [{"to": "10.0.0.1"}], "keyed": True}}}})


def test_serving_metric_script_match_all_scope(agg_searcher, documents):
    """facet_metric_script with query=None (match_all scope) routes to the
    declarative kernel over the index's stored docs — identical value."""
    from flume_elasticsearch_2_spark.operators.aggs import metric_facet

    got = [tuple(r) for r in agg_searcher.facet_metric_script(
        None, "log1p(doc['n_chars'].value)", metric="avg"
    ).collect()]
    want = [tuple(r) for r in metric_facet(
        documents, None, None, "avg", script="log1p(doc['n_chars'].value)"
    ).collect()]
    assert got == want and got[0][0] is not None


def test_serving_metric_script_unknown_field_refuses(agg_searcher):
    with pytest.raises(ValueError, match="unknown doc fields"):
        agg_searcher.facet_metric_script(
            "batch", "doc['nope'].value", metric="sum"
        ).collect()
