"""Facets / aggregations (ES 1.x facets; delegation site
ElasticsearchSink.java:54) — declarative path vs DuckDB, serving path vs
declarative path (identity over the same match scope)."""

from __future__ import annotations

import os

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.facets import (
    histogram_facet,
    histogram_facet_sql,
    stats_facet,
    stats_facet_sql,
    terms_facet,
    terms_facet_sql,
)

CASES = [
    ("dup batch scan", "or"),
    ("join filter window", "and"),
    (None, "or"),  # match_all
    ("zzzznotaterm", "or"),  # empty match set
]


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("query,mode", CASES)
def test_terms_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in terms_facet(documents, query, "lang", size=10, mode=mode).collect()]
    want = _duck(sf_dir, terms_facet_sql(query, "lang", size=10, mode=mode))
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:2])
def test_stats_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [tuple(r) for r in stats_facet(documents, query, "n_chars", mode=mode).collect()]
    want = _duck(sf_dir, stats_facet_sql(query, "n_chars", mode=mode))
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:3])
def test_histogram_facet_matches_duckdb(documents, sf_dir, query, mode):
    got = [
        tuple(r)
        for r in histogram_facet(documents, query, "n_chars", 100, mode=mode).collect()
    ]
    want = _duck(sf_dir, histogram_facet_sql(query, "n_chars", 100, mode=mode))
    assert got == want


# -- serving path ≡ declarative path ----------------------------------------


@pytest.fixture(scope="module")
def facet_searcher(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    d = os.path.join(str(tmp_path_factory.mktemp("facet_idx")), "idx")
    build_segments_partial(
        spark,
        documents,
        d,
        n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars"),
    )
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("query,mode", CASES)
def test_serving_terms_facet_identical(facet_searcher, documents, query, mode):
    got = [tuple(r) for r in facet_searcher.facet(query, "lang", size=10, mode=mode).collect()]
    want = [tuple(r) for r in terms_facet(documents, query, "lang", size=10, mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:2])
def test_serving_stats_facet_identical(facet_searcher, documents, query, mode):
    got = [tuple(r) for r in facet_searcher.facet(query, "n_chars", kind="stats", mode=mode).collect()]
    want = [tuple(r) for r in stats_facet(documents, query, "n_chars", mode=mode).collect()]
    assert got == want


@pytest.mark.parametrize("query,mode", CASES[:3])
def test_serving_histogram_facet_identical(facet_searcher, documents, query, mode):
    got = [
        tuple(r)
        for r in facet_searcher.facet(
            query, "n_chars", kind="histogram", interval=100, mode=mode
        ).collect()
    ]
    want = [
        tuple(r)
        for r in histogram_facet(documents, query, "n_chars", 100, mode=mode).collect()
    ]
    assert got == want


def test_serving_stats_empty_match_set(facet_searcher):
    row = facet_searcher.facet("zzzznotaterm", "n_chars", kind="stats").collect()[0]
    assert row["count"] == 0 and row["min"] is None and row["sum"] is None


def test_facet_rejects_unknown_kind(facet_searcher):
    with pytest.raises(ValueError):
        facet_searcher.facet(None, "lang", kind="percentiles")
    with pytest.raises(ValueError):
        facet_searcher.facet(None, "n_chars", kind="histogram", interval=0)


# -- date_histogram / terms_stats over the events table ----------------------


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _duck_events(sf_dir, sql):
    import duckdb as _dd

    con = _dd.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("interval", ["hour", "day", "week", "month"])
def test_date_histogram_matches_duckdb(events, sf_dir, interval):
    from flume_elasticsearch_2_spark.operators.facets import (
        date_histogram_facet,
        date_histogram_facet_sql,
    )

    got = [tuple(r) for r in date_histogram_facet(events, "ts", interval).collect()]
    want = _duck_events(sf_dir, date_histogram_facet_sql("ts", interval))
    assert got == want


def test_date_histogram_filtered_with_value_stats(events, sf_dir):
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.facets import (
        date_histogram_facet,
        date_histogram_facet_sql,
    )

    got = [
        tuple(r)
        for r in date_histogram_facet(
            events, "ts", "day", where=F.col("event_type") == "purchase", value_col="value"
        ).collect()
    ]
    want = _duck_events(
        sf_dir,
        date_histogram_facet_sql("ts", "day", where_sql="event_type = 'purchase'", value_col="value"),
    )
    assert got == want


def test_terms_stats_matches_duckdb(events, sf_dir):
    from flume_elasticsearch_2_spark.operators.facets import (
        terms_stats_facet,
        terms_stats_facet_sql,
    )

    got = [tuple(r) for r in terms_stats_facet(events, "event_type", "value", size=10).collect()]
    want = _duck_events(sf_dir, terms_stats_facet_sql("event_type", "value", size=10))
    assert got == want


def test_date_histogram_rejects_bad_interval(events):
    from flume_elasticsearch_2_spark.operators.facets import date_histogram_facet

    with pytest.raises(ValueError):
        date_histogram_facet(events, "ts", "fortnight")


# -- date_range over the events table ------------------------------------------


_DR = [
    {"to": "2024-01-10"},
    {"from": "2024-01-10", "to": "2024-02-01", "key": "mid_jan"},
    {"from": "2024-02-01"},
    {"from": "2030-01-01", "key": "future"},  # empty window kept (count 0)
]


def test_date_range_matches_duckdb(events, sf_dir):
    from flume_elasticsearch_2_spark.operators.facets import (
        date_range_facet,
        date_range_facet_sql,
    )

    got = [tuple(r) for r in date_range_facet(events, "ts", _DR).collect()]
    want = _duck_events(sf_dir, date_range_facet_sql("ts", _DR))
    assert got == want and len(got) == 4
    counts = dict(got)
    assert counts["future"] == 0
    total = events.count()
    # the first three windows partition the corpus (from incl, to excl)
    assert counts[f"*-2024-01-10"] + counts["mid_jan"] + counts["2024-02-01-*"] == total


def test_date_range_validation(events):
    from flume_elasticsearch_2_spark.operators.facets import date_range_facet

    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        date_range_facet(events, "ts", [])
    with _pt.raises(ValueError, match="from and/or to"):
        date_range_facet(events, "ts", [{"key": "x"}])
    with _pt.raises(ValueError, match="duplicate"):
        date_range_facet(events, "ts", [{"to": "2024-01-01", "key": "a"},
                                        {"from": "2024-01-01", "key": "a"}])


# -- review regressions: terms-agg option edge cases ------------------------------


def test_terms_include_preserves_case(spark):
    """Bucket keys are RAW stored values: an include pattern with uppercase
    must match uppercase values (the analyzed-term validator lowercases —
    wrong domain here)."""
    import duckdb as _d

    from flume_elasticsearch_2_spark.operators.facets import (
        terms_facet,
        terms_facet_sql,
    )

    df = spark.createDataFrame(
        [(i, "x", v) for i, v in enumerate(["EN", "EN", "Fr-CA", "de", "EN"])],
        "doc_id long, text string, lang string",
    )
    got = [tuple(r) for r in terms_facet(df, None, "lang", include="EN|Fr.*").collect()]
    assert got == [("EN", 3), ("Fr-CA", 1)]
    con = _d.connect()
    con.register("documents", df.toPandas())
    want = con.sql(terms_facet_sql(None, "lang", include="EN|Fr.*")).fetchall()
    assert got == want


def test_terms_term_order_null_bucket_matches_duckdb(spark):
    """NULL bucket placement under order _term pinned to DuckDB defaults
    (NULLS LAST in BOTH directions) on the Spark side."""
    import duckdb as _d

    from flume_elasticsearch_2_spark.operators.facets import (
        terms_facet,
        terms_facet_sql,
    )

    df = spark.createDataFrame(
        [(0, "x", "en"), (1, "x", None), (2, "x", "de"), (3, "x", None)],
        "doc_id long, text string, lang string",
    )
    con = _d.connect()
    con.register("documents", df.toPandas())
    for dr in ("asc", "desc"):
        got = [tuple(r) for r in terms_facet(df, None, "lang", order=("_term", dr)).collect()]
        want = con.sql(terms_facet_sql(None, "lang", order=("_term", dr))).fetchall()
        assert got == want, dr
        assert got[-1][0] is None  # NULLS LAST both directions (DuckDB default)


def test_terms_min_doc_count_zero_refuses(documents):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation_sql
    from flume_elasticsearch_2_spark.operators.facets import terms_facet

    import pytest as _pt

    with _pt.raises(ValueError, match="unscoped value universe"):
        terms_facet(documents, None, "lang", min_doc_count=0)
    with _pt.raises(ValueError, match="unscoped value universe"):
        dsl_aggregation_sql({"aggs": {"t": {"terms": {"field": "lang",
                                                      "min_doc_count": 0}}}})


def test_percentile_ranks_matches_duckdb(documents):
    import duckdb as _d

    from flume_elasticsearch_2_spark.operators.aggs import (
        percentile_ranks_facet,
        percentile_ranks_facet_sql,
    )

    con = _d.connect()
    con.register("documents", documents.toPandas())
    for q in (None, "dup batch"):
        got = [tuple(r) for r in
               percentile_ranks_facet(documents, q, "n_chars", (200, 400, 800)).collect()]
        want = con.sql(percentile_ranks_facet_sql(q, "n_chars", (200, 400, 800))).fetchall()
        assert got == want, q
    vals = [r for _, r in got]
    assert vals == sorted(vals) and vals[-1] <= 100.0  # CDF is monotone


def test_percentile_ranks_validation(documents):
    import pytest as _pt

    from flume_elasticsearch_2_spark.operators.aggs import (
        percentile_ranks_facet,
        percentile_ranks_facet_sql,
    )

    with _pt.raises(ValueError, match="duplicate"):
        percentile_ranks_facet(documents, None, "n_chars", (1, 1))
    with _pt.raises(ValueError, match="at least one"):
        percentile_ranks_facet_sql(None, "n_chars", ())


def test_percentile_ranks_empty_match_set(documents):
    """Review regression: an empty match set returns ZERO rows on both
    engines (Spark's global agg emits a NULL-rank row that must be
    dropped to match the oracle's empty GROUP BY)."""
    import duckdb as _d

    from flume_elasticsearch_2_spark.operators.aggs import (
        percentile_ranks_facet,
        percentile_ranks_facet_sql,
    )

    got = percentile_ranks_facet(documents, "zzzznotaterm", "n_chars", (200,)).collect()
    con = _d.connect()
    con.register("documents", documents.toPandas())
    want = con.sql(percentile_ranks_facet_sql("zzzznotaterm", "n_chars", (200,))).fetchall()
    assert got == [] and want == []
