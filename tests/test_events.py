"""Gap-based sessionization over the events table (SURVEY §2 training-data
extensions): oracle parity, gap-threshold semantics, and parallelism
invariance (the keyed window must not depend on input partitioning)."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.events import sessionize, sessionize_sql


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


@pytest.mark.parametrize("gap", [1800, 300, 60])
def test_sessionize_matches_duckdb(events, duck, gap):
    got = [tuple(r) for r in sessionize(events, gap).collect()]
    want = [tuple(r) for r in duck.execute(sessionize_sql(gap)).fetchall()]
    assert got == want and got, gap


def test_sessionize_repartition_stable(events):
    base = [tuple(r) for r in sessionize(events, 300).collect()]
    assert [tuple(r) for r in sessionize(events.repartition(13), 300).collect()] == base


def test_sessionize_gap_semantics(spark):
    """Crafted stream: gaps of exactly `gap` stay in-session (strict >),
    one microsecond more splits."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(seconds, micros=0):
        return t0 + datetime.timedelta(seconds=seconds, microseconds=micros)

    rows = [
        (1, ts(0), 7),        # session 0
        (2, ts(60), 7),       # +60s == gap -> SAME session (strict >)
        (3, ts(120, 1), 7),   # +60.000001s -> NEW session
        (4, ts(121), 7),
        (5, ts(0), 8),        # second user independent
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    )
    got = {
        (r["user_id"], r["session_index"]): r["n_events"]
        for r in sessionize(ev, 60).collect()
    }
    assert got == {(7, 0): 2, (7, 1): 2, (8, 0): 1}


def test_sessionize_monotone_in_gap(events):
    """Larger gaps can only merge sessions, never split them."""
    n60 = sessionize(events, 60).count()
    n300 = sessionize(events, 300).count()
    n1800 = sessionize(events, 1800).count()
    assert n60 >= n300 >= n1800 > 0


# -- cohort retention ---------------------------------------------------------


@pytest.mark.parametrize("period", ["week", "month", "day"])
def test_retention_matches_duckdb(events, duck, period):
    from flume_elasticsearch_2_spark.operators.events import (
        retention_cohorts,
        retention_cohorts_sql,
    )

    got = [tuple(r) for r in retention_cohorts(events, period).collect()]
    want = [tuple(r) for r in duck.execute(retention_cohorts_sql(period)).fetchall()]
    assert got == want and got, period


def test_retention_semantics(events):
    """Every user counts in their cohort's own period; totals add up to
    distinct (user, period) pairs."""
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.events import retention_cohorts

    grid = retention_cohorts(events, "week")
    rows = grid.collect()
    pairs = (
        events.select("user_id", F.date_trunc("week", "ts").alias("p")).distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == pairs
    firsts = {r["cohort"] for r in rows}
    assert all(any(r["cohort"] == r["active_period"] == c for r in rows) for c in firsts)


def test_retention_bad_period_raises(events):
    from flume_elasticsearch_2_spark.operators.events import (
        retention_cohorts,
        retention_cohorts_sql,
    )

    with pytest.raises(ValueError):
        retention_cohorts(events, "hour")
    with pytest.raises(ValueError):
        retention_cohorts_sql("year")


# -- funnel ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "steps,within",
    [
        (["view", "click", "purchase"], None),
        (["view", "click", "purchase"], 86400),
        (["view", "click"], 3600),
        (["signup", "purchase"], None),
        (["view"], None),
        (["view", "zzz", "click"], None),  # absent step zeroes the tail
    ],
)
def test_funnel_matches_duckdb(events, duck, steps, within):
    from flume_elasticsearch_2_spark.operators.events import funnel, funnel_sql

    got = [tuple(r) for r in funnel(events, steps, within).collect()]
    want = [tuple(r) for r in duck.execute(funnel_sql(steps, within)).fetchall()]
    assert got == want, (steps, within)


def test_funnel_order_matters(spark):
    """B-then-A must NOT count a user whose only B precedes every A."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"),
        (2, t0 + datetime.timedelta(seconds=10), 1, "b"),   # completes a->b
        (3, t0, 2, "b"),
        (4, t0 + datetime.timedelta(seconds=10), 2, "a"),   # b before a only
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long, event_type string")
    from flume_elasticsearch_2_spark.operators.events import funnel

    got = {r["step"]: r["n_users"] for r in funnel(ev, ["a", "b"]).collect()}
    assert got == {"a": 2, "b": 1}


def test_funnel_prefix_counts_monotone(events):
    from flume_elasticsearch_2_spark.operators.events import funnel

    rows = funnel(events, ["view", "click", "purchase"], 86400).collect()
    counts = [r["n_users"] for r in sorted(rows, key=lambda r: r["step_index"])]
    assert counts == sorted(counts, reverse=True)


def test_funnel_empty_steps_raise(events):
    from flume_elasticsearch_2_spark.operators.events import funnel, funnel_sql

    with pytest.raises(ValueError):
        funnel(events, [])
    with pytest.raises(ValueError):
        funnel_sql([])
