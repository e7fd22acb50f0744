"""Event-stream operators over the ``events`` table (SURVEY §2 training-data
extensions): gap-based sessionization — the canonical large-scale behavioral
pipeline op (web logs → sessions) the Flume side of the reference feeds.

Reference analog: the reference ships raw events into ES and leaves session
analysis to the delegated query layer (ElasticsearchSink.java:66); here it
is a first-class declarative operator with a DuckDB oracle.

Scale shape: ONE shuffle keyed by ``user_id`` (the window partition), then
per-partition sorted lag/cumsum — no joins, no second exchange (the
session aggregation reuses the same partitioning). Sessions of one user
never span partitions, so the plan is correct at any parallelism; skewed
power users bound the single partition's sort, exactly like any keyed
window (salting would break the lag chain and is deliberately NOT applied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Split each user's event stream into sessions: a NEW session starts
    when the gap since the previous event exceeds ``gap_seconds`` (the
    standard 30-minute web-analytics default). Returns one row per session
    ``(user_id, session_index, n_events, first_ts, last_ts)`` with
    0-based per-user session indexes, ordered (user_id, session_index).
    Ties in ``ts`` break on ``id_col`` so the lag chain is deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    # interval comparison works on TIMESTAMP and TIMESTAMP_NTZ alike and is
    # microsecond-exact — identical semantics to the oracle's interval test
    new_sess = (
        prev.isNull()
        | ((F.col(ts_col) - prev) > F.expr(f"INTERVAL {int(gap_seconds)} SECOND"))
    ).cast("long")
    with_sess = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        (F.sum(new_sess).over(w) - 1).alias("session_index"),
    )
    return (
        with_sess.groupBy("user_id", "session_index")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id", "session_index")
    )


def sessionize_sql(
    gap_seconds: int = 1800,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`sessionize` (identical lag/cumsum window)."""
    return f"""
WITH lagged AS (
  SELECT {user_col} AS user_id, {ts_col} AS ts, {id_col} AS event_id,
         lag({ts_col}) OVER (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}) AS prev_ts
  FROM {table}
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                OR ts - prev_ts > INTERVAL {int(gap_seconds)} SECOND
              THEN 1 ELSE 0 END AS new_sess
  FROM lagged
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_index
  FROM flagged
)
SELECT user_id, session_index, count(*) AS n_events,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM sess
GROUP BY user_id, session_index
ORDER BY user_id, session_index
"""


def retention_cohorts(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by their FIRST-ACTIVITY period
    (cohort), counted in every later period they return — the classic
    activity-retention triangle. Returns
    ``(cohort, active_period, n_users)`` ordered by both.

    Scale shape: one user-keyed aggregation for first-activity (map-side
    combined min), one distinct over (user, period) — both shuffles keyed
    by user, so AQE coalesces them onto one exchange lineage; the final
    count is a tiny (cohort × period) grid. ``period`` ∈ {week, month, day}
    via ``date_trunc`` (ISO weeks in Spark and DuckDB alike).
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    cohort = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    activity = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc(period, F.col(ts_col)).alias("active_period"),
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort", "active_period")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort", "active_period")
    )


def retention_cohorts_sql(
    period: str = "week",
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB oracle for :func:`retention_cohorts` (both engines truncate
    to ISO weeks / calendar months; CASTs align the date_trunc output types
    for value-hash equality)."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    return f"""
WITH cohort AS (
  SELECT {user_col} AS user_id,
         CAST(date_trunc('{period}', min({ts_col})) AS TIMESTAMP) AS cohort
  FROM {table} GROUP BY {user_col}
),
activity AS (
  SELECT DISTINCT {user_col} AS user_id,
         CAST(date_trunc('{period}', {ts_col}) AS TIMESTAMP) AS active_period
  FROM {table}
)
SELECT c.cohort, a.active_period, count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY c.cohort, a.active_period
ORDER BY c.cohort, a.active_period
"""


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: how many users complete each PREFIX of ``steps`` in
    order (step k counted only after steps 1..k-1, strictly increasing
    timestamps). Returns ``(step_index, step, n_users)`` ordered by
    step_index.

    Exactness: for the UNBOUNDED funnel the earliest-completion chain (min
    ts of step 1, then min ts of step 2 strictly after it, …) is greedy but
    exact — minimizing each step's timestamp only ever admits more
    completions for later steps.

    ``within_seconds`` is the FIRST-TOUCH window contract, pinned: the
    whole chain must complete within the window anchored at the user's
    FIRST step-1 event (the first-touch attribution common in product
    analytics). This is deliberately NOT the any-anchor variant ("completed
    within the window starting from SOME step-1 occurrence") — that
    semantics needs a per-anchor scan and is a documented non-goal here;
    a user whose only fast chain starts at a later step-1 occurrence does
    not count. Both the engine and the oracle implement the same pinned
    contract.

    Scale shape: one filtered user-keyed min-agg per step, each joined to
    the previous step's frame on ``user_id`` — k-1 key joins over
    monotonically SHRINKING user sets (AQE broadcasts the survivors once
    they fit), never a self-join of the event stream.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ts_col).alias("t1"))
    )
    counts = [cur.count()]
    prev = cur.select("user_id", F.col("t1"), F.col("t1").alias("tk"))
    for s in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == s)
            .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
            .join(prev, "user_id")
            .where(F.col("ts") > F.col("tk"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("tk"), F.first("t1").alias("t1"))
            .select("user_id", "t1", "tk")
        )
        if within_seconds is not None:
            nxt = nxt.where(
                (F.col("tk") - F.col("t1"))
                <= F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        counts.append(nxt.count())
        prev = nxt
    spark = events.sparkSession
    return spark.createDataFrame(
        [(i, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))],
        "step_index long, step string, n_users long",
    )


def funnel_sql(
    steps: list[str],
    within_seconds: int | None = None,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`funnel` — the step chain unrolled
    statically (steps are known at generation time)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    esc = [s.replace("'", "''") for s in steps]
    ctes = [
        f"""u1 AS (
  SELECT {user_col} AS user_id, min({ts_col}) AS t1, min({ts_col}) AS tk
  FROM {table} WHERE {type_col} = '{esc[0]}' GROUP BY {user_col}
)"""
    ]
    for i, s in enumerate(esc[1:], start=2):
        within = (
            f"\n  HAVING min(e.{ts_col}) - any_value(u{i-1}.t1) <= INTERVAL {int(within_seconds)} SECOND"
            if within_seconds is not None
            else ""
        )
        ctes.append(f"""u{i} AS (
  SELECT e.{user_col} AS user_id, any_value(u{i-1}.t1) AS t1, min(e.{ts_col}) AS tk
  FROM {table} e JOIN u{i-1} ON u{i-1}.user_id = e.{user_col}
  WHERE e.{type_col} = '{s}' AND e.{ts_col} > u{i-1}.tk
  GROUP BY e.{user_col}{within}
)""")
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step_index, '{s}' AS step, "
        f"CAST((SELECT count(*) FROM u{i+1}) AS BIGINT) AS n_users"
        for i, s in enumerate(esc)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{selects}\nORDER BY step_index"
