"""ES 1.x parent/child queries (SURVEY §2.5 Q36): ``has_child`` (parents
with a matching child) and ``has_parent`` (children of matching parents),
re-expressed over two relational tables keyed by a join column — the
orders/lineitem pair in the test data plays the parent/child mapping an ES
1.x ``_parent`` field defines.

Reference analog: the delegated ES 1.1 supports parent/child mapping and
both query types (delegation site ElasticsearchSink.java:54). ES routes
children to the parent's shard and evaluates per-shard with an in-memory
id cache; here the same co-location is the Spark join on the parent key.

Pinned scoring contract (the ES 1.x score_mode surface applied to
filter-context inner queries, the common case):

- ``has_child``: the child query is a filter (triples, same dialect as the
  DSL filter executor). score_mode 'none' -> constant 1.0 (ES filter
  context); 'sum' with no score_field -> the MATCHING-CHILD COUNT (the sum
  of constant-score children, exactly ES); 'max' / 'sum' / 'avg' with
  ``score_field`` -> that aggregate of the children's field values (the ES
  custom-score child query: score = field value, function_score's
  field_value_factor shape). Parents ranked (score DESC, key ASC), top-k.
- ``has_parent``: score_mode 'none' -> 1.0, or 'score' with
  ``score_field`` -> each child inherits its parent's field value (ES
  has_parent score mode 'score'). Children ranked (score DESC, child keys
  ASC), top-k.

Scale shape (10^12 rows): child/parent filters are JVM predicates pushed to
the Parquet scans; the per-parent aggregate is ONE map-side-combined
groupBy on the join key (partials, never child rows, cross the exchange);
the parent/child join is key-partitioned (AQE picks broadcast when the
filtered side is small — the filtered parent set of has_parent usually is).
No UDFs anywhere.
"""

from __future__ import annotations

from collections import Counter
from typing import Any

from pyspark.sql import DataFrame, functions as F

from .dsl import _filters_col, _filters_sql

Triple = tuple[str, str, Any]

_CHILD_MODES = ("none", "sum", "max", "avg")


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Parents with >=1 child matching ``child_filters``; see module
    docstring for the pinned score_mode contract. Returns
    (parent_key, score) top-k by (score DESC, parent_key ASC)."""
    if score_mode not in _CHILD_MODES:
        raise ValueError(f"score_mode must be one of {_CHILD_MODES}")
    if score_mode in ("max", "avg") and score_field is None:
        raise ValueError(f"score_mode {score_mode!r} needs score_field")
    pred = _filters_col(child_filters)
    matched = children.where(pred) if pred is not None else children
    if score_mode == "none":
        agg = F.lit(1.0)
    elif score_field is None:  # 'sum' of constant-score children = count
        agg = F.count("*").cast("double")
    else:
        agg = {"sum": F.sum, "max": F.max, "avg": F.avg}[score_mode](
            F.col(score_field).cast("double")
        )
    per_parent = (
        matched.groupBy(F.col(child_key).alias(parent_key))
        .agg(agg.alias("score_exact"))
    )
    hits = per_parent.join(parents.select(parent_key), parent_key, "inner")
    return (
        hits.orderBy(F.col("score_exact").desc(), F.col(parent_key).asc())
        .limit(int(k))
        .select(parent_key, F.round("score_exact", 6).alias("score"))
    )


def has_child_sql(
    child_filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
    parents: str = "orders",
    children: str = "lineitem",
    parent_key: str = "o_orderkey",
    child_key: str = "l_orderkey",
) -> str:
    """DuckDB oracle for :func:`has_child`."""
    if score_mode not in _CHILD_MODES:
        raise ValueError(f"score_mode must be one of {_CHILD_MODES}")
    where = _filters_sql(child_filters) or "TRUE"
    if score_mode == "none":
        agg = "1.0"
    elif score_field is None:
        agg = "CAST(count(*) AS DOUBLE)"
    else:
        agg = f"{score_mode}(CAST({score_field} AS DOUBLE))"
    return f"""
WITH per_parent AS (
  SELECT {child_key} AS {parent_key}, {agg} AS s
  FROM {children}
  WHERE {where}
  GROUP BY {child_key}
)
SELECT p.{parent_key}, round(pp.s, 6) AS score
FROM per_parent pp JOIN {parents} p USING ({parent_key})
ORDER BY pp.s DESC, p.{parent_key} ASC
LIMIT {int(k)}
"""


def has_parent(
    children: DataFrame,
    parents: DataFrame,
    parent_key: str,
    child_key: str,
    parent_filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
    child_id_cols: list[str] | None = None,
) -> DataFrame:
    """Children whose parent matches ``parent_filters``; score_mode 'score'
    inherits the parent's ``score_field`` value (ES has_parent 'score'
    mode), 'none' is the 1.0 filter context. Returns
    (*child_id_cols, score) top-k by (score DESC, child ids ASC)."""
    if score_mode not in ("none", "score"):
        raise ValueError("score_mode must be 'none' or 'score'")
    if score_mode == "score" and score_field is None:
        raise ValueError("score_mode 'score' needs score_field")
    ids = child_id_cols or [child_key]
    pred = _filters_col(parent_filters)
    matched = parents.where(pred) if pred is not None else parents
    score = (
        F.lit(1.0)
        if score_mode == "none"
        else F.col(score_field).cast("double")
    )
    side = matched.select(
        F.col(parent_key).alias(child_key), score.alias("score_exact")
    )
    return (
        children.select(*ids, child_key)
        .join(side, child_key, "inner")
        .orderBy(F.col("score_exact").desc(), *[F.col(c).asc() for c in ids])
        .limit(int(k))
        .select(*ids, F.round("score_exact", 6).alias("score"))
    )


def has_parent_sql(
    parent_filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
    parents: str = "orders",
    children: str = "lineitem",
    parent_key: str = "o_orderkey",
    child_key: str = "l_orderkey",
    child_id_cols: list[str] | None = None,
) -> str:
    """DuckDB oracle for :func:`has_parent`."""
    if score_mode not in ("none", "score"):
        raise ValueError("score_mode must be 'none' or 'score'")
    ids = child_id_cols or [child_key]
    where = _filters_sql(parent_filters) or "TRUE"
    score = "1.0" if score_mode == "none" else f"CAST(p.{score_field} AS DOUBLE)"
    id_cols = ", ".join(f"c.{c}" for c in ids)
    order_ids = ", ".join(f"c.{c} ASC" for c in ids)
    return f"""
SELECT {id_cols}, round({score}, 6) AS score
FROM {children} c
JOIN (SELECT * FROM {parents} WHERE {where}) p
  ON p.{parent_key} = c.{child_key}
ORDER BY {score} DESC, {order_ids}
LIMIT {int(k)}
"""


_TC_MODES = ("max", "sum", "avg")


def top_children(
    children: DataFrame,
    query: str,
    parent_col: str,
    score_mode: str = "max",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES 1.x ``top_children`` query (delegation site
    ElasticsearchSink.java:54): a SCORED text query over child documents
    whose BM25 scores are aggregated up to their parent per ``score_mode``
    (max / sum / avg), parents ranked by the aggregate.

    Pinned contract — the exact (factor -> infinity) form: the aggregate
    ranges over ALL matching children. ES approximates this by fetching
    ``size * factor`` top children and growing the window by
    ``incremental_factor`` until k parents fill; that answer converges to
    this one and is fetch-order-dependent on the way, so the deterministic
    limit is what all three engines pin (divergence documented, not silent).

    Scale shape (10^12 children): the same two narrow corpus passes as
    bm25_topk — one map-side-combined stats agg, then a scoring pass whose
    rows flow STRAIGHT into a map-side-combined groupBy on the parent key
    (child scores never sort globally; only <=|parents| partial rows cross
    the exchange), ending in TakeOrderedAndProject. No joins, no UDFs.

    Returns (parent, score) top-k by (score DESC, parent ASC), round-6.
    """
    from ..functions.bm25 import bm25_col
    from ..functions.tokenizer import tokenize, tokens_col

    if score_mode not in _TC_MODES:
        raise ValueError(f"score_mode must be one of {_TC_MODES}")
    empty = children.sparkSession.createDataFrame([], "parent string, score double")
    q_terms = tokenize(query)
    if not q_terms:
        return empty
    weights = Counter(q_terms)
    terms = sorted(weights)

    toks = tokens_col(text_col)
    per_child = children.select(
        F.col(parent_col).alias("parent"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, lambda x: x == F.lit(t)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_child.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0
    if n_docs == 0 or avgdl == 0.0:
        return empty
    score = F.lit(0.0)
    any_present = False
    for i, t in enumerate(terms):
        df_t = int(stats[f"df_{i}"])
        if df_t == 0:
            continue
        any_present = True
        score = score + float(weights[t]) * bm25_col(
            F.col(f"tf_{i}"), F.lit(df_t), F.col("dl"), F.lit(n_docs), F.lit(avgdl)
        )
    if not any_present:
        return empty
    agg = {"max": F.max, "sum": F.sum, "avg": F.avg}[score_mode](
        F.col("child_score")
    )
    return (
        per_child.withColumn("child_score", score)
        .where(F.col("child_score") > 0.0)
        .groupBy("parent")
        .agg(agg.alias("score_exact"))
        .orderBy(F.col("score_exact").desc(), F.col("parent").asc())
        .limit(int(k))
        .select("parent", F.round("score_exact", 6).alias("score"))
    )


def top_children_sql(
    query: str,
    parent_col: str,
    score_mode: str = "max",
    k: int = 10,
    children: str = "documents",
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`top_children` — the independent relational
    formulation: per-child BM25 via the exploded tf/df CTE shape, then the
    parent-level aggregate."""
    from ..functions.tokenizer import duckdb_token_pattern, tokenize

    if score_mode not in _TC_MODES:
        raise ValueError(f"score_mode must be one of {_TC_MODES}")
    q_terms = tokenize(query)
    weights = Counter(q_terms)
    terms_values = ", ".join(
        f"('{t}', {float(c)!r})" for t, c in sorted(weights.items())
    )
    in_list = ", ".join(f"'{t}'" for t in sorted(weights))
    tok_expr = (
        f"regexp_extract_all(lower({text_expr}), '{duckdb_token_pattern()}')"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS cid, unnest({tok_expr}) AS term FROM {children}
),
dl AS (
  SELECT {id_col} AS cid, {parent_col} AS parent,
         len({tok_expr}) AS dl
  FROM {children}
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term, qw) AS (VALUES {terms_values}),
dfreq AS (
  SELECT term, count(DISTINCT cid) AS df FROM toks
  WHERE term IN ({in_list}) GROUP BY term
),
tf AS (
  SELECT cid, term, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY cid, term
),
child AS (
  SELECT dl.parent,
         sum(qterms.qw
             * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS child_score
  FROM tf
  JOIN dfreq USING (term) JOIN qterms USING (term) JOIN dl USING (cid)
  CROSS JOIN stats
  GROUP BY dl.parent, dl.cid
)
SELECT parent, round({score_mode}(child_score), 6) AS score
FROM child
WHERE child_score > 0.0
GROUP BY parent
ORDER BY {score_mode}(child_score) DESC, parent ASC
LIMIT {int(k)}
"""


_CA_METRICS = ("count", "sum", "min", "max", "avg")


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    group_field: str,
    metric: tuple[str, str] | None = None,
    parent_filters: list[Triple] | None = None,
    child_filters: list[Triple] | None = None,
    size: int = 10,
) -> DataFrame:
    """ES 1.4 ``children`` aggregation (delegation site
    ElasticsearchSink.java:54): a ``terms`` bucket on a PARENT field whose
    sub-agg descends to the bucket's children — per bucket the parent
    ``doc_count``, the ``children_count`` under those parents, and an
    optional metric (``(kind, child_field)``, kind in count/sum/min/max/
    avg) over the children's field. Buckets ordered ES-style
    (doc_count DESC, key ASC), top ``size``.

    Semantics pinned to ES: parents with ZERO matching children still
    count in ``doc_count`` (the terms bucket is over parents; the children
    step only feeds the sub-metrics); parents with a NULL ``group_field``
    are dropped entirely (ES terms aggs skip missing-field docs — also
    removes the Spark-NULLS-FIRST vs SQL-NULLS-LAST order divergence);
    ``child_filters`` restrict which children participate; avg/count are
    over the children whose metric field is non-null, exactly the ES
    missing-value rule; sum and count over an empty child set are 0
    (ES returns 0.0 for both), min/max/avg are NULL.

    Scale shape (10^12 rows): child rows never cross a shuffle raw — they
    collapse FIRST via one map-side-combined groupBy on the join key
    (count + the metric partials), then the per-parent partials (<= one
    row per parent) join the filtered parent projection key-partitioned
    (AQE broadcasts when the filtered parent set is small), and the bucket
    rollup is a second map-side-combined groupBy on the bucket key. Both
    filters are JVM predicates pushed to the Parquet scans. No UDFs.
    """
    if metric is not None and metric[0] not in _CA_METRICS:
        raise ValueError(f"metric kind must be one of {_CA_METRICS}")
    ppred = _filters_col(parent_filters or [])
    cpred = _filters_col(child_filters or [])
    p = parents.where(ppred) if ppred is not None else parents
    c = children.where(cpred) if cpred is not None else children

    partials = [F.count("*").alias("_cc")]
    if metric is not None:
        kind, field = metric
        fld = F.col(field).cast("double")
        partials += [
            F.sum(fld).alias("_ps"), F.min(fld).alias("_pmin"),
            F.max(fld).alias("_pmax"), F.count(fld).alias("_pn"),
        ]
    per_parent = c.groupBy(F.col(child_key).alias(parent_key)).agg(*partials)

    j = (
        p.select(parent_key, group_field)
        .where(F.col(group_field).isNotNull())
        .join(per_parent, parent_key, "left")
    )
    rollup = [
        F.count("*").alias("doc_count"),
        F.coalesce(F.sum("_cc"), F.lit(0)).cast("long").alias("children_count"),
    ]
    if metric is not None:
        kind = metric[0]
        value = {
            "count": F.coalesce(F.sum("_pn"), F.lit(0)).cast("double"),
            "sum": F.coalesce(F.sum("_ps"), F.lit(0.0)),
            "min": F.min("_pmin"),
            "max": F.max("_pmax"),
            "avg": F.sum("_ps") / F.sum("_pn"),
        }[kind]
        rollup.append(F.round(value, 6).alias("value"))
    return (
        j.groupBy(F.col(group_field).alias("key"))
        .agg(*rollup)
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(int(size))
    )


def children_agg_sql(
    group_field: str,
    metric: tuple[str, str] | None = None,
    parent_filters: list[Triple] | None = None,
    child_filters: list[Triple] | None = None,
    size: int = 10,
    parents: str = "orders",
    children: str = "lineitem",
    parent_key: str = "o_orderkey",
    child_key: str = "l_orderkey",
) -> str:
    """DuckDB oracle for :func:`children_agg` — identical partial-then-
    rollup shape so float sums fold over the same per-parent partials."""
    if metric is not None and metric[0] not in _CA_METRICS:
        raise ValueError(f"metric kind must be one of {_CA_METRICS}")
    pwhere = _filters_sql(parent_filters or []) or "TRUE"
    cwhere = _filters_sql(child_filters or []) or "TRUE"
    mparts, msel = "", ""
    if metric is not None:
        kind, field = metric
        mparts = (
            f", sum(CAST({field} AS DOUBLE)) AS ps"
            f", min(CAST({field} AS DOUBLE)) AS pmin"
            f", max(CAST({field} AS DOUBLE)) AS pmax"
            f", count({field}) AS pn"
        )
        value = {
            "count": "CAST(coalesce(sum(pn), 0) AS DOUBLE)",
            "sum": "coalesce(sum(ps), 0.0)",
            "min": "min(pmin)",
            "max": "max(pmax)",
            "avg": "sum(ps) / sum(pn)",
        }[kind]
        msel = f", round({value}, 6) AS value"
    return f"""
WITH per_parent AS (
  SELECT {child_key} AS {parent_key}, count(*) AS cc{mparts}
  FROM {children} WHERE {cwhere} GROUP BY {child_key}
),
j AS (
  SELECT p.{group_field} AS key, pp.*
  FROM (SELECT * FROM {parents}
        WHERE ({pwhere}) AND {group_field} IS NOT NULL) p
  LEFT JOIN per_parent pp USING ({parent_key})
)
SELECT key, count(*) AS doc_count,
       CAST(coalesce(sum(cc), 0) AS BIGINT) AS children_count{msel}
FROM j GROUP BY key
ORDER BY doc_count DESC, key ASC
LIMIT {int(size)}
"""
