"""ES 1.x nested documents: the ``nested`` query and the ``nested``
aggregation (SURVEY §2.5; delegation site ElasticsearchSink.java:54 — the
deployed ES 1.1 supports nested mappings, queries, and facets/aggs).

ES indexes nested objects as hidden sub-documents stored in the SAME
segment block as their parent, so nested queries never leave the block.
The Spark-native analog of that co-location is an ``array<struct>`` column:
children live IN the parent row. A nested query is then pure per-row JVM
array expressions (``filter`` / ``aggregate`` / ``array_max`` — all
whole-stage-codegen) + one global top-k: ZERO joins, ZERO shuffles over the
corpus — structurally cheaper than the equivalent ``has_child`` join
(operators/joins.py), which is exactly why ES recommends nested over
parent/child when the children are immutable.

Pinned scoring contract (filter-context inner queries, as joins.py):

- inner query = filter triples (the DSL filter dialect, applied per nested
  object); a parent matches when >=1 nested object passes;
- score_mode 'none' -> 1.0; 'sum' with no score_field -> the matching-child
  COUNT (sum of constant scores, exactly ES); 'sum'/'max'/'avg' with
  ``score_field`` -> that aggregate of the matching children's field values
  (the custom-score shape). Ranked (score DESC, parent key ASC), top-k.

``nest_children`` builds the nested corpus from a relational parent/child
pair (the one-time index-side data shaping ES does at write time): ONE
map-side-combined collect per parent key + ONE key join — at 100 TB this is
the same shuffle the raw tables force anyway, paid once, after which every
nested query is shuffle-free. Arrays are sorted on the child columns so
left-to-right float folds are deterministic and engine-identical.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

Triple = tuple[str, str, Any]

_MODES = ("none", "sum", "max", "avg")

__all__ = [
    "nest_children",
    "nested_corpus_sql",
    "nested_query",
    "nested_query_sql",
    "nested_agg",
    "nested_agg_sql",
]


def nest_children(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_cols: list[str],
    nested_col: str = "children",
) -> DataFrame:
    """Shape a relational parent/child pair into the nested corpus:
    parents + an ``array<struct>`` column of their children (empty array
    when childless — ES keeps the parent doc). ``child_cols[0]`` should be
    a per-parent-unique column: arrays are sorted on the struct fields in
    order, pinning fold order for float determinism."""
    items = children.groupBy(F.col(child_key).alias(parent_key)).agg(
        F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in child_cols]))
        ).alias(nested_col)
    )
    empty = F.array().cast(
        items.schema[nested_col].dataType.simpleString()
    )
    return parents.join(items, parent_key, "left").withColumn(
        nested_col, F.coalesce(F.col(nested_col), empty)
    )


def nested_corpus_sql(
    parents: str = "orders",
    children: str = "lineitem",
    parent_key: str = "o_orderkey",
    child_key: str = "l_orderkey",
    child_cols: list[str] | None = None,
    nested_col: str = "children",
) -> str:
    """DuckDB CTE body mirroring :func:`nest_children` (same sort, same
    empty-array fill) — prepend as ``WITH nested AS (...)``."""
    cols = child_cols or ["l_linenumber", "l_quantity", "l_extendedprice"]
    pack = ", ".join(f"{c} := {c}" for c in cols)
    order = ", ".join(cols)
    return f"""
SELECT p.*, coalesce(i.{nested_col}, []) AS {nested_col}
FROM {parents} p
LEFT JOIN (
  SELECT {child_key} AS {parent_key},
         list(struct_pack({pack}) ORDER BY {order}) AS {nested_col}
  FROM {children} GROUP BY {child_key}
) i USING ({parent_key})
"""


def _elem_pred(triples: list[Triple]):
    """Per-element predicate over a nested struct — the DSL filter dialect
    (dsl._filters_col) re-targeted from columns to struct fields."""
    ops = {
        "==": lambda c, v: c == v,
        "!=": lambda c, v: ~c.eqNullSafe(v),
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "in": lambda c, v: c.isin(list(v)),
        "notnull": lambda c, v: c.isNotNull(),
        "null": lambda c, v: c.isNull(),
    }
    for _, op, _ in triples:
        if op not in ops:
            raise ValueError(f"nested filter op {op!r} unsupported")

    def pred(x: Column) -> Column:
        expr = F.lit(True)
        for f, op, v in triples:
            expr = expr & ops[op](x[f], v)
        return expr

    return pred


def _elem_pred_sql(triples: list[Triple]) -> str:
    def q(v):
        return f"'{v}'" if isinstance(v, str) else repr(v)

    preds = []
    for f, op, v in triples:
        if op == "in":
            preds.append(f"x.{f} IN ({', '.join(q(i) for i in v)})")
        elif op == "==":
            preds.append(f"x.{f} = {q(v)}")
        elif op == "!=":
            preds.append(f"x.{f} IS DISTINCT FROM {q(v)}")
        elif op == "notnull":
            preds.append(f"x.{f} IS NOT NULL")
        elif op == "null":
            preds.append(f"x.{f} IS NULL")
        elif op in ("<", "<=", ">", ">="):
            preds.append(f"x.{f} {op} {q(v)}")
        else:
            raise ValueError(f"nested filter op {op!r} unsupported")
    return " AND ".join(preds) if preds else "TRUE"


def nested_query(
    docs: DataFrame,
    filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
    id_col: str = "o_orderkey",
    nested_col: str = "children",
) -> DataFrame:
    """Parents with >=1 nested object matching ``filters`` (pinned
    score_mode contract in the module docstring). The whole match+score is
    per-row array expressions inside one codegen stage; the only exchange
    is the k-row TakeOrdered. Returns (id_col, score)."""
    if score_mode not in _MODES:
        raise ValueError(f"score_mode must be one of {_MODES}")
    if score_mode in ("max", "avg") and score_field is None:
        raise ValueError(f"score_mode {score_mode!r} needs score_field")
    m = F.filter(F.col(nested_col), _elem_pred(filters))
    if score_mode == "none":
        score = F.lit(1.0)
    elif score_field is None:  # 'sum' of constant-score children = count
        score = F.size(m).cast("double")
    else:
        vals = F.transform(m, lambda x: x[score_field].cast("double"))
        if score_mode == "max":
            score = F.array_max(vals)
        else:
            s = F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v)
            score = s if score_mode == "sum" else s / F.size(m)
    return (
        docs.where(F.size(m) > 0)
        .select(id_col, score.alias("score_exact"))
        .orderBy(F.col("score_exact").desc(), F.col(id_col).asc())
        .limit(int(k))
        .select(id_col, F.round("score_exact", 6).alias("score"))
    )


def nested_query_sql(
    filters: list[Triple],
    score_mode: str = "none",
    score_field: str | None = None,
    k: int = 10,
    id_col: str = "o_orderkey",
    nested_col: str = "children",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`nested_query` — the nested corpus is built
    IN SQL (same list shaping) and matched with the same list lambdas, so
    the array semantics themselves are cross-checked."""
    if score_mode not in _MODES:
        raise ValueError(f"score_mode must be one of {_MODES}")
    if score_mode in ("max", "avg") and score_field is None:
        raise ValueError(f"score_mode {score_mode!r} needs score_field")
    pred = _elem_pred_sql(filters)
    matched = f"list_filter({nested_col}, x -> {pred})"
    if score_mode == "none":
        score = "1.0"
    elif score_field is None:
        score = f"CAST(len({matched}) AS DOUBLE)"
    else:
        vals = f"list_transform({matched}, x -> CAST(x.{score_field} AS DOUBLE))"
        if score_mode == "max":
            score = f"list_max({vals})"
        elif score_mode == "sum":
            score = f"coalesce(list_sum({vals}), 0.0)"
        else:
            score = f"list_sum({vals}) / len({matched})"
    return f"""
WITH nested AS ({corpus_sql or nested_corpus_sql()})
SELECT {id_col}, round({score}, 6) AS score
FROM nested
WHERE len({matched}) > 0
ORDER BY {score} DESC, {id_col} ASC
LIMIT {int(k)}
"""


def nested_agg(
    docs: DataFrame,
    field: str,
    scope_filters: list[Triple] | None = None,
    nested_col: str = "children",
) -> DataFrame:
    """ES ``nested`` aggregation: stats over ``field`` of ALL nested
    objects of the in-scope parents (scope = DSL filter triples on parent
    columns). One explode + one map-side-combined global agg; childless
    parents contribute nothing (ES: no nested docs). Returns a single row
    (n_nested, sum_v, avg_v, min_v, max_v)."""
    from .dsl import _filters_col

    pred = _filters_col(scope_filters or [])
    scoped = docs.where(pred) if pred is not None else docs
    v = F.col("x")[field].cast("double")
    return (
        scoped.select(F.explode(nested_col).alias("x"))
        .agg(
            F.count("*").alias("n_nested"),
            F.round(F.sum(v), 6).alias("sum_v"),
            F.round(F.avg(v), 6).alias("avg_v"),
            F.round(F.min(v), 6).alias("min_v"),
            F.round(F.max(v), 6).alias("max_v"),
        )
    )


def nested_agg_sql(
    field: str,
    scope_filters: list[Triple] | None = None,
    nested_col: str = "children",
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`nested_agg` (unnest over the same nested
    CTE)."""
    from .dsl import _filters_sql

    where = _filters_sql(scope_filters or []) or "TRUE"
    return f"""
WITH nested AS ({corpus_sql or nested_corpus_sql()}),
flat AS (
  SELECT CAST(x.{field} AS DOUBLE) AS v
  FROM (SELECT unnest({nested_col}) AS x FROM nested WHERE {where})
)
SELECT count(*) AS n_nested,
       round(sum(v), 6) AS sum_v,
       round(avg(v), 6) AS avg_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM flat
"""


def reverse_nested_agg(
    docs: DataFrame,
    parent_key: str,
    bucket_field: str,
    parent_metric: str,
    scope_filters: list[Triple] | None = None,
    nested_col: str = "children",
    size: int = 10,
) -> DataFrame:
    """ES 1.x ``reverse_nested`` aggregation: inside a nested context,
    bucket the nested objects by ``bucket_field``, then JOIN BACK to the
    parent documents — per bucket, ``doc_count`` counts nested objects
    (the enclosing nested/terms agg) while ``parent_docs`` and
    ``sum_metric`` come from the DISTINCT parents owning >=1 object in the
    bucket (the reverse_nested sub-agg with a parent-field sum metric).

    ES 1.2 shipped reverse_nested exactly for this "how many PARENT docs
    per nested bucket" question that the plain nested agg can't answer
    (delegation site ElasticsearchSink.java:54).

    Scale shape: one explode, ONE map-side-combined groupBy at the finest
    (bucket, parent) grain — the parent metric rides as first() since it's
    constant per parent — then a second tiny agg over <=|buckets·parents|
    partial rows. No joins, no distinct-count shuffle of raw nested rows.

    Returns (key, doc_count, parent_docs, sum_metric) top-``size`` buckets
    by (doc_count DESC, key ASC).
    """
    from .dsl import _filters_col

    pred = _filters_col(scope_filters or [])
    scoped = docs.where(pred) if pred is not None else docs
    # decimal(18,2) accumulation: thousands of money values per bucket sum
    # EXACTLY (integer cents), so the result is partition-order invariant
    # and bit-equal across engines — double folds drift ~1e-6 at 1e8 sums.
    fine = (
        scoped.select(
            F.col(parent_key).alias("pk"),
            F.col(parent_metric).cast("decimal(18,2)").alias("pm"),
            F.explode(nested_col).alias("x"),
        )
        .select(F.col("x")[bucket_field].cast("long").alias("key"), "pk", "pm")
        .groupBy("key", "pk")
        .agg(F.count("*").alias("n_in_parent"), F.first("pm").alias("pm"))
    )
    return (
        fine.groupBy("key")
        .agg(
            F.sum("n_in_parent").alias("doc_count"),
            F.count("*").alias("parent_docs"),
            F.round(F.sum("pm").cast("double"), 6).alias("sum_metric"),
        )
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(int(size))
    )


def reverse_nested_agg_sql(
    parent_key: str,
    bucket_field: str,
    parent_metric: str,
    scope_filters: list[Triple] | None = None,
    nested_col: str = "children",
    size: int = 10,
    corpus_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`reverse_nested_agg` — the independent
    formulation: unnest + direct count(DISTINCT parent) and a
    distinct-parent metric sum."""
    from .dsl import _filters_sql

    where = _filters_sql(scope_filters or []) or "TRUE"
    return f"""
WITH nested AS ({corpus_sql or nested_corpus_sql()}),
flat AS (
  SELECT CAST(x.{bucket_field} AS BIGINT) AS key,
         {parent_key} AS pk,
         CAST({parent_metric} AS DECIMAL(18,2)) AS pm
  FROM (
    SELECT {parent_key}, {parent_metric}, unnest({nested_col}) AS x
    FROM nested WHERE {where}
  )
),
per_parent AS (
  SELECT key, pk, count(*) AS n_in_parent, any_value(pm) AS pm
  FROM flat GROUP BY key, pk
)
SELECT key,
       CAST(sum(n_in_parent) AS BIGINT) AS doc_count,
       count(*) AS parent_docs,
       round(CAST(sum(pm) AS DOUBLE), 6) AS sum_metric
FROM per_parent
GROUP BY key
ORDER BY doc_count DESC, key ASC
LIMIT {int(size)}
"""
