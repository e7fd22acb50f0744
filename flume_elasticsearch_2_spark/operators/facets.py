"""Facets / aggregations over a query's match set (ES 1.x facets, renamed
aggregations in 1.0 — both shipped in the ES 1.1 the reference targets;
delegation site: ElasticsearchSink.java:54, every query/agg runs in ES).

Implemented kinds, each over ALL docs matching the query (ES "query scope",
not just the top-k page):

- **terms** facet: count per field value, top-``size`` by
  ``(count DESC, value ASC)`` (ES orders by count; the value tiebreak makes
  the cap deterministic).
- **stats** facet: count / min / max / sum / avg of a numeric field.
- **histogram** facet: fixed-``interval`` buckets
  ``floor(field / interval) * interval``, count per bucket, bucket-ordered.

Match semantics: the analyzed OR query (any distinct query term present) or
AND (all present) — identical to the candidate sets of the BM25 ``match``
query, so a facet composes with search as in ES (one request, same scope).
``query=None`` = ``match_all`` (whole corpus).

Scale shape (declarative): one corpus pass — the match condition is a JVM
array predicate (``arrays_overlap`` / ``array_intersect``), the aggregation
is a map-side-combined groupBy on the facet field; rows shuffled ≤ field
cardinality × partitions. No joins, no UDFs. The serving path
(plans/query_index.py ``IndexSearcher.facet``) instead decodes the match set
from postings per shard and reads ONLY (doc_id, field) from the docs table —
partials merged in one tiny final aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col


def match_condition(
    query: str | None,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> Column:
    """JVM boolean Column: doc matches the analyzed query (ES ``match``
    candidate semantics; ``None`` = match_all)."""
    if query is None:
        return F.lit(True)
    terms = sorted(set(tokenize(query, stopwords, analyzer)))
    if not terms:
        return F.lit(False)
    toks = tokens_col(text_col, stopwords, analyzer)
    arr = F.array(*[F.lit(t) for t in terms])
    if mode == "or":
        return F.arrays_overlap(toks, arr)
    if mode != "and":
        raise ValueError(f"unknown match mode {mode!r}")
    return F.size(F.array_intersect(F.array_distinct(toks), arr)) == len(terms)


def _match_sql(
    query: str | None,
    mode: str,
    stopwords: list[str] | None,
    analyzer: str,
) -> str:
    """The identical match predicate as DuckDB SQL."""
    if query is None:
        return "TRUE"
    terms = sorted(set(tokenize(query, stopwords, analyzer)))
    if not terms:
        return "FALSE"
    # full analyzer chain, never the bare pattern (tokens_col composes
    # stem/edge on the Spark side — the oracle must match)
    from ..functions.tokenizer import duckdb_tokens_expr

    tok_expr = duckdb_tokens_expr(analyzer, stopwords)
    lst = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    fn = "list_has_any" if mode == "or" else "list_has_all"
    return f"{fn}({tok_expr}, {lst})"


import re as _re

# the multiterm regexp subset widened to RAW bucket keys: field values keep
# their case (unlike the analyzed-term domain, where the tokenizer
# lowercases), plus `_` which stored values commonly contain. Same
# three-engine-agreed operator set.
_BUCKET_REGEXP_RE = _re.compile(r"^[A-Za-z0-9_.*+?|()\[\]\-{},]+$")


def _validate_bucket_regexp(pattern: str) -> str:
    """Terms-agg include/exclude pattern: validated for the three-engine
    subset WITHOUT lowercasing — bucket keys are raw stored values."""
    if not _BUCKET_REGEXP_RE.match(pattern):
        raise ValueError(
            "regexp pattern must use only [A-Za-z0-9_.*+?|()[]-{},], "
            f"got {pattern!r}"
        )
    try:
        _re.compile(pattern)
    except _re.error as e:
        raise ValueError(f"invalid regexp pattern {pattern!r}: {e}") from None
    return pattern


def _terms_order(order: tuple[str, str] | None):
    """ES terms-agg ``order`` → deterministic sort columns. Default is ES's
    ``{"_count": "desc"}`` with the value as tiebreak; ``_term`` needs no
    tiebreak (values are unique after the groupBy)."""
    key, dr = order or ("_count", "desc")
    if key not in ("_count", "_term") or dr not in ("asc", "desc"):
        raise ValueError(f"terms order must be (_count|_term, asc|desc), got {order!r}")
    # NULL bucket placement pinned to DuckDB's default (NULLS LAST in BOTH
    # directions — its default_null_order is direction-independent);
    # Spark's bare asc() puts nulls FIRST and desc() LAST, which would
    # diverge from the oracle whenever docs miss the field
    if key == "_term":
        v = F.col("value")
        return [v.asc_nulls_last() if dr == "asc" else v.desc_nulls_last()]
    return [getattr(F.col("count"), dr)(), F.col("value").asc_nulls_last()]


def terms_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    size: int = 10,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    min_doc_count: int = 1,
    include: str | None = None,
    exclude: str | None = None,
    order: tuple[str, str] | None = None,
) -> DataFrame:
    """(value, count) — top-``size`` field values over the match set.

    ES terms-agg options: ``min_doc_count`` drops buckets below the count,
    ``include``/``exclude`` are WHOLE-VALUE regexes over the bucket key
    (the three-engine-agreed pattern subset multiterm's regexp query pins —
    NULL keys never match, so they drop on these paths, as ES drops missing
    values), ``order`` is ``(_count|_term, asc|desc)``. All are bucket-level
    operations — the groupBy shuffle is unchanged; include/exclude push into
    the pre-agg scan, min_doc_count is a post-agg HAVING."""
    if int(min_doc_count) < 1:
        # ES min_doc_count: 0 emits ZERO-count buckets for terms outside
        # the match set — that needs the unscoped value universe, which
        # this engine does not compute; refuse rather than silently
        # behaving like 1 (the histogram agg DOES implement 0)
        raise ValueError("terms min_doc_count: 0 unsupported (zero buckets "
                         "need the unscoped value universe)")
    out = docs.where(match_condition(query, mode, text_col, stopwords, analyzer))
    val = F.col(field)
    if include is not None:
        out = out.where(val.cast("string").rlike(f"^(?:{_validate_bucket_regexp(include)})$"))
    if exclude is not None:
        out = out.where(~val.cast("string").rlike(f"^(?:{_validate_bucket_regexp(exclude)})$"))
    out = out.groupBy(val.alias("value")).agg(F.count("*").alias("count"))
    if int(min_doc_count) > 1:
        out = out.where(F.col("count") >= int(min_doc_count))
    return out.orderBy(*_terms_order(order)).limit(int(size))


def stats_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """One row (count, min, max, sum, avg); sum/avg as double (ES returns
    doubles), min/max in the field's own type."""
    return docs.where(match_condition(query, mode, text_col, stopwords, analyzer)).agg(
        F.count("*").alias("count"),
        F.min(field).alias("min"),
        F.max(field).alias("max"),
        F.round(F.sum(field).cast("double"), 6).alias("sum"),
        F.round(F.avg(field).cast("double"), 6).alias("avg"),
    )


def fill_histogram_buckets(
    counts: DataFrame,
    interval: int,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """ES histogram ``min_doc_count: 0``: complete the bucket spine — every
    interval step between the data's min/max bucket (widened to
    ``extended_bounds`` when given) appears, empties with count 0.

    Works on any merged ``(bucket, count)`` frame, so the declarative and
    SERVING paths share it. The spine is one scalar min/max agg + a
    ``sequence`` explode joined back — ≤ (hi−lo)/interval tiny rows, never
    a second corpus pass. An empty match set with no bounds yields no
    buckets (ES behavior); with bounds it yields the full zero spine."""
    i = int(interval)
    lo = F.min("bucket")
    hi = F.max("bucket")
    if extended_bounds is not None:
        bmin, bmax = extended_bounds
        blo = int(bmin // i) * i
        bhi = int(bmax // i) * i
        lo = F.least(F.coalesce(lo, F.lit(blo)), F.lit(blo))
        hi = F.greatest(F.coalesce(hi, F.lit(bhi)), F.lit(bhi))
    spine = (
        counts.agg(lo.cast("long").alias("lo"), hi.cast("long").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi", F.lit(i))).alias("bucket"))
    )
    return (
        spine.join(counts, "bucket", "left")
        .select("bucket", F.coalesce("count", F.lit(0)).cast("long").alias("count"))
        .orderBy("bucket")
    )


def histogram_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    interval: int,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    min_doc_count: int = 1,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(bucket, count) at ``floor(field/interval)*interval``, bucket-ordered
    (ES histogram facet default order). ``min_doc_count: 0`` keeps empty
    buckets over the data span (widened to ``extended_bounds``);
    ``min_doc_count > 1`` drops buckets below the floor."""
    if extended_bounds is not None and int(min_doc_count) != 0:
        raise ValueError("extended_bounds only applies with min_doc_count=0 (ES)")
    bucket = (F.floor(F.col(field) / F.lit(int(interval))) * int(interval)).cast("long")
    out = (
        docs.where(match_condition(query, mode, text_col, stopwords, analyzer))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("count"))
    )
    if int(min_doc_count) == 0:
        return fill_histogram_buckets(out, interval, extended_bounds)
    if int(min_doc_count) > 1:
        out = out.where(F.col("count") >= int(min_doc_count))
    return out.orderBy("bucket")


_DATE_UNITS = ("hour", "day", "week", "month", "year")


def date_histogram_facet(
    df: DataFrame,
    ts_col: str = "ts",
    interval: str = "day",
    where: Column | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """ES ``date_histogram`` facet: count per calendar bucket
    (``date_trunc`` — identical ISO semantics in Spark and DuckDB, week
    starts Monday), bucket-ordered. ``where`` = optional filter scope (the
    ES filtered-query analog for non-text tables). ``value_col`` adds the
    ES value-field stats (min/max/sum/avg) per bucket.

    Scale shape: one pass, map-side-combined groupBy; rows shuffled ≤
    bucket cardinality × partitions."""
    if interval not in _DATE_UNITS:
        raise ValueError(f"interval must be one of {_DATE_UNITS}, got {interval!r}")
    src = df if where is None else df.where(where)
    aggs = [F.count("*").alias("count")]
    if value_col is not None:
        aggs += [
            F.round(F.min(value_col).cast("double"), 6).alias("min"),
            F.round(F.max(value_col).cast("double"), 6).alias("max"),
            F.round(F.sum(value_col).cast("double"), 6).alias("sum"),
            F.round(F.avg(value_col).cast("double"), 6).alias("avg"),
        ]
    return (
        src.groupBy(F.date_trunc(interval, F.col(ts_col)).alias("bucket"))
        .agg(*aggs)
        .orderBy("bucket")
    )


def terms_stats_facet(
    df: DataFrame,
    key_field: str,
    value_field: str,
    size: int = 10,
    where: Column | None = None,
) -> DataFrame:
    """ES 1.x ``terms_stats`` facet: per key-field value, count + stats of
    the value field, top-``size`` by (count DESC, term ASC) — the composed
    terms+stats aggregation shape (sub-aggs, renamed in the 1.0 aggs API)."""
    src = df if where is None else df.where(where)
    return (
        src.groupBy(F.col(key_field).alias("term"))
        .agg(
            F.count("*").alias("count"),
            F.round(F.min(value_field).cast("double"), 6).alias("min"),
            F.round(F.max(value_field).cast("double"), 6).alias("max"),
            F.round(F.sum(value_field).cast("double"), 6).alias("total"),
            F.round(F.avg(value_field).cast("double"), 6).alias("mean"),
        )
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .limit(int(size))
    )


# -- DuckDB oracles ----------------------------------------------------------


def terms_facet_sql(
    query: str | None,
    field: str,
    size: int = 10,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    min_doc_count: int = 1,
    include: str | None = None,
    exclude: str | None = None,
    order: tuple[str, str] | None = None,
) -> str:
    if int(min_doc_count) < 1:
        raise ValueError("terms min_doc_count: 0 unsupported (zero buckets "
                         "need the unscoped value universe)")
    where = [_match_sql(query, mode, stopwords, analyzer)]
    if include is not None:
        where.append(
            f"regexp_full_match(CAST({field} AS VARCHAR), '{_validate_bucket_regexp(include)}')"
        )
    if exclude is not None:
        where.append(
            f"NOT regexp_full_match(CAST({field} AS VARCHAR), '{_validate_bucket_regexp(exclude)}')"
        )
    having = f"HAVING count(*) >= {int(min_doc_count)}" if int(min_doc_count) > 1 else ""
    key, dr = order or ("_count", "desc")
    if key not in ("_count", "_term") or dr not in ("asc", "desc"):
        raise ValueError(f"terms order must be (_count|_term, asc|desc), got {order!r}")
    order_by = (
        f"value {dr.upper()}" if key == "_term"
        else f"count(*) {dr.upper()}, value ASC"
    )
    return f"""
SELECT {field} AS value, count(*) AS count
FROM {table}
WHERE {" AND ".join(where)}
GROUP BY {field}
{having}
ORDER BY {order_by}
LIMIT {int(size)}
"""


def stats_facet_sql(
    query: str | None,
    field: str,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    return f"""
SELECT count(*) AS count, min({field}) AS min, max({field}) AS max,
       round(CAST(sum({field}) AS DOUBLE), 6) AS sum,
       round(CAST(avg({field}) AS DOUBLE), 6) AS avg
FROM {table}
WHERE {_match_sql(query, mode, stopwords, analyzer)}
"""


def date_histogram_facet_sql(
    ts_col: str = "ts",
    interval: str = "day",
    where_sql: str | None = None,
    value_col: str | None = None,
    table: str = "events",
) -> str:
    if interval not in _DATE_UNITS:
        raise ValueError(f"interval must be one of {_DATE_UNITS}, got {interval!r}")
    stats = ""
    if value_col is not None:
        stats = f""",
       round(CAST(min({value_col}) AS DOUBLE), 6) AS min,
       round(CAST(max({value_col}) AS DOUBLE), 6) AS max,
       round(CAST(sum({value_col}) AS DOUBLE), 6) AS sum,
       round(CAST(avg({value_col}) AS DOUBLE), 6) AS avg"""
    # DuckDB date_trunc returns DATE for day-and-coarser units; Spark always
    # returns timestamp — cast for cross-engine value equality
    return f"""
SELECT CAST(date_trunc('{interval}', {ts_col}) AS TIMESTAMP) AS bucket,
       count(*) AS count{stats}
FROM {table}
WHERE {where_sql or 'TRUE'}
GROUP BY 1
ORDER BY bucket
"""


def terms_stats_facet_sql(
    key_field: str,
    value_field: str,
    size: int = 10,
    where_sql: str | None = None,
    table: str = "events",
) -> str:
    return f"""
SELECT {key_field} AS term, count(*) AS count,
       round(CAST(min({value_field}) AS DOUBLE), 6) AS min,
       round(CAST(max({value_field}) AS DOUBLE), 6) AS max,
       round(CAST(sum({value_field}) AS DOUBLE), 6) AS total,
       round(CAST(avg({value_field}) AS DOUBLE), 6) AS mean
FROM {table}
WHERE {where_sql or 'TRUE'}
GROUP BY 1
ORDER BY count(*) DESC, term ASC
LIMIT {int(size)}
"""


def histogram_facet_sql(
    query: str | None,
    field: str,
    interval: int,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    min_doc_count: int = 1,
    extended_bounds: tuple[float, float] | None = None,
) -> str:
    if extended_bounds is not None and int(min_doc_count) != 0:
        raise ValueError("extended_bounds only applies with min_doc_count=0 (ES)")
    i = int(interval)
    bucket = f"CAST(floor({field} / {i}) AS BIGINT) * {i}"
    base = f"""
SELECT {bucket} AS bucket, count(*) AS count
FROM {table}
WHERE {_match_sql(query, mode, stopwords, analyzer)}
GROUP BY 1
"""
    if int(min_doc_count) == 0:
        lo, hi = "min(bucket)", "max(bucket)"
        if extended_bounds is not None:
            bmin, bmax = extended_bounds
            blo, bhi = int(bmin // i) * i, int(bmax // i) * i
            lo = f"least(coalesce(min(bucket), {blo}), {blo})"
            hi = f"greatest(coalesce(max(bucket), {bhi}), {bhi})"
        return f"""
WITH c AS ({base}),
lim AS (SELECT CAST({lo} AS BIGINT) AS lo, CAST({hi} AS BIGINT) AS hi FROM c),
spine AS (
  SELECT unnest(generate_series(lo, hi, {i})) AS bucket FROM lim
  WHERE lo IS NOT NULL
)
SELECT s.bucket, CAST(coalesce(c.count, 0) AS BIGINT) AS count
FROM spine s LEFT JOIN c USING (bucket)
ORDER BY bucket
"""
    having = (
        f"HAVING count(*) >= {int(min_doc_count)}" if int(min_doc_count) > 1 else ""
    )
    return base + having + "\nORDER BY bucket\n"


def date_range_facet(
    df: DataFrame,
    ts_col: str = "ts",
    ranges: list[dict] | None = None,
    where: Column | None = None,
) -> DataFrame:
    """ES ``date_range`` agg: doc counts per [from, to) timestamp window
    (ISO strings; from inclusive, to exclusive, open ends allowed — ES
    semantics, same as the numeric range agg). ONE pass, counts as
    map-side-combined conditional sums — no row shuffle; empty and
    overlapping windows behave exactly like the range agg.

    Timestamp literals are cast to the COLUMN's own type (the
    TIMESTAMP/TIMESTAMP_NTZ split between engines never reaches the
    comparison)."""
    if not ranges:
        raise ValueError("date_range needs at least one range")
    ts_type = df.schema[ts_col].dataType
    src = df if where is None else df.where(where)
    aggs, keys = [], []
    for r in ranges:
        extra = set(r) - {"from", "to", "key"}
        if extra:
            raise ValueError(f"date_range keys {sorted(extra)}")
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("date_range range needs from and/or to")
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(ts_col) >= F.lit(str(lo)).cast(ts_type))
        if hi is not None:
            cond = cond & (F.col(ts_col) < F.lit(str(hi)).cast(ts_type))
        key = r.get("key", f"{lo or '*'}-{hi or '*'}")
        if key in keys:
            raise ValueError(f"duplicate date_range key {key!r}")
        keys.append(key)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"c{len(aggs)}"))
    row = src.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(k).alias("range_key"),
                 F.col(f"c{i}").cast("long").alias("doc_count"))
        for i, k in enumerate(keys)
    ])
    return row.select(F.explode(pairs).alias("x")).select("x.*")


def date_range_facet_sql(
    ts_col: str = "ts",
    ranges: list[dict] | None = None,
    where_sql: str | None = None,
    table: str = "events",
) -> str:
    """DuckDB oracle for :func:`date_range_facet`."""
    if not ranges:
        raise ValueError("date_range needs at least one range")
    where = where_sql or "TRUE"
    selects = []
    seen = set()
    for r in ranges:
        extra = set(r) - {"from", "to", "key"}
        if extra:
            raise ValueError(f"date_range keys {sorted(extra)}")
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("date_range range needs from and/or to")
        conds = [where]
        if lo is not None:
            conds.append(f"{ts_col} >= CAST('{lo}' AS TIMESTAMP)")
        if hi is not None:
            conds.append(f"{ts_col} < CAST('{hi}' AS TIMESTAMP)")
        key = r.get("key", f"{lo or '*'}-{hi or '*'}")
        if key in seen:
            raise ValueError(f"duplicate date_range key {key!r}")
        seen.add(key)
        selects.append(
            f"SELECT '{key}' AS range_key, "
            f"(SELECT count(*) FROM {table} WHERE {' AND '.join(conds)}) AS doc_count"
        )
    return "\nUNION ALL\n".join(selects)
