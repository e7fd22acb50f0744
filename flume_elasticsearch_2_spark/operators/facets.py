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
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    lst = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    fn = "list_has_any" if mode == "or" else "list_has_all"
    return f"{fn}({tok_expr}, {lst})"


def terms_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    size: int = 10,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """(value, count) — top-``size`` field values over the match set."""
    return (
        docs.where(match_condition(query, mode, text_col, stopwords, analyzer))
        .groupBy(F.col(field).alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc())
        .limit(int(size))
    )


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


def histogram_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    interval: int,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """(bucket, count) at ``floor(field/interval)*interval``, bucket-ordered
    (ES histogram facet default order)."""
    bucket = (F.floor(F.col(field) / F.lit(int(interval))) * int(interval)).cast("long")
    return (
        docs.where(match_condition(query, mode, text_col, stopwords, analyzer))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("count"))
        .orderBy("bucket")
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
) -> str:
    return f"""
SELECT {field} AS value, count(*) AS count
FROM {table}
WHERE {_match_sql(query, mode, stopwords, analyzer)}
GROUP BY {field}
ORDER BY count(*) DESC, value ASC
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


def histogram_facet_sql(
    query: str | None,
    field: str,
    interval: int,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    bucket = f"CAST(floor({field} / {int(interval)}) AS BIGINT) * {int(interval)}"
    return f"""
SELECT {bucket} AS bucket, count(*) AS count
FROM {table}
WHERE {_match_sql(query, mode, stopwords, analyzer)}
GROUP BY 1
ORDER BY bucket
"""
