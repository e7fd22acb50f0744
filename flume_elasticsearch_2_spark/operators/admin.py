"""ES document-fetch + index-admin APIs (SURVEY §2.5): ``_mget`` (stored
fields by id) and ``_stats`` (index-level statistics).

Reference analog: the ES GET/mget and index-stats surfaces behind the sink
(delegation site ElasticsearchSink.java:54; SystemUtil.java's client issues
the same transport calls). Both are metadata/fetch-scale — no scoring.

Scale shape: ``mget`` is an id-IN-list read — on both paths the predicate
reaches the Parquet scan (``PushedFilters: In(doc_id ...)``), so row-group
stats skip everything but the owning ranges; doc-range sharding means the
ids' row groups cluster in few shards. ``_stats`` aggregates the corpus in
one exploded-distinct pass (declarative) or reads the prebuilt dictionary +
manifest (serving — zero corpus passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokens_col

MGET_COLS = ["doc_id", "lang", "n_chars", "text"]


def mget(
    docs: DataFrame,
    ids: list[int],
    columns: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``_mget``: stored fields for the given ids, id-ascending (missing
    ids simply absent, the ES found=false analog)."""
    cols = columns or MGET_COLS
    ids = sorted({int(i) for i in ids})
    return (
        docs.where(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"), *[c for c in cols if c != id_col])
        .orderBy("doc_id")
    )


def mget_sql(ids: list[int], columns: list[str] | None = None, table: str = "documents") -> str:
    """DuckDB oracle for :func:`mget`."""
    cols = columns or MGET_COLS
    id_list = ", ".join(str(int(i)) for i in sorted({int(i) for i in ids}))
    return (
        f"SELECT {', '.join(cols)} FROM {table} "
        f"WHERE doc_id IN ({id_list}) ORDER BY doc_id"
    )


def corpus_index_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``_stats`` computed from the corpus (the declarative twin of the
    index-backed :meth:`IndexSearcher.index_stats`): one row
    ``(n_docs, avgdl, n_terms, n_postings)`` where n_postings counts
    distinct (doc, term) pairs — the posting-entry count of the index this
    corpus builds. One exploded-distinct aggregation + one narrow agg."""
    toks = tokens_col(text_col, stopwords, analyzer)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    dl_stats = base.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size("toks")), 6).alias("avgdl"),
    )
    post = base.select("doc_id", F.explode(F.array_distinct("toks")).alias("term")).agg(
        F.count_distinct("term").alias("n_terms"),
        F.count("*").cast("long").alias("n_postings"),
    )
    return dl_stats.crossJoin(post)


def index_stats_sql(
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`corpus_index_stats` /
    :meth:`IndexSearcher.index_stats`."""
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH post AS (
  SELECT DISTINCT doc_id, unnest({tok_expr}) AS term FROM {table}
)
SELECT (SELECT count(*) FROM {table}) AS n_docs,
       (SELECT round(avg(len({tok_expr})), 6) FROM {table}) AS avgdl,
       count(DISTINCT term) AS n_terms,
       CAST(count(*) AS BIGINT) AS n_postings
FROM post
"""
