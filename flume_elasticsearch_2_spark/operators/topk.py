"""DataFrame-native BM25 top-k retrieval (SURVEY.md §2.5 Q1-Q4, Q6-Q7).

This is the declarative query path: the whole plan — tokenize, explode,
tf/df/dl aggregation, scoring, top-k — is expressed with built-in Spark SQL
functions so Catalyst handles pushdown/pruning and the limit+sort collapses
to ``TakeOrderedAndProject`` (per-partition top-k + driver merge, the exact
scatter/gather shape of ES query-then-fetch, SURVEY §2.5 Q6). No Python UDFs.

The segment-backed fast path (pre-built compressed index, BMW pruning) lives
in ``plans/query_index.py``; both must return rank-identical results.

Replaces the [delegated] ES query layer at the reference delegation site
/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66-67.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1, bm25_col
from ..functions.tokenizer import tokenize, tokens_col


def corpus_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) one row per token occurrence — the exploded analysis."""
    return docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")).select(
        "doc_id", F.explode("toks").alias("term")
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl) — token count per doc, computed without exploding."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens_col(text_col)).cast("long").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "or",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k BM25 over a document DataFrame, pure declarative plan.

    ES ``match`` semantics: OR-of-terms scored sum (SURVEY §2.5 Q3); ``mode=
    'and'`` keeps only docs containing every distinct query term. Duplicate
    query terms accumulate per occurrence (FIXTURES.md §4). Deterministic
    tie-break ``(-score, doc_id)`` (Q7). Scores rounded to 6 decimals in the
    output for cross-engine hash stability; ordering uses the exact float64.
    """
    q_terms = tokenize(query)
    if not q_terms:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    # weight = number of occurrences of the term in the query
    weights = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0) + 1
    distinct_terms = sorted(weights)

    toks = corpus_tokens(docs, id_col, text_col)
    dl = doc_lengths(docs, id_col, text_col)
    # global stats over the full corpus (SURVEY §2.4 I6); tiny → broadcast via
    # scalar subquery-style crossJoin of a 1-row DF
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # df over the full corpus restricted to query terms (all that scoring needs)
    dfreq = (
        toks.where(F.col("term").isin(distinct_terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    tf = (
        toks.where(F.col("term").isin(distinct_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    w = docs.sparkSession.createDataFrame(
        [(t, float(c)) for t, c in sorted(weights.items())], "term string, qw double"
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(w), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "partial",
            F.col("qw")
            * bm25_col(F.col("tf"), F.col("df"), F.col("dl"), F.col("n_docs"), F.col("avgdl"), k1, b),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score_exact"), F.countDistinct("term").alias("nterms")
    )
    if mode == "and":
        agg = agg.where(F.col("nterms") == len(distinct_terms))
    return (
        agg.orderBy(F.col("score_exact").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("score_exact", 6).alias("score"))
    )


def bm25_topk_sql(query: str, k: int = 10, mode: str = "or", table: str = "documents") -> str:
    """DuckDB oracle SQL equivalent of :func:`bm25_topk` (same rounding)."""
    q_terms = tokenize(query)
    weights: dict[str, int] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0) + 1
    terms_values = ", ".join(f"('{t}', {c}.0)" for t, c in sorted(weights.items()))
    in_list = ", ".join(f"'{t}'" for t in sorted(weights))
    and_filter = f"HAVING count(DISTINCT term) = {len(weights)}" if mode == "and" else ""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM {table}
),
dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl FROM {table}
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term, qw) AS (VALUES {terms_values}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ({in_list}) GROUP BY term
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         qterms.qw * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS partial,
         tf.term
  FROM tf
  JOIN dfreq USING (term) JOIN qterms USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
GROUP BY doc_id
{and_filter}
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT {k}
"""
