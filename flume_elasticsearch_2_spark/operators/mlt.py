"""ES ``more_like_this`` query (SURVEY §2.5): find documents similar to a
given document or free text.

Reference analog: the ES 1.x MLT query surface behind the sink (delegation
site ElasticsearchSink.java:54). Semantics per Lucene's ``MoreLikeThis``
term-selection contract:

1. **Term selection**: analyze the source ("like") text; keep terms with
   within-doc ``tf >= min_term_freq`` and corpus ``df >= min_doc_freq``;
   rank by the ClassicSimilarity interestingness score
   ``tf * (ln(n_docs / (df + 1)) + 1)`` (Lucene ``MoreLikeThis`` +
   ``DefaultSimilarity.idf``) and keep the top ``max_query_terms``
   (deterministic ``(score DESC, term ASC)`` tiebreak — Lucene's priority
   queue breaks ties arbitrarily; ours is pinned for reproducibility).
2. **Query**: OR-of-selected-terms BM25 (each selected term once, weight 1
   — ``boost_terms`` defaults off in ES), excluding the source document
   itself (ES ``include=false`` default) via the bool-filter path, so
   idf/avgdl/N stay index-wide.

Scale shape (declarative): fetching the source doc is an id-pruned scan (the
ES GET analog); candidate dfs come from ONE exploded-distinct aggregation
restricted to the source doc's terms (map-side combine, ≤ |source vocab|
rows shuffled); the scoring pass is the existing two-narrow-pass
:func:`~.topk.bm25_topk` plan. Nothing quadratic, no corpus re-scan beyond
the two passes every match query already does. On the serving path
(plans/query_index.py ``IndexSearcher.more_like_this``) the dfs come from a
term-pruned read of the prebuilt global ``terms/`` dictionary and n_docs
from the manifest — term selection costs ZERO corpus passes there.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col
from .topk import bm25_topk

MAX_QUERY_TERMS = 25  # ES/Lucene default
MIN_TERM_FREQ = 2  # ES default
MIN_DOC_FREQ = 5  # ES default


def interestingness(tf: int, df: int, n_docs: int) -> float:
    """Lucene MoreLikeThis term score: tf * (idf + 1), ClassicSimilarity
    idf = ln(n_docs / (df + 1))."""
    return float(tf) * (math.log(float(n_docs) / (float(df) + 1.0)) + 1.0)


def select_mlt_terms(
    src_tf: dict[str, int],
    dfreq: dict[str, int],
    n_docs: int,
    max_query_terms: int = MAX_QUERY_TERMS,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
) -> list[str]:
    """Shared selection kernel: rank candidate terms by interestingness,
    apply the tf/df floors, keep the top ``max_query_terms``. Returns the
    selected terms sorted alphabetically (their BM25 weight is uniform, so
    order only affects the query string, not the result)."""
    cand = [
        (t, tf)
        for t, tf in src_tf.items()
        if tf >= min_term_freq and dfreq.get(t, 0) >= min_doc_freq
    ]
    cand.sort(key=lambda tt: (-interestingness(tt[1], dfreq[tt[0]], n_docs), tt[0]))
    return sorted(t for t, _ in cand[: int(max_query_terms)])


def more_like_this(
    docs: DataFrame,
    like_id: int | None = None,
    like_text: str | None = None,
    k: int = 10,
    max_query_terms: int = MAX_QUERY_TERMS,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
    include: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``more_like_this``, declarative path. Provide ``like_id`` (an
    indexed document — fetched by id, the ES GET analog) or ``like_text``
    (free text). Returns top-k (doc_id, score); with ``like_id`` the source
    doc is excluded unless ``include=True`` (the ES default)."""
    if (like_id is None) == (like_text is None):
        raise ValueError("provide exactly one of like_id / like_text")
    if like_text is None:
        rows = docs.where(F.col(id_col) == int(like_id)).select(text_col).collect()
        if not rows:
            return docs.sparkSession.createDataFrame([], "doc_id long, score double")
        like_text = rows[0][0] or ""
    src_tf = Counter(tokenize(like_text, stopwords, analyzer))
    cand = sorted(t for t, c in src_tf.items() if c >= min_term_freq)
    if not cand:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")

    toks = tokens_col(text_col, stopwords, analyzer)
    dfreq = {
        r["term"]: int(r["df"])
        for r in (
            docs.select(F.explode(F.array_distinct(toks)).alias("term"))
            .where(F.col("term").isin(cand))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        )
    }
    n_docs = docs.count()
    sel = select_mlt_terms(src_tf, dfreq, n_docs, max_query_terms, min_term_freq, min_doc_freq)
    if not sel:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    doc_filter = None
    if like_id is not None and not include:
        doc_filter = F.col(id_col) != int(like_id)
    return bm25_topk(
        docs,
        " ".join(sel),
        k=k,
        id_col=id_col,
        text_col=text_col,
        doc_filter=doc_filter,
        stopwords=stopwords,
        analyzer=analyzer,
    )


def more_like_this_sql(
    like_id: int,
    k: int = 10,
    max_query_terms: int = MAX_QUERY_TERMS,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
    include: bool = False,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`more_like_this` (``like_id`` form): the full
    pipeline — term selection (same interestingness formula; both engines
    evaluate it in IEEE float64 with the same operation order, so the
    deterministic tiebreak agrees) + the BM25 scoring block structurally
    identical to :func:`~.topk.bm25_topk_sql` with qterms coming from the
    selection CTE instead of literals."""
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    excl = "" if include else f"WHERE doc_id <> {int(like_id)}"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dl AS (
  SELECT doc_id, len({tok_expr}) AS dl FROM {table}
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
src_tf AS (
  SELECT term, count(*) AS tf FROM toks WHERE doc_id = {int(like_id)}
  GROUP BY term HAVING count(*) >= {int(min_term_freq)}
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN (SELECT term FROM src_tf) GROUP BY term
),
qterms AS (
  SELECT s.term, CAST(1.0 AS DOUBLE) AS qw
  FROM src_tf s JOIN dfreq d USING (term) CROSS JOIN stats
  WHERE d.df >= {int(min_doc_freq)}
  ORDER BY s.tf * (ln(CAST(stats.n_docs AS DOUBLE) / (d.df + 1)) + 1) DESC, s.term ASC
  LIMIT {int(max_query_terms)}
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         qterms.qw * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS partial
  FROM tf
  JOIN dfreq USING (term) JOIN qterms USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
{excl}
GROUP BY doc_id
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT {int(k)}
"""
