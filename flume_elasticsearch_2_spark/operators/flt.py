"""ES 1.x ``fuzzy_like_this`` (FLT): free-text query where every analyzed
term also matches its close misspellings (SURVEY §2.5; reference delegation
site ElasticsearchSink.java:54 — the deployed ES 1.1 exposes
``fuzzy_like_this`` / ``fuzzy_like_this_field``).

Pinned contract (the exactly-reproducible subset; divergences from Lucene's
FuzzyLikeThisQuery are documented, never silent):

* source terms = the first ``max_query_terms`` DISTINCT analyzed terms of
  ``like_text`` in order of appearance (the ES source-term cap);
* expansion = every dictionary term within ``fuzziness`` whole-term edit
  distance of ANY source term, with the exact-``prefix_length`` guard —
  UNCAPPED (Lucene blends per-variant idf through a shared priority queue,
  making scores queue-order-dependent; this engine scores the plain
  expanded OR — the multiterm ``scoring_boolean`` rewrite — which is
  deterministic and engine-checkable);
* scoring = BM25 over the sorted distinct expansion set (each expanded
  term weight 1), identical on the declarative, serving, and oracle paths.

Scale shape (declarative): ONE dictionary aggregation (explode of
array_distinct'd tokens → map-side-combined df) filtered by the OR of
per-source-term Levenshtein predicates, collected (vocabulary-scale, the
same two-job shape as ``expand_pattern``); then the ordinary two-pass
bm25_topk plan. Serving: per-source-term range-pruned ``terms/`` dictionary
reads (``prefix_length`` > 0 prunes; 0 scans the dictionary — vocabulary,
not corpus), then one BMW scatter on the union query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col
from .multiterm import term_match_cond, term_match_sql
from .topk import bm25_topk

__all__ = ["flt_source_terms", "fuzzy_like_this_topk", "fuzzy_like_this_sql"]


def flt_source_terms(
    like_text: str,
    max_query_terms: int = 25,
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> list[str]:
    """First ``max_query_terms`` distinct analyzed terms, in order of
    appearance — computed driver-side so every engine sees the same list."""
    if max_query_terms < 1:
        raise ValueError("max_query_terms must be >= 1")
    seen: list[str] = []
    for t in tokenize(like_text, stopwords=stopwords, analyzer=analyzer):
        if t not in seen:
            seen.append(t)
            if len(seen) >= max_query_terms:
                break
    return seen


def fuzzy_like_this_topk(
    docs: DataFrame,
    like_text: str,
    k: int = 10,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_query_terms: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """Declarative FLT: dictionary expansion + BM25 over the expanded OR."""
    if fuzziness < 0 or prefix_length < 0:
        raise ValueError("fuzziness and prefix_length must be non-negative")
    src = flt_source_terms(like_text, max_query_terms, stopwords, analyzer)
    spark = docs.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not src:
        return empty
    toks = tokens_col(text_col, stopwords, analyzer)
    cond = None
    for t in src:
        c = term_match_cond(t, "fuzzy", fuzziness, prefix_length)
        cond = c if cond is None else (cond | c)
    rows = (
        docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(cond)
        .select("term")
        .collect()
    )
    expanded = sorted(r["term"] for r in rows)
    if not expanded:
        return empty
    return bm25_topk(
        docs, " ".join(expanded), k=k, mode="or", id_col=id_col,
        text_col=text_col, stopwords=stopwords, analyzer=analyzer,
    )


def fuzzy_like_this_sql(
    like_text: str,
    k: int = 10,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_query_terms: int = 25,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`fuzzy_like_this_topk` — the expansion is
    recomputed IN SQL (dictionary CTE + the same OR of Levenshtein
    predicates), so expansion and scoring are both cross-checked."""
    if fuzziness < 0 or prefix_length < 0:
        raise ValueError("fuzziness and prefix_length must be non-negative")
    src = flt_source_terms(like_text, max_query_terms, stopwords, analyzer)
    if not src:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    match_or = " OR ".join(
        f"({term_match_sql(t, 'fuzzy', fuzziness, prefix_length)})" for t in src
    )
    return f"""
WITH dterm AS (
  SELECT DISTINCT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dict AS (SELECT term, count(*) AS df FROM dterm GROUP BY term),
expanded AS (SELECT term, df FROM dict WHERE {match_or}),
toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dl AS (SELECT doc_id, len({tok_expr}) AS dl FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  JOIN expanded USING (term) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n_docs - expanded.df + 0.5) / (expanded.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS partial
  FROM tf
  JOIN expanded USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
GROUP BY doc_id
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT {int(k)}
"""
