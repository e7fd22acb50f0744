"""ES ``_explain`` API (SURVEY §2.5): the per-term score breakdown for one
(query, document) pair.

Reference analog: the ES 1.x explain surface behind the sink (delegation
site ElasticsearchSink.java:54). ES returns a nested Lucene Explanation
tree; the information content for BM25 is flat — one row per query term
present in BOTH the query and the document, carrying every number in the
scoring formula — so that is the contract here (and it makes the whole API
SQL-oracle-checkable, which the nested-JSON form would not be):

    (term, qw, tf, df, dl, idf, partial)

where ``partial = qw * idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` and
``sum(partial) == the hit's score`` in :func:`~.topk.bm25_topk` (pinned by
a test). Terms with tf=0 in the doc are omitted (they contribute nothing —
same as Lucene's "no match on this clause" sub-explanation).

Scale shape: the whole computation is the same ONE-row-per-doc projection
the match query uses, restricted to the explained id — an id-pruned scan +
a 1-row stats aggregation; nothing shuffles. On the serving path
(``IndexSearcher.explain``) df/n_docs/avgdl come from the dictionary and
manifest, and tf comes from decoding only the explained doc's shard
postings for the query terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1
from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col

_SCHEMA = (
    "term string, qw double, tf double, df long, dl long, idf double, partial double"
)


def explain_score(
    docs: DataFrame,
    query: str,
    doc_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """ES ``_explain``: per-term BM25 breakdown for one document, one row
    per query term present in the doc, ordered by term. ``sum(partial)``
    equals the doc's :func:`~.topk.bm25_topk` score exactly (same float64
    operation order); idf/avgdl/N are index-wide as always."""
    spark = docs.sparkSession
    q_terms = tokenize(query, stopwords, analyzer)
    if not q_terms:
        return spark.createDataFrame([], _SCHEMA)
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + float((boosts or {}).get(t, 1.0))
    terms = sorted(weights)

    toks = tokens_col(text_col, stopwords, analyzer)
    # one corpus aggregation -> n_docs, avgdl, df per term (driver constants)
    stats = docs.select(
        F.size(toks).cast("long").alias("dl"),
        *[
            F.array_contains(toks, t).cast("long").alias(f"has_{i}")
            for i, t in enumerate(terms)
        ],
    ).agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(f"has_{i}").alias(f"df_{i}") for i in range(len(terms))],
    ).collect()[0]
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0
    if n_docs == 0 or avgdl == 0.0:
        return spark.createDataFrame([], _SCHEMA)

    # id-pruned scan of the one explained doc -> tf per term + dl
    row = (
        docs.where(F.col(id_col) == int(doc_id))
        .select(
            F.size(toks).cast("long").alias("dl"),
            *[
                F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double").alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
        )
        .collect()
    )
    if not row:
        return spark.createDataFrame([], _SCHEMA)
    return breakdown_rows(
        spark,
        terms,
        weights,
        {t: float(row[0][f"tf_{i}"]) for i, t in enumerate(terms)},
        {t: int(stats[f"df_{i}"]) for i, t in enumerate(terms)},
        int(row[0]["dl"]),
        n_docs,
        avgdl,
        k1,
        b,
    )


def breakdown_rows(
    spark,
    terms: list[str],
    weights: dict[str, float],
    tf: dict[str, float],
    df: dict[str, int],
    dl: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Driver-side assembly of the explanation rows (shared by both paths —
    the arithmetic lives in exactly one place)."""
    import math

    from ..functions.rounding import round_half_up6

    out = []
    for t in terms:
        tft, dft = tf.get(t, 0.0), df.get(t, 0)
        if tft <= 0 or dft <= 0:
            continue
        idf = math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
        partial = (
            weights[t] * idf * tft * (k1 + 1.0)
            / (tft + k1 * (1.0 - b + b * float(dl) / avgdl))
        )
        out.append(
            (t, float(weights[t]), float(tft), int(dft), int(dl),
             round_half_up6(idf), round_half_up6(partial))
        )
    return spark.createDataFrame(out, _SCHEMA)


def explain_score_sql(
    query: str,
    doc_id: int | str,
    table: str = "documents",
    k1: float = K1,
    b: float = B,
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    boosts: dict[str, float] | None = None,
) -> str:
    """DuckDB oracle for :func:`explain_score`. ``doc_id`` may be an int or
    a SQL scalar-subquery string (e.g. the top-1 hit of a query), letting
    the oracle pin the same doc the Spark entry picks without hardcoding."""
    q_terms = tokenize(query, stopwords, analyzer)
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + float((boosts or {}).get(t, 1.0))
    terms_values = ", ".join(f"('{t}', {w!r})" for t, w in sorted(weights.items()))
    in_list = ", ".join(f"'{t}'" for t in sorted(weights))
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    did = f"({doc_id})" if isinstance(doc_id, str) else str(int(doc_id))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dl_t AS (SELECT doc_id, len({tok_expr}) AS dl FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl_t),
qterms(term, qw) AS (VALUES {terms_values}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ({in_list}) GROUP BY term
),
tf AS (
  SELECT term, count(*) AS tf FROM toks
  WHERE doc_id = {did} AND term IN ({in_list}) GROUP BY term
)
SELECT qterms.term AS term,
       CAST(qterms.qw AS DOUBLE) AS qw,
       CAST(tf.tf AS DOUBLE) AS tf,
       dfreq.df AS df,
       dl_t.dl AS dl,
       round(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6) AS idf,
       round(qterms.qw * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * ({k1!r} + 1.0)
             / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl_t.dl / stats.avgdl)), 6) AS partial
FROM qterms
JOIN tf USING (term) JOIN dfreq USING (term)
CROSS JOIN stats
JOIN dl_t ON dl_t.doc_id = {did}
ORDER BY term
"""
