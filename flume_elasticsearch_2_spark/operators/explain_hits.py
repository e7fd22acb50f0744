"""ES search with ``"explain": true`` (SURVEY §2.5, Q20 companion): the
per-HIT score explanation — every hit of a match query carries its full
per-term BM25 breakdown, the flattened form of the Lucene Explanation
tree ES attaches to each hit.

Reference analog: the `explain` request flag of the delegated ES search
(delegation site ElasticsearchSink.java:54,66); `operators/explain.py`
covers the single-document `_explain` endpoint — this is the same row
contract joined onto the hit page:

    (doc_id, score, term, qw, tf, df, dl, idf, partial)

with ``partial`` as in explain.py and ``sum(partial per doc) == score``
(the pinned Q20 identity, now per hit).

Scale shape (declarative): the hit page is k rows — it BROADCAST-joins
back to the corpus (the ES fetch phase), per-term tf/dl are JVM array
expressions in that one projection, and the per-term rows come from
exploding a k×|terms| struct array — O(k·|terms|) rows. Honest cost note:
this path runs TWO corpus-wide aggregations (bm25_topk's internal stats
pass for the page, plus the breakdown's df/n/avgdl pass — bm25_topk does
not expose its stats), i.e. the debug surface costs one extra narrow scan;
the serving path pays neither (dictionary + manifest constants). Serving: the hit page comes from
the ordinary BMW scatter, then each hit's breakdown is the metadata-scale
``IndexSearcher.explain`` decode (k bounded by the window cap — exactly
ES, which explains hits in the fetch phase per shard)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1
from ..functions.rounding import round_half_up6
from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col

_OUT_SCHEMA = (
    "doc_id long, score double, term string, qw double, tf double, df long, "
    "dl long, idf double, partial double"
)


def search_explain(
    docs: DataFrame,
    query: str,
    k: int = 10,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k match with per-hit explanation rows, ordered (score DESC,
    doc_id ASC, term ASC)."""
    from .topk import bm25_topk

    spark = docs.sparkSession
    q_terms = tokenize(query)
    if not q_terms:
        return spark.createDataFrame([], _OUT_SCHEMA)
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + float((boosts or {}).get(t, 1.0))
    terms = sorted(weights)

    hits = bm25_topk(
        docs, query, k=k, id_col=id_col, text_col=text_col, mode=mode,
        k1=k1, b=b, boosts=boosts,
    )

    toks = tokens_col(text_col)
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
        return spark.createDataFrame([], _OUT_SCHEMA)
    df_map = {t: int(stats[f"df_{i}"]) for i, t in enumerate(terms)}
    idf = {
        t: math.log(1.0 + (n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
        for t in terms
    }

    # hits derives from docs — alias its columns so the self-join resolves
    # on unambiguous names (the k-row page is the broadcast side)
    page = hits.select(F.col("doc_id").alias("__hid"), F.col("score").alias("__hscore"))
    joined = docs.join(F.broadcast(page), docs[id_col] == F.col("__hid")).select(
        F.col("__hid").alias("doc_id"), F.col("__hscore").alias("score"),
        F.size(toks).cast("long").alias("dl"), toks.alias("__toks"),
    )
    dl = F.col("e_dl").cast("double")
    structs = []
    for t in terms:
        if df_map[t] <= 0:
            continue
        # plain single-arg closure: F.filter resolves the lambda EAGERLY, so
        # the loop variable capture is safe; a default-arg capture would make
        # PySpark introspect arity 2 = an (element, index) lambda (house trap)
        tf = F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t))).cast("double")
        structs.append(
            F.struct(
                F.lit(t).alias("term"),
                F.lit(float(weights[t])).alias("qw"),
                tf.alias("tf"),
                F.lit(df_map[t]).cast("long").alias("df"),
                F.lit(round_half_up6(idf[t])).alias("idf"),
                # the exact breakdown_rows operation order: qw*idf*tf*(k1+1)
                # / (tf + k1*(1 - b + b*dl/avgdl)); unrounded idf inside
                (
                    F.lit(float(weights[t])) * F.lit(idf[t]) * tf * F.lit(k1 + 1.0)
                    / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl)))
                ).alias("partial_raw"),
            )
        )
    if not structs:
        return spark.createDataFrame([], _OUT_SCHEMA)
    return (
        joined.withColumnRenamed("dl", "e_dl")
        .select(
            "doc_id", "score", "e_dl", F.explode(F.array(*structs)).alias("e")
        )
        .where(F.col("e.tf") > 0)
        .select(
            "doc_id", "score", F.col("e.term").alias("term"),
            F.col("e.qw").alias("qw"), F.col("e.tf").alias("tf"),
            F.col("e.df").alias("df"), F.col("e_dl").alias("dl"),
            F.col("e.idf").alias("idf"),
            F.round("e.partial_raw", 6).alias("partial"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
    )


def search_explain_sql(
    query: str,
    k: int = 10,
    mode: str = "or",
    k1: float = K1,
    b: float = B,
    boosts: dict[str, float] | None = None,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`search_explain`: the bm25 top-k SQL as the
    hit CTE + the explain breakdown joined per hit (identical operation
    order)."""
    from .topk import bm25_topk_sql

    q_terms = tokenize(query)
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + float((boosts or {}).get(t, 1.0))
    terms_values = ", ".join(f"('{t}', {w!r})" for t, w in sorted(weights.items()))
    in_list = ", ".join(f"'{t}'" for t in sorted(weights))
    hits_sql = bm25_topk_sql(query, k=k, mode=mode, table=table, boosts=boosts)
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern('ascii')}')"
    partial = (
        f"q.qw * ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf "
        f"* {k1 + 1.0!r} / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl_t.dl / s.avgdl))"
    )
    return f"""
WITH hits AS (SELECT * FROM ({hits_sql})),
toks_all AS (SELECT doc_id, unnest({tok_expr}) AS term FROM {table}),
dl_t AS (SELECT doc_id, len({tok_expr}) AS dl FROM {table}),
s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl_t),
q(term, qw) AS (VALUES {terms_values}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks_all
  WHERE term IN ({in_list}) GROUP BY term
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks_all
  WHERE term IN ({in_list}) AND doc_id IN (SELECT doc_id FROM hits)
  GROUP BY doc_id, term
)
SELECT hits.doc_id, hits.score, q.term,
       CAST(q.qw AS DOUBLE) AS qw, CAST(tf.tf AS DOUBLE) AS tf,
       dfreq.df AS df, dl_t.dl AS dl,
       round(ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6) AS idf,
       round({partial}, 6) AS partial
FROM hits
JOIN tf ON tf.doc_id = hits.doc_id
JOIN q ON q.term = tf.term
JOIN dfreq ON dfreq.term = tf.term
JOIN dl_t ON dl_t.doc_id = hits.doc_id
CROSS JOIN s
ORDER BY hits.score DESC, hits.doc_id ASC, q.term ASC
"""


def search_explain_index(
    searcher,
    query: str,
    k: int = 10,
    mode: str = "or",
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """SERVING path: the ordinary BMW scatter produces the hit page, then
    each hit's breakdown is the metadata-scale ``IndexSearcher.explain``
    decode (k is window-capped — exactly ES's fetch-phase explain)."""
    hits = searcher.search(query, k=k, mode=mode, boosts=boosts).collect()
    spark = searcher.spark
    rows = []
    for h in hits:
        for r in searcher.explain(query, int(h["doc_id"]), boosts=boosts).collect():
            rows.append(
                (int(h["doc_id"]), float(h["score"]), r["term"], r["qw"], r["tf"],
                 r["df"], r["dl"], r["idf"], r["partial"])
            )
    out = spark.createDataFrame(rows, _OUT_SCHEMA)
    return out.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
