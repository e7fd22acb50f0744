"""Hybrid retrieval: reciprocal-rank fusion of BM25 and vector top-k.

The modern retrieval stack the engine's corpus serves (RAG / semantic
search over web text) fuses a lexical ranking with an embedding ranking;
RRF (Cormack, Clarke & Buettcher 2009, public) is the standard
score-free fusion: ``rrf(d) = Σ_lists 1 / (c + rank_list(d))`` with
c = 60. The reference delegates all ranking to ES
(/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66-67);
this is the composition layer over the engine's own bm25_topk and
cosine_topk.

Determinism contract: ranks are RE-DERIVED from the rounded scores each
list publishes, ordered (score DESC, id ASC) — so identical input lists
(both oracle-exact) give identical ranks in every engine, and the fused
score is a two-term expression over those integer ranks (no folds,
nothing order-dependent). A doc absent from a list contributes 0 and
reports rank 0.

Scale shape: fusion runs on the two top-``depth`` hit lists — driver-k
sized, never corpus-sized. The windows are single-partition by design
(<= depth rows each); the outer join is a broadcast of k-row frames. All
corpus-scale work stays inside the two underlying top-k operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

RRF_C = 60


def rrf_fuse(
    text_hits: DataFrame,
    vec_hits: DataFrame,
    k: int = 10,
    c: int = RRF_C,
    text_id: str = "doc_id",
    text_score: str = "score",
    vec_id: str = "id",
    vec_score: str = "cosine",
) -> DataFrame:
    """Fuse two hit lists (as returned by ``bm25_topk`` / ``cosine_topk``)
    into (id, rrf, text_rank, vec_rank), top-``k`` by (rrf DESC, id ASC).
    Rank 0 marks "absent from that list"."""
    if c <= 0 or k <= 0:
        raise ValueError("k and c must be positive")
    wt = Window.orderBy(F.col(text_score).desc(), F.col(text_id).asc())
    wv = Window.orderBy(F.col(vec_score).desc(), F.col(vec_id).asc())
    t = text_hits.select(
        F.col(text_id).cast("long").alias("id"),
        F.row_number().over(wt).cast("long").alias("text_rank"),
    )
    v = vec_hits.select(
        F.col(vec_id).cast("long").alias("id"),
        F.row_number().over(wv).cast("long").alias("vec_rank"),
    )
    fused = t.join(v, "id", "full_outer")
    raw = F.coalesce(1.0 / (F.lit(int(c)) + F.col("text_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(int(c)) + F.col("vec_rank")), F.lit(0.0)
    )
    return (
        fused.withColumn("__raw", raw)
        .orderBy(F.col("__raw").desc(), F.col("id").asc())
        .limit(int(k))
        .select(
            "id",
            F.round("__raw", 6).alias("rrf"),
            F.coalesce("text_rank", F.lit(0)).cast("long").alias("text_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
        )
    )


def rrf_fuse_sql(
    text_sql: str,
    vec_sql: str,
    k: int = 10,
    c: int = RRF_C,
    text_id: str = "doc_id",
    text_score: str = "score",
    vec_id: str = "id",
    vec_score: str = "cosine",
) -> str:
    """DuckDB oracle for :func:`rrf_fuse` over two hit-list subqueries."""
    if c <= 0 or k <= 0:
        raise ValueError("k and c must be positive")
    return f"""
WITH t AS (
  SELECT CAST({text_id} AS BIGINT) AS id,
         row_number() OVER (ORDER BY {text_score} DESC, {text_id} ASC) AS text_rank
  FROM ({text_sql})
),
v AS (
  SELECT CAST({vec_id} AS BIGINT) AS id,
         row_number() OVER (ORDER BY {vec_score} DESC, {vec_id} ASC) AS vec_rank
  FROM ({vec_sql})
),
f AS (
  SELECT coalesce(t.id, v.id) AS id, t.text_rank, v.vec_rank,
         coalesce(1.0 / ({int(c)} + t.text_rank), 0.0)
           + coalesce(1.0 / ({int(c)} + v.vec_rank), 0.0) AS raw
  FROM t FULL OUTER JOIN v ON t.id = v.id
)
SELECT id, round(raw, 6) AS rrf,
       CAST(coalesce(text_rank, 0) AS BIGINT) AS text_rank,
       CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank
FROM f
ORDER BY raw DESC, id ASC
LIMIT {int(k)}
"""
