"""ES ``rescore`` API (SURVEY §2.5): rerank the top-``window_size`` hits of
a cheap base query with a more expensive rescore query (the classic shape:
BM25 match base + ``match_phrase`` rescorer).

Reference analog: the ES 1.x rescore surface behind the sink (delegation
site ElasticsearchSink.java:54). Contract (ES ``query_weight`` /
``rescore_weight``, total mode):

    final = query_weight * base_score + rescore_weight * phrase_score

where docs in the window that do NOT match the phrase keep
``phrase_score = 0`` (they are rescored, not dropped — ES semantics), and
docs outside the window are never rescored. Stats for the phrase score are
INDEX-WIDE (the rescorer scores against the index, not the window).

Scale shape: the base query is the usual two-narrow-pass top-k; the phrase
pass computes corpus-wide phrase scores but is immediately semi-joined to
the k-row window (broadcast of window ids), so only window rows survive to
the combine. On the serving path the window comes from the BMW scatter and
phrase scores from the positional index's intersection path — both already
O(candidates), and the combine is a driver-side dict join over ``window``
rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .topk import bm25_phrase_topk, bm25_phrase_topk_sql, bm25_topk, bm25_topk_sql

_ALL = 2_147_483_647  # "no limit": every phrase-matching doc


def bm25_rescore(
    docs: DataFrame,
    query: str,
    rescore_phrase: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Declarative rescore: base top-``window_size`` BM25 window collected
    (k rows — the window IS driver-sized by the ES contract), then the
    phrase pass scores ONLY the window docs (``doc_filter`` id pushdown;
    stats still index-wide) — the corpus is never sorted by phrase score.
    Combine + re-cut happen over ``window_size`` rows."""
    from ..functions.rounding import round_half_up6

    base = bm25_topk(
        docs, query, k=window_size, mode=mode, id_col=id_col, text_col=text_col
    ).collect()
    if not base:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    ids = [int(r["doc_id"]) for r in base]
    ph = {
        int(r["doc_id"]): r["score"]
        for r in bm25_phrase_topk(
            docs, rescore_phrase, k=window_size, id_col=id_col, text_col=text_col,
            doc_filter=F.col(id_col).isin(ids),
        ).collect()
    }
    rows = [
        (
            int(r["doc_id"]),
            round_half_up6(
                float(query_weight) * r["score"]
                + float(rescore_weight) * ph.get(int(r["doc_id"]), 0.0)
            ),
        )
        for r in base
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return docs.sparkSession.createDataFrame(rows[: int(k)], "doc_id long, score double")


def bm25_rescore_sql(
    query: str,
    rescore_phrase: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`bm25_rescore` (both engines round the base
    and phrase scores to 6 before the identical combine, so the floats
    agree bit-for-bit)."""
    base = bm25_topk_sql(query, k=window_size, mode=mode, table=table)
    ph = bm25_phrase_topk_sql(rescore_phrase, k=_ALL, table=table)
    return f"""
WITH base AS ({base}), ph AS ({ph})
SELECT base.doc_id,
       round({float(query_weight)!r} * base.score
             + {float(rescore_weight)!r} * coalesce(ph.score, 0.0), 6) AS score
FROM base LEFT JOIN ph ON base.doc_id = ph.doc_id
ORDER BY score DESC, base.doc_id ASC
LIMIT {int(k)}
"""


def rescore_serving(
    searcher,
    query: str,
    rescore_phrase: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mode: str = "or",
) -> DataFrame:
    """Serving-path rescore: BMW-scattered base window, then the positional
    phrase path scores ONLY the window (its ids pushed into the per-shard
    docs read as an ``in`` filter — candidates outside the window are masked
    before any position decode, so a hot rescore phrase never inflates the
    gather past ``window_size`` rows); combined on the driver."""
    from ..functions.rounding import round_half_up6 as round6

    base = searcher.search(query, k=window_size, mode=mode).collect()
    if not base:
        return searcher.spark.createDataFrame([], "doc_id long, score double")
    win_ids = [int(r["doc_id"]) for r in base]
    ph = {
        r["doc_id"]: r["score"]
        for r in searcher.search_phrase(
            rescore_phrase, k=len(win_ids), doc_filter=("doc_id", "in", win_ids)
        ).collect()
    }
    rows = [
        (
            int(r["doc_id"]),
            round6(
                float(query_weight) * r["score"]
                + float(rescore_weight) * ph.get(r["doc_id"], 0.0)
            ),
        )
        for r in base
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    return searcher.spark.createDataFrame(rows[: int(k)], "doc_id long, score double")
