"""Composed web-corpus refinement pipeline: exact dedup -> Gopher quality
battery -> C4 cleaning -> CCNet perplexity bucketing, as ONE declarative
plan.

LLM-pipeline role: this is the canonical modern pretraining-data recipe
(RefinedWeb/FineWeb shape): drop exact duplicates first (cheapest, biggest
win), apply rule-based quality filters (Gopher App. A + C4 §2.2), then
model-based quality bucketing (CCNet) and keep the head+middle. Each stage
is an existing oracle-checked operator; this module only composes them, so
the composed pass is itself fully value-oracle-checkable end to end.

Stage order is load-bearing at 100 TB: dedup before the filters removes
payload bytes before any line-level work; the two rule filters are
zero-shuffle scan conjunctions, so they ride the dedup output without a new
exchange; only CCNet adds exchanges (the charlm train pass + the per-lang
window). Total: dedup's fingerprint shuffle + charlm's 1369-key count +
one lang-partitioned window — three narrow exchanges for the whole recipe,
none carrying full text except dedup's (whose sort key deliberately
excludes the payload, operators/dedup.py:69).

Reference analog: the reference's interceptor chain (FileSource.java:
170-172 -> ElasticsearchSink.java:66) is this pipeline's one-stage
ancestor — transform-then-index; the refinement recipe is the
LLM-pipeline extension the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .c4 import c4_filter, c4_filter_sql
from .ccnet import ccnet_buckets, ccnet_buckets_sql
from .dedup import dedup_exact
from .gopher import gopher_filter, gopher_filter_sql

__all__ = ["refine_corpus", "refine_corpus_sql"]


def refine_corpus(
    docs: DataFrame,
    gopher_kwargs: dict | None = None,
    c4_kwargs: dict | None = None,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 0.1,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang, avg_logprob, bucket) of the docs surviving the whole
    recipe with bucket in {'head','middle'} (the CCNet keep set), ordered
    by doc_id. Stage parameters pass through to the underlying operators;
    the id/lang output names are fixed because :func:`c4_filter` pins its
    output schema to (doc_id, lang, clean_text) — ``docs`` must carry
    ``doc_id`` and ``lang`` columns (rename upstream otherwise).

    The cleaned frame is persisted before the CCNet stage: charlm's train
    pass materializes the chain once inside its counts collect, and the
    returned plan scores over the SAME persisted rows instead of
    recomputing dedup+filters a second time. The persist is left to
    Spark's LRU eviction (no handle is returned to unpersist); call
    ``spark.catalog.clearCache()`` to release it eagerly."""
    d = dedup_exact(docs, text_col=text_col)
    d = gopher_filter(d, text_col=text_col, **(gopher_kwargs or {}))
    d = c4_filter(d, text_col=text_col, **(c4_kwargs or {})).persist()
    cc = ccnet_buckets(
        d, head_frac=head_frac, middle_frac=middle_frac, alpha=alpha,
        text_col="clean_text",
    )
    return cc.where(F.col("bucket") != "tail").orderBy("doc_id")


def refine_corpus_sql(
    gopher_kwargs: dict | None = None,
    c4_kwargs: dict | None = None,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 0.1,
    table: str = "documents",
    columns: tuple[str, ...] = ("doc_id", "text", "lang", "source", "n_chars"),
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`refine_corpus` — the same stage chain as
    CTEs over the same per-stage oracle generators. ``columns`` is the
    input table's column list (the dedup window orders by the non-text
    columns in table order, mirroring dedup_exact)."""
    order_cols = ", ".join(c for c in columns if c != text_col) or text_col
    col_list = ", ".join(columns)
    fp = (
        f"md5(array_to_string(regexp_extract_all(lower({text_col}), "
        "'[a-z0-9]+'), ' '))"
    )
    gop = gopher_filter_sql(table="dd", select="*", **(gopher_kwargs or {}))
    c4 = c4_filter_sql(table="gop", **(c4_kwargs or {}))
    cc = ccnet_buckets_sql(
        head_frac=head_frac, middle_frac=middle_frac, alpha=alpha,
        table="c4kept", id_col="doc_id", lang_col="lang",
        text_col="clean_text",
    )
    return f"""
WITH dd AS (
  SELECT {col_list} FROM (
    SELECT *, row_number() OVER (PARTITION BY {fp} ORDER BY {order_cols}) AS _rn
    FROM {table}
  ) WHERE _rn = 1
),
gop AS ({gop}),
c4kept AS ({c4}),
cc AS ({cc})
SELECT doc_id, lang, avg_logprob, bucket
FROM cc WHERE bucket <> 'tail'
ORDER BY doc_id
"""
