"""Anchor-text aggregation over the link graph — the web-index signal that
describes a page by the words OTHER pages link to it with.

Every production web index (Lucene/Nutch lineage, and the ES deployments the
reference feeds — ElasticsearchSink.java:66) folds in-link anchor text into
the target document's searchable fields: anchors are short, written by a
third party, and empirically the strongest short-text relevance signal for
the target. This module computes, per link target, the top-k anchor terms
with in-link counts:

- edges come from the deterministic hub-skewed link synth the PageRank
  operator already pins (operators/linkrank.py:hash_edges — 60-bit-md5
  derived, bit-identical in Spark and DuckDB);
- each edge's anchor text is the first ``anchor_len`` analyzed tokens of the
  SOURCE page (anchors quote the linking page's wording);
- per (target, term) counts roll up, then a per-target window keeps the
  top ``k`` by (count DESC, term ASC) — fully pinned order since
  (target, term) is unique.

Exactly SQL-expressible end-to-end (md5 edges + regexp tokens + window), so
driver-oracle-checkable.

Scale shape (10^12 docs): anchors are a zero-shuffle projection (tokenize +
slice riding the scan, bounded at ``anchor_len`` tokens per doc — no
full-text explode). The edge->anchor join is ONE hash shuffle on ``src``
(both sides narrow: ids + <=3 tokens). The rollup is a partial-agg shuffle
keyed (dst, term): a hub target with 10^6 in-links still combines map-side
to at most |vocab-of-anchors| rows per partition before the exchange, and
the final per-dst window sees at most distinct-term rows, never the raw
in-link count. No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import MD5_LONG_SQL
from ..functions.tokenizer import duckdb_token_pattern, tokens_col
from .linkrank import hash_edges


def anchor_text_topk(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    degree: int = 4,
    seed: int = 7,
    anchor_len: int = 3,
    k: int = 3,
) -> DataFrame:
    """Per-target top-k anchor terms: ``(dst, term, cnt, rank)``."""
    edges = hash_edges(docs, n, id_col=id_col, degree=degree, seed=seed)
    anchors = docs.select(
        F.col(id_col).cast("long").alias("src"),
        F.explode(F.slice(tokens_col(text_col), 1, anchor_len)).alias("term"),
    )
    counts = (
        edges.join(anchors, "src")
        .groupBy("dst", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("dst", "term", "cnt", "rank")
    )


def anchor_text_topk_sql(
    n: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    degree: int = 4,
    seed: int = 7,
    anchor_len: int = 3,
    k: int = 3,
) -> str:
    """DuckDB oracle for :func:`anchor_text_topk` — same md5 edge synth as
    linkrank.pagerank_sql, same token slice, same pinned window order."""
    n_expr = str(int(n)) if n is not None else f"(SELECT count(*) FROM {table})"
    js = ", ".join(str(j) for j in range(degree))

    def h(tag: str) -> str:
        md5 = MD5_LONG_SQL.format(
            expr=f"'pr:' || CAST(src AS VARCHAR) || ':' || CAST(j AS VARCHAR) "
            f"|| ':{tag}:{seed}'"
        )
        return f"({md5} % {n_expr})"

    tok = f"regexp_extract_all(lower(text), '{duckdb_token_pattern()}')"
    return f"""WITH edges AS (
  SELECT src, least({h('a')}, {h('b')}) AS dst
  FROM (SELECT CAST({id_col} AS BIGINT) AS src FROM {table}), (SELECT unnest([{js}]) AS j)
),
anchors AS (
  SELECT CAST({id_col} AS BIGINT) AS src, unnest({tok}[1:{int(anchor_len)}]) AS term
  FROM {table}
),
counts AS (
  SELECT dst, term, CAST(count(*) AS BIGINT) AS cnt
  FROM edges JOIN anchors USING (src)
  GROUP BY dst, term
)
SELECT dst, term, cnt, rank FROM (
  SELECT dst, term, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= {int(k)}"""
