"""Count-min sketch term-frequency estimation (Cormode & Muthukrishnan
2005, public) — the bounded-memory heavy-hitter companion to the exact
term stats the index publishes.

At 10^12 docs an exact per-term count table is itself corpus-scale; a CMS
is ``depth x width`` int64 cells REGARDLESS of corpus size, mergeable by
plain cell-wise addition (integer sums — associative, so the sketch is
partition-order invariant and engine-exact, the same determinism contract
the fixed-point PageRank pins). Estimates only ever OVER-count
(collisions add, never subtract): ``est >= true`` always, and
``est <= true + eps * N`` w.h.p. for width ~ e/eps.

Hashes are the engine's shared 60-bit md5 (functions/text.py:161) seeded
per sketch row, so Spark and DuckDB compute byte-identical cells; no
xxhash variant here because the sketch IS the verified path.

Scale shape: build = one map-side-combined groupBy over (row, cell) —
the depth-x token explosion combines down to <= depth*width partials per
partition before the exchange, so the shuffle is sketch-sized, not
corpus-sized. Estimation joins the query terms' cells (a literal frame)
against the broadcast sketch and takes the row-wise min; absent cells
coalesce to 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col
from ..functions.tokenizer import duckdb_token_pattern, tokens_col


def _cell_col(term: Column, row: Column, width: int, seed: int) -> Column:
    """cell(row, term) = md5_60("cms:<row>:<term>:<seed>") % width."""
    return md5_long_col(
        F.concat_ws(
            ":", F.lit("cms"), row.cast("string"), term, F.lit(str(int(seed)))
        )
    ) % F.lit(int(width))


def _cell_sql(width: int, seed: int) -> str:
    """The identical cell over SQL variables ``row`` and ``term``."""
    h = MD5_LONG_SQL.format(
        expr=f"'cms:' || CAST(row AS VARCHAR) || ':' || term || ':{int(seed)}'"
    )
    return f"({h} % {int(width)})"


def cms_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
    text_col: str = "text",
) -> DataFrame:
    """The sketch itself: (row, cell, cnt) over the corpus token stream.
    Merging two corpora's sketches = UNION ALL + re-sum, cell-wise."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("term"))
        .select(
            "term",
            F.explode(F.array(*[F.lit(i) for i in range(int(depth))])).alias("row"),
        )
        .select("row", _cell_col(F.col("term"), F.col("row"), width, seed).alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate_terms(
    docs: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
    text_col: str = "text",
) -> DataFrame:
    """(term, est_count, true_count) for each query term: est = min over
    sketch rows of the term's cell counts (0 if a cell is empty), true =
    the exact occurrence count — ``est >= true`` by construction."""
    if not terms or sorted(set(terms)) != sorted(terms):
        raise ValueError("terms must be a non-empty duplicate-free list")
    sketch = cms_build(docs, depth, width, seed, text_col)
    probes = docs.sparkSession.createDataFrame(
        [(t, i) for t in terms for i in range(int(depth))], "term string, row int"
    ).select(
        "term", "row", _cell_col(F.col("term"), F.col("row"), width, seed).alias("cell")
    )
    est = (
        probes.join(sketch, ["row", "cell"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )
    true = (
        docs.select(F.explode(tokens_col(text_col)).alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    return (
        est.join(true, "term", "left")
        .select(
            "term",
            "est_count",
            F.coalesce("true_count", F.lit(0)).cast("long").alias("true_count"),
        )
        .orderBy("term")
    )


def cms_estimate_terms_sql(
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
    seed: int = 11,
    table: str = "documents",
    text_expr: str = "text",
) -> str:
    """DuckDB oracle for :func:`cms_estimate_terms` (same cells, same min)."""
    if not terms or sorted(set(terms)) != sorted(terms):
        raise ValueError("terms must be a non-empty duplicate-free list")
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    term_values = ", ".join(f"('{t}')" for t in sorted(terms))
    rows_values = ", ".join(f"({i})" for i in range(int(depth)))
    tok = f"regexp_extract_all(lower({text_expr}), '{duckdb_token_pattern()}')"
    cell = _cell_sql(width, seed)
    return f"""
WITH toks AS (SELECT unnest({tok}) AS term FROM {table}),
rws(row) AS (VALUES {rows_values}),
sketch AS (
  SELECT row, {cell} AS cell, CAST(count(*) AS BIGINT) AS cnt
  FROM toks, rws
  GROUP BY row, {cell}
),
qterms(term) AS (VALUES {term_values}),
probes AS (
  SELECT term, row, {cell} AS cell FROM qterms, rws
),
est AS (
  SELECT p.term, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_count
  FROM probes p LEFT JOIN sketch s ON s.row = p.row AND s.cell = p.cell
  GROUP BY p.term
),
trues AS (
  SELECT term, CAST(count(*) AS BIGINT) AS true_count FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
)
SELECT e.term, e.est_count,
       CAST(coalesce(t.true_count, 0) AS BIGINT) AS true_count
FROM est e LEFT JOIN trues t USING (term)
ORDER BY e.term
"""
