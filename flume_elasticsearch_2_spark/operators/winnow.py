"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
— local fingerprinting for copy detection, the MOSS algorithm.

MinHash (operators/dedup.py) sketches GLOBAL set similarity; winnowing gives
a LOCALITY guarantee instead: any shared substring of at least ``w + k - 1``
tokens is guaranteed to contribute at least one identical fingerprint to
both documents. That makes it the standard tool for partial-overlap
detection (quotes, mirrored boilerplate, plagiarised spans) where Jaccard on
whole-document shingle sets dilutes below threshold. The pipeline:

1. k-gram hashes: ``h_i = md5_60(join(tok_i .. tok_{i+k-1}))`` — the
   engine's cross-engine 60-bit hash (functions/text.py:161);
2. sliding window of ``w`` consecutive gram hashes; each window selects its
   MINIMUM hash (value ties collapse — fingerprints are value-keyed);
3. the document's fingerprint set = distinct selected hashes. Documents
   with fewer than ``w`` grams contribute ``min(all grams)`` (the SWA
   boundary rule); documents shorter than ``k`` tokens contribute nothing.

:func:`winnow_fingerprints` emits ``(doc_id, fp)``; :func:`winnow_pairs`
joins fingerprints to candidate pairs sharing at least ``min_shared``
selections.

Exactly SQL-expressible (md5 + list_transform/range + list_min slices agree
bytewise across engines; note Spark ``sequence(1, 0)`` DESCENDS — the
empty-case guard is load-bearing), so driver-oracle-checkable.

Scale shape (10^12 docs): fingerprinting is a ZERO-shuffle codegen
projection — tokenize, gram-hash, window-min all ride the scan as JVM
higher-order array functions (no UDF, no explode of full token lists; the
fingerprint density is ~2/(w+1) per token, the paper's bound). The pair
join shuffles once on ``fp``; like the MinHash band join it is
candidate-driven, and ``max_fp_df`` drops degenerate fingerprints (site
boilerplate shared by millions of pages) BEFORE the self-join — the same
hot-key lever the n-gram Jaccard operator pins (operators/dedup.py:216).

Reference analog: the reference dedups only by record key (its ES layer has
no content fingerprinting; ElasticsearchSink.java:66) — this operator family
is part of the brief's training-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col
from ..functions.tokenizer import duckdb_token_pattern, tokens_col


def _grams_col(toks: Column, k: int) -> Column:
    """array<long> of k-gram 60-bit md5 hashes for one token array."""
    g = F.size(toks) - (k - 1)  # gram count
    return F.when(
        g >= 1,
        F.transform(
            F.sequence(F.lit(1), g),
            lambda i: md5_long_col(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _mins_col(grams: Column, w: int) -> Column:
    """array<long> of distinct window-min selections over a BOUND gram
    column. The caller MUST pass a materialized column reference, not the
    gram expression itself: a Column expression inlined here is re-evaluated
    per window by the higher-order lambda (O(grams²) md5 calls per doc —
    measured 7× the whole operator's cost); Catalyst's CollapseProject keeps
    the staged projection because the alias is non-cheap and multiply
    referenced."""
    g = F.size(grams)
    nwin = g - (w - 1)
    mins = (
        F.when(
            nwin >= 1,
            F.transform(
                F.sequence(F.lit(1), nwin),
                lambda j: F.array_min(F.slice(grams, j, w)),
            ),
        )
        .when(g >= 1, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return F.array_distinct(mins)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, fp)`` — one row per distinct winnowing selection.

    Three staged zero-shuffle projections (tokens -> grams -> window mins)
    so each heavy array is evaluated ONCE per row — see :func:`_mins_col`."""
    staged = docs.select(
        F.col(id_col), tokens_col(text_col).alias("_t")
    ).select(F.col(id_col), _grams_col(F.col("_t"), k).alias("_g"))
    return staged.select(
        F.col(id_col), F.explode(_mins_col(F.col("_g"), w)).alias("fp")
    )


def _fingerprints_sql(k: int, w: int, text_col: str = "text") -> str:
    """DuckDB expression: list of distinct selections (list_distinct) for a
    row of ``text_col``; bitwise-identical to :func:`_fingerprints_col`."""
    toks = f"regexp_extract_all(lower({text_col}), '{duckdb_token_pattern()}')"
    gram_h = MD5_LONG_SQL.format(expr=f"array_to_string({toks}[i:i+{k - 1}], ' ')")
    grams = f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), i -> {gram_h})"
    g = f"(len({toks}) - {k - 1})"
    nwin = f"({g} - {w - 1})"
    mins = (
        f"CASE WHEN {nwin} >= 1 THEN "
        f"list_transform(range(1, {nwin} + 1), j -> list_min(({grams})[j:j+{w - 1}])) "
        f"WHEN {g} >= 1 THEN [list_min({grams})] "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    return f"list_distinct({mins})"


def winnow_fingerprints_sql(
    table: str = "documents",
    k: int = 4,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return (
        f"SELECT {id_col}, unnest({_fingerprints_sql(k, w, text_col)}) AS fp "
        f"FROM {table}"
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, shared)`` with ``id_a < id_b`` sharing
    at least ``min_shared`` fingerprints. ``max_fp_df`` drops fingerprints
    held by more than that many docs before the self-join (boilerplate
    guard; ``None`` disables — exact config, oracle-sized corpora only)."""
    fps = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    if max_fp_df is not None:
        keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).where(
            F.col("_df") <= max_fp_df
        )
        fps = fps.join(keep.select("fp"), "fp")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def winnow_pairs_sql(
    table: str = "documents",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    base = winnow_fingerprints_sql(table, k=k, w=w, id_col=id_col, text_col=text_col)
    fp_src = "fps"
    cte = f"WITH fps AS ({base})"
    if max_fp_df is not None:
        cte += (
            f", kept AS (SELECT fp FROM fps GROUP BY fp "
            f"HAVING count(*) <= {int(max_fp_df)})"
            f", fpk AS (SELECT f.* FROM fps f JOIN kept USING (fp))"
        )
        fp_src = "fpk"
    return (
        f"{cte} SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, "
        f"CAST(count(*) AS BIGINT) AS shared "
        f"FROM {fp_src} a JOIN {fp_src} b ON a.fp = b.fp AND a.{id_col} < b.{id_col} "
        f"GROUP BY 1, 2 HAVING count(*) >= {int(min_shared)}"
    )
