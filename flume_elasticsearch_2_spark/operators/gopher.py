"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", App. A — the
MassiveText quality-filter battery, since reused by FineWeb / Dolma /
RefinedWeb): per-document heuristics over RAW whitespace words and raw
lines, distinct from the analyzer-token signals in ``functions/text.py``.

LLM-pipeline role: the first cheap quality gate a 100 TB web corpus runs
after language ID — each rule is a pure per-row expression, so the whole
battery is one narrow WholeStageCodegen scan (no shuffle, no UDF, no
join), exactly the shape that survives a 1000-executor scale-up.

Implemented rules (paper thresholds as defaults):

* word count in ``[min_words, max_words]`` (50 .. 100 000)
* mean word length in ``[min_mean_word_len, max_mean_word_len]`` (3 .. 10)
* symbol-to-word ratio ≤ ``max_symbol_ratio`` (0.1) — symbols are ``#``
  and ellipses (``...`` / ``…``), counted non-overlapping left-to-right
* fraction of lines starting with a bullet ≤ ``max_bullet_frac`` (0.9)
* fraction of lines ending with an ellipsis ≤ ``max_ellipsis_frac`` (0.3)
* fraction of words containing ≥1 ASCII alphabetic char ≥
  ``min_alpha_frac`` (0.8)
* ≥ ``min_stop_hits`` (2) DISTINCT hits from the paper's 8-word stop list
  (the, be, to, of, and, that, have, with)

Engine-parity contract (pinned in tests): words split on explicit ASCII
whitespace ``[ \\t\\n\\r\\f]+`` (Java ``\\s`` includes ``\\x0B``, RE2's
does not — the explicit class removes the divergence); lines split on
``\\n``; "alphabetic" means ``[A-Za-z]`` (Unicode letter classes differ
across engines); stop-word matching lowercases per-word. Fractions round
to 6 decimals (Spark round ≡ DuckDB round, see functions/rounding.py) so
the two engines value-hash identically.

Reference provenance: the reference pipeline has no quality gate at all —
it forwards every event to ES (``ElasticsearchSink.java:54``); this
operator is part of the beyond-reference LLM-pipeline family the engine
adds (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: the paper's required-stop-word list (App. A: "contains at least two of
#: the following English words: the, be, to, of, and, that, have, with")
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: ASCII whitespace class shared verbatim by Java regex and RE2
_WS = r"[ \t\n\r\f]+"
#: a line "starts with a bullet" iff its leading blanks are followed by
#: one of the common bullet glyphs (FineWeb's reimplementation uses the
#: same set); '-' placed last in the class so no escape is needed
_BULLET_RE = r"^[ \t]*[*•‣▪-]"
#: a line "ends with an ellipsis" iff '...' or U+2026 is last before
#: trailing blanks
_ELLIPSIS_RE = r"(\.\.\.|…)[ \t]*$"

_METRIC_COLS = (
    "n_words", "mean_word_len", "symbol_ratio", "bullet_line_frac",
    "ellipsis_line_frac", "alpha_word_frac", "stop_hits",
)


def _frac(num: Column, den: Column) -> Column:
    return F.when(den <= 0, F.lit(0.0)).otherwise(F.round(num / den, 6))


def _metric_exprs(text_col: str) -> dict[str, Column]:
    """The seven rule inputs as JVM Column expressions over one text
    column — shared by :func:`gopher_metrics` (projects them) and
    :func:`gopher_filter` (filters on them inline, zero joins)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, _WS, -1), lambda w: F.length(w) > 0)
    lines = F.split(text, "\n", -1)
    n_words = F.size(words)
    total_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    # non-overlapping left-to-right counts via replace-length deltas —
    # plain-string replace has identical semantics in Spark and DuckDB
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
        + (F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit(""))))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter(lines, lambda li: li.rlike(_BULLET_RE)))
    n_ell_end = F.size(F.filter(lines, lambda li: li.rlike(_ELLIPSIS_RE)))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": _frac(total_len, n_words),
        "symbol_ratio": _frac(n_hash + n_ellipsis, n_words),
        "bullet_line_frac": _frac(n_bullet, F.size(lines)),
        "ellipsis_line_frac": _frac(n_ell_end, F.size(lines)),
        "alpha_word_frac": _frac(n_alpha_words, n_words),
        "stop_hits": stop_hits.cast("long"),
    }


def gopher_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc Gopher rule inputs: ``(doc_id, n_words, mean_word_len,
    symbol_ratio, bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    stop_hits)``. One narrow pass; every column is a JVM expression."""
    ex = _metric_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[ex[name].alias(name) for name in _METRIC_COLS],
    )


def _rule_predicate(
    ex: dict[str, Column],
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_frac: float,
    min_stop_hits: int,
) -> Column:
    return (
        (ex["n_words"] >= int(min_words))
        & (ex["n_words"] <= int(max_words))
        & (ex["mean_word_len"] >= float(min_mean_word_len))
        & (ex["mean_word_len"] <= float(max_mean_word_len))
        & (ex["symbol_ratio"] <= float(max_symbol_ratio))
        & (ex["bullet_line_frac"] <= float(max_bullet_frac))
        & (ex["ellipsis_line_frac"] <= float(max_ellipsis_frac))
        & (ex["alpha_word_frac"] >= float(min_alpha_frac))
        & (ex["stop_hits"] >= int(min_stop_hits))
    )


def gopher_filter(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Documents passing EVERY Gopher rule, as the input rows (all input
    columns preserved). Thresholds default to the paper's App. A values.

    Scale shape: the battery is ONE per-row conjunction over one scan (no
    metrics join — the rule expressions are inlined), so the pass stays a
    single WholeStageCodegen stage at any corpus size."""
    ex = _metric_exprs(text_col)
    return docs.where(
        _rule_predicate(
            ex, min_words, max_words, min_mean_word_len, max_mean_word_len,
            max_symbol_ratio, max_bullet_frac, max_ellipsis_frac,
            min_alpha_frac, min_stop_hits,
        )
    )


# -- DuckDB oracle twins ---------------------------------------------------------


def _metric_exprs_sql(text_expr: str = "coalesce(text, '')") -> dict[str, str]:
    """DuckDB twins of :func:`_metric_exprs` — same arithmetic, same
    rounding (DuckDB ``round`` matches Spark's, functions/rounding.py)."""
    words = (
        f"list_filter(regexp_split_to_array({text_expr}, '[ \\t\\n\\r\\f]+'), "
        "w -> length(w) > 0)"
    )
    lines = f"string_split({text_expr}, chr(10))"
    n_words = f"len({words})"
    total_len = f"list_aggregate(list_transform({words}, w -> length(w)), 'sum')"
    n_hash = f"length({text_expr}) - length(replace({text_expr}, '#', ''))"
    n_ell = (
        f"(length({text_expr}) - length(replace({text_expr}, '...', ''))) / 3"
        f" + (length({text_expr}) - length(replace({text_expr}, '…', '')))"
    )
    n_alpha = f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
    n_bullet = (
        f"len(list_filter({lines}, li -> regexp_matches(li, '{_BULLET_RE}')))"
    )
    n_ell_end = (
        f"len(list_filter({lines}, li -> "
        f"regexp_matches(li, '(\\.\\.\\.|…)[ \\t]*$')))"
    )
    stops = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + "]"
    stop_hits = (
        f"len(list_intersect(list_distinct(list_transform({words}, "
        f"w -> lower(w))), {stops}))"
    )

    def frac(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} <= 0 THEN 0.0 "
            f"ELSE round(({num})::DOUBLE / ({den}), 6) END"
        )

    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": frac(total_len, n_words),
        "symbol_ratio": frac(f"{n_hash} + {n_ell}", n_words),
        "bullet_line_frac": frac(n_bullet, f"len({lines})"),
        "ellipsis_line_frac": frac(n_ell_end, f"len({lines})"),
        "alpha_word_frac": frac(n_alpha, n_words),
        "stop_hits": f"CAST({stop_hits} AS BIGINT)",
    }


def gopher_metrics_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`gopher_metrics`."""
    ex = _metric_exprs_sql()
    cols = ",\n       ".join(f"{ex[name]} AS {name}" for name in _METRIC_COLS)
    return f"SELECT doc_id,\n       {cols}\nFROM {table}"


def gopher_filter_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    table: str = "documents",
    select: str = "*",
) -> str:
    """DuckDB oracle for :func:`gopher_filter`."""
    ex = _metric_exprs_sql()
    return f"""
SELECT {select} FROM {table}
WHERE {ex["n_words"]} >= {int(min_words)}
  AND {ex["n_words"]} <= {int(max_words)}
  AND {ex["mean_word_len"]} >= {float(min_mean_word_len)!r}
  AND {ex["mean_word_len"]} <= {float(max_mean_word_len)!r}
  AND {ex["symbol_ratio"]} <= {float(max_symbol_ratio)!r}
  AND {ex["bullet_line_frac"]} <= {float(max_bullet_frac)!r}
  AND {ex["ellipsis_line_frac"]} <= {float(max_ellipsis_frac)!r}
  AND {ex["alpha_word_frac"]} >= {float(min_alpha_frac)!r}
  AND {ex["stop_hits"]} >= {int(min_stop_hits)}
"""
