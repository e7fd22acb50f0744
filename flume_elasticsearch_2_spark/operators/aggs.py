"""ES 1.x aggregation kinds beyond the facet five (operators/facets.py):
``range``, ``filters``, ``cardinality``, ``percentiles``, ``top_hits`` (as a
terms sub-agg) and ``significant_terms``. All shipped in the ES 1.1 the
reference deployment runs (delegation site: ElasticsearchSink.java:54,66 —
every aggregation executes inside the delegated ES); re-expressed here as
single-pass declarative DataFrame plans with byte-matching DuckDB oracles.

Scope semantics are identical to facets.py: every agg runs over ALL docs
matching the body's query (ES "query scope"), not the top-k page;
``query=None`` = match_all.

Scale shapes (the 100 TB story, per kind):

- **range / filters**: ONE corpus pass, zero shuffles — each bucket is a
  ``count_if`` over a boolean JVM expression in a single global aggregate
  (partials combine map-side; one row per bucket crosses the exchange), then
  an O(n_buckets) ``stack`` to long form. Empty buckets are kept (count 0),
  as ES does; an explode-filter-groupBy plan would drop them AND shuffle a
  row per (doc, bucket).
- **cardinality**: ``exact=True`` (the oracle config) is a count-distinct —
  one shuffle keyed by the field. The 100 TB path is ``exact=False``:
  Spark's ``approx_count_distinct`` is HyperLogLog++ with map-side sketch
  merge — O(sketch) per partition crosses the wire, never the value set.
  That is exactly what ES's cardinality agg does (HLL++, precision_threshold).
- **percentiles**: ``exact=True`` (oracle config) sorts the match-set values
  once (Spark's exact ``percentile``). The 100 TB path is ``exact=False``:
  ``approx_percentile`` merges per-partition quantile sketches, the same
  trade ES makes (t-digest).
- **top_hits**: rank window per bucket. Spark 4 plans a partial
  ``WindowGroupLimit`` BEFORE the exchange, so at most k rows per (bucket,
  input-partition) are shuffled — never a bucket's full match set (pinned in
  tests/test_plan_hygiene.py).
- **significant_terms**: one exploded-distinct-tokens pass — the INDEX-BUILD
  shuffle shape (term-keyed, map-side combined, ≤ vocabulary × partitions
  rows) — computing foreground and background doc counts in the SAME
  aggregate, so the corpus is tokenized once, not twice. Totals are two
  count jobs collected as driver constants (the bm25 stats pattern).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.tokenizer import tokens_col
from .facets import _match_sql, match_condition

Triple = tuple[str, str, Any]


# -- range ---------------------------------------------------------------------


def _fmt_edge(v: float | int | None) -> str:
    return "*" if v is None else str(float(v))


def _range_key(lo, hi) -> str:
    """ES range-agg auto key: ``"from-to"`` with ``*`` for an open edge
    (edges rendered as doubles, as ES does)."""
    return f"{_fmt_edge(lo)}-{_fmt_edge(hi)}"


def _norm_ranges(ranges: list[dict]) -> list[tuple[str, float | None, float | None]]:
    out = []
    for r in ranges:
        extra = set(r) - {"key", "from", "to"}
        if extra:
            raise ValueError(f"range keys {sorted(extra)} unsupported")
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("range bucket needs from and/or to")
        out.append((str(r.get("key", _range_key(lo, hi))), lo, hi))
    if len({k for k, _, _ in out}) != len(out):
        raise ValueError("duplicate range bucket keys")
    return out


def range_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    ranges: list[dict],
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``range`` aggregation: one bucket per requested range, doc counted
    into EVERY range containing it (``from`` inclusive, ``to`` exclusive —
    ES range-agg contract; buckets may overlap, docs may match several).
    Returns (key, count) for all requested buckets — empties kept at 0 —
    ordered by key ASC (deterministic cross-engine order).
    """
    rs = _norm_ranges(ranges)
    sel = docs.where(match_condition(query, mode, text_col)).select(
        F.col(field).cast("double").alias("v")
    )
    aggs = []
    for i, (_, lo, hi) in enumerate(rs):
        cond = F.lit(True) if lo is None else F.col("v") >= float(lo)
        if hi is not None:
            cond = cond & (F.col("v") < float(hi))
        aggs.append(F.count_if(cond & F.col("v").isNotNull()).alias(f"c{i}"))
    # keys as Column literals, not a selectExpr stack() string: SQL-literal
    # backslash escaping in a user-supplied key would diverge from the
    # DuckDB oracle (which does not process escapes)
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.col(f"c{i}").alias("count"))
            for i, (k, _, _) in enumerate(rs)
        ]
    )
    return (
        sel.agg(*aggs)  # one row: a count per bucket
        .select(F.explode(pairs).alias("p"))
        .select("p.key", "p.count")
        .orderBy("key")
    )


def range_facet_sql(
    query: str | None,
    field: str,
    ranges: list[dict],
    mode: str = "or",
    table: str = "documents",
) -> str:
    rs = _norm_ranges(ranges)
    m = _match_sql(query, mode, None, "ascii")
    parts = []
    for k, lo, hi in rs:
        conds = [m, f"{field} IS NOT NULL"]
        if lo is not None:
            conds.append(f"CAST({field} AS DOUBLE) >= {float(lo)}")
        if hi is not None:
            conds.append(f"CAST({field} AS DOUBLE) < {float(hi)}")
        key = k.replace("'", "''")
        parts.append(
            f"SELECT '{key}' AS key, count(*) FILTER (WHERE {' AND '.join(conds)}) AS count\nFROM {table}"
        )
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts) + "\n) ORDER BY key"


# -- filters -------------------------------------------------------------------


def filters_facet(
    docs: DataFrame,
    filters: dict[str, list[Triple]],
    query: str | None = None,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per filter, counted over
    the query scope. Filter triples are the DSL's normalized form
    ((field, op, value) — what ``operators/dsl._filter_triples`` emits from
    ES filter JSON), so term/terms/range/exists/missing all route here; the
    ES ``missing`` agg is the one-bucket ``(field, "null", None)`` case.
    Returns (filter, count), empties kept, ordered by filter ASC."""
    from .dsl import _filters_col  # lazy: dsl imports facets at module level

    if not filters:
        raise ValueError("filters agg needs at least one named filter")
    names = sorted(filters)
    sel = docs.where(match_condition(query, mode, text_col))
    aggs = [
        F.count_if(_filters_col(filters[n]) if filters[n] else F.lit(True)).alias(f"c{i}")
        for i, n in enumerate(names)
    ]
    pairs = ", ".join(f"'{n.replace(chr(39), chr(39)*2)}', c{i}" for i, n in enumerate(names))
    return (
        sel.agg(*aggs)  # one row: a count per named filter
        .selectExpr(f"stack({len(names)}, {pairs}) AS (filter, count)")
        .orderBy("filter")
    )


def filters_facet_sql(
    filters: dict[str, list[Triple]],
    query: str | None = None,
    mode: str = "or",
    table: str = "documents",
) -> str:
    from .dsl import _filters_sql

    m = _match_sql(query, mode, None, "ascii")
    parts = []
    for n in sorted(filters):
        pred = _filters_sql(filters[n]) or "TRUE"
        name = n.replace("'", "''")
        parts.append(
            f"SELECT '{name}' AS filter, count(*) FILTER (WHERE {m} AND ({pred})) AS count\nFROM {table}"
        )
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts) + "\n) ORDER BY filter"


# -- cardinality ---------------------------------------------------------------


def cardinality_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    exact: bool = True,
    rsd: float = 0.05,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``cardinality`` aggregation: distinct count of ``field`` over the
    match set (nulls ignored, as ES ignores missing). ``exact=True`` is the
    oracle config; ``exact=False`` is the 100 TB path — HyperLogLog++ via
    ``approx_count_distinct`` (sketches merge map-side; ES's own cardinality
    agg is HLL++ too, so the approx path is the semantically faithful one)."""
    agg = (
        F.count_distinct(F.col(field))
        if exact
        else F.approx_count_distinct(field, float(rsd))
    )
    return (
        docs.where(match_condition(query, mode, text_col))
        .agg(agg.alias("cardinality"))
    )


def cardinality_facet_sql(
    query: str | None, field: str, mode: str = "or", table: str = "documents"
) -> str:
    return (
        f"SELECT count(DISTINCT {field}) AS cardinality\nFROM {table}\n"
        f"WHERE {_match_sql(query, mode, None, 'ascii')}"
    )


# -- missing -------------------------------------------------------------------


def missing_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``missing`` aggregation: docs in the query scope with NO value for
    ``field`` (one row, ``count``) — the agg form of the 1.x missing filter."""
    return docs.where(match_condition(query, mode, text_col)).agg(
        F.count_if(F.col(field).isNull()).alias("count")
    )


def missing_facet_sql(
    query: str | None, field: str, mode: str = "or", table: str = "documents"
) -> str:
    return (
        f"SELECT count(*) FILTER (WHERE {field} IS NULL) AS count\nFROM {table}\n"
        f"WHERE {_match_sql(query, mode, None, 'ascii')}"
    )


# -- percentiles ---------------------------------------------------------------

_DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)


def percentiles_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    percents: tuple[float, ...] = _DEFAULT_PERCENTS,
    exact: bool = True,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``percentiles`` aggregation: (percent, value) per requested
    percent, continuous interpolation over the match set's values (the
    definition Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    share, so the oracle matches bit-for-bit after round-6).

    ``exact=False`` is the 100 TB path: ``approx_percentile`` merges
    per-partition sketches instead of sorting the match set — the same
    accuracy-for-scale trade ES's own t-digest makes."""
    ps = [float(p) for p in percents]
    if not ps or any(not (0.0 <= p <= 100.0) for p in ps):
        raise ValueError("percents must be in [0, 100]")
    v = F.col(field).cast("double")
    fracs = F.array(*[F.lit(p / 100.0) for p in ps])
    agg = F.percentile(v, fracs) if exact else F.percentile_approx(v, fracs, 10_000)
    plits = F.array(*[F.lit(p) for p in ps])
    return (
        docs.where(match_condition(query, mode, text_col))
        .agg(agg.alias("vals"))
        .select(F.posexplode("vals").alias("pos", "value"))
        .select(
            F.element_at(plits, F.col("pos") + 1).alias("percent"),
            F.round(F.col("value"), 6).alias("value"),
        )
        .orderBy("percent")
    )


def percentiles_facet_sql(
    query: str | None,
    field: str,
    percents: tuple[float, ...] = _DEFAULT_PERCENTS,
    mode: str = "or",
    table: str = "documents",
) -> str:
    ps = [float(p) for p in percents]
    fr = "[" + ", ".join(str(p / 100.0) for p in ps) + "]"
    pl = "[" + ", ".join(str(p) for p in ps) + "]"
    # parallel unnest zips the two equal-length lists row-wise in DuckDB
    return f"""
SELECT unnest({pl}) AS percent, round(unnest(qs), 6) AS value
FROM (
  SELECT quantile_cont(CAST({field} AS DOUBLE), {fr}) AS qs
  FROM {table}
  WHERE {_match_sql(query, mode, None, 'ascii')}
)
ORDER BY percent
"""


# -- percentile_ranks ----------------------------------------------------------


def percentile_ranks_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    values: tuple[float, ...],
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation (the inverse of ``percentiles``):
    for each given value, the percentage of the match set's observed field
    values that are <= it. Pinned EXACT contract: ``100 * avg(x <= v)``
    over non-NULL values (missing values skipped, as ES skips docs without
    the field) — the empirical CDF, a documented divergence from t-digest's
    interpolated estimate (which is approximation, not semantics). ONE
    map-side-combined conditional-avg pass; rows (value, rank) value-ASC.
    Duplicate probe values raise."""
    vs = [float(v) for v in values]
    if not vs:
        raise ValueError("percentile_ranks needs at least one value")
    if len(set(vs)) != len(vs):
        raise ValueError("duplicate percentile_ranks values")
    vs = sorted(vs)
    col = F.col(field).cast("double")
    matched = docs.where(match_condition(query, mode, text_col)).where(col.isNotNull())
    aggs = [
        F.round(F.avg(F.when(col <= F.lit(v), 1).otherwise(0)) * 100.0, 6).alias(
            f"__r{i}"
        )
        for i, v in enumerate(vs)
    ]
    vlits = F.array(*[F.lit(v) for v in vs])
    return (
        matched.agg(*aggs)
        .select(F.posexplode(F.array(*[F.col(f"__r{i}") for i in range(len(vs))]))
                .alias("pos", "rank"))
        # empty match set (or all-NULL field): Spark's global agg still emits
        # one row with NULL ranks, while the oracle's GROUP BY emits zero
        # rows — drop the NULL rows so both engines return 0 rows
        .where(F.col("rank").isNotNull())
        .select(
            F.element_at(vlits, F.col("pos") + 1).alias("value"), F.col("rank")
        )
        .orderBy("value")
    )


def percentile_ranks_facet_sql(
    query: str | None,
    field: str,
    values: tuple[float, ...],
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`percentile_ranks_facet` (same CASE + avg)."""
    vs = [float(v) for v in values]
    if not vs:
        raise ValueError("percentile_ranks needs at least one value")
    if len(set(vs)) != len(vs):
        raise ValueError("duplicate percentile_ranks values")
    vs = sorted(vs)
    vals = ", ".join(f"({v!r})" for v in vs)
    return f"""
SELECT v.value,
       round(avg(CASE WHEN CAST({field} AS DOUBLE) <= v.value THEN 1 ELSE 0 END)
             * 100.0, 6) AS rank
FROM {table}, (VALUES {vals}) v(value)
WHERE {_match_sql(query, mode, None, 'ascii')} AND {field} IS NOT NULL
GROUP BY v.value
ORDER BY v.value
"""


# -- top_hits (terms sub-agg) --------------------------------------------------


def top_hits_agg(
    docs: DataFrame,
    query: str | None,
    group_field: str,
    k: int,
    sort_field: str,
    ascending: bool = False,
    mode: str = "or",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation under a ``terms`` bucketing: the k
    best docs per bucket by ``sort_field`` (ties broken by id ASC — the
    deterministic analog of ES's internal docid tiebreak). Returns
    (key, doc_id, sort_value, rank) ordered by (key, rank).

    Scale: Spark 4 inserts a PARTIAL WindowGroupLimit below the exchange —
    each input partition forwards at most k rows per bucket, so the shuffle
    carries O(buckets × k × partitions), never a bucket's match set
    (plan-pinned in tests/test_plan_hygiene.py)."""
    if k <= 0:
        raise ValueError("k must be positive")
    sort = F.col(sort_field).asc() if ascending else F.col(sort_field).desc()
    w = Window.partitionBy(group_field).orderBy(sort, F.col(id_col).asc())
    return (
        docs.where(match_condition(query, mode, text_col))
        .select(
            F.col(group_field).alias("key"),
            F.col(id_col).alias("doc_id"),
            F.round(F.col(sort_field).cast("double"), 6).alias("sort_value"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= int(k))
        .orderBy("key", "rank")
    )


def top_hits_agg_sql(
    query: str | None,
    group_field: str,
    k: int,
    sort_field: str,
    ascending: bool = False,
    mode: str = "or",
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    direction = "ASC" if ascending else "DESC"
    return f"""
SELECT key, doc_id, sort_value, rank FROM (
  SELECT {group_field} AS key, {id_col} AS doc_id,
         round(CAST({sort_field} AS DOUBLE), 6) AS sort_value,
         row_number() OVER (
           PARTITION BY {group_field}
           ORDER BY {sort_field} {direction}, {id_col} ASC
         ) AS rank
  FROM {table}
  WHERE {_match_sql(query, mode, None, 'ascii')}
)
WHERE rank <= {int(k)}
ORDER BY key, rank
"""


# -- significant_terms ---------------------------------------------------------


def significant_terms_facet(
    docs: DataFrame,
    query: str,
    size: int = 10,
    min_doc_count: int = 1,
    mode: str = "or",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``significant_terms`` aggregation over the analyzed text field:
    terms whose document frequency in the FOREGROUND (the query's match set)
    is anomalously high vs the BACKGROUND (whole corpus), scored with ES's
    default JLH: ``(fg% − bg%) × (fg% / bg%)``. Only positively significant
    terms (fg% > bg%) are returned — the ES contract — top-``size`` by
    (score DESC, term ASC), with fg/bg doc counts like ES's
    ``doc_count``/``bg_count``.

    One exploded-distinct pass computes both frequencies (is_fg rides the
    explode); totals are two count jobs collected as driver constants."""
    if not query:
        raise ValueError("significant_terms needs a foreground query")
    fg = match_condition(query, mode, text_col, stopwords, analyzer)
    bg_total = docs.count()
    fg_total = docs.where(fg).count()
    if fg_total == 0 or bg_total == 0:
        return docs.sparkSession.createDataFrame(
            [], "term string, fg_count long, bg_count long, score double"
        )
    toks = tokens_col(text_col, stopwords, analyzer)
    per_term = (
        docs.select(fg.alias("is_fg"), F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(
            F.count("*").alias("bg_count"),
            F.count_if(F.col("is_fg")).alias("fg_count"),
        )
    )
    fgp = F.col("fg_count").cast("double") / float(fg_total)
    bgp = F.col("bg_count").cast("double") / float(bg_total)
    return (
        per_term.where(F.col("fg_count") >= int(min_doc_count))
        .where(fgp > bgp)
        .select(
            "term",
            "fg_count",
            "bg_count",
            F.round((fgp - bgp) * (fgp / bgp), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(int(size))
    )


def significant_terms_facet_sql(
    query: str,
    size: int = 10,
    min_doc_count: int = 1,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    from ..functions.tokenizer import duckdb_token_pattern

    m = _match_sql(query, mode, stopwords, analyzer)
    tok = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok = f"list_filter({tok}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH totals AS (
  SELECT count(*) AS bg_total, count(*) FILTER (WHERE {m}) AS fg_total
  FROM {table}
),
exploded AS (
  SELECT {m} AS is_fg, unnest(list_distinct({tok})) AS term
  FROM {table}
),
per_term AS (
  SELECT term, count(*) AS bg_count, count(*) FILTER (WHERE is_fg) AS fg_count
  FROM exploded
  GROUP BY term
)
SELECT term, fg_count, bg_count,
       round(
         (CAST(fg_count AS DOUBLE) / fg_total - CAST(bg_count AS DOUBLE) / bg_total)
         * ((CAST(fg_count AS DOUBLE) / fg_total) / (CAST(bg_count AS DOUBLE) / bg_total)),
         6
       ) AS score
FROM per_term, totals
WHERE fg_count >= {int(min_doc_count)}
  AND CAST(fg_count AS DOUBLE) / fg_total > CAST(bg_count AS DOUBLE) / bg_total
ORDER BY score DESC, term ASC
LIMIT {int(size)}
"""


# -- extended_stats / value_count ------------------------------------------------


def extended_stats_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``extended_stats`` aggregation: the ``stats`` row plus
    sum_of_squares, variance and std_deviation over the match scope.
    Population variance (ES semantics): ``sos/count - avg²`` — computed with
    the SAME explicit formula in both engines (not the engines' var_pop
    built-ins, whose summation strategies differ) so the rounded-6 values
    are bit-comparable. One global aggregate: partials combine map-side,
    one row crosses the exchange — the same zero-shuffle shape as stats."""
    f = F.col(field).cast("double")
    base = docs.where(match_condition(query, mode, text_col)).agg(
        F.count(field).alias("count"),
        F.min(field).alias("min"),
        F.max(field).alias("max"),
        F.sum(f).alias("_sum"),
        F.sum(f * f).alias("_sos"),
    )
    avg = F.col("_sum") / F.col("count")
    var = F.col("_sos") / F.col("count") - avg * avg
    return base.select(
        "count",
        "min",
        "max",
        F.round("_sum", 6).alias("sum"),
        F.round(avg, 6).alias("avg"),
        F.round("_sos", 6).alias("sum_of_squares"),
        F.round(var, 6).alias("variance"),
        F.round(F.sqrt(var), 6).alias("std_deviation"),
    )


def extended_stats_facet_sql(
    query: str | None, field: str, mode: str = "or", table: str = "documents"
) -> str:
    return f"""
WITH base AS (
  SELECT count({field}) AS count, min({field}) AS min, max({field}) AS max,
         sum(CAST({field} AS DOUBLE)) AS s,
         sum(CAST({field} AS DOUBLE) * CAST({field} AS DOUBLE)) AS sos
  FROM {table}
  WHERE {_match_sql(query, mode, None, 'ascii')}
)
SELECT count, min, max, round(s, 6) AS sum, round(s / count, 6) AS avg,
       round(sos, 6) AS sum_of_squares,
       round(sos / count - (s / count) * (s / count), 6) AS variance,
       round(sqrt(sos / count - (s / count) * (s / count)), 6) AS std_deviation
FROM base
"""


def value_count_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``value_count`` aggregation: how many docs in the match scope have
    a value for ``field`` (nulls excluded — ES counts extracted values)."""
    return docs.where(match_condition(query, mode, text_col)).agg(
        F.count(field).alias("count")
    )


def value_count_facet_sql(
    query: str | None, field: str, mode: str = "or", table: str = "documents"
) -> str:
    return (
        f"SELECT count({field}) AS count\nFROM {table}\n"
        f"WHERE {_match_sql(query, mode, None, 'ascii')}"
    )


# -- 1.x query facet ---------------------------------------------------------------


def query_facet(
    docs: DataFrame,
    query: str | None,
    facet_query: str,
    mode: str = "or",
    facet_mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES 1.x ``query`` facet: how many docs in the body's match scope ALSO
    match the facet query (one row, ``count``). Both matches are the same
    analyzed-overlap predicate the facet family shares — one corpus pass,
    two JVM array predicates ANDed, zero shuffles beyond the global count."""
    return (
        docs.where(match_condition(query, mode, text_col))
        .where(match_condition(facet_query, facet_mode, text_col))
        .agg(F.count("*").alias("count"))
    )


def query_facet_sql(
    query: str | None,
    facet_query: str,
    mode: str = "or",
    facet_mode: str = "or",
    table: str = "documents",
) -> str:
    return (
        f"SELECT count(*) AS count\nFROM {table}\n"
        f"WHERE ({_match_sql(query, mode, None, 'ascii')})\n"
        f"  AND ({_match_sql(facet_query, facet_mode, None, 'ascii')})"
    )


# -- deterministic HyperLogLog cardinality --------------------------------------

# The 100 TB cardinality path, made oracle-exact: a REAL HyperLogLog sketch
# (Flajolet et al. 2007) whose every step is deterministic integer/float64
# arithmetic both engines share, so Spark and DuckDB produce the IDENTICAL
# estimate — unlike approx_count_distinct / DuckDB's approx functions, whose
# internal sketches differ. ES's own cardinality agg is HLL++ for the same
# reason this exists: registers merge with max(), so the agg is map-side
# combinable and one shuffle of ≤ 2^p tiny rows replaces a full distinct.
#
# Determinism details (each one matters for the oracle hash-match):
# * value hash = the house 60-bit md5 prefix (functions/text.py) — bit-equal
#   cross-engine; register index = top p bits, rho over the low w = 60-p bits.
# * rho via STRING bit-length (bin()+length, exact integer math in both
#   engines) — never floor(log2(x)), whose float boundaries can disagree.
# * Σ 2^-rho is summed SCALED BY 2^(w+1) in pure BIGINT (every term is an
#   exact power of two, max m·2^(w+1) = 2^61 for p=12 — no float
#   accumulation, so partition order can't change the sum).
# * the bias constant α_m and the final division are single float64 ops with
#   Python-computed literals injected into both engines.


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_cardinality(
    docs: DataFrame,
    query: str | None,
    field: str,
    p: int = 12,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """HLL cardinality estimate of ``field`` over the match set (nulls
    ignored, as ES ignores missing). One row ``(cardinality double)`` —
    the raw HLL estimate with small-range linear counting, rounded to 6
    decimals. Standard error ≈ 1.04/√(2^p) (~1.6 % at the default p=12).

    Scale shape: scan → narrow (idx, rho) projection → groupBy(idx) with a
    partially-aggregated max (≤ 2^p rows cross the exchange) → one scalar
    row. At 10^12 docs this is the ONLY shuffle and it is 2^p rows."""
    from ..functions.text import md5_long_col

    if not 4 <= int(p) <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    p = int(p)
    m, w = 1 << p, 60 - p
    mask = (1 << w) - 1
    h = md5_long_col(F.col(field).cast("string"))
    rest = h.bitwiseAND(F.lit(mask))
    rho = (
        F.when(rest == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    regs = (
        docs.where(match_condition(query, mode, text_col))
        .where(F.col(field).isNotNull())
        .select(F.shiftright(h, w).alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )
    alpha = _hll_alpha(m)
    scale = float(1 << (w + 1))
    # S (scaled): present registers contribute 2^(w+1-rho); the m-n_present
    # absent ones contribute 2^(w+1) each — all exact BIGINTs
    stats = regs.agg(
        F.count("*").alias("n_present"),
        F.coalesce(
            # variable-distance shift: SQL shiftleft takes a column bit
            # count (the F.shiftleft python wrapper insists on an int)
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - rho)")),
            F.lit(0),
        ).cast("long").alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(1 << (w + 1)).cast("long")
    ).cast("double")
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    e_raw = F.lit(alpha * m * m * scale) / s_total
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return stats.select(F.round(est, 6).alias("cardinality"))


def hll_cardinality_sql(
    query: str | None,
    field: str,
    p: int = 12,
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`hll_cardinality` — same hash, same integer
    register math, same literals: the estimate matches bit-for-bit."""
    from ..functions.text import MD5_LONG_SQL

    if not 4 <= int(p) <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    p = int(p)
    m, w = 1 << p, 60 - p
    mask = (1 << w) - 1
    alpha = _hll_alpha(m)
    scale = float(1 << (w + 1))
    h = MD5_LONG_SQL.format(expr=f"CAST({field} AS VARCHAR)")
    return f"""
WITH regs AS (
  SELECT ({h}) >> {w} AS idx,
         max(CASE WHEN (({h}) & {mask}) = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(({h}) & {mask})) END) AS rho
  FROM {table}
  WHERE ({_match_sql(query, mode, None, "ascii")}) AND {field} IS NOT NULL
  GROUP BY 1
),
s AS (
  SELECT count(*) AS n_present,
         coalesce(sum(1::BIGINT << ({w + 1} - rho)), 0)::BIGINT AS s_present
  FROM regs
)
SELECT round(
  CASE WHEN ({alpha * m * m * scale!r} / CAST(s_present + ({m} - n_present) * {1 << (w + 1)}::BIGINT AS DOUBLE)) <= {2.5 * m!r}
        AND ({m} - n_present) > 0
       THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - n_present AS DOUBLE))
       ELSE ({alpha * m * m * scale!r} / CAST(s_present + ({m} - n_present) * {1 << (w + 1)}::BIGINT AS DOUBLE))
  END, 6) AS cardinality
FROM s
"""


# -- scripted_metric ------------------------------------------------------------


_SM_REDUCES = ("sum", "min", "max", "avg")


def scripted_metric_facet(
    docs: DataFrame,
    query: str | None,
    map_script: str,
    reduce: str = "sum",
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``scripted_metric`` agg, the shape real deployments use it for
    (a per-doc arithmetic map + an associative reduce): exactly
    :func:`metric_facet` with a script value — one validation + aggregate
    shape, two ES surfaces. Free-form ES init/combine/reduce scripts are
    out of the subset and raise."""
    if reduce not in _SM_REDUCES:
        raise ValueError(f"reduce must be one of {_SM_REDUCES}, got {reduce!r}")
    return metric_facet(
        docs, query, None, reduce, script=map_script, mode=mode, text_col=text_col
    )


def scripted_metric_facet_sql(
    query: str | None,
    map_script: str,
    reduce: str = "sum",
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`scripted_metric_facet` (same delegation)."""
    if reduce not in _SM_REDUCES:
        raise ValueError(f"reduce must be one of {_SM_REDUCES}, got {reduce!r}")
    return metric_facet_sql(query, None, reduce, script=map_script, mode=mode, table=table)


# -- standalone metric aggs (min / max / sum / avg) ------------------------------


_METRICS = ("min", "max", "sum", "avg")


def metric_facet(
    docs: DataFrame,
    query: str | None,
    field: str | None,
    metric: str,
    script: str | None = None,
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES single-metric aggs ``min``/``max``/``sum``/``avg`` over the match
    set — the most common agg bodies a client sends. Value column is
    ``value`` (double, round-6) as ES returns doubles. ``script`` replaces
    ``field`` with a computed per-doc value (ES's ``script`` option on
    metric aggs; the functions/scripts.py subset compiled once to a JVM
    column). One map-side-combined aggregate; a scalar row returned."""
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    if (field is None) == (script is None):
        raise ValueError("exactly one of field/script required")
    if script is not None:
        from ..functions.scripts import parse_script

        sc = parse_script(script)
        if sc.uses_score:
            raise ValueError("metric agg scripts have no _score (no hit context)")
        missing = sorted(sc.fields - set(docs.columns))
        if missing:
            raise ValueError(f"script references unknown doc fields {missing}")
        v = sc.spark_col(None)
    else:
        v = F.col(field)
    fn = {"min": F.min, "max": F.max, "sum": F.sum, "avg": F.avg}[metric]
    return (
        docs.where(match_condition(query, mode, text_col))
        .agg(F.round(fn(v).cast("double"), 6).alias("value"))
    )


def metric_facet_sql(
    query: str | None,
    field: str | None,
    metric: str,
    script: str | None = None,
    mode: str = "or",
    table: str = "documents",
) -> str:
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    if (field is None) == (script is None):
        raise ValueError("exactly one of field/script required")
    if script is not None:
        from ..functions.scripts import parse_script

        sc = parse_script(script)
        if sc.uses_score:
            raise ValueError("metric agg scripts have no _score (no hit context)")
        v = sc.sql(None)
    else:
        v = field
    return (
        f"SELECT round(CAST({metric}({v}) AS DOUBLE), 6) AS value\n"
        f"FROM {table}\nWHERE {_match_sql(query, mode, None, 'ascii')}"
    )


# -- ip_range ------------------------------------------------------------------

_IP_MULT = (16777216, 65536, 256, 1)


def _ip_num_py(s: str) -> int:
    parts = s.split(".")
    if len(parts) != 4 or not all(p.isdigit() and 0 <= int(p) <= 255 for p in parts):
        raise ValueError(f"not a dotted-quad IPv4 address: {s!r}")
    return sum(int(p) * m for p, m in zip(parts, _IP_MULT))


# full-string dotted-quad validation, shared verbatim by both engines (the
# pattern is in the Java-regex ∩ RE2 dialect). Invalid values — wrong part
# count, octets > 255, signs, junk — become NULL and DROP, matching the
# docstring contract; without it '10.0.0.300' silently lands in the wrong
# bucket in BOTH engines (so the oracle could never catch the miscount) and
# a short value like '1.2.3' crashes Spark's ANSI element_at outright.
_IP_OCTET = "([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])"
_IP_RE = f"^{_IP_OCTET}(\\.{_IP_OCTET}){{3}}$"


def _ip_num_col(field: str) -> Column:
    p = F.split(F.col(field), r"\.")
    num = F.lit(0).cast("long")
    for i, m in enumerate(_IP_MULT, start=1):
        # try_element_at: never raises even pre-validation (ANSI mode)
        num = num + F.try_element_at(p, F.lit(i)).try_cast("long") * F.lit(m)
    return F.when(F.col(field).rlike(_IP_RE), num)


def _ip_num_sql(field: str) -> str:
    parts = " + ".join(
        f"TRY_CAST(str_split({field}, '.')[{i}] AS BIGINT) * {m}"
        for i, m in enumerate(_IP_MULT, start=1)
    )
    return f"(CASE WHEN regexp_full_match({field}, '{_IP_RE}') THEN ({parts}) END)"


def _norm_ip_ranges(ranges: list[dict]) -> list[tuple[str, int | None, int | None]]:
    out = []
    for r in ranges:
        extra = set(r) - {"key", "from", "to"}
        if extra:
            # ES also takes CIDR "mask" buckets; out of the subset — refuse
            raise ValueError(f"ip_range keys {sorted(extra)} unsupported (from/to/key only)")
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("ip_range bucket needs from and/or to")
        key = str(r.get("key", f"{lo or '*'}-{hi or '*'}"))
        out.append(
            (key, None if lo is None else _ip_num_py(str(lo)),
             None if hi is None else _ip_num_py(str(hi)))
        )
    if len({k for k, _, _ in out}) != len(out):
        raise ValueError("duplicate ip_range bucket keys")
    return out


def ip_range_facet(
    docs: DataFrame,
    query: str | None,
    field: str,
    ranges: list[dict],
    mode: str = "or",
    text_col: str = "text",
) -> DataFrame:
    """ES ``ip_range`` aggregation: dotted-quad IPv4 buckets, ``from``
    inclusive / ``to`` exclusive on the 32-bit address value (ES contract;
    buckets may overlap). Keys default to ``"from-to"`` with ``*`` for open
    edges, rendered as the INPUT address strings. Returns (key, count) for
    every requested bucket — empties kept at 0 — ordered key ASC.

    Scale shape: the address parses to a long with split+cast JVM
    expressions riding the scan (malformed/NULL values drop — both engines
    yield NULL via non-ANSI cast / TRY_CAST), then ONE zero-shuffle
    conditional-count aggregate, exactly like the numeric range agg.
    Declarative + oracle paths; no stored index carries an ip column, so
    there is no serving form to (dis)honestly approximate."""
    rs = _norm_ip_ranges(ranges)
    sel = docs.where(match_condition(query, mode, text_col)).select(
        _ip_num_col(field).alias("v")
    )
    aggs = []
    for i, (_, lo, hi) in enumerate(rs):
        cond = F.lit(True) if lo is None else F.col("v") >= int(lo)
        if hi is not None:
            cond = cond & (F.col("v") < int(hi))
        aggs.append(F.count_if(cond & F.col("v").isNotNull()).alias(f"c{i}"))
    # keys ride as Column literals, never through a selectExpr string — SQL
    # literal backslash escaping would diverge from the DuckDB oracle's
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.col(f"c{i}").alias("count"))
            for i, (k, _, _) in enumerate(rs)
        ]
    )
    return (
        sel.agg(*aggs)
        .select(F.explode(pairs).alias("p"))
        .select("p.key", "p.count")
        .orderBy("key")
    )


def ip_range_facet_sql(
    query: str | None,
    field: str,
    ranges: list[dict],
    mode: str = "or",
    table: str = "documents",
) -> str:
    rs = _norm_ip_ranges(ranges)
    m = _match_sql(query, mode, None, "ascii")
    num = _ip_num_sql(field)
    parts = []
    for k, lo, hi in rs:
        conds = [m, f"{num} IS NOT NULL"]
        if lo is not None:
            conds.append(f"{num} >= {int(lo)}")
        if hi is not None:
            conds.append(f"{num} < {int(hi)}")
        key = k.replace("'", "''")
        parts.append(
            f"SELECT '{key}' AS key, count(*) FILTER (WHERE {' AND '.join(conds)}) AS count\nFROM {table}"
        )
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts) + "\n) ORDER BY key"
