"""Sort-by-field and from/size paging over a query's match set (ES `sort`
+ `from`/`size`; delegation site: ElasticsearchSink.java:54 — every search
option runs in ES; Lucene `Sort`/`TopFieldCollector` analog).

ES semantics: when `sort` names stored fields, hits are ordered by those
fields (not by score; scores are skipped entirely unless asked for), and
`from`/`size` page into the globally sorted list. Each shard returns its
local top-(from+size); the coordinator merges and slices — deep pages cost
every shard from+size work, which is why ES caps `from` (index.max_result_
window, default 10 000). Both paths here reproduce that shape exactly:

- Declarative (:func:`match_sorted`): `WHERE <match> ORDER BY fields
  LIMIT size OFFSET from` — Catalyst compiles the orderBy+offset+limit to a
  single `TakeOrderedAndProject(limit=from+size, offset=from)`: per
  partition top-(from+size) heaps, one driver merge, never a global sort.
- Serving (`IndexSearcher.search_sorted`, plans/query_index.py): per-shard
  match-set decode from postings doc streams, `(doc_id, fields)`-pruned
  docs read, local top-(from+size) per shard, tiny final merge.

A trailing `doc_id ASC` tiebreak is always appended so pages are
deterministic and non-overlapping (ES uses internal doc order; a stable
key is the reproducible analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .facets import _match_sql, match_condition

MAX_RESULT_WINDOW = 10_000  # ES index.max_result_window default


def _check_window(size: int, from_: int) -> None:
    if size < 0 or from_ < 0:
        raise ValueError("size and from_ must be non-negative")
    if from_ + size > MAX_RESULT_WINDOW:
        raise ValueError(
            f"from_+size = {from_ + size} exceeds max_result_window "
            f"({MAX_RESULT_WINDOW}); use search_after-style keyset paging "
            "for deeper scans"
        )


def _ascending(sort_by: list[tuple[str, str]]) -> list[bool]:
    out = []
    for _, o in sort_by:
        if o not in ("asc", "desc"):
            raise ValueError(f"sort order must be asc|desc, got {o!r}")
        out.append(o == "asc")
    return out


def after_condition(sort_by: list[tuple[str, str]], after: tuple, id_col: str = "doc_id"):
    """Boolean Column: row is STRICTLY after the ``after`` cursor in the
    composite (fields..., doc_id) sort order — ES ``search_after``. The
    cursor is the previous page's last hit's sort values + doc_id."""
    fields = [f for f, _ in sort_by] + [id_col]
    asc = _ascending(sort_by) + [True]
    if len(after) != len(fields):
        raise ValueError(f"after cursor needs {len(fields)} values (sort fields + id)")
    cond = F.lit(False)
    eq = F.lit(True)
    for f, a, av in zip(fields, asc, after):
        this = (F.col(f) > F.lit(av)) if a else (F.col(f) < F.lit(av))
        cond = cond | (eq & this)
        eq = eq & (F.col(f) == F.lit(av))
    return cond


def after_mask_pandas(df, sort_by: list[tuple[str, str]], after: tuple, id_col: str = "doc_id"):
    """NumPy boolean mask version of :func:`after_condition` — used by the
    serving path inside the per-shard partial (the cursor must filter
    BEFORE the local top-(size) truncation)."""
    import numpy as np

    fields = [f for f, _ in sort_by] + [id_col]
    asc = _ascending(sort_by) + [True]
    mask = np.zeros(len(df), dtype=bool)
    eq = np.ones(len(df), dtype=bool)
    for f, a, av in zip(fields, asc, after):
        col = df[f].to_numpy()
        this = (col > av) if a else (col < av)
        mask |= eq & this
        eq &= col == av
    return mask


def _after_sql(sort_by: list[tuple[str, str]], after: tuple) -> str:
    """The identical strictly-after predicate as SQL (explicit expansion —
    row-value compare only works for all-ascending keys)."""
    fields = [f for f, _ in sort_by] + ["doc_id"]
    asc = _ascending(sort_by) + [True]

    def lit(v):
        return f"'{v}'" if isinstance(v, str) else repr(v)

    clauses, eqs = [], []
    for f, a, av in zip(fields, asc, after):
        op = ">" if a else "<"
        prefix = " AND ".join(eqs + [f"{f} {op} {lit(av)}"])
        clauses.append(f"({prefix})")
        eqs.append(f"{f} = {lit(av)}")
    return "(" + " OR ".join(clauses) + ")"


def match_sorted(
    docs: DataFrame,
    query: str | None,
    sort_by: list[tuple[str, str]],
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    after: tuple | None = None,
) -> DataFrame:
    """Page [from_, from_+size) of the match set ordered by ``sort_by`` =
    [(field, "asc"|"desc"), ...]; returns (doc_id, *fields).

    ``after`` = ES ``search_after`` keyset cursor (last hit's sort values +
    doc_id): pages by a WHERE predicate instead of an offset, so page N
    costs the same as page 1 — the scale path past max_result_window.
    Mutually exclusive with ``from_``."""
    if after is not None and from_:
        raise ValueError("search_after and from_ are mutually exclusive (as in ES)")
    _check_window(size, 0 if after is not None else from_)
    asc = _ascending(sort_by)
    order = [
        F.col(f).asc() if a else F.col(f).desc() for (f, _), a in zip(sort_by, asc)
    ]
    order.append(F.col(id_col).asc())
    out = docs.where(match_condition(query, mode, text_col, stopwords, analyzer))
    if after is not None:
        out = out.where(after_condition(sort_by, after, id_col))
    return (
        out.select(F.col(id_col).alias("doc_id"), *[f for f, _ in sort_by])
        .orderBy(*order)
        .offset(int(from_))
        .limit(int(size))
    )


def match_script_sorted(
    docs: DataFrame,
    query: str | None,
    script_src: str,
    order: str = "asc",
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES 1.x ``_script`` sort, ``type: number`` (delegation site
    ElasticsearchSink.java:54): the match set ordered by a script value
    computed per doc — the Q39 arithmetic subset (functions/scripts.py)
    compiled ONCE into a pure-JVM Column riding the scan, so "script" sort
    costs exactly a field sort plus codegen arithmetic. ``doc['f'].value``
    NULLs pin to 0.0 (the doc-values contract), so null ordering cannot
    diverge between engines. Tie-break doc_id ASC; the output carries the
    sort value rounded to 6 (house hash-stability rule; ordering uses the
    exact float64). ``_score`` is rejected — ES skips scoring entirely on
    field/script-sorted searches, so no score is in scope."""
    from ..functions.scripts import parse_script

    if order not in ("asc", "desc"):
        raise ValueError(f"script sort order {order!r} (asc/desc)")
    _check_window(size, from_)
    script = parse_script(script_src)
    if script.uses_score:
        raise ValueError(
            "_script sort: _score is not in scope (ES skips scoring on "
            "sorted searches)"
        )
    # front-door refusal, matching the serving twin: an unknown doc field
    # must not surface as a deep Catalyst AnalysisException (review finding)
    missing = sorted(set(script.fields) - set(docs.columns))
    if missing:
        raise ValueError(
            f"_script sort fields {missing} are not columns of the corpus "
            f"(available: {sorted(docs.columns)})"
        )
    val = script.spark_col()
    return (
        docs.where(match_condition(query, mode, text_col, None, "ascii"))
        .select(
            F.col(id_col).alias("doc_id"),
            val.cast("double").alias("_sv"),
        )
        .orderBy(
            F.col("_sv").asc() if order == "asc" else F.col("_sv").desc(),
            F.col("doc_id").asc(),
        )
        .offset(int(from_))
        .limit(int(size))
        .select("doc_id", F.round(F.col("_sv"), 6).alias("sort_value"))
    )


def match_script_sorted_sql(
    query: str | None,
    script_src: str,
    order: str = "asc",
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`match_script_sorted` — the Script's
    identical-semantics SQL twin in both the projection and ORDER BY."""
    from ..functions.scripts import parse_script

    if order not in ("asc", "desc"):
        raise ValueError(f"script sort order {order!r} (asc/desc)")
    script = parse_script(script_src)
    if script.uses_score:
        raise ValueError("_script sort: _score is not in scope")
    expr = script.sql()
    return f"""
SELECT doc_id, round(CAST({expr} AS DOUBLE), 6) AS sort_value
FROM {table}
WHERE {_match_sql(query, mode, None, "ascii")}
ORDER BY CAST({expr} AS DOUBLE) {order.upper()}, doc_id ASC
LIMIT {int(size)} OFFSET {int(from_)}
"""


def match_sorted_sql(
    query: str | None,
    sort_by: list[tuple[str, str]],
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    after: tuple | None = None,
) -> str:
    """DuckDB oracle for :func:`match_sorted` (identical match + ordering)."""
    order = ", ".join(f"{f} {o.upper()}" for f, o in sort_by) + ", doc_id ASC"
    cols = ", ".join(["doc_id"] + [f for f, _ in sort_by])
    after_pred = "" if after is None else f"\n  AND {_after_sql(sort_by, after)}"
    return f"""
SELECT {cols}
FROM {table}
WHERE {_match_sql(query, mode, stopwords, analyzer)}{after_pred}
ORDER BY {order}
LIMIT {int(size)} OFFSET {int(from_)}
"""


def match_sorted_tracked(
    docs: DataFrame,
    query: str,
    sort_by: list[tuple[str, str]],
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES ``track_scores: true`` on a sorted search: hits are ordered by the
    sort fields exactly as :func:`match_sorted`, but each hit also carries
    its BM25 score (ES skips scoring on sorted searches unless asked).

    Plan: the page is the usual TakeOrderedAndProject; scores come from one
    corpus-stats agg (driver constants, the bm25_topk pass-1 shape) plus a
    BROADCAST join of the <= max_result_window page rows back to the corpus
    scan that recomputes tf/dl — scoring work is O(page), never a corpus
    sort by score. Returns (doc_id, *sort_fields, score) in sort order."""
    from ..functions.bm25 import bm25_col
    from ..functions.tokenizer import tokenize, tokens_col

    q_terms = tokenize(query or "")
    if not q_terms:
        raise ValueError("track_scores needs a scored (non-empty) query")
    page = match_sorted(
        docs, query, sort_by, size=size, from_=from_, mode=mode,
        id_col=id_col, text_col=text_col,
    )
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + 1.0
    distinct_terms = sorted(weights)
    toks = tokens_col(text_col)
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, lambda x: x == F.lit(t)))
            .cast("double").alias(f"tf_{i}")
            for i, t in enumerate(distinct_terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(distinct_terms))
        ],
    ).collect()[0]
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0
    score = F.lit(0.0)
    for i, t in enumerate(distinct_terms):
        df_t = int(stats[f"df_{i}"])
        if df_t == 0:
            continue
        score = score + float(weights[t]) * bm25_col(
            F.col(f"tf_{i}"), F.lit(df_t), F.col("dl"), F.lit(n_docs), F.lit(avgdl)
        )
    asc = _ascending(sort_by)
    order = [
        F.col(f).asc() if a else F.col(f).desc() for (f, _), a in zip(sort_by, asc)
    ]
    order.append(F.col("doc_id").asc())
    return (
        per_doc.join(F.broadcast(page), "doc_id")
        .select(
            "doc_id", *[f for f, _ in sort_by],
            F.round(score, 6).alias("score"),
        )
        .orderBy(*order)
    )


def match_sorted_tracked_sql(
    query: str,
    sort_by: list[tuple[str, str]],
    size: int = 10,
    from_: int = 0,
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`match_sorted_tracked` — the match_sorted
    page joined to the bm25_topk_sql scoring CTEs restricted to page docs
    (same formula, same 6-decimal rounding)."""
    from ..functions.tokenizer import duckdb_token_pattern, tokenize

    q_terms = tokenize(query or "")
    if not q_terms:
        raise ValueError("track_scores needs a scored (non-empty) query")
    weights: dict[str, float] = {}
    for t in q_terms:
        weights[t] = weights.get(t, 0.0) + 1.0
    terms_values = ", ".join(f"('{t}', {c!r})" for t, c in sorted(weights.items()))
    in_list = ", ".join(f"'{t}'" for t in sorted(weights))
    order = ", ".join(f"{f} {o.upper()}" for f, o in sort_by) + ", doc_id ASC"
    fields = ", ".join(f for f, _ in sort_by)
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern()}')"
    return f"""
WITH page AS (
  SELECT doc_id, {fields}
  FROM {table}
  WHERE {_match_sql(query, mode, None, 'ascii')}
  ORDER BY {order}
  LIMIT {int(size)} OFFSET {int(from_)}
),
toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dl AS (SELECT doc_id, len({tok_expr}) AS dl FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term, qw) AS (VALUES {terms_values}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ({in_list}) GROUP BY term
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({in_list}) GROUP BY doc_id, term
),
sc AS (
  SELECT tf.doc_id,
         round(sum(qterms.qw
           * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6) AS score
  FROM tf
  JOIN dfreq USING (term) JOIN qterms USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
  WHERE tf.doc_id IN (SELECT doc_id FROM page)
  GROUP BY tf.doc_id
)
SELECT p.doc_id, {', '.join('p.' + f for f, _ in sort_by)}, sc.score
FROM page p JOIN sc ON sc.doc_id = p.doc_id
ORDER BY {order.replace('doc_id ASC', 'p.doc_id ASC')}
"""
