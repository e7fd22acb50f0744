"""Multi-field analyzed search: per-field BM25 + ``dis_max`` / ``multi_match``
(SURVEY §2.5 Q28).

Reference analog: the delegated ES indexes EVERY field of the dynamic record
map (SystemUtil.java:23-32 serializes the whole map; FileSource.java:170-172
fields are dynamic), so a 1.x client can ``match`` any field and combine
fields with ``multi_match`` / ``dis_max`` (delegation site
ElasticsearchSink.java:54,66). This module is the native form: each analyzed
field scores as its own mini-index — per-field df, dl and avgdl, exactly
Lucene's per-field postings + norms — and ``dis_max`` combines clause scores
as ``max + tie_breaker * (sum - max)`` (``multi_match type=best_fields`` is
dis_max over the same query on every field, tie_breaker default 0 as in ES).

Scoring/ordering contract (pinned so the declarative plan, the serving
combiner and the DuckDB oracle are provably identical): the combined score
is rounded to 6 decimals and hits are ordered by ``(round6(combined) DESC,
doc_id ASC)``. For ``tie_breaker=0`` max commutes with the monotone rounding,
so combining ROUNDED per-field scores (what the serving path has) equals
rounding the exact max.

Scale shape (declarative path): ONE corpus pass — every field's token array,
per-field dl and per-(field, term) tf are projected as JVM expressions in a
single ``select``; one map-side-combined aggregation collects n_docs +
per-field avgdl + per-pair df as driver constants; the scoring pass ends in
``TakeOrderedAndProject``. No joins, no shuffles, no Python in the hot path —
the same two-narrow-pass shape as ``operators/topk.py`` widened to F fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B, K1, bm25_col
from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col

# a clause is (field, query, mode) with mode in {"or", "and"}
Clause = tuple[str, str, str]


def _clause_weights(query: str) -> dict[str, float]:
    w: dict[str, float] = {}
    for t in tokenize(query):
        w[t] = w.get(t, 0.0) + 1.0
    return w


def bm25_dismax_topk(
    docs: DataFrame,
    clauses: list[Clause],
    k: int = 10,
    tie_breaker: float = 0.0,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k ``dis_max`` over per-field BM25 ``match`` clauses.

    Each clause ``(field, query, mode)`` scores like ``bm25_topk`` would on
    that field (per-field df/dl/avgdl; AND mode requires every distinct term
    in the doc AND present in the field's corpus). A doc qualifies if ANY
    clause matches; its score is ``max(clause scores) + tie_breaker *
    (sum - max)`` — Lucene DisjunctionMaxQuery. Returns (doc_id, score)
    with the module's round6 ordering contract.
    """
    spark = docs.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    parsed = [(f, _clause_weights(q), mode) for f, q, mode in clauses]
    parsed = [(f, w, m) for f, w, m in parsed if w]
    if not parsed:
        return empty

    fields = sorted({f for f, _, _ in parsed})
    pairs = sorted({(f, t) for f, w, _ in parsed for t in w})
    fidx = {f: i for i, f in enumerate(fields)}
    pidx = {p: i for i, p in enumerate(pairs)}

    # ONE projection: per-field dl + per-(field, term) tf, all JVM
    def project(src: DataFrame) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")]
        toks = {f: tokens_col(f) for f in fields}
        cols += [
            F.size(toks[f]).cast("long").alias(f"dl_{i}") for f, i in fidx.items()
        ]
        # NB: plain single-arg closures — a `lambda x, t=t:` default-arg
        # capture would be introspected as an (element, index) lambda (see
        # operators/topk.py); F.filter evaluates eagerly per comprehension
        # iteration, so the closure binding is correct
        cols += [
            F.size(F.filter(toks[f], lambda x: x == F.lit(t)))
            .cast("double")
            .alias(f"tf_{i}")
            for (f, t), i in pidx.items()
        ]
        return src.select(*cols)

    per_doc = project(docs)
    stats_row = per_doc.agg(
        F.count("*").alias("n_docs"),
        *[F.avg(f"dl_{i}").alias(f"avgdl_{i}") for i in range(len(fields))],
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(pairs))
        ],
    ).collect()[0]
    n_docs = int(stats_row["n_docs"])
    if n_docs == 0:
        return empty
    avgdl = {f: float(stats_row[f"avgdl_{i}"] or 0.0) for f, i in fidx.items()}
    df = {p: int(stats_row[f"df_{i}"]) for p, i in pidx.items()}

    clause_cols = []
    for f, weights, mode in parsed:
        if avgdl[f] == 0.0:
            continue
        present = [t for t in weights if df[(f, t)] > 0]
        if not present or (mode == "and" and len(present) < len(weights)):
            continue  # clause can never match (same rule as bm25_topk)
        score = F.lit(0.0)
        for t in present:
            score = score + float(weights[t]) * bm25_col(
                F.col(f"tf_{pidx[(f, t)]}"),
                F.lit(df[(f, t)]),
                F.col(f"dl_{fidx[f]}"),
                F.lit(n_docs),
                F.lit(avgdl[f]),
                k1,
                b,
            )
        if mode == "and":
            cond = F.lit(True)
            for t in weights:
                cond = cond & (F.col(f"tf_{pidx[(f, t)]}") > 0)
            score = F.when(cond, score).otherwise(F.lit(0.0))
        clause_cols.append(score)
    if not clause_cols:
        return empty

    # matching clauses all score > 0 (tf > 0 => positive partials), so 0.0 is
    # a safe "clause did not match" sentinel for both max and sum
    best = F.greatest(*clause_cols) if len(clause_cols) > 1 else clause_cols[0]
    total = clause_cols[0]
    for c in clause_cols[1:]:
        total = total + c
    combined = best + F.lit(float(tie_breaker)) * (total - best)
    scored = per_doc.withColumn("score_r", F.round(combined, 6)).where(
        F.col("score_r") > 0.0
    )
    return (
        scored.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.col("score_r").alias("score"))
    )


def bm25_multi_match_topk(
    docs: DataFrame,
    query: str,
    fields: list[str],
    k: int = 10,
    mode: str = "or",
    tie_breaker: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``multi_match`` ``type=best_fields``: the same query matched on
    every field, combined with dis_max (ES default tie_breaker 0.0)."""
    return bm25_dismax_topk(
        docs, [(f, query, mode) for f in fields], k=k, tie_breaker=tie_breaker,
        id_col=id_col,
    )


# -- DuckDB oracle SQL --------------------------------------------------------


def _field_tokens_sql(field: str, field_exprs: dict[str, str] | None) -> str:
    expr = (field_exprs or {}).get(field, field)
    return f"regexp_extract_all(lower({expr}), '{duckdb_token_pattern()}')"


def dismax_topk_sql(
    clauses: list[Clause],
    k: int = 10,
    tie_breaker: float = 0.0,
    table: str = "documents",
    field_exprs: dict[str, str] | None = None,
) -> str:
    """DuckDB oracle for :func:`bm25_dismax_topk` — per-field token CTEs,
    per-clause scored sets, max+tie_breaker combine, identical round6
    ordering. ``field_exprs`` maps a field name to the SQL expression that
    produces it (for derived fields)."""
    parsed = [(f, _clause_weights(q), mode) for f, q, mode in clauses]
    parsed = [(f, w, m) for f, w, m in parsed if w]
    fields = sorted({f for f, _, _ in parsed})
    ctes = []
    for fi, f in enumerate(fields):
        te = _field_tokens_sql(f, field_exprs)
        ctes.append(
            f"toks_{fi} AS (SELECT doc_id, unnest({te}) AS term FROM {table})"
        )
        ctes.append(f"dl_{fi} AS (SELECT doc_id, len({te}) AS dl FROM {table})")
        ctes.append(
            f"stats_{fi} AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl_{fi})"
        )
    fidx = {f: i for i, f in enumerate(fields)}
    clause_sqls = []
    for ci, (f, weights, mode) in enumerate(parsed):
        fi = fidx[f]
        terms_values = ", ".join(f"('{t}', {c!r})" for t, c in sorted(weights.items()))
        in_list = ", ".join(f"'{t}'" for t in sorted(weights))
        having = (
            f"HAVING count(DISTINCT tf.term) = {len(weights)}" if mode == "and" else ""
        )
        ctes.append(f"q_{ci}(term, qw) AS (VALUES {terms_values})")
        ctes.append(
            f"""dfreq_{ci} AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks_{fi}
  WHERE term IN ({in_list}) GROUP BY term
)"""
        )
        ctes.append(
            f"""tf_{ci} AS (
  SELECT doc_id, term, count(*) AS tf FROM toks_{fi}
  WHERE term IN ({in_list}) GROUP BY doc_id, term
)"""
        )
        ctes.append(
            f"""c_{ci} AS (
  SELECT tf.doc_id,
         sum(q.qw * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS s
  FROM tf_{ci} tf
  JOIN dfreq_{ci} d USING (term) JOIN q_{ci} q ON q.term = tf.term
  JOIN dl_{fi} dl USING (doc_id) CROSS JOIN stats_{fi} s
  GROUP BY tf.doc_id
  {having}
)"""
        )
        clause_sqls.append(f"SELECT doc_id, s FROM c_{ci}")
    union = "\nUNION ALL\n".join(clause_sqls)
    ctes.append(f"all_scores AS ({union})")
    ctes.append(
        f"""comb AS (
  SELECT doc_id,
         max(s) + {float(tie_breaker)!r} * (sum(s) - max(s)) AS c
  FROM all_scores GROUP BY doc_id
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT doc_id, round(c, 6) AS score
FROM comb
WHERE round(c, 6) > 0
ORDER BY round(c, 6) DESC, doc_id ASC
LIMIT {k}
"""


def multi_match_topk_sql(
    query: str,
    fields: list[str],
    k: int = 10,
    mode: str = "or",
    tie_breaker: float = 0.0,
    table: str = "documents",
    field_exprs: dict[str, str] | None = None,
) -> str:
    """DuckDB oracle for :func:`bm25_multi_match_topk`."""
    return dismax_topk_sql(
        [(f, query, mode) for f in fields], k=k, tie_breaker=tie_breaker,
        table=table, field_exprs=field_exprs,
    )
