"""Character-bigram language-model quality scoring (CCNet-style perplexity
filtering, the proxy form that needs no external model).

LLM-pipeline role: CCNet/Gopher-style corpora rank documents by LM
perplexity and drop the worst tail. The real pipelines use a KenLM model
trained on a reference corpus; this operator implements the same *shape* —
train a smoothed LM, score every document, filter on the score — with a
character-bigram model trained on the corpus itself, so it is fully
self-contained and value-oracle-checkable. Gibberish, encoding junk and
repetition-free random strings score far below natural text exactly as with
the heavyweight model.

Model: add-alpha-smoothed bigram LM over the normalized alphabet
[a-z0-9 space] (V = 37 fixed)::

    p(c_i | c_{i-1}) = (C(c_{i-1} c_i) + alpha) / (C(c_{i-1} .) + alpha*V)
    avg_logprob(doc) = (1/n_bigrams) * sum ln p   (natural log, nats/char)

Normalization: ``trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))`` —
non-alphanumeric RUNS collapse to one space, which also makes the Spark
(UTF-16 code units) and DuckDB (code points) regex engines agree on astral
characters (any junk run becomes exactly one space in both).

Cross-engine exactness: a per-doc float sum over hundreds of ln() terms
would be addition-order-sensitive. Instead each term is scaled to an
INTEGER — ``floor(ln(p) * 1e9 + 0.5)`` nano-nats, the quantize/HLL
parity trick — and summed as BIGINT: integer addition is order-free, so
Spark's sequential array fold and DuckDB's unordered GROUP BY sum agree
bit-for-bit; the final average divides the identical integer by the
identical count.

Scale shape (100 TB): training is ONE explode + map-side-combined count of
at most V^2 = 1369 keys collected to the driver; scoring is a pure per-row
JVM ``aggregate`` fold over the doc's bigram array with the counts
broadcast as two literal ``str_to_map`` constants — zero joins, zero
shuffles, whole-stage codegen. The driver-side model is ~1369 ints, so the
"train pass + literal-fold score pass" survives any corpus size.

Reference analog: content-quality transforms ride the reference's
interceptor chain (FileSource.java:170-172 field extraction feeding the
delegated index at ElasticsearchSink.java:66); perplexity filtering is the
LLM-pipeline extension of that stage.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "charlm_train", "charlm_score", "charlm_score_sql",
    "charlm_tail_filter", "charlm_tail_filter_sql", "ALPHABET_V",
]

ALPHABET_V = 37  # a-z, 0-9, space — fixed so the smoothing denominator is
# a constant, not a function of which characters the corpus happens to use

_NORM_RE = "[^a-z0-9]+"
_SCALE = 1_000_000_000.0  # nano-nats


def _norm_col(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " "))


def _bigrams_col(norm):
    # sequence(1, 0) in Spark yields a DESCENDING [1, 0] — guard length < 2
    return F.when(
        F.length(norm) >= 2,
        F.expr(
            "transform(sequence(1, length(_norm_c) - 1), "
            "i -> substring(_norm_c, i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def charlm_train(docs: DataFrame, text_col: str = "text") -> dict[str, int]:
    """Train the bigram LM: corpus bigram counts as a plain dict (at most
    V^2 = 1369 entries — driver-sized at any corpus scale). One explode +
    map-side-combined groupBy."""
    norm = _norm_col(text_col)
    rows = (
        docs.select(norm.alias("_norm_c"))
        .select(F.explode(_bigrams_col(F.col("_norm_c"))).alias("bg"))
        .groupBy("bg")
        .count()
        .collect()
    )
    return {r["bg"]: int(r["count"]) for r in rows}


def _ctx_counts(counts: dict[str, int]) -> dict[str, int]:
    ctx: dict[str, int] = {}
    for bg, c in counts.items():
        ctx[bg[0]] = ctx.get(bg[0], 0) + c
    return ctx


def charlm_score(
    docs: DataFrame,
    counts: dict[str, int] | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score every doc under the bigram LM: (id_col, n_bigrams,
    avg_logprob[, *carry_cols]) for docs with at least one bigram, ordered
    by id. ``counts=None`` trains on ``docs`` itself (the self-contained
    oracle config); pass a pre-trained dict to score against a reference
    corpus (the CCNet shape). ``carry_cols`` are passed through untouched
    (appended after avg_logprob) so downstream ops (per-language bucketing)
    need no join back to the corpus. ``avg_logprob`` is nats/char,
    rounded to 6."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if counts is None:
        counts = charlm_train(docs, text_col)
    if not counts:
        return (
            docs.select(id_col, *carry_cols)
            .limit(0)
            .withColumn("n_bigrams", F.lit(0).cast("long"))
            .withColumn("avg_logprob", F.lit(0.0).cast("double"))
            .select(id_col, "n_bigrams", "avg_logprob", *carry_cols)
        )
    ctx = _ctx_counts(counts)
    alpha_v = alpha * ALPHABET_V  # computed ONCE here; injected as the same
    # literal into both engines so the float denominator is identical
    bg_map = ",".join(f"{k}:{v}" for k, v in sorted(counts.items()))
    ctx_map = ",".join(f"{k}:{v}" for k, v in sorted(ctx.items()))
    # nano-nat integer per bigram: floor(ln(p)*1e9 + 0.5) — identical f64
    # inputs -> identical integer in Spark and DuckDB; BIGINT sums are
    # order-free, so the fold order cannot matter
    term = (
        "CAST(floor(ln("
        f"(coalesce(CAST(element_at(str_to_map('{bg_map}', ',', ':'), bg) AS DOUBLE), 0.0D) + {alpha!r}D) / "
        f"(coalesce(CAST(element_at(str_to_map('{ctx_map}', ',', ':'), substring(bg, 1, 1)) AS DOUBLE), 0.0D) + {alpha_v!r}D)"
        f") * {_SCALE!r}D + 0.5D) AS BIGINT)"
    )
    nats = F.expr(
        f"aggregate(_bgs_c, CAST(0 AS BIGINT), (acc, bg) -> acc + {term})"
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _norm_col(text_col).alias("_norm_c"),
            *[F.col(c) for c in carry_cols],
        )
        .withColumn("_bgs_c", _bigrams_col(F.col("_norm_c")))
        .withColumn("n_bigrams", F.size("_bgs_c").cast("long"))
        .where(F.col("n_bigrams") > 0)
        .select(
            F.col("doc_id").alias(id_col),
            "n_bigrams",
            F.round(
                (nats / F.lit(_SCALE)) / F.col("n_bigrams").cast("double"), 6
            ).alias("avg_logprob"),
            *carry_cols,
        )
        .orderBy(id_col)
    )


def charlm_score_sql(
    alpha: float = 0.1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB oracle for the self-trained :func:`charlm_score` config —
    train CTEs + the identical nano-nat integer term, summed per doc.
    ``carry_cols`` thread through the per-doc CTEs and the final GROUP BY
    exactly as the Spark side appends them."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    alpha_v = alpha * ALPHABET_V
    carry_sel = "".join(f", {c}" for c in carry_cols)
    carry_bg = "".join(f", bg.{c}" for c in carry_cols)
    return f"""
WITH norm AS (
  SELECT {id_col} AS doc_id{carry_sel},
         trim(regexp_replace(lower({text_col}), '{_NORM_RE}', ' ', 'g')) AS s
  FROM {table}
),
bg AS (
  SELECT doc_id{carry_sel}, unnest(list_transform(range(1, length(s)), i -> substr(s, i, 2))) AS b
  FROM norm WHERE length(s) >= 2
),
cnt AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
ctx AS (SELECT substr(b, 1, 1) AS ch, sum(c) AS c FROM cnt GROUP BY 1),
terms AS (
  SELECT bg.doc_id{carry_bg},
         CAST(floor(ln((cnt.c + {alpha!r}) / (ctx.c + {alpha_v!r})) * {_SCALE!r} + 0.5) AS BIGINT) AS nats
  FROM bg JOIN cnt ON cnt.b = bg.b JOIN ctx ON ctx.ch = substr(bg.b, 1, 1)
)
SELECT doc_id AS {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round((CAST(sum(nats) AS DOUBLE) / {_SCALE!r}) / count(*), 6) AS avg_logprob{carry_sel}
FROM terms GROUP BY doc_id{carry_sel} ORDER BY doc_id
"""


def charlm_tail_filter(
    docs: DataFrame,
    keep_frac: float = 0.9,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet-style tail drop: keep the best ``keep_frac`` of scorable
    docs by LM score. Rank-based, not quantile-based — keep rank <=
    ceil(keep_frac * N) under (avg_logprob DESC, doc_id ASC) — so the cut
    is deterministic and engine-independent (no interpolated-percentile
    parity surface). Returns (id_col, avg_logprob) of the kept docs,
    ordered by id.

    Scale: one window rank over the scored rows — a single total-order
    sort of (score, id) pairs, the same shape as any global top-p cut; at
    100 TB swap in an approximate threshold from a sampled quantile, which
    this exact form is the oracle for."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    from pyspark.sql import Window

    scored = charlm_score(docs, alpha=alpha, id_col=id_col, text_col=text_col)
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col(id_col).asc())
    n = scored.count()
    keep = math.ceil(keep_frac * n)
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= keep)
        .select(id_col, "avg_logprob")
        .orderBy(id_col)
    )


def charlm_tail_filter_sql(
    keep_frac: float = 0.9,
    alpha: float = 0.1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`charlm_tail_filter` (same rank cut over the
    same scored rows; ceil computed in SQL so N need not be known)."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    inner = charlm_score_sql(alpha=alpha, table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH scored AS ({inner}),
ranked AS (
  SELECT {id_col}, avg_logprob,
         row_number() OVER (ORDER BY avg_logprob DESC, {id_col} ASC) AS rk,
         count(*) OVER () AS n
  FROM scored
)
SELECT {id_col}, avg_logprob FROM ranked
WHERE rk <= CAST(ceil({keep_frac!r} * n) AS BIGINT)
ORDER BY {id_col}
"""
