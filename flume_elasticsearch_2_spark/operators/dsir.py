"""DSIR-style data selection: hashed n-gram importance weights
(Data Selection for Language Models via Importance Resampling, Xie et al.
2023 — the public method behind quality-targeted pretraining mixtures).

Method (the paper's exact shape, self-contained): featurize every document
as a multiset of HASHED word n-grams (unigrams..n-grams hashed into ``B``
buckets), fit two add-alpha categorical bucket distributions — ``p`` on the
TARGET corpus (what we want more of) and ``q`` on the RAW corpus — and
weight each raw document by its log importance ratio::

    log w(x) = sum_{features f of x} [ ln p(bucket(f)) - ln q(bucket(f)) ]
    p(b) = (C_p(b) + alpha) / (N_p + alpha*B)     (q analogous)

``dsir_select`` then keeps the best ``keep_frac`` by a deterministic
(log_weight DESC, id ASC) rank cut — the exact oracle form of the paper's
Gumbel resampling step (which adds sampling noise this engine pins out).

Cross-engine exactness: per-feature terms are scaled to INTEGER nano-nats
(``floor(nats * 1e9 + 0.5)`` — the charlm/quantize parity trick) and
summed as BIGINT, so Spark's in-row array fold and DuckDB's unordered
GROUP BY sum agree bit-for-bit; the +0.5 floor also absorbs any last-ulp
``ln`` divergence between the JVM and libm. Bucket ids use the house
cross-engine 60-bit md5 hash (functions/text.py md5_long_col), so the
featurization itself is bit-identical in both engines.

Scale shape (100 TB): TWO training passes (raw + target), each ONE explode
into a map-side-combined count of at most ``B`` buckets collected to the
driver (B defaults to 1024 — driver-sized at any corpus scale); scoring is
a zero-join, zero-shuffle per-row JVM ``aggregate`` fold with the two count
maps inlined as ``str_to_map`` literal constants. The rank cut is one
total-order sort of (weight, id) pairs; at 100 TB swap in a sampled
quantile threshold, for which this exact form is the oracle.

Reference analog: corpus curation rides ahead of the reference's ingestion
(FileSource.java:128-191 feeding the delegated index at
ElasticsearchSink.java:66); importance reweighting is the LLM-pipeline
extension of that stage.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col
from ..functions.tokenizer import duckdb_token_pattern, tokens_col

__all__ = [
    "dsir_log_weights", "dsir_log_weights_sql",
    "dsir_select", "dsir_select_sql",
]

_SCALE = 1_000_000_000.0  # nano-nats


def _gram_cols(toks, n: int):
    """Array of word n-grams (sizes 1..n) from a token-array column — pure
    JVM transform/slice, no explode until the training agg needs one."""
    parts = []
    for s in range(1, n + 1):
        parts.append(
            F.when(
                F.size(toks) >= s,
                F.expr(
                    f"transform(sequence(1, size(_toks_c) - {s - 1}), "
                    f"i -> array_join(slice(_toks_c, i, {s}), ' '))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def _bucket_col(grams, buckets: int):
    return F.transform(grams, lambda g: md5_long_col(g) % buckets)


def _gram_sql(s: int) -> str:
    # DuckDB list_slice is INCLUSIVE-inclusive; range(a, b) excludes b
    return (
        f"list_transform(range(1, len(toks) - {s - 1} + 1), "
        f"i -> array_to_string(list_slice(toks, i, i + {s - 1}), ' '))"
    )


def _features_sql(n: int) -> str:
    parts = [
        f"(CASE WHEN len(toks) >= {s} THEN {_gram_sql(s)} ELSE [] END)"
        for s in range(1, n + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = f"list_concat({out}, {p})"
    return out


def _train_counts(docs: DataFrame, buckets: int, n: int,
                  text_col: str) -> tuple[dict[int, int], int]:
    rows = (
        docs.select(tokens_col(text_col).alias("_toks_c"))
        .select(_bucket_col(_gram_cols(F.col("_toks_c"), n), buckets).alias("_b"))
        .select(F.explode("_b").alias("b"))
        .groupBy("b").count().collect()
    )
    counts = {int(r["b"]): int(r["count"]) for r in rows}
    return counts, sum(counts.values())


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    n: int = 2,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_feats, log_weight) for every raw doc with >= 1 feature,
    ordered by id. ``log_weight`` is the summed log importance ratio in
    nats, rounded to 6 (positive = more target-like than raw-average)."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if buckets < 2 or n < 1:
        raise ValueError("buckets must be >= 2 and n >= 1")
    cq, nq = _train_counts(docs, buckets, n, text_col)
    cp, np_ = _train_counts(target, buckets, n, text_col)
    if nq == 0 or np_ == 0:
        raise ValueError("raw/target corpus has no features to train on")
    alpha_b = alpha * buckets  # one Python float, injected into BOTH engines
    p_map = ",".join(f"{k}:{v}" for k, v in sorted(cp.items()))
    q_map = ",".join(f"{k}:{v}" for k, v in sorted(cq.items()))
    term = (
        "CAST(floor((ln("
        f"(coalesce(CAST(element_at(str_to_map('{p_map}', ',', ':'), CAST(b AS STRING)) AS DOUBLE), 0.0D) + {alpha!r}D) / "
        f"({np_}D + {alpha_b!r}D)"
        ") - ln("
        f"(coalesce(CAST(element_at(str_to_map('{q_map}', ',', ':'), CAST(b AS STRING)) AS DOUBLE), 0.0D) + {alpha!r}D) / "
        f"({nq}D + {alpha_b!r}D)"
        f")) * {_SCALE!r}D + 0.5D) AS BIGINT)"
    )
    nats = F.expr(
        f"aggregate(_bks_c, CAST(0 AS BIGINT), (acc, b) -> acc + {term})"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("_toks_c"))
        .withColumn("_bks_c", _bucket_col(_gram_cols(F.col("_toks_c"), n), buckets))
        .withColumn("n_feats", F.size("_bks_c").cast("long"))
        .where(F.col("n_feats") > 0)
        .select(
            F.col("doc_id").alias(id_col),
            "n_feats",
            F.round(nats / F.lit(_SCALE), 6).alias("log_weight"),
        )
        .orderBy(id_col)
    )


def dsir_log_weights_sql(
    target_where: str,
    buckets: int = 1024,
    n: int = 2,
    alpha: float = 0.1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle: the target corpus is ``{table} WHERE {target_where}``
    (the driver-entry config); train CTEs + the identical nano-nat term,
    joined per feature instead of inlined as literal maps — an independent
    derivation of the same integers."""
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if buckets < 2 or n < 1:
        raise ValueError("buckets must be >= 2 and n >= 1")
    alpha_b = alpha * buckets
    tok = f"regexp_extract_all(lower({text_col}), '{duckdb_token_pattern('ascii')}')"
    h = MD5_LONG_SQL.format(expr="f") + f" % {buckets}"
    return f"""
WITH raw_toks AS (
  SELECT {id_col} AS doc_id, {tok} AS toks FROM {table}
),
tgt_toks AS (
  SELECT {id_col} AS doc_id, {tok} AS toks FROM {table} WHERE {target_where}
),
raw_feats AS (
  SELECT doc_id, {h} AS b
  FROM (SELECT doc_id, unnest({_features_sql(n)}) AS f FROM raw_toks)
),
tgt_feats AS (
  SELECT {h} AS b
  FROM (SELECT unnest({_features_sql(n)}) AS f FROM tgt_toks)
),
cq AS (SELECT b, count(*) AS c FROM raw_feats GROUP BY b),
cp AS (SELECT b, count(*) AS c FROM tgt_feats GROUP BY b),
nq AS (SELECT sum(c) AS t FROM cq),
np AS (SELECT sum(c) AS t FROM cp),
terms AS (
  SELECT rf.doc_id,
         CAST(floor((ln((coalesce(cp.c, 0) + {alpha!r}) / (np.t + {alpha_b!r}))
                   - ln((coalesce(cq.c, 0) + {alpha!r}) / (nq.t + {alpha_b!r})))
                    * {_SCALE!r} + 0.5) AS BIGINT) AS nats
  FROM raw_feats rf
  LEFT JOIN cp ON cp.b = rf.b
  LEFT JOIN cq ON cq.b = rf.b
  CROSS JOIN np CROSS JOIN nq
)
SELECT doc_id AS {id_col}, CAST(count(*) AS BIGINT) AS n_feats,
       round(CAST(sum(nats) AS DOUBLE) / {_SCALE!r}, 6) AS log_weight
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    keep_frac: float = 0.5,
    buckets: int = 1024,
    n: int = 2,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the most target-like ``keep_frac`` of scorable raw docs:
    deterministic rank cut under (log_weight DESC, id ASC) — the exact
    form of the paper's resampling step (see module doc). Returns
    (id_col, log_weight) of the kept docs, ordered by id."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    from pyspark.sql import Window

    scored = dsir_log_weights(
        docs, target, buckets=buckets, n=n, alpha=alpha,
        id_col=id_col, text_col=text_col,
    )
    w = Window.orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
    keep = math.ceil(keep_frac * scored.count())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= keep)
        .select(id_col, "log_weight")
        .orderBy(id_col)
    )


def dsir_select_sql(
    target_where: str,
    keep_frac: float = 0.5,
    buckets: int = 1024,
    n: int = 2,
    alpha: float = 0.1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`dsir_select` (same rank cut; ceil in SQL)."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    inner = dsir_log_weights_sql(
        target_where, buckets=buckets, n=n, alpha=alpha,
        table=table, id_col=id_col, text_col=text_col,
    )
    return f"""
WITH scored AS ({inner}),
ranked AS (
  SELECT {id_col}, log_weight,
         row_number() OVER (ORDER BY log_weight DESC, {id_col} ASC) AS rk,
         count(*) OVER () AS n
  FROM scored
)
SELECT {id_col}, log_weight FROM ranked
WHERE rk <= CAST(ceil({keep_frac!r} * n) AS BIGINT)
ORDER BY {id_col}
"""
