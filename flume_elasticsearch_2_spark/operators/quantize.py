"""Scalar int8 embedding quantization + quantized cosine top-k — the
memory/IO-reduction path a 100 TB embedding corpus needs before ANN
(4 bytes/dim float32 → 1 byte/dim codes; the standard per-vector scalar
quantization used by FAISS's SQ8 / Lucene 9 KNN, public technique).

Reference analog: beyond the reference (brief-mandated embedding family,
SURVEY §2.8), composing with `operators/similarity.py`'s exact/LSH/IVF
search surface.

Per-vector affine quantization, deterministic and ORACLE-CHECKABLE (no
training, no randomness): ``mn = min(vec)``, ``scale = (max(vec) - mn) /
255``; ``code_i = floor((x_i - mn)/scale + 0.5)`` ∈ [0, 255] (explicit
floor(+0.5) so both engines round identically — never engine round());
dequantized ``x̂_i = mn + code_i * scale``. A constant vector (mx == mn)
stores scale 0 and dequantizes to mn exactly.

Scale shape: quantization is ONE narrow map-side pass (pure JVM lambda
expressions — no UDF, no shuffle); `quantize_embeddings` materializes
(id, mn, scale, codes) to Parquet once, then every search reads 1/4 the
bytes (codes land as INT32 in this Parquet layout; a production layout
packs them BINARY 1 B/dim — the scan-cost argument, not correctness,
changes). Scoring dequantizes in-expression inside the same fold the
exact scorer uses, so the quantized search is the exact search's plan
with a cheaper input."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import _dot, _norm


def _mn_scale(vec: Column) -> tuple[Column, Column]:
    mn = F.array_min(vec).cast("double")
    scale = (F.array_max(vec).cast("double") - mn) / F.lit(255.0)
    return mn, scale


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to ``(id, mn, scale, codes)`` — one narrow
    JVM pass, write-ready (partition/bucket by id downstream as the
    corpus layout dictates)."""
    mn, scale = _mn_scale(F.col(vec_col))
    codes = F.when(
        scale > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor((x.cast("double") - mn) / scale + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return df.select(
        F.col(id_col).alias("id"), mn.alias("mn"), scale.alias("scale"),
        codes.alias("codes"),
    )


def dequantize_col(codes: Column, mn: Column, scale: Column) -> Column:
    """x̂ = mn + code * scale, elementwise (pure JVM)."""
    return F.transform(codes, lambda c: mn + c.cast("double") * scale)


def cosine_topk_quantized(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over int8-DEQUANTIZED vectors (the full-precision query
    scores against x̂): quantize → dequantize → the exact scorer's fold, in
    ONE narrow pass ending in TakeOrdered — identical plan shape to
    :func:`~.similarity.cosine_topk`, reading-cost reduced by the code
    layout. Deterministic; rounded to 6; tie-break (cosine DESC, id ASC)."""
    qz = quantize_embeddings(df, id_col, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    dq = dequantize_col(F.col("codes"), F.col("mn"), F.col("scale"))
    # rank on the UNROUNDED cosine (the oracle's ORDER BY) — quantization
    # collapses values, so round-level ties are likelier than in the float
    # path and a rounded sort key could admit/order a different row
    scored = qz.select(
        F.col("id"), (_dot(dq, q) / (_norm(dq) * _norm(q))).alias("__raw")
    )
    return (
        scored.orderBy(F.col("__raw").desc(), F.col("id").asc()).limit(k)
        .select("id", F.round("__raw", 6).alias("cosine"))
    )


def cosine_topk_quantized_sql(
    query_id: int = 0,
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for :func:`cosine_topk_quantized` (query = the stored
    vector ``query_id``, as the driver entry uses): identical quantize →
    dequantize → fold arithmetic, element order preserved by the ordered
    unnest."""
    return f"""
WITH q AS (SELECT embedding AS qe FROM {table} WHERE vec_id = {int(query_id)}),
qz AS (
  SELECT vec_id AS id,
         CAST(list_min(embedding) AS DOUBLE) AS mn,
         (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
           / 255.0 AS scale,
         embedding
  FROM {table}
),
expand AS (
  SELECT qz.id, t.i,
         CASE WHEN qz.scale > 0
              THEN qz.mn + floor((qz.embedding[t.i]::DOUBLE - qz.mn) / qz.scale + 0.5)
                   * qz.scale
              ELSE qz.mn END AS xd,
         q.qe[t.i]::DOUBLE AS qd
  FROM qz, q, unnest(range(1, {int(dim) + 1})) AS t(i)
),
d AS (
  SELECT id, sum(xd * qd) AS dot, sqrt(sum(xd * xd)) AS na,
         sqrt(sum(qd * qd)) AS nb
  FROM expand GROUP BY id
)
SELECT id, round(dot / (na * nb), 6) AS cosine
FROM d ORDER BY dot / (na * nb) DESC, id ASC LIMIT {int(k)}
"""
