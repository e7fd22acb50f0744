"""CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data").

LLM-pipeline role: CCNet splits each language's documents into
head / middle / tail thirds by LM perplexity; downstream training recipes
keep head(+middle) or reweight by bucket. This operator implements that
exact shape over the self-contained character-bigram LM
(:mod:`.charlm` — the same proxy the ``charlm_*`` entries use, so the
whole pass is value-oracle-checkable without an external KenLM model).

Semantics (pinned):

- score every doc with :func:`charlm_score` (higher avg_logprob = lower
  perplexity = better);
- per ``lang_col`` partition, rank docs by (avg_logprob DESC, id ASC) —
  the deterministic rank form, not an interpolated quantile, so the cut is
  engine-independent;
- bucket 'head' = rank <= ceil(head_frac * n_lang), 'middle' = rank <=
  ceil((head_frac + middle_frac) * n_lang), else 'tail'. The combined
  fraction is computed ONCE in Python and injected as the same float64
  literal into both engines.

Unscorable docs (no bigram after normalization) are absent from the
output, exactly as in ``charlm_score``.

Scale shape (100 TB): scoring is the charlm literal-fold — zero joins,
zero shuffles (the model is ~1369 driver-side ints broadcast as a literal
map); bucketing is ONE hash exchange on lang + a per-language sort. A
language's partition is as large as its corpus slice, so at extreme scale
swap the exact rank for a sampled per-language score threshold
(approxQuantile per lang) and a map-side CASE — this exact form is the
oracle for that approximation. No UDFs anywhere.

Reference analog: content-quality staging rides the reference's
interceptor chain (FileSource.java:170-172 feeding the delegated index at
ElasticsearchSink.java:66); CCNet bucketing is the LLM-pipeline extension
of that stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .charlm import charlm_score, charlm_score_sql

__all__ = ["ccnet_buckets", "ccnet_buckets_sql"]


def _check_fracs(head_frac: float, middle_frac: float) -> float:
    if not (0.0 < head_frac < 1.0) or not (0.0 <= middle_frac < 1.0):
        raise ValueError("head_frac must be in (0,1), middle_frac in [0,1)")
    hm = head_frac + middle_frac
    if hm > 1.0:
        raise ValueError("head_frac + middle_frac must be <= 1")
    return hm


def ccnet_buckets(
    docs: DataFrame,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, lang, avg_logprob, bucket) for every scorable doc, ordered
    by id; bucket in {'head','middle','tail'} per the module contract."""
    hm = _check_fracs(head_frac, middle_frac)
    scored = charlm_score(
        docs, alpha=alpha, id_col=id_col, text_col=text_col,
        carry_cols=(lang_col,),
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(lang_col)
    n = F.count(F.lit(1)).over(wn).cast("double")
    rk = F.row_number().over(w)
    bucket = (
        F.when(rk <= F.ceil(F.lit(head_frac) * n), F.lit("head"))
        .when(rk <= F.ceil(F.lit(hm) * n), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.select(id_col, lang_col, "avg_logprob", bucket.alias("bucket"))
        .orderBy(id_col)
    )


def ccnet_buckets_sql(
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 0.1,
    table: str = "documents",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`ccnet_buckets` — same scored rows (the
    charlm nano-nat oracle with the lang column carried), same per-language
    rank windows, same injected fraction literals."""
    hm = _check_fracs(head_frac, middle_frac)
    inner = charlm_score_sql(
        alpha=alpha, table=table, id_col=id_col, text_col=text_col,
        carry_cols=(lang_col,),
    )
    return f"""
WITH scored AS ({inner}),
ranked AS (
  SELECT {id_col}, {lang_col}, avg_logprob,
         row_number() OVER (PARTITION BY {lang_col}
                            ORDER BY avg_logprob DESC, {id_col} ASC) AS rk,
         CAST(count(*) OVER (PARTITION BY {lang_col}) AS DOUBLE) AS n
  FROM scored
)
SELECT {id_col}, {lang_col}, avg_logprob,
       CASE WHEN rk <= CAST(ceil({head_frac!r} * n) AS BIGINT) THEN 'head'
            WHEN rk <= CAST(ceil({hm!r} * n) AS BIGINT) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked ORDER BY {id_col}
"""
