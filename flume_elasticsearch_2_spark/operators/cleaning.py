"""Training-data cleaning operators: PII redaction, within-doc repetition
metrics, cross-doc duplicated n-gram spans (SURVEY §2.7 / the LLM-pipeline
operator family).

These are the standard web-corpus hygiene passes a 100 TB training-data
pipeline runs between ingest and indexing (cf. C4 / RefinedWeb /
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022 — public methodology; implementations here are original Spark-first
expressions):

* ``redact_pii_col``: regex redaction of emails / phone numbers / IPv4s.
  The pattern dialect is the RE2-compatible subset of Java regex, so Spark
  (Java), DuckDB (RE2), and Python agree byte-for-byte — parity pinned on
  crafted strings in tests; conservative by design (favor precision: no
  lookarounds, no catastrophic backtracking candidates).
* ``repetition_metrics``: per-doc n-gram repetition ratio (1 − distinct/
  total) — the standard boilerplate/degenerate-text quality signal. Pure
  JVM (sequence+transform over the token array, no explode), one narrow
  pass.
* ``duplicated_ngrams``: exact n-gram spans occurring in ≥ ``min_df`` docs
  — the discovery half of exact-substring dedup. ONE exploded-distinct
  aggregation with map-side combine: at 10^12 docs the shuffle carries at
  most |distinct grams per partition| rows, never per-occurrence rows.

Scale notes: all three are single-pass, shuffle-light, and JVM-side; the
only exchange is ``duplicated_ngrams``' gram-keyed aggregation. Redaction
composes with the extract stage of plans/pipeline.py (same regexp_replace
family the reference's interceptor chain uses, FileSource.java:168).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokens_col

# RE2 ∩ Java-regex dialect; order matters (email before phone: an email's
# digits must not be half-eaten as a phone number)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9 ()\-]{7,}[0-9]",
}
REDACT_TOKEN = "<PII>"


def redact_pii_col(
    text_col: Column | str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    token: str = REDACT_TOKEN,
) -> Column:
    """Chained JVM ``regexp_replace`` redaction — no UDF, stays in codegen."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for k in kinds:
        col = F.regexp_replace(col, PII_PATTERNS[k], token)
    return col


def redact_pii_sql_expr(
    text_expr: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    token: str = REDACT_TOKEN,
) -> str:
    """DuckDB twin of :func:`redact_pii_col` (global regexp_replace)."""
    expr = text_expr
    for k in kinds:
        expr = f"regexp_replace({expr}, '{PII_PATTERNS[k]}', '{token}', 'g')"
    return expr


def redact_pii_py(text: str, kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
                  token: str = REDACT_TOKEN) -> str:
    """Python twin (three-engine parity pinned in tests)."""
    import re

    for k in kinds:
        text = re.sub(PII_PATTERNS[k], token, text)
    return text


def _ngrams_col(toks: Column, n: int) -> Column:
    """array<string> of space-joined n-grams of the token array (JVM-only:
    sequence + transform + slice, no explode)."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def repetition_metrics(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, repetition_ratio): the fraction of
    repeated n-grams within each doc, rounded to 6 — degenerate/boilerplate
    text scores high. One narrow pass, no shuffle."""
    grams = _ngrams_col(tokens_col(text_col, analyzer=analyzer), n)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(grams).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        F.when(F.size(grams) <= 0, F.lit(0.0))
        .otherwise(
            F.round(1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 6)
        )
        .alias("repetition_ratio"),
    )


def repetition_metrics_sql(
    n: int = 3, table: str = "documents", analyzer: str = "ascii"
) -> str:
    """DuckDB oracle for :func:`repetition_metrics`."""
    tok = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) END"
    )
    return f"""
SELECT doc_id,
       CAST(len({grams}) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct({grams})) AS BIGINT) AS n_distinct,
       CASE WHEN len({grams}) <= 0 THEN 0.0
            ELSE round(1.0 - len(list_distinct({grams})) / len({grams}), 6)
       END AS repetition_ratio
FROM {table}
"""


def duplicated_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """(gram, df): exact n-gram spans present in at least ``min_df``
    distinct docs — the cross-doc duplicated-span inventory that drives
    exact-substring dedup. Per-doc grams are DISTINCT'd inside the array
    (JVM) before exploding, so the aggregation's map-side combine sees one
    row per (doc, gram); the shuffle carries partial counts per gram."""
    grams = F.array_distinct(_ngrams_col(tokens_col(text_col, analyzer=analyzer), n))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("df"))
        .where(F.col("df") >= int(min_df))
        .orderBy(F.col("df").desc(), F.col("gram").asc())
    )


def duplicated_ngrams_sql(
    n: int = 5, min_df: int = 2, table: str = "documents", analyzer: str = "ascii"
) -> str:
    """DuckDB oracle for :func:`duplicated_ngrams`."""
    tok = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) END"
    )
    return f"""
SELECT gram, CAST(count(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, unnest(list_distinct({grams})) AS gram FROM {table})
GROUP BY gram
HAVING count(*) >= {int(min_df)}
ORDER BY df DESC, gram ASC
"""


def doc_dup_fraction(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """(doc_id, n_ngrams, n_dup, dup_fraction): per doc, the fraction of its
    distinct n-grams that are CORPUS-duplicated (present in >= ``min_df``
    docs) — the removal half of exact-substring dedup: filter or down-weight
    docs above a threshold.

    Scale shape: one exploded-distinct (doc, gram) table feeds BOTH the
    gram-df aggregation and the per-doc dup count; the df set is joined back
    by a semi-join ON GRAM (shuffle-partitioned both sides — at 100 TB the
    duplicated-gram set is far too large to broadcast, and this plan never
    assumes it fits anywhere). Two gram-keyed exchanges total, each carrying
    per-(doc,gram)-distinct rows, never per-occurrence rows."""
    grams = F.array_distinct(_ngrams_col(tokens_col(text_col, analyzer=analyzer), n))
    base = docs.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))
    ex = base.select("doc_id", F.explode("grams").alias("gram"))
    dup = (
        ex.groupBy("gram")
        .agg(F.count("*").alias("gdf"))
        .where(F.col("gdf") >= int(min_df))
        .select("gram")
    )
    nd = (
        ex.join(dup, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_dup"))
    )
    tot = base.select("doc_id", F.size("grams").cast("long").alias("n_ngrams"))
    return tot.join(nd, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
        F.when(F.col("n_ngrams") <= 0, F.lit(0.0))
        .otherwise(F.round(F.coalesce(F.col("n_dup"), F.lit(0)) / F.col("n_ngrams"), 6))
        .alias("dup_fraction"),
    )


def doc_dup_fraction_sql(
    n: int = 5, min_df: int = 2, table: str = "documents", analyzer: str = "ascii"
) -> str:
    """DuckDB oracle for :func:`doc_dup_fraction`."""
    tok = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_distinct(list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' '))) END"
    )
    return f"""
WITH ex AS (SELECT doc_id, unnest({grams}) AS gram FROM {table}),
dup AS (SELECT gram FROM ex GROUP BY gram HAVING count(*) >= {int(min_df)}),
nd AS (
  SELECT doc_id, count(*) AS n_dup FROM ex
  WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id
),
tot AS (SELECT doc_id, len({grams}) AS n_ngrams FROM {table})
SELECT tot.doc_id,
       CAST(tot.n_ngrams AS BIGINT) AS n_ngrams,
       CAST(coalesce(nd.n_dup, 0) AS BIGINT) AS n_dup,
       CASE WHEN tot.n_ngrams <= 0 THEN 0.0
            ELSE round(coalesce(nd.n_dup, 0) / tot.n_ngrams, 6)
       END AS dup_fraction
FROM tot LEFT JOIN nd ON tot.doc_id = nd.doc_id
"""


def clean_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] | None = ("en", "fr", "de"),
    min_quality: float = 0.3,
    max_repetition: float = 0.5,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The composed C4/RefinedWeb-style hygiene pass as ONE declarative
    plan: language allowlist → quality floor → within-doc repetition cap →
    PII redaction. Returns (doc_id, lang, clean_text) for the survivors.

    Scale shape: every predicate and the redaction are per-row JVM
    expressions over a single narrow scan — no shuffle, no UDF; Catalyst
    collapses the whole pass into one WholeStageCodegen stage. Cross-doc
    signals (``doc_dup_fraction``) intentionally stay a separate composable
    join, since they need a corpus aggregation the per-doc pass does not."""
    from ..functions.text import quality_score_col

    grams = _ngrams_col(tokens_col(text_col), ngram)
    rep = F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 6)
    )
    out = docs
    if langs is not None:
        out = out.where(F.col(lang_col).isin(list(langs)))
    return (
        out.where(quality_score_col(text_col) >= float(min_quality))
        .where(rep <= float(max_repetition))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            redact_pii_col(text_col).alias("clean_text"),
        )
    )


def clean_corpus_sql(
    langs: tuple[str, ...] | None = ("en", "fr", "de"),
    min_quality: float = 0.3,
    max_repetition: float = 0.5,
    ngram: int = 3,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`clean_corpus`."""
    n = ngram
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) END"
    )
    quality = (
        f"floor((CASE WHEN len({tok}) BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.3 END)"
        "  * (0.5 + 0.5 * length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE"
        "      / greatest(length(text), 1))"
        "  * (1.0 - length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE"
        "      / greatest(length(text), 1)) * 1000000.0 + 0.5) / 1000000.0"
    )
    rep = (
        f"CASE WHEN len({grams}) <= 0 THEN 0.0 "
        f"ELSE round(1.0 - len(list_distinct({grams})) / len({grams}), 6) END"
    )
    lang_pred = (
        "TRUE" if langs is None
        else "lang IN (" + ", ".join(f"'{la}'" for la in langs) + ")"
    )
    return f"""
SELECT doc_id, lang, {redact_pii_sql_expr()} AS clean_text
FROM {table}
WHERE {lang_pred}
  AND {quality} >= {float(min_quality)!r}
  AND {rep} <= {float(max_repetition)!r}
"""


# -- collocations (PMI bigrams) --------------------------------------------------


def collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information —
    the corpus-linguistics primitive behind phrase discovery / tokenizer
    vocab curation in web-scale text pipelines. PMI(a,b) =
    ln( (c(ab)/N₂) / ((c(a)/N₁)·(c(b)/N₁)) ) with c(ab) adjacent-pair
    counts, N₂ total bigrams, c(·)/N₁ unigram probabilities; bigrams below
    ``min_count`` are dropped (PMI's low-count noise). Returns
    (bigram, n, pmi) ordered (pmi DESC, bigram ASC), pmi rounded 6.

    Scale shape: bigrams come from ONE ``transform`` over each token array
    (no positional self-join) exploded into a map-side-combined count agg —
    the index-build shuffle shape (≤ bigram-vocabulary × partitions rows);
    unigram counts ride a second identical agg; the final PMI expression
    joins the tiny bigram table against the broadcast unigram dictionary.
    """
    toks = tokens_col(text_col)
    # Spark array brackets are 0-BASED (unlike element_at): slice element i
    # (0-based lambda index) is full-array [i], so the successor is [i + 1]
    bigrams = F.expr(
        "transform(slice({t}, 1, greatest(size({t}) - 1, 0)), (x, i) -> "
        "concat(x, ' ', {t}[i + 1]))".format(t="__toks")
    )
    base = docs.select(toks.alias("__toks"))
    big = (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= int(min_count))
    )
    uni = (
        base.select(F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    totals = base.agg(
        F.sum(F.size("__toks")).alias("n1"),
        F.sum(F.greatest(F.size("__toks") - 1, F.lit(0))).alias("n2"),
    ).collect()[0]
    if totals["n1"] is None or not totals["n2"]:  # empty/token-less corpus
        return docs.sparkSession.createDataFrame(
            [], "bigram string, n long, pmi double"
        )
    n1, n2 = float(totals["n1"]), float(totals["n2"])
    a = F.split(F.col("bigram"), " ").getItem(0)
    b = F.split(F.col("bigram"), " ").getItem(1)
    ua = uni.select(F.col("term").alias("__a"), F.col("cnt").alias("ca"))
    ub = uni.select(F.col("term").alias("__b"), F.col("cnt").alias("cb"))
    pmi = F.log(
        (F.col("n") / F.lit(n2))
        / ((F.col("ca") / F.lit(n1)) * (F.col("cb") / F.lit(n1)))
    )
    return (
        big.join(F.broadcast(ua), a == F.col("__a"))
        .join(F.broadcast(ub), b == F.col("__b"))
        .withColumn("pmi_exact", pmi)
        .orderBy(F.col("pmi_exact").desc(), F.col("bigram").asc())
        .limit(int(k))
        .select("bigram", "n", F.round("pmi_exact", 6).alias("pmi"))
    )


def collocations_sql(
    k: int = 20, min_count: int = 5, table: str = "documents"
) -> str:
    """DuckDB oracle for :func:`collocations`."""
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
WITH toks AS (SELECT {tok} AS ts FROM {table}),
big AS (
  SELECT bigram, count(*) AS n FROM (
    SELECT unnest(list_transform(ts[1:greatest(len(ts) - 1, 0)],
                  (x, i) -> x || ' ' || ts[i + 1])) AS bigram
    FROM toks
  ) GROUP BY bigram HAVING count(*) >= {int(min_count)}
),
uni AS (
  SELECT term, count(*) AS cnt FROM (SELECT unnest(ts) AS term FROM toks) GROUP BY term
),
tot AS (
  SELECT CAST(sum(len(ts)) AS DOUBLE) AS n1,
         CAST(sum(greatest(len(ts) - 1, 0)) AS DOUBLE) AS n2
  FROM toks
)
SELECT b.bigram, b.n,
       round(ln((b.n / t.n2) / ((ua.cnt / t.n1) * (ub.cnt / t.n1))), 6) AS pmi
FROM big b
JOIN uni ua ON ua.term = split_part(b.bigram, ' ', 1)
JOIN uni ub ON ub.term = split_part(b.bigram, ' ', 2)
CROSS JOIN tot t
ORDER BY ln((b.n / t.n2) / ((ua.cnt / t.n1) * (ub.cnt / t.n1))) DESC, b.bigram ASC
LIMIT {int(k)}
"""
