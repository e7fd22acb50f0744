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

from ..functions.tokenizer import duckdb_token_pattern, duckdb_tokens_expr, tokens_col

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
    tok = duckdb_tokens_expr(analyzer)
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
    tok = duckdb_tokens_expr(analyzer)
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


def duplicated_spans(
    docs: DataFrame,
    n: int = 10,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """MAXIMAL duplicated token spans per doc — the span-level output of
    exact-substring dedup ("Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022: remove the duplicated SUBSTRING, not
    the whole document). Every position whose n-gram occurs in >= ``min_df``
    docs is a hit; overlapping/adjacent hit windows merge into maximal
    spans via the gaps-and-islands idiom (a new island opens when
    ``pos > prev_pos + n``). Returns ``(doc_id, start_token, end_token,
    n_grams)`` ordered — token-index spans the caller slices out of the
    analyzed stream (or maps to char offsets via its own tokenizer).

    Scale shape: df comes from ONE map-side-combined aggregation over
    per-doc-DISTINCT grams; hits are a gram-keyed shuffle join (the dup
    gram set is never assumed broadcastable); the island window is
    partitioned by doc — per-partition state bounded by dl, and the doc
    shuffle carries only hit positions, never text."""
    from pyspark.sql.window import Window

    toks = tokens_col(text_col, analyzer=analyzer)
    grams = _ngrams_col(toks, n)
    base = docs.select(F.col(id_col).alias("doc_id"), grams.alias("grams"))
    pos_grams = base.select(
        "doc_id", F.posexplode("grams").alias("pos", "gram")
    )
    dup = (
        base.select("doc_id", F.explode(F.array_distinct(F.col("grams"))).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("gdf"))
        .where(F.col("gdf") >= int(min_df))
        .select("gram")
    )
    hits = pos_grams.join(dup, "gram", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = (
        F.when(F.lag("pos").over(w).isNull(), F.lit(0))
        .when(F.col("pos") > F.lag("pos").over(w) + int(n), F.lit(1))
        .otherwise(F.lit(0))
    )
    isl = hits.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("start_token"),
            (F.max("pos") + int(n) - 1).cast("long").alias("end_token"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select("doc_id", "start_token", "end_token", "n_grams")
        .orderBy("doc_id", "start_token")
    )


def duplicated_spans_sql(
    n: int = 10, min_df: int = 2, table: str = "documents", analyzer: str = "ascii"
) -> str:
    """DuckDB oracle for :func:`duplicated_spans` — identical grams, df
    rule, and gaps-and-islands window arithmetic."""
    tok = duckdb_tokens_expr(analyzer)
    pg = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> {{'pos': i - 1, 'gram': array_to_string({tok}[i:i+{n - 1}], ' ')}}) END"
    )
    return f"""
WITH pos_grams AS (
  SELECT doc_id, u.pos AS pos, u.gram AS gram
  FROM (SELECT doc_id, unnest({pg}) AS u FROM {table})
),
dup AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos_grams)
  GROUP BY gram HAVING count(*) >= {int(min_df)}
),
hits AS (
  SELECT doc_id, pos FROM pos_grams WHERE gram IN (SELECT gram FROM dup)
),
w AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL THEN 0
              WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {n} THEN 1
              ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
  FROM w
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS start_token,
       CAST(max(pos) + {n} - 1 AS BIGINT) AS end_token,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, start_token
"""


def doc_dup_fraction_sql(
    n: int = 5, min_df: int = 2, table: str = "documents", analyzer: str = "ascii"
) -> str:
    """DuckDB oracle for :func:`doc_dup_fraction`."""
    tok = duckdb_tokens_expr(analyzer)
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


# -- paragraph-level corpus dedup (CCNet-style) --------------------------------


def _paras_col(text_col: str, splitter: str | None, chunk_tokens: int | None,
               analyzer: str = "ascii") -> Column:
    """array<string> of a doc's paragraphs: non-empty regex-split segments
    (``splitter``) or fixed-size non-overlapping token windows
    (``chunk_tokens`` — the windowed analog for newline-free corpora)."""
    if (splitter is None) == (chunk_tokens is None):
        raise ValueError("exactly one of splitter / chunk_tokens required")
    if splitter is not None:
        return F.filter(F.split(F.col(text_col), splitter), lambda p: p != F.lit(""))
    w = int(chunk_tokens)
    if w < 1:
        raise ValueError("chunk_tokens must be >= 1")
    toks = tokens_col(text_col, analyzer=analyzer)
    return F.when(F.size(toks) < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks), F.lit(w)),
            lambda i: F.array_join(F.slice(toks, i, w), " "),
        )
    )


def _paras_sql(splitter: str | None, chunk_tokens: int | None,
               analyzer: str = "ascii") -> str:
    if (splitter is None) == (chunk_tokens is None):
        raise ValueError("exactly one of splitter / chunk_tokens required")
    if splitter is not None:
        return (
            f"list_filter(regexp_split_to_array(text, '{splitter}'), p -> p <> '')"
        )
    w = int(chunk_tokens)
    tok = duckdb_tokens_expr(analyzer)
    return (
        f"list_transform(range(1, len({tok}) + 1, {w}), "
        f"i -> array_to_string({tok}[i:i+{w - 1}], ' '))"
    )


def dedup_paragraphs(
    docs: DataFrame,
    splitter: str | None = None,
    chunk_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    analyzer: str = "ascii",
) -> DataFrame:
    """CCNet-style paragraph-level corpus dedup: every paragraph that has
    appeared earlier in the corpus (global order = (doc_id, position) —
    including earlier in the SAME doc) is dropped; docs are reassembled
    from their surviving paragraphs. Returns
    (doc_id, n_paras, n_kept, text_deduped) for every input doc (a doc
    whose paragraphs all duplicate earlier text keeps an empty string —
    the caller's quality floor drops it, same as CCNet's pipeline order).

    Paragraphs come from ``splitter`` (regex, e.g. ``'\\n\\n+'`` — the CCNet
    form) or ``chunk_tokens`` (fixed non-overlapping token windows — the
    analog for newline-free corpora); exactly one must be given.

    Scale shape: ONE shuffle keyed by the paragraph string decides
    first-occurrence (window row_number over (para) — Zipfian-hot
    boilerplate paragraphs land on one reducer but carry only (doc_id,
    idx) pairs), then ONE doc_id-keyed reassembly agg with map-side
    combine. No driver-side state; no all-pairs shape anywhere."""
    from pyspark.sql import Window

    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(_paras_col(text_col, splitter, chunk_tokens, analyzer)).alias(
            "idx", "para"
        ),
    )
    w = Window.partitionBy("para").orderBy("doc_id", "idx")
    flagged = paras.withColumn(
        "kept",
        F.when(F.col("para").isNull(), F.lit(False)).otherwise(
            F.row_number().over(w) == 1
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(F.col("para").isNotNull().cast("long")).alias("n_paras"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("kept"), F.struct("idx", "para"))
                            )
                        ),
                        lambda s: s.isNotNull(),
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("text_deduped"),
        )
        .orderBy("doc_id")
    )


def dedup_paragraphs_sql(
    splitter: str | None = None,
    chunk_tokens: int | None = None,
    table: str = "documents",
    sep: str = "\n\n",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`dedup_paragraphs` (same first-occurrence
    window, same reassembly order)."""
    paras = _paras_sql(splitter, chunk_tokens, analyzer)
    sep_lit = sep.replace("'", "''")
    return f"""
WITH plist AS (
  SELECT doc_id, {paras} AS ps FROM {table}
),
paras AS (
  SELECT doc_id, u.i - 1 AS idx, ps[u.i] AS para
  FROM plist, unnest(range(1, len(ps) + 1)) AS u(i)
),
flagged AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) = 1 AS kept
  FROM paras
)
SELECT p.doc_id,
       CAST(coalesce(count(f.para), 0) AS BIGINT) AS n_paras,
       CAST(coalesce(sum(CASE WHEN f.kept THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN f.kept THEN f.para END, '{sep_lit}' ORDER BY f.idx), '')
         AS text_deduped
FROM {table} p LEFT JOIN flagged f ON f.doc_id = p.doc_id
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


# -- benchmark decontamination --------------------------------------------------


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM 13-gram protocol, public
    methodology): for every training doc, count its DISTINCT token
    n-grams that also occur anywhere in the ``benchmark`` corpus. Returns
    (doc_id, n_contaminated, contaminated) for every doc in ``docs`` —
    the caller drops ``contaminated`` rows (or audits high counts).

    Scale shape: both gram sets are per-doc-DISTINCT'd in the array (JVM)
    before exploding, so the map-side combine sees one row per (doc,
    gram); the overlap is a gram-keyed inner join of (doc grams) against
    the DISTINCT benchmark gram set — benchmark sets are tiny next to a
    training corpus, so AQE broadcasts them; nothing is ever collected.
    Counts then join back LEFT so clean docs report 0."""
    grams = F.array_distinct(_ngrams_col(tokens_col(text_col, analyzer=analyzer), n))
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    counts = (
        doc_grams.join(bench_grams, "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ascii",
) -> DataFrame:
    """The REVERSE direction of :func:`decontaminate` — per BENCHMARK item:
    how many of its distinct n-grams occur anywhere in the training corpus,
    and how many distinct training docs share at least one gram with it.
    This is the report eval owners actually read (which benchmark items are
    compromised and must be excluded from the eval), where decontaminate's
    per-train-doc view drives the training-side drop.

    Scale shape: the benchmark side is tiny, so its exploded grams
    broadcast; the training side streams through ONE gram-keyed join, and
    both aggregates are map-side-combined at the (bench_id, ...) grain —
    ≤ |bench grams| rows ever shuffle. Clean items report 0/0 via the
    LEFT join back. Returns (bench_id, n_hit_grams, n_hit_docs) ordered."""
    grams = F.array_distinct(_ngrams_col(tokens_col(text_col, analyzer=analyzer), n))
    bench_grams = benchmark.select(
        F.col(id_col).alias("bench_id"), F.explode(grams).alias("gram")
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("bench_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_hit_grams"),
            F.countDistinct("doc_id").cast("long").alias("n_hit_docs"),
        )
    )
    return (
        benchmark.select(F.col(id_col).alias("bench_id"))
        .join(hits, "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            F.coalesce("n_hit_docs", F.lit(0)).cast("long").alias("n_hit_docs"),
        )
        .orderBy("bench_id")
    )


def contamination_report_sql(
    bench_pred: str,
    docs_pred: str = "TRUE",
    n: int = 13,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`contamination_report` over the same
    predicate-carved benchmark/train slices as :func:`decontaminate_sql`.

    The gram token expression comes from :func:`duckdb_tokens_expr` — the
    FULL analyzer chain — so ``_sstem``/``_edge`` analyzer names stay in
    lockstep with the Spark twin's ``tokens_col`` (driver-advice drift
    class: a bare ``duckdb_token_pattern`` here silently skipped the stem
    step while the Spark side stemmed both sides)."""
    tok = duckdb_tokens_expr(analyzer)
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) END"
    )
    return f"""
WITH bench_grams AS (
  SELECT DISTINCT doc_id AS bench_id, unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {bench_pred}
),
doc_grams AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {docs_pred}
),
hits AS (
  SELECT b.bench_id,
         CAST(count(DISTINCT b.gram) AS BIGINT) AS n_hit_grams,
         CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_hit_docs
  FROM bench_grams b JOIN doc_grams d USING (gram)
  GROUP BY b.bench_id
)
SELECT t.bench_id,
       CAST(coalesce(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
       CAST(coalesce(h.n_hit_docs, 0) AS BIGINT) AS n_hit_docs
FROM (SELECT doc_id AS bench_id FROM {table} WHERE {bench_pred}) t
LEFT JOIN hits h ON h.bench_id = t.bench_id
ORDER BY t.bench_id
"""


def decontaminate_sql(
    bench_pred: str,
    docs_pred: str = "TRUE",
    n: int = 13,
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`decontaminate` where the benchmark is the
    ``bench_pred`` slice of ``table`` and the scored docs are the
    ``docs_pred`` slice (how the driver entry carves the synthetic corpus).
    Token expression = :func:`duckdb_tokens_expr` (full chain), matching
    :func:`decontaminate`'s ``tokens_col`` for every analyzer name."""
    tok = duckdb_tokens_expr(analyzer)
    grams = (
        f"CASE WHEN len({tok}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({tok}) - {n} + 2), "
        f"i -> array_to_string({tok}[i:i+{n - 1}], ' ')) END"
    )
    return f"""
WITH doc_grams AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {docs_pred}
),
bench_grams AS (
  SELECT DISTINCT unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {bench_pred}
),
counts AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
  FROM doc_grams d JOIN bench_grams b USING (gram)
  GROUP BY d.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       coalesce(c.n_contaminated, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM {table} WHERE {docs_pred}) t
LEFT JOIN counts c ON c.doc_id = t.doc_id
ORDER BY t.doc_id
"""
