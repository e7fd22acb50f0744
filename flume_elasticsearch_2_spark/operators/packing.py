"""Training-data shaping operators: sequence packing, document chunking,
and per-document keyword extraction (tf-idf) — the ops a 100 TB LLM data
pipeline runs between cleaning/dedup and tokenized shards.

Reference analog: downstream of the reference's ingestion chain (the
interceptor transforms feeding the index, FileSource.java:170-172); these
are the Spark-first extensions the brief asks for beyond the reference's
own surface.

Scale shapes:

- ``pack_sequences`` — greedy first-fit-in-order packing of documents into
  token-budget bins. Packing is inherently a SEQUENTIAL scan (each bin's
  fill depends on every earlier doc), so it runs per GROUP via
  ``applyInPandas`` — groups (e.g. ``lang``, or a hash bucket) partition
  the corpus so each sequential scan is bounded and the groups themselves
  are embarrassingly parallel; no global ordering, no driver collect. The
  in-group scan is a NumPy loop over two scalars per row (fill, bin) — the
  one honest non-vectorizable recurrence, on data already Arrow-batched.
- ``chunk_docs`` — overlapping token-window chunks (the embedding-pipeline
  shape). Pure JVM: one ``sequence``/``posexplode`` over chunk starts +
  ``slice``/``array_join``; no shuffle at all, output partitions inherit
  the scan.
- ``doc_keywords`` — top-k tf-idf terms per doc. One explode→(doc,term)
  tf agg, one term-keyed df agg joined back on term (term-keyed shuffle
  join — the df side is vocabulary-sized, NOT broadcast), one per-doc
  window top-k. All JVM expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokens_col

_TOK_SQL = "regexp_extract_all(lower({expr}), '{pat}')"


def _tok_sql(expr: str, analyzer: str = "ascii") -> str:
    return _TOK_SQL.format(expr=expr, pat=duckdb_token_pattern(analyzer))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy in-order sequence packing: within each ``group_col`` group,
    walk docs id-ascending and start a new bin whenever the running token
    fill would exceed ``budget`` (a doc longer than the budget gets a bin
    of its own). Returns ``(group, doc_id, n_tokens, bin)`` with ``bin``
    numbered from 0 per group.

    Greedy-in-order is the standard streaming packer (cf. sequence packing
    in LLM pretraining): deterministic given the (group, id) order, which
    makes it oracle-checkable — :func:`pack_sequences_sql` replays the
    identical recurrence as a recursive CTE."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    base = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    gtype = docs.schema[group_col].dataType.simpleString()
    schema = f"group {gtype}, doc_id long, n_tokens int, bin long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = []
        fill, b = 0, 0
        first = True
        for n in pdf["n_tokens"].to_numpy():
            if not first and fill + n > budget:
                b += 1
                fill = 0
            bins.append(b)
            fill += int(n)
            first = False
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return (
        base.groupBy("group").applyInPandas(pack, schema)
        .orderBy("group", "doc_id")
    )


def pack_sequences_sql(
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`pack_sequences`: the same greedy recurrence
    as a recursive CTE stepping row-by-row within each group."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    toks = _tok_sql(text_col, analyzer)
    return f"""
WITH RECURSIVE ord AS (
  SELECT {group_col} AS grp, {id_col} AS doc_id,
         CAST(len({toks}) AS INT) AS n_tokens,
         row_number() OVER (PARTITION BY {group_col} ORDER BY {id_col}) AS rn
  FROM {table}
),
packed AS (
  SELECT grp, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin, n_tokens AS fill
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens > {budget} THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.fill + o.n_tokens > {budget} THEN o.n_tokens
              ELSE p.fill + o.n_tokens END
  FROM packed p JOIN ord o ON o.grp = p.grp AND o.rn = p.rn + 1
)
SELECT grp AS "group", doc_id, n_tokens, bin
FROM packed ORDER BY "group", doc_id
"""


def chunk_docs(
    docs: DataFrame,
    window: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each doc's token stream into chunks of ``window`` tokens
    starting every ``stride`` tokens (default ``window``, i.e. disjoint;
    smaller = overlapping). Chunk starts run while ``start < n_tokens``,
    so the tail chunk may be short; empty docs yield no chunks. Returns
    ``(doc_id, chunk_id, n_tokens, chunk_text)`` with ``chunk_text`` the
    space-joined analyzed tokens (the tokenized-shard form)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    stride = window if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = tokens_col(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).where(
        F.size("toks") > 0
    )
    # chunk indices 0..floor((n-1)/stride): the exact set with start < n
    idx = F.sequence(F.lit(0), F.floor((F.size("toks") - 1) / stride).cast("int"))
    return (
        base.select("doc_id", "toks", F.explode(idx).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice("toks", F.col("chunk_id") * stride + 1, window).alias("c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("c").alias("n_tokens"),
            F.array_join("c", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def chunk_docs_sql(
    window: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`chunk_docs` (generate_series + list_slice)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    stride = window if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _tok_sql(text_col, analyzer)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}
),
nonempty AS (SELECT * FROM t WHERE len(toks) > 0),
chunks AS (
  SELECT doc_id, CAST(u.chunk_id AS BIGINT) AS chunk_id,
         list_slice(toks, u.chunk_id * {stride} + 1,
                    u.chunk_id * {stride} + {window}) AS c
  FROM nonempty,
       unnest(generate_series(0, CAST(floor((len(toks) - 1) / {stride}) AS INT)))
         AS u(chunk_id)
)
SELECT doc_id, chunk_id, CAST(len(c) AS INT) AS n_tokens,
       array_to_string(c, ' ') AS chunk_text
FROM chunks ORDER BY doc_id, chunk_id
"""


def doc_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` tf-idf keywords per document: ``tfidf = tf * (ln(n_docs /
    (df + 1)) + 1)`` (the ClassicSimilarity-style idf the MLT selector uses,
    operators/mlt.py), ranked ``(tfidf DESC, term ASC)`` per doc. Returns
    ``(doc_id, rank, term, tfidf)`` with tfidf rounded to 6 places AFTER
    ranking (ranking uses exact doubles; the round is presentation)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    toks = tokens_col(text_col)
    pairs = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    tf = pairs.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = pairs.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * (F.log(F.lit(float(n_docs)) / (F.col("df") + 1)) + 1)).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", F.round("tfidf", 6).alias("tfidf"))
        .orderBy("doc_id", "rank")
    )


def doc_keywords_sql(
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`doc_keywords` (same idf, same tiebreak)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = _tok_sql(text_col, analyzer)
    return f"""
WITH pairs AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY doc_id, term),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM pairs GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln(n.n_docs / (dfreq.df + 1.0)) + 1) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)
           AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, round(tfidf, 6) AS tfidf
FROM ranked WHERE rank <= {k} ORDER BY doc_id, rank
"""
