"""ES ``highlight`` API (SURVEY §2.5): matched-term markup on the stored
text of each hit.

Reference analog: the ES 1.x highlighting surface behind the sink
(delegation site ElasticsearchSink.java:54). Contract implemented here is
the ``number_of_fragments: 0`` mode — the WHOLE field is returned with
every occurrence of an analyzed query term wrapped in ``pre_tag``/
``post_tag`` (ES default ``<em>``/``</em>``), original case preserved —
plus a deterministic single-fragment mode (``fragment_size`` chars starting
at the first highlighted occurrence; ES fragment selection is
scorer-dependent and unspecified, so we pin the simplest deterministic
choice and document it).

Exactness across engines: the text is split into ALTERNATING maximal runs
of token chars and non-token chars (one regexp_extract_all — the same token
class as the analyzer, case-widened); a run is wrapped iff its lowercase
form is one of the query's analyzed terms. Identical chain in Spark
(regexp_extract_all + transform + array_join, pure JVM, codegen'd) and
DuckDB (regexp_extract_all + list_transform + list_aggregate), so
highlights are byte-identical — no lookbehind tricks (RE2 has none) and no
adjacent-match dropout that plain regexp_replace boundary groups suffer.

Scale shape: highlighting applies AFTER top-k — k rows, never the corpus.
The declarative entry runs the two-narrow-pass bm25_topk then joins k ids
back to the docs table (broadcast-sized); the serving path fetches the k
stored docs from the index's docs table (id-pruned read) and marks up
driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.tokenizer import tokenize
from .topk import bm25_topk, bm25_topk_sql

PRE_TAG = "<em>"
POST_TAG = "</em>"

# case-widened split patterns: token-run | non-token-run (alternating full
# cover of the string). Java (Spark) and RE2 (DuckDB) spellings.
_SPLIT_JAVA = {
    "ascii": "[a-zA-Z0-9]+|[^a-zA-Z0-9]+",
    "unicode": r"[\p{L}\p{N}]+|[^\p{L}\p{N}]+",
}
_SPLIT_RE2 = {
    "ascii": "[a-zA-Z0-9]+|[^a-zA-Z0-9]+",
    "unicode": r"[\pL\pN]+|[^\pL\pN]+",
}


def highlight_col(
    text_col: Column | str,
    terms: list[str],
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    analyzer: str = "ascii",
) -> Column:
    """Whole-field highlight as a pure-JVM Column: split into token /
    non-token runs, wrap runs whose lowercase form is in ``terms``."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.regexp_extract_all(col, F.lit(_SPLIT_JAVA[analyzer]), F.lit(0))
    wrapped = F.transform(
        pieces,
        lambda p: F.when(
            F.lower(p).isin(list(terms)), F.concat(F.lit(pre_tag), p, F.lit(post_tag))
        ).otherwise(p),
    )
    return F.array_join(wrapped, "")


def highlight_sql_expr(
    terms: list[str],
    text_expr: str = "text",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    analyzer: str = "ascii",
) -> str:
    """DuckDB expression byte-identical to :func:`highlight_col`."""
    term_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return (
        f"list_aggregate(list_transform("
        f"regexp_extract_all({text_expr}, '{_SPLIT_RE2[analyzer]}'), "
        f"p -> CASE WHEN lower(p) IN ({term_list}) "
        f"THEN '{pre_tag}' || p || '{post_tag}' ELSE p END), 'string_agg', '')"
    )


def first_fragment_col(hl: Column, fragment_size: int = 100, pre_tag: str = PRE_TAG) -> Column:
    """Deterministic single-fragment mode: ``fragment_size`` chars of the
    highlighted text starting at the first ``pre_tag`` (1 if none)."""
    start = F.greatest(F.locate(pre_tag, hl), F.lit(1))
    return F.substring(hl, start, fragment_size)


def first_fragment_sql(hl_expr: str, fragment_size: int = 100, pre_tag: str = PRE_TAG) -> str:
    """DuckDB twin of :func:`first_fragment_col` (``instr`` = ``locate``)."""
    return (
        f"substr({hl_expr}, greatest(instr({hl_expr}, '{pre_tag}'), 1), {int(fragment_size)})"
    )


def search_highlight(
    docs: DataFrame,
    query: str,
    k: int = 10,
    mode: str = "or",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    analyzer: str = "ascii",
    stopwords: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    fragment_size: int | None = None,
) -> DataFrame:
    """Top-k BM25 hits with whole-field highlights — the ES search+highlight
    response shape (doc_id, score, highlight). Markup joins AFTER top-k: the
    k-row hit list broadcasts against the docs table, so the highlight cost
    is O(k), not O(corpus). ``fragment_size`` switches to the deterministic
    single-fragment mode (ES number_of_fragments=1): that many chars of the
    marked-up text starting at the first highlighted occurrence."""
    terms = sorted(set(tokenize(query, stopwords, analyzer)))
    hits = bm25_topk(
        docs, query, k=k, mode=mode, id_col=id_col, text_col=text_col,
        stopwords=stopwords, analyzer=analyzer,
    )
    # broadcast the K-ROW hit list against the docs scan (id-pruned by the
    # broadcast hash join); the highlight expression evaluates AFTER the
    # join, i.e. on k rows only — never on the corpus
    joined = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")).join(
        F.broadcast(hits), "doc_id", "inner"
    )
    return (
        joined.select(
            "doc_id",
            "score",
            _frag(
                highlight_col(F.col("_t"), terms, pre_tag, post_tag, analyzer),
                fragment_size,
                pre_tag,
            ).alias("highlight"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )


def _frag(hl: Column, fragment_size: int | None, pre_tag: str) -> Column:
    return hl if fragment_size is None else first_fragment_col(hl, int(fragment_size), pre_tag)


def search_highlight_sql(
    query: str,
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    analyzer: str = "ascii",
    stopwords: list[str] | None = None,
    fragment_size: int | None = None,
) -> str:
    """DuckDB oracle for :func:`search_highlight`."""
    terms = sorted(set(tokenize(query, stopwords, analyzer)))
    hl = highlight_sql_expr(terms, "d.text", pre_tag, post_tag, analyzer)
    if fragment_size is not None:
        hl = first_fragment_sql(hl, int(fragment_size), pre_tag)
    inner = bm25_topk_sql(query, k=k, mode=mode, table=table, stopwords=stopwords, analyzer=analyzer)
    return f"""
SELECT h.doc_id, h.score, {hl} AS highlight
FROM ({inner}) h JOIN {table} d USING (doc_id)
ORDER BY h.score DESC, h.doc_id ASC
"""


# -- number_of_fragments > 1 (multi-fragment mode) ---------------------------
#
# ES's own fragment selection is scorer-dependent and unspecified, so (as
# with the single-fragment mode above) the engine pins the simplest
# deterministic contract and documents it: fragment 1 starts at the FIRST
# pre_tag occurrence; fragment i+1 starts at the first occurrence AT OR
# AFTER the end of fragment i (fragments never overlap); extraction stops
# at number_of_fragments or when occurrences run out. Hits whose highlight
# carries no occurrence yield no fragment rows (ES omits the highlight
# field for such hits).
#
# This is fetch-phase work on K ROWS (exactly where ES's highlighter runs,
# on the fetch node), so the Spark twin is a pandas UDF over the k-row hit
# page — the one place a Python loop is the honest plan — while the DuckDB
# oracle expresses the identical iteration as a recursive CTE. Both sides
# index by CODE POINTS (Python str / DuckDB substr), so parity is total.


def fragments_py(hl: str, n: int, size: int, pre_tag: str = PRE_TAG) -> list[str]:
    """The pinned multi-fragment iteration, one highlighted string."""
    out: list[str] = []
    pos = hl.find(pre_tag)
    while pos != -1 and len(out) < n:
        out.append(hl[pos : pos + size])
        pos = hl.find(pre_tag, pos + size)
    return out


def _explode_fragments(
    hits: DataFrame, n: int, size: int, pre_tag: str
) -> DataFrame:
    """(doc_id, score, highlight) k-row frame -> (doc_id, score,
    fragment_no, fragment) rows via the pinned iteration (Arrow-batched
    pandas UDF over k rows)."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pyspark's hint inference rejects — the legacy (fn, returnType)
    # form pins the scalar pandas eval type explicitly
    frag_udf = pandas_udf(
        lambda hl: hl.map(lambda s: fragments_py(s, n, size, pre_tag)),
        "array<string>",
    )

    return (
        hits.select("doc_id", "score", frag_udf(F.col("highlight")).alias("_f"))
        .select("doc_id", "score", F.posexplode(F.col("_f")).alias("_i", "fragment"))
        .select(
            "doc_id", "score",
            (F.col("_i") + 1).cast("int").alias("fragment_no"),
            "fragment",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc(), F.col("fragment_no").asc())
    )


def search_highlight_fragments(
    docs: DataFrame,
    query: str,
    k: int = 10,
    number_of_fragments: int = 3,
    fragment_size: int = 100,
    mode: str = "or",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ES search+highlight with ``number_of_fragments`` > 1: top-k BM25
    hits exploded to ``(doc_id, score, fragment_no, fragment)`` rows under
    the pinned non-overlapping-fragment contract above."""
    if number_of_fragments < 2:
        raise ValueError("use search_highlight for number_of_fragments 0/1")
    if fragment_size <= 0:
        raise ValueError("fragment_size must be positive")
    hits = search_highlight(
        docs, query, k=k, mode=mode, pre_tag=pre_tag, post_tag=post_tag,
        id_col=id_col, text_col=text_col,
    )
    return _explode_fragments(hits, number_of_fragments, fragment_size, pre_tag)


def search_highlight_fragments_index(
    searcher,
    query: str,
    k: int = 10,
    number_of_fragments: int = 3,
    fragment_size: int = 100,
    mode: str = "or",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
) -> DataFrame:
    """Multi-fragment highlight on the SERVING path: the BMW top-k +
    stored-docs markup of ``IndexSearcher.search_highlight``, then the SAME
    pinned explode over the k-row page."""
    if number_of_fragments < 2:
        raise ValueError("use search_highlight for number_of_fragments 0/1")
    if fragment_size <= 0:
        raise ValueError("fragment_size must be positive")
    hits = searcher.search_highlight(query, k=k, mode=mode, pre_tag=pre_tag, post_tag=post_tag)
    return _explode_fragments(hits, number_of_fragments, fragment_size, pre_tag)


def search_highlight_fragments_sql(
    query: str,
    k: int = 10,
    number_of_fragments: int = 3,
    fragment_size: int = 100,
    mode: str = "or",
    table: str = "documents",
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
) -> str:
    """DuckDB oracle for :func:`search_highlight_fragments` — the identical
    iteration as a recursive CTE (1-based ``pos``; the next occurrence is
    probed with ``instr`` over the suffix starting at ``pos + size``, so
    fragments never overlap, exactly the Python twin's ``find(tag, pos +
    size)``)."""
    if number_of_fragments < 2:
        raise ValueError("use search_highlight_sql for number_of_fragments 0/1")
    if fragment_size <= 0:
        raise ValueError("fragment_size must be positive")
    inner = search_highlight_sql(query, k=k, mode=mode, table=table,
                                 pre_tag=pre_tag, post_tag=post_tag)
    n, size, tag = int(number_of_fragments), int(fragment_size), pre_tag
    nxt = f"instr(substr(hl, pos + {size}), '{tag}')"
    return f"""
WITH RECURSIVE hits AS ({inner}),
frags AS (
  SELECT doc_id, score, highlight AS hl, 1 AS fragment_no,
         instr(highlight, '{tag}') AS pos
  FROM hits WHERE instr(highlight, '{tag}') > 0
  UNION ALL
  SELECT doc_id, score, hl, fragment_no + 1, pos + {size} - 1 + {nxt}
  FROM frags
  WHERE fragment_no < {n} AND {nxt} > 0
)
SELECT doc_id, score, CAST(fragment_no AS INT) AS fragment_no,
       substr(hl, pos, {size}) AS fragment
FROM frags
ORDER BY score DESC, doc_id ASC, fragment_no ASC
"""
