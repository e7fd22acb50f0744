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
