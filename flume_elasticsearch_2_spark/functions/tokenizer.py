"""Analyzer: tokenize + normalize (SURVEY.md §2.4 I1, §2.5 Q1).

Reproduces the [delegated] ES/Lucene standard-analyzer role at the reference's
delegation site (/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66).
Contract pinned for oracle parity (SURVEY §7 hard part (d)): tokens are maximal
runs of ``[a-z0-9]+`` over the lowercased text. The same chain is expressible

* JVM-side in Spark:   ``regexp_extract_all(lower(col), '[a-z0-9]+', 0)``
* in DuckDB SQL:       ``regexp_extract_all(lower(text), '[a-z0-9]+')``
* in Python/NumPy:     :func:`tokenize` below

so the Spark path, the SQL oracle, and the NumPy oracle tokenize identically.
The index-time lowercasing mirrors the reference's only [impl] normalization,
``indexName.toLowerCase()`` (ElasticsearchSink.java:66).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str, stopwords: list[str] | None = None) -> list[str]:
    """Driver-side / oracle tokenizer. Must match :func:`tokens_col` exactly.

    ``stopwords`` is the ES analyzer ``stopwords`` option (default
    ``_none_``, matching the ES standard analyzer): matching tokens are
    removed AFTER tokenization, duplicates preserved."""
    toks = _TOKEN_RE.findall(text.lower())
    if stopwords:
        stop = set(stopwords)
        toks = [t for t in toks if t not in stop]
    return toks


def tokens_col(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """JVM-side tokenizer column: array<string> of analyzed tokens.

    Stays inside whole-stage codegen — no Python UDF in the hot path.
    ``stopwords`` filters tokens with a JVM array filter (duplicates of
    non-stop tokens preserved — `array_except` would dedup); the identical
    chain in DuckDB is ``list_filter(regexp_extract_all(lower(text),
    '[a-z0-9]+'), t -> t NOT IN (...))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(list(stopwords)))
    return toks


def tokenize_series(texts) -> "list[list[str]]":
    """Batch tokenizer for pandas/Arrow UDF bodies (pre-compiled regex).
    Null text tokenizes to [] — the JVM tokenizer's behavior for NULL."""
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_TOKEN_RE).tolist()
