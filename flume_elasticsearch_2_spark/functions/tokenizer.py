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

# Opt-in Unicode analyzer (ES standard-analyzer-like segmentation for
# multilingual text): tokens are maximal runs of Unicode letters/digits over
# the lowercased text. The same class is expressible in all three engines —
# Java regex \p{L}\p{N} (Spark), RE2 \pL\pN (DuckDB), and Python's
# [^\W_] (\w minus underscore = L* ∪ N* by the str.isalnum definition) —
# parity is pinned by tests/test_text_functions.py on accented/CJK tokens.
# The default stays "ascii": byte-identical to round-1 indexes and oracles.
TOKEN_PATTERN_UNICODE_JAVA = r"[\p{L}\p{N}]+"
TOKEN_PATTERN_UNICODE_RE2 = r"[\pL\pN]+"
_TOKEN_RE_UNICODE = re.compile(r"[^\W_]+", re.UNICODE)

_PY_RES = {"ascii": _TOKEN_RE, "unicode": _TOKEN_RE_UNICODE}
_JAVA_PATTERNS = {"ascii": TOKEN_PATTERN, "unicode": TOKEN_PATTERN_UNICODE_JAVA}
_RE2_PATTERNS = {"ascii": TOKEN_PATTERN, "unicode": TOKEN_PATTERN_UNICODE_RE2}


def duckdb_token_pattern(analyzer: str = "ascii") -> str:
    """The RE2 token pattern for DuckDB oracle SQL generators."""
    return _RE2_PATTERNS[analyzer]


def tokenize(
    text: str, stopwords: list[str] | None = None, analyzer: str = "ascii"
) -> list[str]:
    """Driver-side / oracle tokenizer. Must match :func:`tokens_col` exactly.

    ``stopwords`` is the ES analyzer ``stopwords`` option (default
    ``_none_``, matching the ES standard analyzer): matching tokens are
    removed AFTER tokenization, duplicates preserved."""
    toks = _PY_RES[analyzer].findall(text.lower())
    if stopwords:
        stop = set(stopwords)
        toks = [t for t in toks if t not in stop]
    return toks


def tokens_col(
    col: Column | str,
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> Column:
    """JVM-side tokenizer column: array<string> of analyzed tokens.

    Stays inside whole-stage codegen — no Python UDF in the hot path.
    ``stopwords`` filters tokens with a JVM array filter (duplicates of
    non-stop tokens preserved — `array_except` would dedup); the identical
    chain in DuckDB is ``list_filter(regexp_extract_all(lower(text),
    '[a-z0-9]+'), t -> t NOT IN (...))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(F.lower(c), F.lit(_JAVA_PATTERNS[analyzer]), F.lit(0))
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(list(stopwords)))
    return toks


def tokenize_series(texts) -> "list[list[str]]":
    """Batch tokenizer for pandas/Arrow UDF bodies (pre-compiled regex).
    Null text tokenizes to [] — the JVM tokenizer's behavior for NULL."""
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_TOKEN_RE).tolist()
