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


def tokenize(text: str) -> list[str]:
    """Driver-side / oracle tokenizer. Must match :func:`tokens_col` exactly."""
    return _TOKEN_RE.findall(text.lower())


def tokens_col(col: Column | str) -> Column:
    """JVM-side tokenizer column: array<string> of analyzed tokens.

    Stays inside whole-stage codegen — no Python UDF in the hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))


def tokenize_series(texts) -> "list[list[str]]":
    """Batch tokenizer for pandas/Arrow UDF bodies (pre-compiled regex)."""
    lowered = texts.str.lower()
    return lowered.str.findall(_TOKEN_RE).tolist()
