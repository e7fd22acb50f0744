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

# Opt-in light stemming: the published Harman "S-stemmer" (Harman 1991,
# "How Effective Is Suffixing?") — the same conflation class as ES's
# minimal_english token filter. Three ordered plural rules, applied after
# stopword removal, skipping tokens of length <= 2 (so "s"/"as"/"is" never
# stem to junk). Analyzer name "<base>_sstem" composes with either token
# class; the identical CASE chain is expressible in all three engines.
for _base in ("ascii", "unicode"):
    _PY_RES[f"{_base}_sstem"] = _PY_RES[_base]
    _JAVA_PATTERNS[f"{_base}_sstem"] = _JAVA_PATTERNS[_base]
    _RE2_PATTERNS[f"{_base}_sstem"] = _RE2_PATTERNS[_base]

# Opt-in full English stemming: the Porter algorithm (functions/porter.py;
# Porter 1980 + the reference-implementation departures Lucene applies).
# Analyzer name "<base>_porter" composes with either token class; "english"
# is the ES-1.x `analyzer: "english"` chain = ascii tokens + the Lucene
# classic English stop set + Porter (EnglishAnalyzer order: stop filter
# BEFORE the stemmer). Documented divergence from real ES: the [a-z0-9]+
# tokenizer splits "porter's" into (porter, s) where Lucene's possessive
# filter strips "'s" entirely — the trailing s-token survives (length<=2
# tokens pass Porter unchanged).
for _base in ("ascii", "unicode"):
    _PY_RES[f"{_base}_porter"] = _PY_RES[_base]
    _JAVA_PATTERNS[f"{_base}_porter"] = _JAVA_PATTERNS[_base]
    _RE2_PATTERNS[f"{_base}_porter"] = _RE2_PATTERNS[_base]
_PY_RES["english"] = _PY_RES["ascii"]
_JAVA_PATTERNS["english"] = _JAVA_PATTERNS["ascii"]
_RE2_PATTERNS["english"] = _RE2_PATTERNS["ascii"]

# Lucene StopAnalyzer.ENGLISH_STOP_WORDS_SET (the classic 33-word list the
# ES 1.x `english` analyzer defaults to)
ENGLISH_STOPWORDS: frozenset = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _is_porter(base: str) -> bool:
    return base.endswith("_porter") or base == "english"


def _merge_stopwords(base: str, stopwords: "list[str] | None") -> "list[str] | None":
    if base != "english":
        return stopwords
    return sorted(ENGLISH_STOPWORDS | set(stopwords or ()))


def s_stem(t: str) -> str:
    """Harman S-stemmer, one token. First matching rule wins."""
    if len(t) <= 2:
        return t
    if t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if t.endswith("s") and not t.endswith(("us", "ss")):
        return t[:-1]
    return t


def _s_stem_col(t: Column) -> Column:
    """The same three ordered rules as a JVM expression (whole-stage
    codegen; used inside ``transform`` over the tokens array)."""
    return (
        F.when(F.length(t) <= 2, t)
        .when(
            t.endswith("ies") & ~t.endswith("eies") & ~t.endswith("aies"),
            F.concat(F.substr(t, F.lit(1), F.length(t) - F.lit(3)), F.lit("y")),
        )
        .when(
            t.endswith("es")
            & ~t.endswith("aes")
            & ~t.endswith("ees")
            & ~t.endswith("oes"),
            F.substr(t, F.lit(1), F.length(t) - F.lit(1)),
        )
        .when(
            t.endswith("s") & ~t.endswith("us") & ~t.endswith("ss"),
            F.substr(t, F.lit(1), F.length(t) - F.lit(1)),
        )
        .otherwise(t)
    )


def duckdb_stem_case(var: str = "t") -> str:
    """The S-stemmer as a DuckDB CASE expression over token variable
    ``var`` (for ``list_transform(toks, t -> ...)`` in oracle SQL)."""
    return (
        f"CASE WHEN len({var}) <= 2 THEN {var} "
        f"WHEN {var} LIKE '%ies' AND {var} NOT LIKE '%eies' "
        f"AND {var} NOT LIKE '%aies' "
        f"THEN substr({var}, 1, len({var}) - 3) || 'y' "
        f"WHEN {var} LIKE '%es' AND {var} NOT LIKE '%aes' "
        f"AND {var} NOT LIKE '%ees' AND {var} NOT LIKE '%oes' "
        f"THEN substr({var}, 1, len({var}) - 1) "
        f"WHEN {var} LIKE '%s' AND {var} NOT LIKE '%us' "
        f"AND {var} NOT LIKE '%ss' "
        f"THEN substr({var}, 1, len({var}) - 1) "
        f"ELSE {var} END"
    )


# Opt-in edge n-grams: Lucene/ES `edge_ngram` TOKEN FILTER (the 1.x
# index-time autocomplete recipe — index grams, search with a plain
# analyzer so the typed prefix is ONE exact term lookup instead of a
# dictionary wildcard scan). Analyzer name "<base>_edge{min}_{max}"
# composes after either token class and after _sstem. Lucene 4.x
# EdgeNGramTokenFilter contract, pinned in all three engines: each token
# emits its prefixes of length min..min(max, len); tokens SHORTER than
# min_gram emit nothing; tokens longer than max_gram lose their full form
# (no preserve_original in 1.x). Emission order is per-token, gram-length
# ascending; duplicates across tokens are preserved (tf semantics).
# Divergence documented (not silent): Lucene norms count positions while
# this engine pins dl = emitted-gram count on BOTH engines.
_EDGE_RE = re.compile(r"^(?P<base>.+?)_edge(?P<min>\d+)_(?P<max>\d+)$")


def edge_params(analyzer: str) -> "tuple[str, int, int] | None":
    """``(base_analyzer, min_gram, max_gram)`` for an edge analyzer name,
    else None. Bad bounds raise (min >= 1, max >= min)."""
    m = _EDGE_RE.match(analyzer)
    if not m:
        return None
    base, mn, mx = m.group("base"), int(m.group("min")), int(m.group("max"))
    if base not in _PY_RES:
        raise KeyError(f"unknown base analyzer {base!r} in {analyzer!r}")
    if mn < 1 or mx < mn:
        raise ValueError(f"edge_ngram needs 1 <= min <= max, got {analyzer!r}")
    return base, mn, mx


def _base_name(analyzer: str) -> str:
    """Resolve an analyzer name to its registered token-class key."""
    e = edge_params(analyzer)
    return e[0] if e else analyzer


def edge_ngrams_col(toks: Column, min_gram: int, max_gram: int) -> Column:
    """Edge-ngram expansion of a token array as a pure JVM expression
    (filter + nested transform + flatten — whole-stage codegen, no UDF)."""
    kept = F.filter(toks, lambda t: F.length(t) >= F.lit(min_gram))
    return F.flatten(
        F.transform(
            kept,
            lambda t: F.transform(
                F.sequence(F.lit(min_gram), F.least(F.lit(max_gram), F.length(t))),
                lambda i: F.substr(t, F.lit(1), i),
            ),
        )
    )


def duckdb_edge_transform(tok_expr: str, min_gram: int, max_gram: int) -> str:
    """The identical edge-ngram chain over a DuckDB list expression."""
    return (
        f"flatten(list_transform(list_filter({tok_expr}, t -> len(t) >= {min_gram}), "
        f"t -> list_transform(range({min_gram}, least({max_gram}, len(t)) + 1), "
        f"i -> substr(t, 1, i))))"
    )


def duckdb_token_pattern(analyzer: str = "ascii") -> str:
    """The RE2 token pattern for DuckDB oracle SQL generators."""
    return _RE2_PATTERNS[_base_name(analyzer)]


def duckdb_tokens_expr(
    analyzer: str = "ascii",
    stopwords: "list[str] | None" = None,
    text_expr: str = "text",
) -> str:
    """The COMPLETE analyzer chain as one DuckDB list expression — the
    single source of truth for oracle SQL generators, composing exactly as
    :func:`tokenize` does: pattern → stopwords → s-stem → edge grams. A
    generator that inlines only the bare pattern silently diverges for
    ``_sstem``/``_edge`` analyzer names (the drift class a review pass
    found in three separate generators)."""
    expr = f"regexp_extract_all(lower({text_expr}), '{duckdb_token_pattern(analyzer)}')"
    edge = edge_params(analyzer)
    base = edge[0] if edge else analyzer
    stopwords = _merge_stopwords(base, stopwords)
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        expr = f"list_filter({expr}, t -> t NOT IN ({stop_list}))"
    if base.endswith("_sstem"):
        expr = f"list_transform({expr}, t -> {duckdb_stem_case('t')})"
    if _is_porter(base):
        from .porter import duckdb_porter_case

        expr = f"list_transform({expr}, t -> {duckdb_porter_case('t')})"
    if edge:
        expr = duckdb_edge_transform(expr, edge[1], edge[2])
    return expr


def tokenize(
    text: str, stopwords: list[str] | None = None, analyzer: str = "ascii"
) -> list[str]:
    """Driver-side / oracle tokenizer. Must match :func:`tokens_col` exactly.

    ``stopwords`` is the ES analyzer ``stopwords`` option (default
    ``_none_``, matching the ES standard analyzer): matching tokens are
    removed AFTER tokenization, duplicates preserved."""
    edge = edge_params(analyzer)
    base = edge[0] if edge else analyzer
    toks = _PY_RES[base].findall(text.lower())
    stopwords = _merge_stopwords(base, stopwords)
    if stopwords:
        stop = set(stopwords)
        toks = [t for t in toks if t not in stop]
    if base.endswith("_sstem"):
        toks = [s_stem(t) for t in toks]
    if _is_porter(base):
        from .porter import porter_stem

        toks = [porter_stem(t) for t in toks]
    if edge:
        _, mn, mx = edge
        toks = [t[:i] for t in toks if len(t) >= mn for i in range(mn, min(mx, len(t)) + 1)]
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
    edge = edge_params(analyzer)
    base = edge[0] if edge else analyzer
    toks = F.regexp_extract_all(F.lower(c), F.lit(_JAVA_PATTERNS[base]), F.lit(0))
    stopwords = _merge_stopwords(base, stopwords)
    if stopwords:
        toks = F.filter(toks, lambda t: ~t.isin(list(stopwords)))
    if base.endswith("_sstem"):
        toks = F.transform(toks, _s_stem_col)
    if _is_porter(base):
        # the one Arrow-batched stage of the chain (functions/porter.py
        # docstring: the full Porter rule set is deliberately NOT a
        # codegen CASE chain); memoized per batch, vectorized, never
        # per-row Python
        from .porter import porter_col

        toks = porter_col(toks)
    if edge:
        toks = edge_ngrams_col(toks, edge[1], edge[2])
    return toks


def tokenize_series(texts) -> "list[list[str]]":
    """Batch tokenizer for pandas/Arrow UDF bodies (pre-compiled regex).
    Null text tokenizes to [] — the JVM tokenizer's behavior for NULL."""
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_TOKEN_RE).tolist()
