"""Multi-term queries: ES ``prefix`` / ``wildcard`` / ``fuzzy`` / ``regexp``
(SURVEY §2.5).

The reference deployment's ES 1.x query surface includes the Lucene
MultiTermQuery family (delegation site: ElasticsearchSink.java:54 — the sink
indexes into ES and every query runs there). Semantics re-expressed here:

1. **Expansion** against the term dictionary: all analyzed terms matching the
   pattern, capped at ``max_expansions`` (Lucene/ES default 50) ordered by
   ``(df DESC, term ASC)`` — Lucene's top-terms rewrite keeps the
   highest-docFreq terms; the term tiebreak makes the cap deterministic.
2. **Rewrite** of the expanded set (the ES ``rewrite`` parameter):
   - ``scoring_boolean``: OR-of-terms BM25, each expanded term keeping its
     own idf (Lucene ``SCORING_BOOLEAN_REWRITE``). Divergence note: ES
     fuzzy defaults to *blended* freqs (``top_terms_blended_freqs_N``, one
     shared idf across the expansion); per-term idf is the documented
     ``rewrite=scoring_boolean`` contract, chosen because it is exactly
     SQL-expressible and oracle-checkable.
   - ``constant_score``: every matching doc scores ``boost`` (default 1.0)
     — the ES default for prefix/wildcard. Deterministic order is then the
     ``(score, doc_id)`` tiebreak, i.e. the k smallest matching doc ids.

Patterns are NOT analyzed (ES contract for term-level queries) but are
lowercased to the index's case normalization; wildcard ``*``/``?`` translate
to SQL LIKE ``%``/``_`` (terms are ``[a-z0-9]+`` so no escape collisions).
Fuzzy uses plain Levenshtein distance with Lucene's ``prefix_length`` exact
prefix guard; Spark's ``levenshtein`` and DuckDB's ``levenshtein`` are
bit-identical on the analyzer's token class (pinned in tests).

``regexp`` (ES regexp query, whole-term match like Lucene's RegexpQuery) is
restricted to the syntax subset on which Java regex (Spark ``rlike``), RE2
(DuckDB ``regexp_full_match``) and Python ``re`` agree byte-for-byte:
literals ``[a-z0-9]``, ``.``, ``*``, ``+``, ``?``, alternation ``|``,
groups ``(…)``, character classes ``[…]`` (with ranges), and bounded
repeats ``{m,n}``. Backslash escapes, anchors, and Lucene-regexp-only
operators (``~ & < >``) are rejected — three-engine parity over a corpus
dictionary is pinned in tests. Matching is implicitly anchored to the whole
term (the Lucene contract): Spark wraps as ``^(?:pat)$``, DuckDB uses
``regexp_full_match``, Python uses ``re.fullmatch``.

Scale shape: the declarative expansion is one map-side-combine aggregation
over ``array_distinct`` tokens (df per term) + a ≤``max_expansions`` collect;
the scoring pass is the existing two-narrow-pass :func:`bm25_topk` plan. On
the serving path (plans/query_index.py) expansion reads the prebuilt global
``terms`` dictionary instead — prefix via a range-pruned Parquet read, never
a corpus pass.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokenize, tokens_col
from .topk import bm25_topk, bm25_topk_sql

MAX_EXPANSIONS = 50  # Lucene/ES default

_PREFIX_RE = re.compile(r"^[a-z0-9]+$")
_WILDCARD_RE = re.compile(r"^[a-z0-9*?]+$")
# regexp subset: chars on which Java regex / RE2 / Python `re` agree (module
# docstring). No backslash, no anchors, no Lucene-regexp extra operators.
_REGEXP_RE = re.compile(r"^[a-z0-9.*+?|()\[\]\-{},]+$")


def _validate_regexp(pattern: str) -> str:
    pattern = pattern.lower()
    if not _REGEXP_RE.match(pattern):
        raise ValueError(
            f"regexp pattern must use only [a-z0-9.*+?|()[]-{{}},], got {pattern!r}"
        )
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"invalid regexp pattern {pattern!r}: {e}") from None
    return pattern


def translate_wildcard(pattern: str) -> str:
    """ES/Lucene wildcard (``*``/``?``) → SQL LIKE (``%``/``_``).

    Identical LIKE semantics in Spark and DuckDB; the token class
    ``[a-z0-9]+`` cannot contain ``%``/``_`` so no escaping is needed."""
    pattern = pattern.lower()
    if not _WILDCARD_RE.match(pattern):
        raise ValueError(f"wildcard pattern must be [a-z0-9*?]+, got {pattern!r}")
    return pattern.replace("*", "%").replace("?", "_")


def _normalize_pattern(pattern: str, kind: str, prefix_length: int) -> str:
    pattern = pattern.lower()
    if kind in ("prefix", "fuzzy"):
        if not _PREFIX_RE.match(pattern):
            raise ValueError(f"{kind} pattern must be [a-z0-9]+, got {pattern!r}")
    elif kind == "wildcard":
        if not _WILDCARD_RE.match(pattern):
            raise ValueError(f"wildcard pattern must be [a-z0-9*?]+, got {pattern!r}")
    elif kind == "regexp":
        pattern = _validate_regexp(pattern)
    else:
        raise ValueError(f"unknown multi-term kind {kind!r}")
    if prefix_length < 0:
        raise ValueError("prefix_length must be >= 0")
    return pattern


def literal_prefix(pattern: str, kind: str, prefix_length: int = 0) -> str:
    """The longest literal prefix every match must share — the dictionary
    range-pruning key on the serving path (prefix: the whole pattern;
    wildcard: chars before the first meta; fuzzy: the exact-prefix guard)."""
    if kind == "prefix":
        return pattern
    if kind == "wildcard":
        for i, ch in enumerate(pattern):
            if ch in "*?":
                return pattern[:i]
        return pattern
    if kind == "regexp":
        # a `|` at nesting depth 0 voids any prefix guarantee — `b.tch|d.p`
        # matches "dup", which shares no prefix with the left branch
        depth = 0
        for ch in pattern:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "|" and depth == 0:
                return ""
        # otherwise chars before the first meta are a guaranteed literal
        # prefix, except a quantifier makes the last literal optional or
        # repeatable (`ab*` matches "a", `ab{0,2}`…) so stop one short of it
        lit = ""
        for ch in pattern:
            if ch not in "abcdefghijklmnopqrstuvwxyz0123456789":
                return lit[:-1] if ch in "*?{" and lit else lit
            lit += ch
        return lit
    return pattern[:prefix_length]


def levenshtein_py(a: str, b: str) -> int:
    """Plain Levenshtein — same definition as Spark's ``levenshtein`` and
    DuckDB's ``levenshtein`` (three-engine parity pinned in tests)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def match_term_py(
    term: str, pattern: str, kind: str, fuzziness: int = 1, prefix_length: int = 0
) -> bool:
    """Driver-side term matcher, semantics-identical to
    :func:`term_match_cond` / :func:`term_match_sql` — used for serving-path
    expansion over the prebuilt term dictionary."""
    if kind == "prefix":
        return term.startswith(pattern)
    if kind == "wildcard":
        rx = "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern)
        return re.fullmatch(rx, term) is not None
    if kind == "regexp":
        return re.fullmatch(pattern, term) is not None
    if prefix_length > 0 and term[:prefix_length] != pattern[:prefix_length]:
        return False
    return levenshtein_py(term, pattern) <= int(fuzziness)


def term_match_cond(
    pattern: str, kind: str, fuzziness: int = 1, prefix_length: int = 0
) -> F.Column:
    """JVM boolean Column over a ``term`` column for one pattern kind."""
    term = F.col("term")
    if kind == "prefix":
        return term.startswith(pattern)
    if kind == "wildcard":
        return term.like(translate_wildcard(pattern))
    if kind == "regexp":
        return term.rlike(f"^(?:{pattern})$")
    # fuzzy: whole-term edit distance with an exact-prefix guard
    cond = F.levenshtein(term, F.lit(pattern)) <= F.lit(int(fuzziness))
    if prefix_length > 0:
        cond = cond & (term.substr(1, prefix_length) == F.lit(pattern[:prefix_length]))
    return cond


def term_match_sql(
    pattern: str, kind: str, fuzziness: int = 1, prefix_length: int = 0
) -> str:
    """The identical predicate as DuckDB SQL (term dictionary CTE filter)."""
    if kind == "prefix":
        return f"term LIKE '{pattern}%'"
    if kind == "wildcard":
        return f"term LIKE '{translate_wildcard(pattern)}'"
    if kind == "regexp":
        return f"regexp_full_match(term, '{pattern}')"
    cond = f"levenshtein(term, '{pattern}') <= {int(fuzziness)}"
    if prefix_length > 0:
        cond += f" AND substr(term, 1, {prefix_length}) = '{pattern[:prefix_length]}'"
    return cond


def expand_pattern(
    docs: DataFrame,
    pattern: str,
    kind: str,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_expansions: int = MAX_EXPANSIONS,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> list[str]:
    """Expand a pattern against the corpus term dictionary (declarative path).

    One aggregation: ``explode(array_distinct(tokens))`` → df per term
    (map-side combine, ≤ vocabulary rows shuffled), pattern filter, then the
    deterministic Lucene-style cap ``ORDER BY df DESC, term ASC LIMIT n``.
    Returns analyzed terms sorted ascending (order does not affect scoring).
    """
    pattern = _normalize_pattern(pattern, kind, prefix_length)
    toks = tokens_col(text_col, stopwords, analyzer)
    dictionary = (
        docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    rows = (
        dictionary.where(term_match_cond(pattern, kind, fuzziness, prefix_length))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(int(max_expansions))
        .collect()
    )
    return sorted(r["term"] for r in rows)


def bm25_multiterm_topk(
    docs: DataFrame,
    pattern: str,
    kind: str,
    k: int = 10,
    rewrite: str | None = None,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_expansions: int = MAX_EXPANSIONS,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    boost: float = 1.0,
) -> DataFrame:
    """Top-k for a multi-term query, declarative plan (expansion + rewrite).

    ``rewrite=None`` picks the ES default per kind: ``constant_score`` for
    prefix/wildcard/regexp, ``scoring_boolean`` for fuzzy.
    """
    if rewrite is None:
        rewrite = "scoring_boolean" if kind == "fuzzy" else "constant_score"
    terms = expand_pattern(
        docs, pattern, kind, fuzziness, prefix_length, max_expansions,
        text_col, stopwords, analyzer,
    )
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    if rewrite == "scoring_boolean":
        # expanded terms are analyzed tokens ([a-z0-9]+) — a space join
        # round-trips through the analyzer unchanged
        return bm25_topk(
            docs, " ".join(terms), k=k, id_col=id_col, text_col=text_col,
            mode="or", stopwords=stopwords, analyzer=analyzer,
            boosts={t: boost for t in terms} if boost != 1.0 else None,
        )
    if rewrite != "constant_score":
        raise ValueError(f"unknown rewrite {rewrite!r}")
    toks = tokens_col(text_col, stopwords, analyzer)
    matched = F.exists(toks, lambda x: x.isin(terms))
    return (
        docs.select(F.col(id_col).alias("doc_id"), matched.alias("m"))
        .where(F.col("m"))
        .orderBy(F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.lit(round(float(boost), 6)).alias("score"))
    )


def multiterm_topk_sql(
    pattern: str,
    kind: str,
    k: int = 10,
    rewrite: str | None = None,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_expansions: int = MAX_EXPANSIONS,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
    boost: float = 1.0,
) -> str:
    """DuckDB oracle for :func:`bm25_multiterm_topk`.

    The expansion itself is computed IN SQL (dictionary CTE + the same
    ``df DESC, term ASC LIMIT n`` cap), so the oracle independently
    cross-checks expansion, rewrite, and scoring — not just the final sum.
    """
    if rewrite is None:
        rewrite = "scoring_boolean" if kind == "fuzzy" else "constant_score"
    pattern = _normalize_pattern(pattern, kind, prefix_length)
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    match_sql = term_match_sql(pattern, kind, fuzziness, prefix_length)
    expansion = f"""
dterm AS (
  SELECT DISTINCT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dict AS (SELECT term, count(*) AS df FROM dterm GROUP BY term),
expanded AS (
  SELECT term FROM dict WHERE {match_sql}
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
)"""
    if rewrite == "constant_score":
        return f"""
WITH {expansion.lstrip()}
SELECT doc_id, round({float(boost)!r}, 6) AS score
FROM dterm JOIN expanded USING (term)
GROUP BY doc_id
ORDER BY doc_id ASC
LIMIT {k}
"""
    if rewrite != "scoring_boolean":
        raise ValueError(f"unknown rewrite {rewrite!r}")
    return f"""
WITH {expansion.lstrip()},
toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
dl AS (
  SELECT doc_id, len({tok_expr}) AS dl FROM {table}
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, df FROM dict JOIN expanded USING (term)),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  JOIN expanded USING (term) GROUP BY doc_id, term
),
scored AS (
  SELECT tf.doc_id,
         {float(boost)!r} * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS partial
  FROM tf
  JOIN dfreq USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, round(sum(partial), 6) AS score
FROM scored
GROUP BY doc_id
ORDER BY sum(partial) DESC, doc_id ASC
LIMIT {k}
"""


# -- term suggester (ES suggest API) ------------------------------------------


def term_suggest(
    docs: DataFrame,
    term: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES term suggester ("did you mean"): dictionary terms within
    ``max_edits`` Levenshtein of the input, sharing its first
    ``prefix_length`` chars (the ES default 1 — and the serving path's
    range-pruning key), excluding the input itself, ordered by
    ``(distance ASC, df DESC, term ASC)`` — ES ranks by closeness then
    frequency; the term tiebreak makes the cap deterministic. Returns
    (suggestion, distance, df).

    Scale shape: same one-aggregation dictionary as :func:`expand_pattern`
    (map-side combine, ≤ vocabulary rows shuffled), then a vocabulary-sized
    Levenshtein filter — never a corpus re-scan per suggestion."""
    term = term.lower()
    if prefix_length < 0 or max_edits < 0:
        raise ValueError("max_edits and prefix_length must be non-negative")
    toks = tokens_col(text_col, stopwords, analyzer)
    dictionary = (
        docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    cond = (F.levenshtein(F.col("term"), F.lit(term)) <= int(max_edits)) & (
        F.col("term") != term
    )
    if prefix_length:
        cond = cond & (
            F.substring("term", 1, int(prefix_length)) == term[: int(prefix_length)]
        )
    return (
        dictionary.where(cond)
        .select(
            F.col("term").alias("suggestion"),
            F.levenshtein(F.col("term"), F.lit(term)).cast("long").alias("distance"),
            "df",
        )
        .orderBy(F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc())
        .limit(int(size))
    )


def term_suggest_sql(
    term: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`term_suggest` (levenshtein is bit-identical
    across engines on the analyzer's token class — pinned in tests)."""
    term = term.lower()
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    prefix_pred = (
        f"AND substr(term, 1, {int(prefix_length)}) = '{term[: int(prefix_length)]}'"
        if prefix_length
        else ""
    )
    return f"""
WITH dict AS (
  SELECT term, count(*) AS df
  FROM (SELECT unnest(list_distinct({tok_expr})) AS term FROM {table})
  GROUP BY term
)
SELECT term AS suggestion, CAST(levenshtein(term, '{term}') AS BIGINT) AS distance, df
FROM dict
WHERE levenshtein(term, '{term}') <= {int(max_edits)} AND term <> '{term}'
  {prefix_pred}
ORDER BY distance ASC, df DESC, suggestion ASC
LIMIT {int(size)}
"""


def completion_suggest(
    docs: DataFrame,
    prefix: str,
    size: int = 5,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES completion suggester (1.x ``suggest`` with a ``completion``
    field): type-ahead — dictionary entries starting with ``prefix``,
    ranked by weight. ES backs this with an in-memory FST built at index
    time from explicit (input, weight) pairs; this engine derives the
    completion field from the analyzed corpus itself — inputs are the
    dictionary terms, weight is document frequency (the standard auto-
    suggest weighting when no editorial weights exist). Returns
    (suggestion, weight) ordered ``(weight DESC, suggestion ASC)`` — the ES
    ranking plus a deterministic tiebreak.

    Scale shape: one map-side-combined dictionary aggregation (≤ vocabulary
    rows shuffled — identical to :func:`expand_pattern`), then a prefix
    filter. The serving twin (:meth:`IndexSearcher.complete`) never touches
    the corpus at all: the prebuilt ``terms/`` dictionary is range-pruned
    on the prefix, the Parquet analog of the FST's prefix walk.

    Reference analog: the ES suggest surface behind the sink
    (ElasticsearchSink.java:54).
    """
    prefix = prefix.lower()
    if not prefix or not _PREFIX_RE.match(prefix):
        raise ValueError(
            f"completion prefix must be [a-z0-9]+, got {prefix!r} (the "
            "analyzer's token class — also keeps the SQL oracle's LIKE and "
            "the serving range-prune metacharacter-safe)"
        )
    toks = tokens_col(text_col, stopwords, analyzer)
    dictionary = (
        docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("weight"))
    )
    return (
        dictionary.where(F.col("term").startswith(prefix))
        .select(F.col("term").alias("suggestion"), F.col("weight"))
        .orderBy(F.col("weight").desc(), F.col("suggestion").asc())
        .limit(int(size))
    )


def completion_suggest_sql(
    prefix: str,
    size: int = 5,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`completion_suggest`."""
    prefix = prefix.lower()
    if not prefix or not _PREFIX_RE.match(prefix):
        raise ValueError(f"completion prefix must be [a-z0-9]+, got {prefix!r}")
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH dict AS (
  SELECT term, count(*) AS weight
  FROM (SELECT unnest(list_distinct({tok_expr})) AS term FROM {table})
  GROUP BY term
)
SELECT term AS suggestion, weight
FROM dict
WHERE term LIKE '{prefix}%'
ORDER BY weight DESC, suggestion ASC
LIMIT {int(size)}
"""


# -- phrase suggester ------------------------------------------------------------

import math as _math


def _phrase_candidates(
    input_terms: list[str],
    dictionary: dict[str, int],
    n_docs: int,
    size: int,
    max_edits: int,
    prefix_length: int,
    max_candidates: int,
) -> list[tuple[str, float]]:
    """Shared scorer for both phrase-suggester paths. Per position i the
    candidate set is the dictionary terms within ``max_edits`` of the input
    token sharing its first ``prefix_length`` chars, capped by the engine's
    deterministic (df DESC, term ASC) cap at ``max_candidates``; candidate
    PHRASES replace exactly ONE position (the ES ``max_errors=1`` default —
    the space stays linear in m). Rank = Laplace-smoothed unigram log-
    likelihood Σ ln((df+0.5)/(n_docs+1)); the identity phrase is excluded.
    Deterministic tiebreak (score DESC, phrase ASC)."""

    def lp(term: str) -> float:
        return _math.log((dictionary.get(term, 0) + 0.5) / (n_docs + 1))

    base_lp = [lp(t) for t in input_terms]
    total = sum(base_lp)
    phrases: dict[str, float] = {}
    for i, tok in enumerate(input_terms):
        pre = tok[:prefix_length] if prefix_length else ""
        cand = [
            (t, d)
            for t, d in dictionary.items()
            if t != tok
            and (not pre or t.startswith(pre))
            and levenshtein_py(t, tok) <= max_edits
        ]
        cand.sort(key=lambda td: (-td[1], td[0]))
        for t, _ in cand[: int(max_candidates)]:
            phrase = " ".join(input_terms[:i] + [t] + input_terms[i + 1:])
            score = total - base_lp[i] + lp(t)
            prev = phrases.get(phrase)
            if prev is None or score > prev:
                phrases[phrase] = score
    from ..functions.rounding import round_half_up6

    ranked = sorted(phrases.items(), key=lambda ps: (-ps[1], ps[0]))
    return [(p, round_half_up6(s)) for p, s in ranked[: int(size)]]


def phrase_suggest(
    docs: DataFrame,
    text: str,
    size: int = 5,
    max_edits: int = 1,
    prefix_length: int = 1,
    max_candidates: int = 5,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES phrase suggester ("did you mean" for whole inputs), pinned
    simplified contract (see :func:`_phrase_candidates`): single-position
    corrections from the dictionary, ranked by a Laplace-smoothed unigram
    language model over corpus document frequencies (ES's word-LM scorer
    with its default ``max_errors=1``; the n-gram-LM variants are out of
    the subset — absent loudly, not approximated). Returns
    (suggestion, score).

    Scale shape: ONE map-side-combined dictionary aggregation pruned to the
    positions' prefixes BEFORE the shuffle (≤ the prefixed vocabulary
    crosses the exchange, plus the input terms' own df lookups); candidate
    assembly and LM scoring are driver-side over that tiny slice — the
    suggester IS a coordinator-side structure in ES too. The serving twin
    (:meth:`IndexSearcher.suggest_phrase`) range-prunes the prebuilt
    ``terms/`` dictionary instead and never touches the corpus."""
    input_terms = tokenize(text, stopwords, analyzer)
    spark = docs.sparkSession
    empty = spark.createDataFrame([], "suggestion string, score double")
    if not input_terms:
        return empty
    n_docs = docs.count()
    if n_docs == 0:
        return empty
    toks = tokens_col(text_col, stopwords, analyzer)
    prefixes = sorted({t[:prefix_length] for t in input_terms if t}) if prefix_length else []
    dict_src = docs.select(F.explode(F.array_distinct(toks)).alias("term"))
    if prefixes:  # prune before the (term) shuffle: candidates + exact lookups
        keep = F.col("term").isin(input_terms)
        for p in prefixes:
            keep = keep | F.col("term").startswith(p)
        dict_src = dict_src.where(keep)
    rows = dict_src.groupBy("term").agg(F.count("*").alias("df")).collect()
    dictionary = {r["term"]: int(r["df"]) for r in rows}
    ranked = _phrase_candidates(
        input_terms, dictionary, n_docs, size, max_edits, prefix_length, max_candidates
    )
    return spark.createDataFrame(ranked, "suggestion string, score double")


def phrase_suggest_sql(
    text: str,
    size: int = 5,
    max_edits: int = 1,
    prefix_length: int = 1,
    max_candidates: int = 5,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`phrase_suggest` — per-position candidate
    CTEs unrolled statically (the analyzed input is known at generation
    time), same cap / LM / identity-exclusion / tiebreak contract."""
    input_terms = tokenize(text, stopwords, analyzer)
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"

    def lp_sql(term: str) -> str:
        esc = term.replace("'", "''")
        return (
            f"ln((coalesce((SELECT df FROM dict WHERE term = '{esc}'), 0) + 0.5)"
            " / ((SELECT n FROM nd) + 1))"
        )

    parts = []
    for i, tok in enumerate(input_terms):
        pre = tok[:prefix_length] if prefix_length else ""
        pre_pred = f"AND term LIKE '{pre}%'" if pre else ""
        others = " + ".join(
            [lp_sql(t) for j, t in enumerate(input_terms) if j != i] or ["0.0"]
        )
        phrase = " || ' ' || ".join(
            [f"'{t}'" if j != i else "c.term" for j, t in enumerate(input_terms)]
        )
        parts.append(f"""
SELECT {phrase} AS suggestion,
       {others} + ln((c.df + 0.5) / ((SELECT n FROM nd) + 1)) AS score
FROM (
  SELECT term, df FROM dict
  WHERE levenshtein(term, '{tok}') <= {int(max_edits)} AND term <> '{tok}' {pre_pred}
  ORDER BY df DESC, term ASC LIMIT {int(max_candidates)}
) c""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH dict AS (
  SELECT term, count(*) AS df
  FROM (SELECT unnest(list_distinct({tok_expr})) AS term FROM {table})
  GROUP BY term
),
nd AS (SELECT count(*) AS n FROM {table}),
cands AS (
{union}
),
best AS (
  SELECT suggestion, max(score) AS score FROM cands GROUP BY suggestion
)
SELECT suggestion, round(score, 6) AS score
FROM best
ORDER BY score DESC, suggestion ASC
LIMIT {int(size)}
"""


# -- the _suggest endpoint (named suggesters in one body) ------------------------

_SUGGEST_KINDS = ("term", "phrase", "completion")


def _parse_suggest_body(body: dict) -> list[tuple[str, str, str, dict]]:
    """Normalize an ES 1.x ``_suggest`` body: each named entry carries
    ``text`` (``prefix`` accepted for completion, as 2.x spells it) and
    exactly one suggester config. Returns [(name, kind, text, options)];
    anything outside the subset raises loudly."""
    if not isinstance(body, dict) or not body:
        raise ValueError("unsupported _suggest: body must be a non-empty dict")
    out = []
    for name in sorted(body):
        entry = body[name]
        if not isinstance(entry, dict):
            raise ValueError(f"unsupported _suggest: entry {name!r} must be a dict")
        kinds = [k for k in entry if k in _SUGGEST_KINDS]
        if len(kinds) != 1:
            raise ValueError(
                f"unsupported _suggest: entry {name!r} needs exactly one of {_SUGGEST_KINDS}"
            )
        kind = kinds[0]
        if "text" in entry and "prefix" in entry:
            raise ValueError(
                f"unsupported _suggest: entry {name!r} has both text and prefix"
            )
        if "prefix" in entry and kind != "completion":
            # 'prefix' is the completion spelling only — a term/phrase
            # suggester fed a 'prefix' is a client mistake, rejected loudly
            raise ValueError(
                f"unsupported _suggest: entry {name!r} uses 'prefix' with a "
                f"{kind} suggester (completion only)"
            )
        text = entry.get("text", entry.get("prefix"))
        extra = set(entry) - {kind, "text", "prefix"}
        if extra or not isinstance(text, str) or not text:
            raise ValueError(f"unsupported _suggest: entry {name!r} keys/text")
        conf = dict(entry[kind] or {})
        allowed = {
            "term": {"field", "size", "max_edits", "prefix_length"},
            "phrase": {"field", "size", "max_edits", "prefix_length", "max_candidates"},
            "completion": {"field", "size"},
        }[kind]
        bad = set(conf) - allowed
        if bad:
            raise ValueError(f"unsupported _suggest: {kind} options {sorted(bad)}")
        if conf.pop("field", "text") != "text":
            raise ValueError("unsupported _suggest: suggesters run on the analyzed text field")
        out.append((name, kind, text, {k: int(v) for k, v in conf.items()}))
    return out


def _rank_wrap(frame: DataFrame, name: str, order_cols) -> DataFrame:
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return frame.select(
        F.lit(name).alias("name"),
        F.col("suggestion"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


_SUGGEST_ORDER = {
    "term": lambda: [F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()],
    "phrase": lambda: [F.col("score").desc(), F.col("suggestion").asc()],
    "completion": lambda: [F.col("weight").desc(), F.col("suggestion").asc()],
}
_SUGGEST_ORDER_SQL = {
    "term": "distance ASC, df DESC, suggestion ASC",
    "phrase": "score DESC, suggestion ASC",
    "completion": "weight DESC, suggestion ASC",
}


def suggest_body(docs: DataFrame, body: dict, text_col: str = "text") -> DataFrame:
    """ES ``_suggest`` endpoint on the DECLARATIVE path: named term /
    phrase / completion suggesters in one body, each routed to its native
    operator, results normalized to ``(name, suggestion, rank)`` (the
    per-kind payload columns differ — rank is the cross-kind invariant the
    response shape shares). Ordered (name, rank)."""
    frames = []
    for name, kind, text, conf in _parse_suggest_body(body):
        if kind == "term":
            f = term_suggest(docs, text, text_col=text_col, **conf)
        elif kind == "phrase":
            f = phrase_suggest(docs, text, text_col=text_col, **conf)
        else:
            f = completion_suggest(docs, text, text_col=text_col, **conf)
        frames.append(_rank_wrap(f, name, _SUGGEST_ORDER[kind]()))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("name", "rank")


def suggest_body_sql(body: dict, table: str = "documents") -> str:
    """DuckDB oracle for :func:`suggest_body` / :func:`suggest_body_index`."""
    parts = []
    for name, kind, text, conf in _parse_suggest_body(body):
        inner = {
            "term": term_suggest_sql,
            "phrase": phrase_suggest_sql,
            "completion": completion_suggest_sql,
        }[kind](text, table=table, **conf)
        parts.append(
            f"SELECT '{name}' AS name, suggestion,\n"
            f"       row_number() OVER (ORDER BY {_SUGGEST_ORDER_SQL[kind]}) AS rank\n"
            f"FROM ({inner})"
        )
    return (
        "SELECT * FROM (\n" + "\nUNION ALL\n".join(parts) + "\n) ORDER BY name, rank"
    )


def suggest_body_index(searcher, body: dict) -> DataFrame:
    """``_suggest`` on the SERVING path: every suggester reads only the
    prebuilt ``terms/`` dictionary (range-/IN-pruned) — zero corpus work
    for the whole body."""
    frames = []
    for name, kind, text, conf in _parse_suggest_body(body):
        if kind == "term":
            f = searcher.suggest(text, **conf)
        elif kind == "phrase":
            f = searcher.suggest_phrase(text, **conf)
        else:
            f = searcher.complete(text, **conf)
        frames.append(_rank_wrap(f, name, _SUGGEST_ORDER[kind]()))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("name", "rank")


def bm25_span_multi_topk(
    docs: DataFrame,
    pattern: str,
    kind: str = "prefix",
    k: int = 10,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_expansions: int = MAX_EXPANSIONS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lucene/ES ``span_multi`` wrapping a multi-term query (ES 1.x body
    ``{"span_multi": {"match": {"prefix": {"text": "qu"}}}}``; reference
    delegation site ElasticsearchSink.java:54).

    Lucene's SpanMultiTermQueryWrapper rewrites the inner multi-term query
    to a SpanOr over every dictionary term it matches — so the pinned
    contract IS span_or's (operators/topk.py:bm25_span_or_topk: summed sf,
    summed idf over the expanded set), with the expansion following the
    deterministic Lucene cap ``(df DESC, term ASC) LIMIT max_expansions``
    (:func:`expand_pattern`). An expansion of ZERO terms returns zero hits
    (Lucene's empty SpanOr), unlike span_or's explicit-clause refusal.

    Scale shape: expansion is one map-side-combined dictionary agg (<=
    vocabulary rows shuffled) collected as driver constants; scoring is
    span_or's two-narrow-pass zero-join plan."""
    from .topk import bm25_span_or_topk

    terms = expand_pattern(
        docs, pattern, kind, fuzziness=fuzziness, prefix_length=prefix_length,
        max_expansions=max_expansions, text_col=text_col,
    )
    if not terms:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    return bm25_span_or_topk(docs, terms, k=k, id_col=id_col, text_col=text_col)


def bm25_span_multi_topk_sql(
    pattern: str,
    kind: str = "prefix",
    k: int = 10,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_expansions: int = MAX_EXPANSIONS,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`bm25_span_multi_topk` — the expansion (same
    dictionary df + Lucene cap) and the span_or scoring contract inlined as
    one self-contained query (sf via an explode join: lambdas cannot hold
    subqueries)."""
    pattern_n = _normalize_pattern(pattern, kind, prefix_length)
    pred = term_match_sql(pattern_n, kind, fuzziness, prefix_length)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM {table}
),
dict AS (
  SELECT term, count(*) AS df
  FROM (SELECT doc_id, unnest(list_distinct(ts)) AS term FROM toks)
  GROUP BY term
),
mt AS (
  SELECT term, df FROM dict WHERE {pred}
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
s AS (SELECT count(*) AS n_docs, avg(len(ts)) AS avgdl FROM toks),
idf AS (
  SELECT coalesce(sum(ln(1 + ((SELECT n_docs FROM s) - df + 0.5) / (df + 0.5))), 0) AS v
  FROM mt
),
sfq AS (
  SELECT t.doc_id, CAST(count(*) AS DOUBLE) AS sf
  FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) t
  JOIN mt ON t.tok = mt.term
  GROUP BY t.doc_id
),
f AS (
  SELECT toks.doc_id, len(toks.ts) AS dl, sfq.sf
  FROM toks JOIN sfq USING (doc_id)
)
SELECT f.doc_id,
       round((SELECT v FROM idf) * f.sf * (1.2 + 1.0)
             / (f.sf + 1.2 * (1.0 - 0.75 + 0.75 * f.dl / (SELECT avgdl FROM s))), 6) AS score
FROM f
WHERE f.sf > 0
ORDER BY (SELECT v FROM idf) * f.sf * (1.2 + 1.0)
         / (f.sf + 1.2 * (1.0 - 0.75 + 0.75 * f.dl / (SELECT avgdl FROM s))) DESC,
         f.doc_id ASC
LIMIT {int(k)}
"""
