"""Text-analysis column functions for the webtext pipeline.

Covers the reference interceptor-chain transforms (SURVEY.md §2.2: P2 regex
mapping, P4 case normalization, P7 classification) plus the training-data
operations a 100 TB corpus pipeline needs: text extraction with the
byte-identical invariant (BASELINE.json input_hint), quality scoring,
language ID, token counting, and document fingerprinting.

All hot-path functions are JVM-side Column expressions (whole-stage codegen,
no Python); a vectorized Arrow alternative for extraction is provided to
exercise the pandas-UDF plumbing that binary-payload (image/audio) columns
will use.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .tokenizer import TOKEN_PATTERN, tokens_col

# Minimal deterministic per-language stopword profiles for the n-gram/stopword
# language-ID heuristic. Ordered dict: ties resolve to the earlier language.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"),
    "es": ("el", "los", "las", "de", "y", "es", "una", "en", "que", "por"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "na"),
}

EXTRACT_PATTERN = r"(?s)<p>(.*)</p>"


def extract_text_col(html: Column | str) -> Column:
    """Byte-identical text extraction from the page body (input_hint
    invariant: ``extract_text(html) == text`` per url).

    The html binary is UTF-8-decoded and the ``<p>...</p>`` payload is
    pulled with a single JVM regex — the Spark-first re-expression of the
    reference's per-line regex field extraction (FileSource.java:168),
    compiled once by codegen instead of per line (reference bug §8.7).
    """
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract(c.cast("string"), EXTRACT_PATTERN, 1)


_EXTRACT_RE = re.compile(EXTRACT_PATTERN)


def extract_text_arrow(html: Column | str) -> Column:
    """Arrow-vectorized extraction (pre-compiled regex, batch transfer) —
    the pattern binary multimodal decoders follow; must agree
    byte-identically with :func:`extract_text_col`. Defined lazily because
    pandas_udf type resolution needs an active SparkSession."""

    @pandas_udf("string")
    def _udf(col: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            m = _EXTRACT_RE.search(bytes(b).decode("utf-8"))
            return m.group(1) if m else ""

        return col.map(one)

    return _udf(F.col(html) if isinstance(html, str) else html)


def token_count_col(text: Column | str) -> Column:
    """Whitespace-free token count under the pinned analyzer."""
    return F.size(tokens_col(text)).cast("long")


# GPT-2-style pre-tokenizer shape: letter runs, digit runs, punct runs, each
# optionally glued to one leading space; standalone whitespace runs dropped.
# Deliberately RE2/ICU-compatible (no \p classes) so Spark and DuckDB agree.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count_col(text: Column | str) -> Column:
    """BPE-ish token count: the pre-tokenization pass of a byte-pair
    encoder (word/number/punct chunks with leading-space gluing) — the
    standard proxy for LLM token budgeting over a training corpus. Pure
    JVM regex; identical pattern runs in the DuckDB oracle."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))).cast("long")


def quality_cols(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation and
    stopword ratios, alpha ratio. Pure JVM expressions."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks).cast("long")
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, "[^!-/:-@\\[-`{-~]", ""))
    en_stops = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), en_stops)).cast("long")
    avg_tok = F.when(n_tokens > 0, n_alpha.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        "distinct_stopwords": n_stop,
        "avg_token_len": F.round(avg_tok, 6),
    }


def quality_score_col(text: Column | str) -> Column:
    """Composite [0,1] quality score (deterministic heuristic).

    Built from UNROUNDED integer-ratio doubles and finished with an explicit
    ``floor(x*1e6 + 0.5)`` — pure IEEE ops that DuckDB evaluates bit-
    identically, so the SQL oracle can't diverge on representation ties
    (engine round() implementations disagree exactly at .5e-6 products of
    pre-rounded ratios)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tokens = F.size(tokens_col(c)).cast("long")
    n_chars = F.greatest(F.length(c), F.lit(1))
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", "")).cast("double") / n_chars
    punct = F.length(F.regexp_replace(c, "[^!-/:-@\\[-`{-~]", "")).cast("double") / n_chars
    length_ok = F.when((n_tokens >= 20) & (n_tokens <= 100000), 1.0).otherwise(0.3)
    x = length_ok * (F.lit(0.5) + F.lit(0.5) * alpha) * (F.lit(1.0) - punct)
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def lang_id_col(text: Column | str) -> Column:
    """Stopword-profile language ID: argmax distinct-stopword hits per
    language, ties to the profile order, no hits -> 'und'."""
    toks = F.array_distinct(tokens_col(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in words]))))
        for lang, words in LANG_PROFILES.items()
    ]
    best = None
    best_score = None
    # fold right-to-left so earlier languages win ties with strict '>'
    for lang, sc in reversed(scores):
        if best is None:
            best, best_score = F.lit(lang), sc
        else:
            best = F.when(sc >= best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(sc, best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint_col(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the analyzed token stream
    (normalization-invariant: whitespace/punct/case changes don't alter it).
    md5 is available identically in DuckDB for oracle checks."""
    return F.md5(F.concat_ws(" ", tokens_col(text)))


def md5_long_col(c: Column | str) -> Column:
    """60-bit deterministic string hash: first 15 hex chars of md5 as a
    non-negative int64 (``conv(substring(md5(s),1,15),16,10)``).

    Chosen because DuckDB computes the byte-identical value as
    ``('0x' || substr(md5(s),1,15))::BIGINT``, which makes every
    hash-derived operator (MinHash signatures, LSH band buckets, SimHash)
    exactly SQL-oracle-checkable. JVM-side and codegen-friendly; a few times
    slower than xxhash64, so the dedup operators take ``hash_fn='xxhash64'``
    for the pure-scale path and ``'md5'`` for the verified path."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


MD5_LONG_SQL = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def classify_col(text: Column | str, rules: list[tuple[str, str]], default: str = "other") -> Column:
    """P7 classification transform: first-match regex routing of every doc
    to a class label (the reference routes every doc to one index/type at
    ElasticsearchSink.java:66; `rules` generalizes the static label)."""
    c = F.col(text) if isinstance(text, str) else text
    expr = F.lit(default)
    for pat, label in reversed(rules):
        expr = F.when(c.rlike(pat), F.lit(label)).otherwise(expr)
    return expr
