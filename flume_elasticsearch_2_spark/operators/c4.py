"""C4 corpus-cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §2.2 — the
heuristics that turned Common Crawl into C4): LINE-granularity filtering
plus page-level policy rules, complementing the doc-level Gopher battery
(``operators/gopher.py``) and the composed hygiene pass
(``operators/cleaning.py clean_corpus``).

LLM-pipeline role: C4's signature move is that cleaning happens at the
LINE level — a page survives with its boilerplate lines removed rather
than being dropped wholesale. Every rule here is a per-row JVM expression
(higher-order ``filter`` over the split lines, length-delta counts), so
the whole pass is ONE narrow WholeStageCodegen scan: no shuffle, no UDF,
no join — the shape that survives a 1000-executor scale-up unchanged.

Implemented rules (paper defaults):

* keep only lines ending in a terminal punctuation mark — period,
  exclamation mark, question mark, or end quotation mark (``"``/``”``),
  trailing blanks allowed (``require_terminal_punct`` exists as an
  explicit relaxation lever for corpora without punctuation; tests pin
  the real rule on crafted docs);
* keep only lines with ≥ ``min_line_words`` (3) whitespace words;
* drop any line containing the word "javascript" (case-insensitive
  substring, as C4's own implementation);
* drop the whole page if the KEPT text has fewer than ``min_sentences``
  (5) sentences — counted as terminal marks ``.!?`` in the kept text (a
  deterministic proxy for C4's sentence splitter, documented contract);
* drop the whole page if the raw text contains a curly bracket, the
  phrase "lorem ipsum" (case-insensitive), or any word from ``badwords``
  (lowercased whole-word match; the paper uses the "List of Dirty,
  Naughty, Obscene or Otherwise Bad Words" — external, so the list is a
  parameter, empty by default).

Engine-parity contract (pinned in tests): lines split on ``\\n``; words
within a line split on ``[ \\t]+`` with empties dropped; the terminal
mark class is ``[.!?"”]`` verbatim in Java regex and RE2; sentence counts
use translate-deletion length deltas (identical Spark/DuckDB semantics);
boolean flags are cast to INT so value reprs cannot diverge.

Reference provenance: the reference pipeline has no cleaning at all — it
forwards every event to ES (``ElasticsearchSink.java:54``); this operator
belongs to the beyond-reference LLM-pipeline family (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: terminal punctuation per C4 §2.2: period, exclamation mark, question
#: mark, or end quotation mark; trailing ASCII blanks allowed
_TERMINAL_RE = '[.!?"”][ \t]*$'
#: sentence-counting marks (subset of the terminal class: quotes end a
#: line but do not end a sentence on their own)
_SENTENCE_MARKS = ".!?"

_METRIC_COLS = (
    "n_lines", "n_kept_lines", "n_sentences", "has_brace", "has_lorem",
    "clean_len",
)


def _line_keep_pred(
    li: Column, min_line_words: int, require_terminal_punct: bool
) -> Column:
    words = F.filter(F.split(li, "[ \t]+", -1), lambda w: F.length(w) > 0)
    keep = (F.size(words) >= int(min_line_words)) & (
        ~F.contains(F.lower(li), F.lit("javascript"))
    )
    if require_terminal_punct:
        keep = keep & li.rlike(_TERMINAL_RE)
    return keep


def _split_lines(text: Column) -> Column:
    # \r?\n so CRLF text never leaks a trailing \r into the predicates
    # (Java $ and RE2 $ disagree on "abc.\r" — see the parity contract)
    return F.split(text, "\\r?\\n", -1)


def _kept_lines(
    text: Column, min_line_words: int, require_terminal_punct: bool
) -> Column:
    return F.filter(
        _split_lines(text),
        lambda li: _line_keep_pred(li, min_line_words, require_terminal_punct),
    )


def _n_sentences(clean: Column) -> Column:
    return (
        F.length(clean) - F.length(F.translate(clean, _SENTENCE_MARKS, ""))
    ).cast("long")


def _brace_flag(text: Column) -> Column:
    return F.contains(text, F.lit("{")) | F.contains(text, F.lit("}"))


def _lorem_flag(text: Column) -> Column:
    return F.contains(F.lower(text), F.lit("lorem ipsum"))


def _page_flags(text: Column, badwords: tuple[str, ...]) -> Column:
    """TRUE iff the page violates a page-level policy rule."""
    bad = _brace_flag(text) | _lorem_flag(text)
    if badwords:
        words = F.filter(
            F.split(F.lower(text), "[ \t\n\r\f]+", -1),
            lambda w: F.length(w) > 0,
        )
        bad = bad | F.exists(words, lambda w: w.isin([b.lower() for b in badwords]))
    return bad


def c4_line_metrics(
    docs: DataFrame,
    min_line_words: int = 3,
    require_terminal_punct: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc C4 rule inputs: ``(doc_id, n_lines, n_kept_lines,
    n_sentences, has_brace, has_lorem, clean_len)`` — counts over the raw
    lines, the surviving lines, and the page-level policy flags (INT 0/1).
    One narrow pass; every column is a JVM expression."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    kept = _kept_lines(text, min_line_words, require_terminal_punct)
    clean = F.array_join(kept, "\n")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_split_lines(text)).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        _n_sentences(clean).alias("n_sentences"),
        _brace_flag(text).cast("int").alias("has_brace"),
        _lorem_flag(text).cast("int").alias("has_lorem"),
        F.length(clean).cast("long").alias("clean_len"),
    )


def c4_filter(
    docs: DataFrame,
    min_line_words: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
    require_terminal_punct: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The composed C4 §2.2 pass: line-filter every page, then keep pages
    with ≥ ``min_sentences`` sentences in the kept text and no page-level
    policy violation. Returns ``(doc_id, lang, clean_text)`` where
    ``clean_text`` is the surviving lines re-joined with ``\\n``.

    Scale shape: line filtering and every page predicate are inlined
    per-row expressions over one scan — no metrics join, no shuffle; the
    pass stays a single WholeStageCodegen stage at any corpus size."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    kept = _kept_lines(text, min_line_words, require_terminal_punct)
    clean = F.array_join(kept, "\n")
    return (
        docs.where(~_page_flags(text, badwords))
        .where(_n_sentences(clean) >= int(min_sentences))
        .where(F.size(kept) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            clean.alias("clean_text"),
        )
    )


# -- DuckDB oracle twins ---------------------------------------------------------


def _kept_lines_sql(
    text: str, min_line_words: int, require_terminal_punct: bool
) -> str:
    words = "list_filter(regexp_split_to_array(li, '[ \\t]+'), w -> length(w) > 0)"
    conds = [
        f"len({words}) >= {int(min_line_words)}",
        "NOT contains(lower(li), 'javascript')",
    ]
    if require_terminal_punct:
        conds.append(f"regexp_matches(li, '{_TERMINAL_RE}')")
    pred = " AND ".join(conds)
    return f"list_filter({_split_lines_sql(text)}, li -> ({pred}))"


def _split_lines_sql(text: str) -> str:
    return f"regexp_split_to_array({text}, '\\r?\\n')"


def _brace_flag_sql(text: str) -> str:
    return f"(contains({text}, '{{') OR contains({text}, '}}'))"


def _lorem_flag_sql(text: str) -> str:
    return f"contains(lower({text}), 'lorem ipsum')"


def _n_sentences_sql(clean: str) -> str:
    return (
        f"CAST(length({clean}) - length(translate({clean}, '{_SENTENCE_MARKS}', ''))"
        " AS BIGINT)"
    )


def _page_flags_sql(text: str, badwords: tuple[str, ...]) -> str:
    conds = [_brace_flag_sql(text), _lorem_flag_sql(text)]
    if badwords:
        words = (
            f"list_filter(regexp_split_to_array(lower({text}), "
            "'[ \\t\\n\\r\\f]+'), w -> length(w) > 0)"
        )
        lits = "[" + ", ".join(
            "'" + b.lower().replace("'", "''") + "'" for b in badwords
        ) + "]"
        conds.append(f"len(list_intersect({words}, {lits})) > 0")
    return "(" + " OR ".join(conds) + ")"


def c4_line_metrics_sql(
    min_line_words: int = 3,
    require_terminal_punct: bool = True,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`c4_line_metrics`."""
    text = "coalesce(text, '')"
    kept = _kept_lines_sql(text, min_line_words, require_terminal_punct)
    # DuckDB array_to_string(empty_list) is NULL (Spark's array_join is '')
    clean = f"coalesce(array_to_string({kept}, chr(10)), '')"
    return f"""
SELECT doc_id,
       CAST(len({_split_lines_sql(text)}) AS BIGINT) AS n_lines,
       CAST(len({kept}) AS BIGINT) AS n_kept_lines,
       {_n_sentences_sql(clean)} AS n_sentences,
       CAST({_brace_flag_sql(text)} AS INT) AS has_brace,
       CAST({_lorem_flag_sql(text)} AS INT) AS has_lorem,
       CAST(length({clean}) AS BIGINT) AS clean_len
FROM {table}
"""


def c4_filter_sql(
    min_line_words: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
    require_terminal_punct: bool = True,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`c4_filter`."""
    text = "coalesce(text, '')"
    kept = _kept_lines_sql(text, min_line_words, require_terminal_punct)
    clean = f"coalesce(array_to_string({kept}, chr(10)), '')"
    return f"""
SELECT doc_id, lang, {clean} AS clean_text
FROM {table}
WHERE NOT {_page_flags_sql(text, badwords)}
  AND {_n_sentences_sql(clean)} >= {int(min_sentences)}
  AND len({kept}) > 0
"""
