"""ES 1.x synonym token filter, query-time mode (SURVEY §2.5; delegation
site ElasticsearchSink.java:54 — the deployed ES 1.1 ships the `synonym`
token filter with Solr-format rules).

Rule syntax (the Solr/ES format, both forms):

* ``"quick, fast, speedy"`` — equivalence class: in expand mode (the ES
  default) every member maps to the whole class;
* ``"car, auto => automobile, vehicle"`` — explicit mapping: LHS terms map
  to exactly the RHS terms (replacing themselves, as ES).

Pinned query contract: each analyzed query term is replaced by the SORTED
distinct union of its expansions (unknown terms map to themselves); BM25
scores the expanded OR — the 1.x query-time-expansion behavior (a plain
boolean OR; later ES's blended SynonymQuery is a documented divergence).
Expansion is driver-side pure Python over literal rules (the analyzer
settings are request config, not data), so declarative, serving, and
oracle paths share one expanded query string and stay rank-identical; the
scoring itself remains fully oracle-checked through bm25_topk's SQL twin.

Scale: expansion cost is O(|query|); the search is the ordinary two-pass
bm25 plan (declarative) or one BMW scatter (serving) — synonyms add zero
distributed work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.tokenizer import tokenize
from .topk import bm25_topk, bm25_topk_sql

__all__ = [
    "parse_synonyms",
    "expand_query",
    "bm25_synonym_topk",
    "bm25_synonym_sql",
    "search_synonyms",
]


def parse_synonyms(
    rules: list[str], stopwords: list[str] | None = None, analyzer: str = "ascii"
) -> dict[str, tuple[str, ...]]:
    """Solr-format rules -> term -> sorted expansion tuple. Rule terms go
    through the SAME analyzer as documents (ES applies the filter after
    tokenization, so un-analyzable rule terms can never match anyway)."""
    out: dict[str, set[str]] = {}

    def norm(side: str) -> list[str]:
        terms = []
        for raw in side.split(","):
            toks = tokenize(raw, stopwords=stopwords, analyzer=analyzer)
            if len(toks) != 1:
                raise ValueError(
                    f"synonym rule term {raw.strip()!r} must analyze to "
                    f"exactly one token (multi-word synonyms unsupported)"
                )
            terms.append(toks[0])
        return terms

    for rule in rules:
        if "=>" in rule:
            lhs, rhs = rule.split("=>", 1)
            if "=>" in rhs:
                raise ValueError(f"synonym rule {rule!r} has multiple '=>'")
            targets = norm(rhs)
            for t in norm(lhs):
                out.setdefault(t, set()).update(targets)
        else:
            cls = norm(rule)
            for t in cls:
                out.setdefault(t, set()).update(cls)
    return {t: tuple(sorted(s)) for t, s in out.items()}


def expand_query(
    query: str,
    syn_map: dict[str, tuple[str, ...]],
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """Analyzed query terms -> the sorted distinct union of their
    expansions (unknown terms map to themselves)."""
    expanded: set[str] = set()
    for t in tokenize(query, stopwords=stopwords, analyzer=analyzer):
        expanded.update(syn_map.get(t, (t,)))
    return " ".join(sorted(expanded))


def bm25_synonym_topk(
    docs: DataFrame,
    query: str,
    rules: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """Declarative synonym match: BM25 over the expanded OR."""
    syn = parse_synonyms(rules, stopwords, analyzer)
    q = expand_query(query, syn, stopwords, analyzer)
    return bm25_topk(
        docs, q, k=k, id_col=id_col, text_col=text_col,
        stopwords=stopwords, analyzer=analyzer,
    )


def bm25_synonym_sql(
    query: str,
    rules: list[str],
    k: int = 10,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`bm25_synonym_topk` (same expansion, the
    tested bm25 SQL twin)."""
    syn = parse_synonyms(rules, stopwords, analyzer)
    q = expand_query(query, syn, stopwords, analyzer)
    return bm25_topk_sql(q, k=k, table=table, stopwords=stopwords, analyzer=analyzer)


def search_synonyms(searcher, query: str, rules: list[str], k: int = 10) -> DataFrame:
    """Synonym match on the SERVING path: same expansion, one BMW scatter
    over the expanded query — rank-identical to the declarative path."""
    syn = parse_synonyms(rules)
    return searcher.search(expand_query(query, syn), k=k)
