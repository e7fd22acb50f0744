"""Property fuzz for the edge_ngram analyzer family: hypothesis generates
mixed-mess text (tokens spanning the min/max boundary lengths, digits,
punctuation runs, empty strings) and random (min_gram, max_gram) bounds,
pinning the Python tokenizer == the DuckDB list chain on every draw, plus
the filter's structural invariants. The driver gate checks one fixed
corpus/config; this explores the boundary space (len == min-1, == min,
== max, > max) where an off-by-one in either engine's slice arithmetic
would hide."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.functions.tokenizer import (
    duckdb_edge_transform,
    duckdb_token_pattern,
    tokenize,
)

_CON = duckdb.connect()

piece_st = st.sampled_from(
    ["a", "ab", "abc", "abcd", "batch", "supercalifragilistic", "42", "x9y",
     "-", "  ", ".", "!", "", "B", "Scan", "ORDER"]
)
text_st = st.lists(piece_st, min_size=0, max_size=12).map(" ".join)
bounds_st = st.tuples(st.integers(1, 5), st.integers(0, 4)).map(
    lambda t: (t[0], t[0] + t[1])
)


@given(text=text_st, bounds=bounds_st)
@settings(max_examples=150, deadline=None)
def test_edge_python_duckdb_parity(text, bounds):
    mn, mx = bounds
    name = f"ascii_edge{mn}_{mx}"
    py = tokenize(text, analyzer=name)
    tok = f"regexp_extract_all(lower(?::VARCHAR), '{duckdb_token_pattern(name)}')"
    duck = _CON.sql(
        f"SELECT {duckdb_edge_transform(tok, mn, mx)}", params=[text]
    ).fetchone()[0]
    assert duck == py
    # structural invariants of the Lucene contract
    base = tokenize(text)
    assert all(mn <= len(g) <= mx for g in py)
    # every emitted gram is a prefix of some base token of length >= min
    ok_tokens = [t for t in base if len(t) >= mn]
    assert all(any(t.startswith(g) for t in ok_tokens) for g in py)
    # emission count: each kept token emits min(max, len) - min + 1 grams
    assert len(py) == sum(min(mx, len(t)) - mn + 1 for t in ok_tokens)
