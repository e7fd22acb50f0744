"""The fixed query set (FIXTURES.md §4): ~24 deterministic queries checked
into the repo, classed to exercise every retrieval path — rank-identity
tests, the latency benchmark, and the driver contract all draw from here.

Tuned to the documents-table vocabulary (31 terms; 'dup' is the only rare
term, df≈25/500 — everything else is hot, df≈370-410/500, which makes most
of these long-postings worst cases)."""

from __future__ import annotations

QUERY_SET: list[tuple[str, str]] = [
    # single rare term (tiny postings, exact idf)
    ("dup", "or"),
    ("dup", "and"),
    # rare + hot mixes (BMW must not let the hot term drown the rare one)
    ("dup batch", "or"),
    ("dup query scan", "or"),
    # single hot term (long postings, block skipping)
    ("query", "or"),
    ("batch", "or"),
    ("window", "or"),
    ("the", "or"),
    # 2-3 mixed-frequency OR (ES match semantics: scored union)
    ("batch small scan", "or"),
    ("join filter window", "or"),
    ("hash join merge sort", "or"),
    ("row column table", "or"),
    ("fast slow line", "or"),
    ("key value data", "or"),
    # conjunctions (posting intersection)
    ("join filter window", "and"),
    ("batch scan", "and"),
    ("the fast", "and"),
    ("row column", "and"),
    # all-hot worst case for pruning
    ("query scan window merge sort", "or"),
    ("batch data small agg", "or"),
    # absent terms (empty / partial-empty handling)
    ("zzzznotaterm", "or"),
    ("zzzznotaterm batch", "and"),
    # duplicate query terms (per-occurrence weight accumulation)
    ("the the fast", "or"),
    ("dup dup", "or"),
]
