"""Brute-force NumPy BM25 oracle (SURVEY.md §5.3): exact float64, no pruning.

Ground truth for rank-identity tests of both query paths.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from flume_elasticsearch_2_spark.functions.bm25 import B, K1
from flume_elasticsearch_2_spark.functions.tokenizer import tokenize


def brute_force_bm25(
    docs: list[tuple[int, str]], query: str, k: int = 10, mode: str = "or"
) -> list[tuple[int, float]]:
    """docs = [(doc_id, text)]; returns [(doc_id, exact_score)] ordered by
    (-score, doc_id), length <= k."""
    q = tokenize(query)
    if not q:
        return []
    qw = Counter(q)
    toks = {did: tokenize(text) for did, text in docs}
    dl = {did: len(ts) for did, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    dfreq = {t: sum(1 for ts in toks.values() if t in ts) for t in qw}
    results = []
    for did, ts in toks.items():
        tfs = Counter(ts)
        score = 0.0
        hit_terms = 0
        for t in sorted(qw):
            tf = tfs.get(t, 0)
            if tf == 0 or dfreq[t] == 0:
                continue
            hit_terms += 1
            idf = np.log1p((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            norm = K1 * (1 - B + B * dl[did] / avgdl)
            score += qw[t] * idf * tf * (K1 + 1) / (tf + norm)
        if score > 0.0 and (mode == "or" or hit_terms == len(qw)):
            results.append((did, score))
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:k]
