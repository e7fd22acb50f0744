"""Anchor-text aggregation (operators/anchors.py): hand-built graph
semantics, DuckDB parity on the synth corpus, and plan hygiene."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.anchors import (
    anchor_text_topk,
    anchor_text_topk_sql,
)


def test_anchor_semantics_hand_graph(spark):
    # 4 docs, degree/seed fixed: recompute the expected rollup in Python
    # from the SAME md5 edge rule, then pin counts + window order.
    import hashlib

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha alpha zeta"),
            (2, "beta"),
            (3, "gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    n, degree, seed, anchor_len = 4, 4, 7, 3

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    texts = {0: ["alpha", "beta", "gamma"], 1: ["alpha", "alpha", "zeta"],
             2: ["beta"], 3: ["gamma", "beta", "alpha"]}
    from collections import Counter

    counts: Counter = Counter()
    for src in range(n):
        for j in range(degree):
            dst = min(
                h60(f"pr:{src}:{j}:a:{seed}") % n, h60(f"pr:{src}:{j}:b:{seed}") % n
            )
            for t in texts[src][:anchor_len]:
                counts[(dst, t)] += 1
    expected = {}
    for dst in range(n):
        terms = sorted(
            ((c, t) for (d, t), c in counts.items() if d == dst),
            key=lambda ct: (-ct[0], ct[1]),
        )[:3]
        if terms:
            expected[dst] = [(t, c, r + 1) for r, (c, t) in enumerate(terms)]

    got: dict = {}
    for row in anchor_text_topk(docs, n).collect():
        got.setdefault(row.dst, []).append((row.term, row.cnt, row.rank))
    got = {d: sorted(v, key=lambda x: x[2]) for d, v in got.items()}
    assert got == expected


def test_anchor_duckdb_parity(documents, sf_dir):
    n = documents.count()
    sdf = anchor_text_topk(documents, n).toPandas()
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from parquet_scan('{sf_dir}/documents.parquet')"
    )
    odf = con.sql(anchor_text_topk_sql()).df()
    key = lambda df: sorted(map(repr, df.itertuples(index=False, name=None)))
    assert len(sdf) == len(odf) and key(sdf) == key(odf)


def test_anchor_rank_window_bounded(documents):
    n = documents.count()
    out = anchor_text_topk(documents, n, k=2)
    import pandas as pd

    pdf = out.toPandas()
    assert pdf.groupby("dst")["rank"].max().le(2).all()
    assert pdf.groupby("dst").size().le(2).all()
    # (dst, term) unique -> deterministic order
    assert not pdf.duplicated(["dst", "term"]).any()


def test_anchor_plan_partial_agg(documents):
    plan = (
        anchor_text_topk(documents, documents.count())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side combine on (dst, term) before the exchange; no Python UDF
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
