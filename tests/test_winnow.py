"""Winnowing fingerprints (operators/winnow.py): the SWA locality guarantee,
boundary rules, DuckDB parity, hot-fingerprint guard, and plan hygiene."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_sql,
    winnow_pairs,
    winnow_pairs_sql,
)

K, W = 4, 5


def test_locality_guarantee(spark):
    # Two docs sharing a run of >= w + k - 1 = 8 tokens MUST share >= 1 fp.
    shared = "quick brown fox jumps over the lazy dog"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zeta eta theta iota {shared} kappa"),
            (3, "completely different words here with no overlap at all today"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc = {d: {r.fp for r in fps if r.doc_id == d} for d in (1, 2, 3)}
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] and by_doc[2] & by_doc[3])


def test_boundary_rules(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f"), (3, "")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=K, w=W).collect()
    ids = [r.doc_id for r in rows]
    assert 1 not in ids  # 3 tokens < k -> no grams -> nothing
    assert ids.count(2) == 1  # 3 grams < w -> single min-of-all fingerprint
    assert 3 not in ids


def test_duckdb_parity_fps_and_pairs(documents, sf_dir):
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from parquet_scan('{sf_dir}/documents.parquet')"
    )
    key = lambda df: sorted(map(repr, df.itertuples(index=False, name=None)))
    sdf = winnow_fingerprints(documents).toPandas()
    odf = con.sql(winnow_fingerprints_sql()).df()
    assert len(sdf) == len(odf) and key(sdf) == key(odf)
    sp = winnow_pairs(documents).toPandas()
    op = con.sql(winnow_pairs_sql()).df()
    assert len(sp) == len(op) and key(sp) == key(op)


def test_hot_fp_guard_drops_boilerplate(spark):
    # one boilerplate 8-token run shared by every doc; cap df at 3 -> no pairs
    boiler = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail{i} word{i} extra{i}") for i in range(6)],
        "doc_id long, text string",
    )
    capped = winnow_pairs(docs, k=K, w=W, max_fp_df=3).collect()
    uncapped = winnow_pairs(docs, k=K, w=W, max_fp_df=None).collect()
    assert len(uncapped) > len(capped)


def test_fingerprint_plan_zero_shuffle(documents):
    plan = (
        winnow_fingerprints(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fingerprint_plan_staged_single_evaluation(documents):
    # the staged projections must survive optimization: tokens and gram
    # hashes each evaluated ONCE per row — an inlined gram expression is
    # re-evaluated per window by the higher-order lambda (O(g²) md5/doc;
    # measured 2.3× the operator's cost before the staging fix)
    plan = (
        winnow_fingerprints(documents)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("regexp_extract_all") == 1
    assert plan.count("md5") == 1
