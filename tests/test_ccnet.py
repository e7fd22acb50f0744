"""CCNet-style per-language perplexity bucketing (operators/ccnet.py):
cross-engine exactness, hand-checkable bucket cuts, carry-through scoring,
and the no-join plan shape.

Reference analog: quality staging rides the reference's interceptor chain
(FileSource.java:170-172) ahead of the delegated index."""

from __future__ import annotations

import math

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.ccnet import (
    ccnet_buckets,
    ccnet_buckets_sql,
)
from flume_elasticsearch_2_spark.operators.charlm import charlm_score


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_ccnet_matches_duckdb_exactly(documents, duck):
    got = [tuple(r) for r in ccnet_buckets(documents).collect()]
    want = [tuple(r) for r in duck.sql(ccnet_buckets_sql()).fetchall()]
    assert got == want and got
    assert {r[3] for r in got} == {"head", "middle", "tail"}


def test_ccnet_cut_sizes_per_language(spark):
    """7 'en' docs + 5 'de' docs: head = ceil(n/3), middle = ceil(2n/3) -
    head, tail = rest — per language, independent of the other language."""
    rows = [(i, f"doc number {i} with shared english words", "en") for i in range(7)]
    rows += [(100 + i, f"ein anderes dokument nummer {i}", "de") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df).collect()
    for lang, n in (("en", 7), ("de", 5)):
        by_bucket = {}
        for r in out:
            if r.lang == lang:
                by_bucket[r.bucket] = by_bucket.get(r.bucket, 0) + 1
        head = math.ceil(n / 3)
        middle = math.ceil(2 * n / 3) - head
        assert by_bucket.get("head", 0) == head
        assert by_bucket.get("middle", 0) == middle
        assert by_bucket.get("tail", 0) == n - head - middle


def test_ccnet_head_is_best_scored(spark):
    """Bucket assignment follows the score order: every head doc of a
    language outscores (or ties at lower id than) every tail doc."""
    rows = [(i, "the quick brown fox jumps over the lazy dog", "en") for i in range(6)]
    rows += [(6, "xq9z zq9x jq7v qvjx 9zxq vjq7", "en"),
             (7, "zz9 qqj 7xv vv9 jjq x7z", "en"),
             (8, "wv7q 9jxz qzv9 7wjx", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: (r.bucket, r.avg_logprob) for r in ccnet_buckets(df).collect()}
    heads = [s for b, s in out.values() if b == "head"]
    tails = [s for b, s in out.values() if b == "tail"]
    assert heads and tails and min(heads) >= max(tails)
    # the junk docs never land in head
    assert all(out[i][0] != "head" for i in (6, 7, 8))


def test_ccnet_frac_validation(spark):
    df = spark.createDataFrame([(0, "ab", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="head_frac"):
        ccnet_buckets(df, head_frac=0.0)
    with pytest.raises(ValueError, match="<= 1"):
        ccnet_buckets(df, head_frac=0.7, middle_frac=0.5)
    with pytest.raises(ValueError):
        ccnet_buckets_sql(head_frac=1.2)


def test_charlm_carry_cols_passthrough(spark):
    """carry_cols appends untouched columns after avg_logprob and keeps
    the scored values identical to the no-carry call."""
    df = spark.createDataFrame(
        [(0, "hello world", "en"), (1, "hallo welt", "de")],
        "doc_id long, text string, lang string",
    )
    plain = {r.doc_id: r.avg_logprob for r in charlm_score(df).collect()}
    carried = charlm_score(df, carry_cols=("lang",))
    assert carried.columns == ["doc_id", "n_bigrams", "avg_logprob", "lang"]
    rows = carried.collect()
    assert {r.doc_id: r.avg_logprob for r in rows} == plain
    assert {r.doc_id: r.lang for r in rows} == {0: "en", 1: "de"}


def test_ccnet_plan_no_join(documents):
    """Scoring is the broadcast-literal fold, bucketing a lang-partitioned
    window — the physical plan must contain no join at all."""
    plan = ccnet_buckets(documents)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
