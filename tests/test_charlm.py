"""Character-bigram LM quality scoring (operators/charlm.py) — the
CCNet-style perplexity-filter proxy: cross-engine exactness via nano-nat
integer sums, model semantics on hand-checkable fixtures, tail-filter cut.

Reference analog: quality transforms ride the reference's interceptor
chain (FileSource.java:170-172) ahead of the delegated index."""

from __future__ import annotations

import math

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.charlm import (
    ALPHABET_V,
    charlm_score,
    charlm_score_sql,
    charlm_tail_filter,
    charlm_tail_filter_sql,
    charlm_train,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_charlm_matches_duckdb_exactly(documents, duck):
    got = [tuple(r) for r in charlm_score(documents).collect()]
    want = [tuple(r) for r in duck.sql(charlm_score_sql()).fetchall()]
    assert got == want and got


def test_charlm_tail_filter_matches_duckdb(documents, duck):
    got = [tuple(r) for r in charlm_tail_filter(documents, keep_frac=0.8).collect()]
    want = [tuple(r) for r in duck.sql(charlm_tail_filter_sql(keep_frac=0.8)).fetchall()]
    assert got == want and got
    n_all = charlm_score(documents).count()
    assert len(got) == math.ceil(0.8 * n_all)


def test_charlm_model_semantics_hand_checked(spark):
    """Tiny corpus where the counts are checkable by hand: 'ababab' —
    bigrams ab x3, ba x2; ctx a=3, b=2; verify the exact smoothed
    per-char average against the closed form."""
    df = spark.createDataFrame([(0, "ababab")], "doc_id long, text string")
    counts = charlm_train(df)
    assert counts == {"ab": 3, "ba": 2}
    alpha = 0.1
    av = alpha * ALPHABET_V
    p_ab = (3 + alpha) / (3 + av)
    p_ba = (2 + alpha) / (2 + av)
    nano = lambda p: math.floor(math.log(p) * 1e9 + 0.5)
    want = round((3 * nano(p_ab) + 2 * nano(p_ba)) / 1e9 / 5, 6)
    row = charlm_score(df).collect()[0]
    assert (row.n_bigrams, row.avg_logprob) == (5, want)


def test_charlm_gibberish_scores_below_text(spark):
    """The filter's reason to exist: repetitive natural-ish text scores
    above high-entropy junk under the corpus-trained model."""
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(8)]
    rows += [(8, "xq9z zq9x jq7v qvjx 9zxq vjq7 x9zq qzj7")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_id = {r.doc_id: r.avg_logprob for r in charlm_score(df).collect()}
    assert by_id[8] < min(by_id[i] for i in range(8))


def test_charlm_normalization_and_guards(spark):
    """Punctuation runs collapse to ONE space (cross-engine astral-safe
    form); docs that normalize below 2 chars drop; alpha<=0 and bad
    keep_frac refuse."""
    df = spark.createDataFrame(
        [(0, "a!!!b"), (1, "..."), (2, "x")], "doc_id long, text string"
    )
    counts = charlm_train(df)
    assert counts == {"a ": 1, " b": 1}  # 'a b' after run-collapse
    scored = charlm_score(df).collect()
    assert [r.doc_id for r in scored] == [0]
    with pytest.raises(ValueError, match="alpha"):
        charlm_score(df, alpha=0.0)
    with pytest.raises(ValueError, match="keep_frac"):
        charlm_tail_filter(df, keep_frac=0.0)


def test_charlm_pretrained_counts_reference_shape(spark):
    """The CCNet shape: score corpus B under a model trained on corpus A —
    scoring must NOT retrain (doc bigrams absent from A hit the coalesce
    0-count smoothing path, not a KeyError)."""
    a = spark.createDataFrame([(0, "aaaa bbbb")], "doc_id long, text string")
    b = spark.createDataFrame([(0, "cccc")], "doc_id long, text string")
    counts = charlm_train(a)
    row = charlm_score(b, counts=counts).collect()[0]
    alpha = 0.1
    av = alpha * ALPHABET_V
    want = round(math.floor(math.log(alpha / av) * 1e9 + 0.5) * 3 / 1e9 / 3, 6)
    assert row.avg_logprob == want  # 'cc' unseen: p = alpha / (0 + alpha*V)
