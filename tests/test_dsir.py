"""DSIR importance weighting (operators/dsir.py): cross-engine value
parity, selection semantics, featurization invariants, refusal surface."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.dsir import (
    dsir_log_weights,
    dsir_log_weights_sql,
    dsir_select,
    dsir_select_sql,
)

TARGET_WHERE = "lang = 'en'"


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con.sql(sql).fetchall()


@pytest.fixture(scope="module")
def target(documents):
    return documents.where(F.col("lang") == "en")


def test_log_weights_match_duckdb(documents, target, sf_dir):
    got = [tuple(r) for r in dsir_log_weights(documents, target).collect()]
    want = _duck(sf_dir, dsir_log_weights_sql(TARGET_WHERE))
    assert got == want and len(got) > 0


def test_select_matches_duckdb(documents, target, sf_dir):
    got = [tuple(r) for r in dsir_select(documents, target, keep_frac=0.6).collect()]
    want = _duck(sf_dir, dsir_select_sql(TARGET_WHERE, keep_frac=0.6))
    assert got == want


def test_target_docs_skew_positive(documents, target):
    """The point of the method: target-like (en) docs get higher weights
    than the rest on average."""
    w = dsir_log_weights(documents, target)
    j = w.join(documents.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_t"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("log_weight").alias("m")).collect()
    }
    assert means[True] > means[False]


def test_select_keeps_ceil_fraction(documents, target):
    scored_n = dsir_log_weights(documents, target).count()
    kept = dsir_select(documents, target, keep_frac=0.25).count()
    import math

    assert kept == math.ceil(0.25 * scored_n)


def test_featureless_docs_excluded(spark, target):
    df = spark.createDataFrame(
        [(1, "real words here", "en"), (2, "", "en"), (3, "...", "en")],
        "doc_id long, text string, lang string",
    )
    out = dsir_log_weights(df, df.where(F.col("doc_id") == 1))
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_unigram_vs_bigram_features_differ(documents, target):
    w1 = dsir_log_weights(documents, target, n=1).toPandas()
    w2 = dsir_log_weights(documents, target, n=2).toPandas()
    # bigrams add features: n_feats strictly larger for multi-token docs
    assert (w2.set_index("doc_id").n_feats >= w1.set_index("doc_id").n_feats).all()
    assert not w1.log_weight.equals(w2.log_weight)


def test_repartition_invariant(documents, target):
    a = [tuple(r) for r in dsir_log_weights(documents, target).collect()]
    b = [tuple(r) for r in dsir_log_weights(documents.repartition(7), target).collect()]
    assert a == b


def test_refusals(documents, target):
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_weights(documents, target, alpha=0.0)
    with pytest.raises(ValueError, match="buckets"):
        dsir_log_weights(documents, target, buckets=1)
    with pytest.raises(ValueError, match="keep_frac"):
        dsir_select(documents, target, keep_frac=0.0)
    with pytest.raises(ValueError, match="no features"):
        dsir_log_weights(documents, target.where(F.lit(False)))
