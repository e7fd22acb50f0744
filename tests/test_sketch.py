"""Count-min sketch: oracle parity, over-count bound, mergeability,
partition invariance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.sketch import (
    cms_build,
    cms_estimate_terms,
    cms_estimate_terms_sql,
)

TERMS = ["batch", "dup", "scan", "table", "zzznothere"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.mark.parametrize("width", [64, 256])
def test_cms_matches_duckdb(documents, duck, width):
    got = [tuple(r) for r in cms_estimate_terms(documents, TERMS, width=width).collect()]
    want = [
        tuple(r)
        for r in duck.execute(cms_estimate_terms_sql(TERMS, width=width)).fetchall()
    ]
    assert got == want and len(got) == len(TERMS)
    # CMS never under-counts; absent term estimates >= 0
    assert all(e >= t for _, e, t in got)
    assert dict((t, tr) for t, _, tr in got)["zzznothere"] == 0


def test_cms_narrow_width_collides_but_bounds(documents):
    rows = cms_estimate_terms(documents, TERMS, width=8).collect()
    n_tokens = documents.select(
        F.sum(F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))
    ).collect()[0][0]
    for r in rows:
        assert r["est_count"] >= r["true_count"]
        assert r["est_count"] <= n_tokens  # trivially bounded by the stream


def test_cms_partition_invariant(documents):
    a = [tuple(r) for r in cms_estimate_terms(documents, TERMS, width=64).collect()]
    b = [
        tuple(r)
        for r in cms_estimate_terms(documents.repartition(7), TERMS, width=64).collect()
    ]
    assert a == b


def test_cms_merge_is_cellwise_sum(documents):
    """Sketch(all) == cell-wise sum of Sketch(half1) + Sketch(half2) — the
    property that makes per-executor sketches combinable."""
    h1 = documents.where("doc_id % 2 = 0")
    h2 = documents.where("doc_id % 2 = 1")
    merged = (
        cms_build(h1, width=64)
        .unionAll(cms_build(h2, width=64))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(documents, width=64)
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b


def test_cms_validation(documents):
    with pytest.raises(ValueError, match="duplicate-free"):
        cms_estimate_terms(documents, ["a", "a"])
    with pytest.raises(ValueError, match="duplicate-free"):
        cms_estimate_terms_sql([])
    with pytest.raises(ValueError, match="positive"):
        cms_build(documents, depth=0)
    with pytest.raises(ValueError, match="positive"):
        cms_estimate_terms_sql(["a"], width=0)
