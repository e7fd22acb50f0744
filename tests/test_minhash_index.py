"""Materialized incremental MinHash index (operators/minhash_index.py):
probe ≡ the in-corpus join's cross pairs, DuckDB parity, estimator sanity,
and the no-corpus-rescan plan pin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.dedup import minhash_lsh_pairs
from flume_elasticsearch_2_spark.operators.minhash_index import (
    minhash_index_build,
    minhash_index_probe,
    minhash_index_probe_sql,
)


@pytest.fixture(scope="module")
def built(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mhidx") / "idx")
    corpus = documents.where("doc_id % 4 <> 0")
    minhash_index_build(corpus, d, hash_fn="md5")
    return d


def test_probe_equals_in_corpus_cross_pairs(spark, documents, built):
    new = documents.where("doc_id % 4 = 0")
    probe = {
        (r.new_id, r.corpus_id)
        for r in minhash_index_probe(spark, built, new).collect()
    }
    # the one-shot join over ALL docs, restricted to (new, corpus) pairs
    allp = minhash_lsh_pairs(documents, hash_fn="md5").collect()
    cross = set()
    for r in allp:
        a, b = r.id_a, r.id_b
        if (a % 4 == 0) != (b % 4 == 0):
            new_id, corpus_id = (a, b) if a % 4 == 0 else (b, a)
            cross.add((new_id, corpus_id))
    assert probe == cross


@pytest.mark.parametrize("thr", [None, 0.2])
def test_probe_duckdb_parity(spark, documents, built, sf_dir, thr):
    new = documents.where("doc_id % 4 = 0")
    sdf = minhash_index_probe(spark, built, new, min_est_jaccard=thr).toPandas()
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from parquet_scan('{sf_dir}/documents.parquet')"
    )
    odf = con.sql(
        minhash_index_probe_sql("{id} % 4 = 0", "{id} % 4 <> 0", min_est_jaccard=thr)
    ).df()
    key = lambda df: sorted(map(repr, df.itertuples(index=False, name=None)))
    assert len(sdf) == len(odf) and key(sdf) == key(odf)


def test_estimator_identical_doc_is_one(spark, documents, built):
    # a "new" doc that is byte-identical to a corpus doc estimates 1.0
    src = documents.where("doc_id % 4 <> 0").limit(1)
    new = src.withColumn("doc_id", F.lit(999_999_999).cast("long"))
    rows = minhash_index_probe(
        spark, built, new, min_est_jaccard=0.99
    ).collect()
    twin = src.first().doc_id
    assert any(r.corpus_id == twin and r.est_jaccard == 1.0 for r in rows)


def test_probe_never_rescans_corpus_text(spark, documents, built):
    new = documents.where("doc_id % 4 = 0")
    plan = (
        minhash_index_probe(spark, built, new, materialize=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # tokenize runs ONCE (staged projection — the new batch only); the
    # corpus side is columnar (band, bucket, id) reads from the stored index
    assert plan.count("regexp_extract_all") == 1
    # and the only text-bearing scan is the new batch's documents read (the
    # cached signature subtree prints as FileScan inside InMemoryRelation)
    scan_lines = [
        ln for ln in plan.splitlines() if "Relation" in ln or "FileScan" in ln
    ]
    text_scans = [ln for ln in scan_lines if "text#" in ln]
    assert len(text_scans) == 1
