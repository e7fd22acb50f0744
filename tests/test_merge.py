"""Segment-generation merge (plans/merge.py, SURVEY §2.4 I5): merging two
half-corpus generations built over a pinned id space must be query-identical
to a single-shot build over the full corpus."""

from __future__ import annotations

import json

import pytest

from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.merge import merge_indexes
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

QUERIES = [
    ("dup", "or"),
    ("batch small scan", "or"),
    ("join filter window", "and"),
    ("the the fast", "or"),
]


@pytest.fixture(scope="module")
def merged_and_full(spark, documents, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    id_space = documents.agg({"doc_id": "max"}).collect()[0][0] + 1
    half_a = documents.where("doc_id % 2 = 0")
    half_b = documents.where("doc_id % 2 = 1")
    a_dir, b_dir = str(root / "gen_a"), str(root / "gen_b")
    build_index(spark, half_a, a_dir, n_shards=4, id_space=id_space)
    build_index(spark, half_b, b_dir, n_shards=4, id_space=id_space)
    merged_dir, full_dir = str(root / "merged"), str(root / "full")
    merge_indexes(spark, [a_dir, b_dir], merged_dir)
    build_index(spark, documents, full_dir, n_shards=4, id_space=id_space)
    return merged_dir, full_dir


def test_merge_manifest(spark, merged_and_full, documents):
    merged_dir, full_dir = merged_and_full
    m = json.load(open(f"{merged_dir}/manifest.json"))
    f = json.load(open(f"{full_dir}/manifest.json"))
    assert m["n_docs"] == f["n_docs"] == documents.count()
    assert abs(m["avgdl"] - f["avgdl"]) < 1e-9
    assert m["merged_generations"] == 2


@pytest.mark.parametrize("query,mode", QUERIES)
def test_merged_equals_full_build(spark, merged_and_full, query, mode):
    merged_dir, full_dir = merged_and_full
    sm = IndexSearcher(spark, merged_dir)
    sf = IndexSearcher(spark, full_dir)
    got = [(r.doc_id, r.score) for r in sm.search(query, k=10, mode=mode).collect()]
    want = [(r.doc_id, r.score) for r in sf.search(query, k=10, mode=mode).collect()]
    assert got == want


def test_merged_postings_identical(spark, merged_and_full):
    """Stronger than query-identity: the merged postings table must be
    byte-identical per (shard, term) to the full build's."""
    merged_dir, full_dir = merged_and_full
    cols = ["shard", "term", "n", "cf", "doc_bytes", "tf_bytes"]
    m = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{merged_dir}/postings").select(cols).collect()
    }
    f = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{full_dir}/postings").select(cols).collect()
    }
    assert m == f
