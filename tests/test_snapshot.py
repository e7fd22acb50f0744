"""Index snapshot/restore (ES _snapshot lifecycle over immutable segments):
restored indexes answer queries bit-identically; partial/uncommitted states
refuse loudly; restore never clobbers without consent."""

from __future__ import annotations

import os
import shutil

import pytest

from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
from flume_elasticsearch_2_spark.plans.snapshot import restore_index, snapshot_index


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snapidx") / "idx")
    build_segments_partial(spark, documents, d, n_shards=4, store_positions=True)
    return d


def test_snapshot_restore_query_identical(spark, index_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("snap"))
    snap = os.path.join(base, "snap1")
    restored = os.path.join(base, "restored")
    m1 = snapshot_index(index_dir, snap)
    m2 = restore_index(snap, restored)
    assert m1 == m2
    a = [tuple(r) for r in IndexSearcher(spark, index_dir).search("dup batch scan", k=10).collect()]
    b = [tuple(r) for r in IndexSearcher(spark, restored).search("dup batch scan", k=10).collect()]
    assert a == b and a
    # positional stream survives the round trip too
    p1 = [tuple(r) for r in IndexSearcher(spark, index_dir).search_phrase("part filter", k=5).collect()]
    p2 = [tuple(r) for r in IndexSearcher(spark, restored).search_phrase("part filter", k=5).collect()]
    assert p1 == p2


def test_snapshot_refuses_uncommitted_and_clobber(index_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("snapbad"))
    partial = os.path.join(base, "partial")
    shutil.copytree(index_dir, partial)
    os.remove(os.path.join(partial, "manifest.json"))  # uncommitted state
    with pytest.raises(ValueError, match="manifest"):
        snapshot_index(partial, os.path.join(base, "s"))
    snap = os.path.join(base, "snap")
    snapshot_index(index_dir, snap)
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(index_dir, snap)


def test_restore_refuses_then_overwrites(spark, index_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("snapow"))
    snap = os.path.join(base, "snap")
    snapshot_index(index_dir, snap)
    target = os.path.join(base, "existing")
    shutil.copytree(index_dir, target)
    with pytest.raises(ValueError, match="overwrite"):
        restore_index(snap, target)
    restore_index(snap, target, overwrite=True)
    assert IndexSearcher(spark, target).search("dup", k=3).count() > 0


# -- _reindex ------------------------------------------------------------------


@pytest.fixture(scope="module")
def stored_index(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reidx") / "src")
    build_segments_partial(
        spark, documents, d, n_shards=4, store_positions=True,
        orig_ids=documents.select("doc_id", "lang", "n_chars", "text"),
    )
    return d


def test_reindex_rank_identical_at_new_shard_count(spark, stored_index, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.snapshot import reindex

    dst = str(tmp_path_factory.mktemp("reidx2") / "dst")
    m = reindex(spark, stored_index, dst, n_shards=7)
    assert m["n_shards"] == 7 and m["positions"]
    for q in ("dup batch scan", "join filter window"):
        a = [tuple(r) for r in IndexSearcher(spark, stored_index).search(q, k=10).collect()]
        b = [tuple(r) for r in IndexSearcher(spark, dst).search(q, k=10).collect()]
        assert a == b and a, q
    p1 = [tuple(r) for r in IndexSearcher(spark, stored_index).search_phrase("part filter", k=5).collect()]
    p2 = [tuple(r) for r in IndexSearcher(spark, dst).search_phrase("part filter", k=5).collect()]
    assert p1 == p2


def test_reindex_with_query_filter(spark, stored_index, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.snapshot import reindex

    dst = str(tmp_path_factory.mktemp("reidx3") / "dst")
    m = reindex(spark, stored_index, dst, n_shards=4, doc_filter=("lang", "==", "en"))
    assert m["n_docs"] == documents.where("lang = 'en'").count()
    s = IndexSearcher(spark, dst)
    ids = {r["doc_id"] for r in s.mget(list(range(50))).collect()}
    en = {r.doc_id for r in documents.where("lang = 'en'").select("doc_id").collect()}
    assert ids <= en


def test_reindex_requires_stored_source(spark, documents, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.snapshot import reindex

    bare = str(tmp_path_factory.mktemp("reidx4") / "bare")
    build_segments_partial(spark, documents, bare, n_shards=4)  # no stored text
    with pytest.raises(ValueError, match="_source"):
        reindex(spark, bare, bare + "2", n_shards=4)


def test_snapshot_accepts_multifield_layout(spark, documents, tmp_path_factory):
    """Review regression: the multi-field layout (field=<f>/ subtrees, no
    top-level docs/) is a committed index and must snapshot/restore."""
    from flume_elasticsearch_2_spark.plans.build_index import build_multifield_index
    from flume_elasticsearch_2_spark.plans.query_index import MultiFieldIndexSearcher
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col

    fdocs = documents.withColumn(
        "title", F.array_join(F.slice(tokens_col("text"), 1, 5), " ")
    )
    base = str(tmp_path_factory.mktemp("snapmf"))
    src = os.path.join(base, "mfidx")
    build_multifield_index(spark, fdocs, src, fields=["text", "title"], n_shards=4)
    snap = os.path.join(base, "snap")
    restored = os.path.join(base, "restored")
    snapshot_index(src, snap)
    restore_index(snap, restored)
    a = [tuple(r) for r in MultiFieldIndexSearcher(spark, src).search("dup batch", field="title", k=5).collect()]
    b = [tuple(r) for r in MultiFieldIndexSearcher(spark, restored).search("dup batch", field="title", k=5).collect()]
    assert a == b and a


def test_restore_overwrite_leaves_no_debris(spark, index_dir, tmp_path_factory):
    """Review regression: overwrite keeps a committed index visible at every
    instant (old renamed aside, new renamed in, old deleted) and cleans up."""
    base = str(tmp_path_factory.mktemp("snapow2"))
    snap = os.path.join(base, "snap")
    snapshot_index(index_dir, snap)
    target = os.path.join(base, "t")
    shutil.copytree(index_dir, target)
    restore_index(snap, target, overwrite=True)
    assert not os.path.exists(target + ".restore-old")
    assert not os.path.exists(target + ".restore-tmp")
    assert IndexSearcher(spark, target).search("dup", k=3).count() > 0


def test_reindex_refuses_clobber_and_tuple_of_triples(spark, stored_index, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.snapshot import reindex

    base = str(tmp_path_factory.mktemp("reidx5"))
    dst = os.path.join(base, "dst")
    reindex(spark, stored_index, dst, n_shards=4)
    with pytest.raises(ValueError, match="overwrite"):
        reindex(spark, stored_index, dst, n_shards=4)
    # review regression: a tuple OF triples is a triple sequence, not one triple
    dst2 = os.path.join(base, "dst2")
    m = reindex(
        spark, stored_index, dst2, n_shards=4,
        doc_filter=(("lang", "==", "en"), ("n_chars", ">=", 100)),
    )
    assert 0 < m["n_docs"] < IndexSearcher(spark, stored_index).n_docs
