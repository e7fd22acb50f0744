"""Kill/restart resume scenario (FIXTURES.md §5): completed chunks are not
re-tokenized; the resumed index is content-identical to an uninterrupted
build; doc ids are deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.plans.resume import build_index_chunked, plan_chunks
from flume_elasticsearch_2_spark.sources.webpages import write_webpages


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus") / "webpages")
    write_webpages(spark, 2000, d, n_partitions=8)
    return d


def _index_content(spark, index_dir):
    postings = (
        spark.read.parquet(f"{index_dir}/postings")
        .select("shard", "term", "n", F.md5(F.hex("doc_bytes")).alias("dh"), F.md5(F.hex("tf_bytes")).alias("th"))
        .orderBy("shard", "term")
        .collect()
    )
    docs = spark.read.parquet(f"{index_dir}/docs").orderBy("doc_id").collect()
    return postings, docs


def test_resume_after_injected_failure(spark, corpus_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("resume")
    chunks = plan_chunks(corpus_dir, files_per_chunk=2)
    assert len(chunks) >= 3

    # uninterrupted reference build
    ref_manifest = build_index_chunked(
        spark, corpus_dir, str(base / "idx_ref"), str(base / "work_ref"), files_per_chunk=2
    )

    # interrupted build: fail after 2 chunks
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_chunked(
            spark, corpus_dir, str(base / "idx"), str(base / "work"),
            files_per_chunk=2, fail_after_chunks=2,
        )
    from flume_elasticsearch_2_spark.plans.lineage import LineageLog

    done_after_crash = LineageLog(str(base / "work/lineage")).load()
    assert len(done_after_crash) == 2  # committed chunks survived the crash

    # resume: remaining chunks only, then identical index
    acc = spark.sparkContext.accumulator(0)
    manifest = build_index_chunked(
        spark, corpus_dir, str(base / "idx"), str(base / "work"),
        files_per_chunk=2, tokenize_counter=acc,
    )
    assert manifest["n_docs"] == ref_manifest["n_docs"]
    resumed_rows = acc.value  # rows touched during resume
    assert resumed_rows < 2000  # strictly fewer than the whole corpus

    p1, d1 = _index_content(spark, str(base / "idx_ref"))
    p2, d2 = _index_content(spark, str(base / "idx"))
    assert p1 == p2
    assert d1 == d2

    # third run: everything committed -> zero re-tokenization
    acc2 = spark.sparkContext.accumulator(0)
    build_index_chunked(
        spark, corpus_dir, str(base / "idx"), str(base / "work"),
        files_per_chunk=2, tokenize_counter=acc2,
    )
    assert acc2.value == 0


def test_chunk_fingerprint_invalidation(spark, corpus_dir, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.lineage import LineageLog

    log = LineageLog(str(tmp_path_factory.mktemp("lineage")))
    log.commit("00000", fingerprint="a:1", n_docs=10)
    assert log.done("00000", "a:1")
    assert not log.done("00000", "a:2")  # changed input invalidates
    assert not log.done("00001", "a:1")


def test_changed_early_chunk_invalidates_later_offsets(spark, tmp_path_factory):
    """If an earlier chunk's doc count changes, every later chunk's staged
    ids are stale (prefix-sum offsets shifted) — the rebuild must produce an
    index identical to a fresh build, never colliding doc ids."""
    import shutil

    base = tmp_path_factory.mktemp("offsets")
    corpus = str(base / "corpus")
    write_webpages(spark, 900, corpus, n_partitions=6)
    idx, work = str(base / "idx"), str(base / "work")
    build_index_chunked(spark, corpus, idx, work, files_per_chunk=2)

    # grow ONLY the first chunk's input in place: later files keep their
    # fingerprints, so without the offset gate their staged ids (built under
    # the old prefix sum) would be reused and collide with the new layout
    import glob

    files = sorted(glob.glob(f"{corpus}/*.parquet"))
    first = spark.read.parquet(files[0])
    grown = first.unionByName(
        first.withColumn("url", F.concat(F.col("url"), F.lit("?v=2")))
    )
    tmp_out = str(base / "grown")
    grown.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    gfile = glob.glob(f"{tmp_out}/*.parquet")[0]
    shutil.copyfile(gfile, files[0])
    import os

    for crc in glob.glob(f"{corpus}/.*.crc"):  # stale Hadoop checksum sidecars
        os.remove(crc)
    manifest = build_index_chunked(spark, corpus, idx, work, files_per_chunk=2)

    ref = str(base / "idx_ref")
    ref_manifest = build_index_chunked(
        spark, corpus, ref, str(base / "work_ref"), files_per_chunk=2
    )
    assert manifest["n_docs"] == ref_manifest["n_docs"]
    p1, d1 = _index_content(spark, ref)
    p2, d2 = _index_content(spark, idx)
    assert p1 == p2 and d1 == d2
    # sanity: no duplicate doc ids survived the offset shift
    ids = [r.doc_id for r in d2]
    assert len(ids) == len(set(ids))


def test_stale_chunks_excluded_after_plan_shrinks(spark, tmp_path_factory):
    """Deleting input files must remove their docs from the rebuilt index
    even though their staged chunk dirs remain in work_dir."""
    import glob
    import os

    base = tmp_path_factory.mktemp("shrink")
    corpus = str(base / "corpus")
    write_webpages(spark, 600, corpus, n_partitions=6)
    idx, work = str(base / "idx"), str(base / "work")
    m1 = build_index_chunked(spark, corpus, idx, work, files_per_chunk=1)
    files = sorted(glob.glob(f"{corpus}/*.parquet"))
    kept = spark.read.parquet(*files[:-2]).count()
    for f in files[-2:]:
        os.remove(f)
    m2 = build_index_chunked(spark, corpus, idx, work, files_per_chunk=1)
    assert m2["n_docs"] < m1["n_docs"]
    assert spark.read.parquet(f"{idx}/docs").count() == m2["n_docs"]
