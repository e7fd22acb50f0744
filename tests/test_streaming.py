from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.sources.webpages import write_webpages
from flume_elasticsearch_2_spark.streaming.ingest import (
    ingest_metrics,
    staged_docs,
    start_ingest,
)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "in")
    write_webpages(spark, 600, d, n_partitions=6)
    return d


def test_stream_ingest_available_now(spark, stream_input, tmp_path_factory):
    base = tmp_path_factory.mktemp("ingest")
    stage, ckpt = str(base / "stage"), str(base / "ckpt")

    from flume_elasticsearch_2_spark.functions.text import extract_text_col

    def transform(df):
        return df.withColumn("extracted", extract_text_col("html"))

    q = start_ingest(
        spark, stream_input, stage, ckpt, max_files_per_trigger=2, transform=transform
    )
    q.awaitTermination(120)

    docs = staged_docs(spark, stage)
    assert docs.count() == 600
    # transform applied and invariant held through the stream
    assert docs.where(F.col("extracted") != F.col("text")).count() == 0
    m = ingest_metrics(stage)
    assert m["docs"] == 600 and m["chunks"] >= 2

    # restart with same checkpoint: no new batches, no duplicates (S4)
    q2 = start_ingest(spark, stream_input, stage, ckpt, max_files_per_trigger=2)
    q2.awaitTermination(60)
    assert staged_docs(spark, stage).count() == 600


def test_stateful_stream_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState first-write-wins: a url seen in batch N is
    dropped in every later batch (state survives micro-batch boundaries)."""
    base = tmp_path_factory.mktemp("stateful")
    src, ckpt, out = str(base / "src"), str(base / "ckpt"), str(base / "out")

    from flume_elasticsearch_2_spark.sources.webpages import WEBPAGES_SCHEMA
    from flume_elasticsearch_2_spark.streaming.stateful import dedup_stream_first_wins

    # two input files -> (maxFilesPerTrigger=1) two micro-batches; url u1
    # appears in both, u2 only in the first, u3 only in the second
    import datetime as dt
    import os

    os.makedirs(src, exist_ok=True)
    ts = dt.datetime(2025, 1, 1)
    rows_a = [("u1", ts, b"<p>a</p>", "a", "en"), ("u2", ts, b"<p>b</p>", "b", "en")]
    rows_b = [("u1", ts, b"<p>c</p>", "c", "fr"), ("u3", ts, b"<p>d</p>", "d", "de")]
    spark.createDataFrame(rows_a, WEBPAGES_SCHEMA).coalesce(1).write.parquet(f"{src}/a")
    spark.createDataFrame(rows_b, WEBPAGES_SCHEMA).coalesce(1).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    deduped = dedup_stream_first_wins(stream, key_col="url", out_cols=("url", "lang"))
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.url, r.lang) for r in spark.read.parquet(out).collect()}
    assert ("u1", "en") in got or ("u1", "fr") in got
    assert sum(1 for u, _ in got if u == "u1") == 1  # exactly one u1 admitted
    assert ("u2", "en") in got and ("u3", "de") in got
    assert len(got) == 3


def test_stream_to_generations_to_merge_end_to_end(spark, tmp_path_factory):
    """The reference's actual topology (conf/flume-elasticsearch.conf:1-31)
    composed end-to-end: stream ingest stages committed chunks -> each chunk
    becomes an index GENERATION (pinned id_space) -> generations merge with
    dedup_key='url' (ES setId upsert as tombstones) -> queries are fresh
    after each merge and rank-identical to a single-shot build over the
    surviving corpus."""
    import os

    from pyspark.sql.window import Window

    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.lineage import LineageLog
    from flume_elasticsearch_2_spark.plans.merge import merge_indexes
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
    from flume_elasticsearch_2_spark.sources.webpages import generate_webpages

    base = tmp_path_factory.mktemp("s2m")
    src, stage, ckpt = str(base / "src"), str(base / "stage"), str(base / "ckpt")
    ID_SPACE, NSH = 10_000, 4

    pages = generate_webpages(spark, 240, n_partitions=2).cache()
    pages.repartition(4).write.mode("overwrite").parquet(src)

    def chunk_docs_in_order():
        """Committed chunks -> (chunk_id, docs-with-ids) in commit order;
        id allocation is a running offset per chunk, deterministic."""
        log = LineageLog(os.path.join(stage, "lineage"))
        out, offset = [], 0
        for cid in sorted(log.load()):
            chunk = spark.read.parquet(f"{stage}/docs/chunk={cid}")
            w = Window.orderBy("url", "warc_ts")
            docs = chunk.withColumn(
                "doc_id", F.row_number().over(w) - 1 + F.lit(offset)
            ).select("doc_id", "url", "text")
            out.append((cid, docs))
            offset += chunk.count()
        return out

    def build_generations():
        gens = []
        for cid, docs in chunk_docs_in_order():
            gd = str(base / f"gen_{cid}")
            if not os.path.exists(gd):  # generations are immutable once built
                build_segments_partial(
                    spark, docs, gd, NSH,
                    orig_ids=docs.select("doc_id", "url"), id_space=ID_SPACE,
                )
            gens.append(gd)
        return gens

    # --- day 1: ingest -> generations -> merge -> serve --------------------
    q = start_ingest(spark, src, stage, ckpt, max_files_per_trigger=2)
    q.awaitTermination(120)
    gens = build_generations()
    assert len(gens) >= 2, "expected multiple micro-batch generations"
    merge_indexes(spark, gens, str(base / "m1"), dedup_key="url")
    s1 = IndexSearcher(spark, str(base / "m1"))
    assert s1.search("freshrevision", k=10).count() == 0  # not crawled yet

    # --- day 2: 40 urls re-crawled (revised text), 40 new urls -------------
    recrawl = (
        pages.dropDuplicates(["url"]).orderBy("url").limit(40)
        .withColumn("text", F.concat_ws(" ", "text", F.lit("freshrevision")))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 7 DAYS"))
    )
    newpages = generate_webpages(spark, 40).withColumn(
        "url", F.concat(F.col("url"), F.lit("?v2"))
    )
    recrawl.unionByName(newpages).repartition(2).write.mode("append").parquet(src)
    q = start_ingest(spark, src, stage, ckpt, max_files_per_trigger=2)
    q.awaitTermination(120)
    gens = build_generations()
    merged = merge_indexes(spark, gens, str(base / "m2"), dedup_key="url")
    assert merged["tombstoned_docs"] >= 40  # every re-crawl supersedes a doc
    s2 = IndexSearcher(spark, str(base / "m2"))

    # freshness: the revised docs are queryable right after the merge
    fresh = s2.search("freshrevision", k=100)
    assert fresh.count() == 40

    # rank-identity vs a single-shot build over the surviving corpus
    # (newest doc_id per url == newest generation per url, since chunk id
    # ranges increase with commit order — the merge's tombstone rule)
    all_docs = None
    for _, docs in chunk_docs_in_order():
        all_docs = docs if all_docs is None else all_docs.unionByName(docs)
    w = Window.partitionBy("url").orderBy(F.col("doc_id").desc())
    survivors = (
        all_docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    bdir = str(base / "batch")
    build_segments_partial(
        spark, survivors, bdir, NSH,
        orig_ids=survivors.select("doc_id", "url"), id_space=ID_SPACE,
    )
    sb = IndexSearcher(spark, bdir)
    for query, mode in [("hot00 hot01", "or"), ("hot02", "or"), ("freshrevision hot00", "and")]:
        got = [(r.doc_id, r.score) for r in s2.search(query, k=10, mode=mode).collect()]
        want = [(r.doc_id, r.score) for r in sb.search(query, k=10, mode=mode).collect()]
        assert got == want, (query, mode)
        assert want, query
