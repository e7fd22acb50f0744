"""End-to-end webpages → index pipeline (plans/pipeline.py): the north_star
path. Covers the extract/dedup/classify transforms, the byte-identity
invariant (BASELINE.json input_hint), Flume-shaped stage metrics (SURVEY
§2.6), and rank-identity of search results against the brute-force oracle
computed over the deduped corpus."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.functions.text import extract_text_arrow, extract_text_col
from flume_elasticsearch_2_spark.plans.pipeline import (
    index_webpages,
    invariant_report,
    prepare_webpages,
)
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
from flume_elasticsearch_2_spark.sources.webpages import generate_webpages

from .oracle import brute_force_bm25

N_DOCS = 600


@pytest.fixture(scope="module")
def pages(spark):
    return generate_webpages(spark, N_DOCS, n_partitions=8).cache()


def test_invariant_extract_text_byte_identical(pages):
    rep = invariant_report(pages)
    assert rep == {"total": N_DOCS, "violations": 0}


def test_arrow_and_jvm_extraction_agree(pages):
    n_bad = (
        pages.select(
            extract_text_col("html").eqNullSafe(extract_text_arrow("html")).alias("ok")
        )
        .where(~F.col("ok"))
        .count()
    )
    assert n_bad == 0


def test_prepare_dedups_by_url_last_write_wins(pages):
    prepared = prepare_webpages(pages)
    n_urls = pages.select("url").distinct().count()
    assert prepared.count() == n_urls
    # last-write-wins: for a dup url the kept row has the max warc_ts
    expected = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    mismatches = prepared.select("url", "warc_ts").exceptAll(expected).count()
    assert mismatches == 0


def test_classification_column(pages):
    prepared = prepare_webpages(pages)
    bad = prepared.where(
        (F.col("lang").isin("en", "fr", "es", "de") & (F.col("doc_class") != "latin"))
        | ((F.col("lang") == "zh") & (F.col("doc_class") != "cjk"))
    ).count()
    assert bad == 0


@pytest.fixture(scope="module")
def built(spark, pages, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    idx = str(d / "idx")
    metrics_path = str(d / "metrics.json")
    manifest = index_webpages(
        spark, pages, idx, n_shards=4, metrics_path=metrics_path
    )
    return idx, metrics_path, manifest


def test_pipeline_metrics_shape(built, pages):
    _, metrics_path, manifest = built
    with open(metrics_path) as fh:
        metrics = json.load(fh)
    src = metrics["SOURCE.webpages"]
    assert src["EventReceivedCount"] == N_DOCS
    assert src["EventAcceptedCount"] == manifest["n_docs"]
    assert src["DedupDroppedCount"] == N_DOCS - manifest["n_docs"]
    assert metrics["SINK.segments"]["EventDrainSuccessCount"] == manifest["n_docs"]
    assert manifest["docs_per_sec"] > 0


def test_pipeline_search_matches_oracle(spark, built, pages):
    idx, _, _ = built
    searcher = IndexSearcher(spark, idx)
    # oracle corpus: deduped pages with the SAME doc ids the pipeline assigned
    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "orig_id")
    prepared = prepare_webpages(pages).withColumnRenamed("url", "orig_id")
    corpus_df = docs.join(prepared.select("orig_id", "text"), "orig_id")
    corpus = [(r.doc_id, r.text) for r in corpus_df.collect()]
    for q, mode in [("hot00 hot05 term00042", "or"), ("hot01 hot02", "and"), ("term00017", "or")]:
        expected = brute_force_bm25(corpus, q, k=10, mode=mode)
        got = searcher.search(q, k=10, mode=mode).collect()
        assert [r.doc_id for r in got] == [d for d, _ in expected]
        for r, (_, s) in zip(got, expected):
            assert abs(r.score - s) < 1e-6


def test_read_webpages_parquet_and_iceberg_gate(spark, tmp_path):
    from flume_elasticsearch_2_spark.sources.webpages import read_webpages, write_webpages

    d = str(tmp_path / "pages")
    write_webpages(spark, 50, d, n_partitions=2)
    df = read_webpages(spark, d)
    assert df.count() == 50
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    with pytest.raises(NotImplementedError):
        read_webpages(spark, "iceberg:cat.db.webpages")


def test_metrics_viz_renders(spark, tmp_path):
    """M3: the same-shaped metrics.json renders to a standalone HTML flow
    diagram — direct labels on every band (identity never color-alone), raw
    counters repeated as a table."""
    from flume_elasticsearch_2_spark.plans.metrics_viz import (
        render_metrics_file,
        render_metrics_html,
    )
    from flume_elasticsearch_2_spark.plans.pipeline import index_webpages
    from flume_elasticsearch_2_spark.sources.webpages import generate_webpages

    pages = generate_webpages(spark, 200, n_partitions=2)
    mpath = str(tmp_path / "metrics.json")
    manifest = index_webpages(
        spark, pages, str(tmp_path / "idx"), n_shards=4, metrics_path=mpath
    )
    out = render_metrics_file(mpath, str(tmp_path / "metrics.html"))
    htm = open(out).read()
    m = manifest["metrics"]
    src = m["SOURCE.webpages"]
    assert "<svg" in htm and "</table>" in htm
    # node + band labels present with counts
    assert "SOURCE.webpages" in htm and "SINK.segments" in htm
    assert f"accepted: {src['EventAcceptedCount']:,}" in htm
    assert src["DedupDroppedCount"] > 0  # fixture injects dups
    assert f"dedup dropped: {src['DedupDroppedCount']:,}" in htm
    # every counter appears in the table view
    for grp in m.values():
        for k in grp:
            assert k in htm
    # zero-drop metrics render without a drop band
    htm2 = render_metrics_html(
        {"SOURCE.s": {"EventReceivedCount": 5, "EventAcceptedCount": 5},
         "CHANNEL.c": {"EventTakeSuccessCount": 5},
         "SINK.k": {"EventDrainSuccessCount": 5}}
    )
    assert "dedup dropped" not in htm2
