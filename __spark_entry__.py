"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: flume_elasticsearch_2_spark — PySpark-native full-text index + BM25
top-k (SURVEY.md §2), plus training-data-pipeline ops (dedup, similarity,
text analysis) over the documents/embeddings tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql  # noqa: E402

# ---------------------------------------------------------------------------
# Fixed query set (FIXTURES.md §4), tuned to the documents-table vocabulary:
# 'dup' is the only rare term (df≈25/500 at sf0.01); everything else is hot
# (df≈380-400/500), which exercises long-postings paths.
# ---------------------------------------------------------------------------
BM25_QUERIES = {
    "bm25_topk_or": ("dup batch scan", "or"),
    "bm25_topk_and": ("join filter window", "and"),
    "bm25_topk_rare": ("dup", "or"),
    "bm25_topk_hot": ("batch small scan", "or"),
    "bm25_topk_dupterms": ("the the fast", "or"),
    "bm25_topk_absent": ("zzzznotaterm", "or"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 BM25 over sf0.001 documents (OR of mixed-df terms)."""
    return bm25_topk(_docs(spark, "/root/testdata/sf0.001"), "dup batch scan", k=10)


# ---------------------------------------------------------------------------
# queries() / oracle_sql()
# ---------------------------------------------------------------------------


def _bm25_query(q: str, mode: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return bm25_topk(_docs(spark, sf_dir), q, k=10, mode=mode)

    return run


def _term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.topk import corpus_tokens

    return (
        corpus_tokens(_docs(spark, sf_dir))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
    )


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.topk import doc_lengths

    return doc_lengths(_docs(spark, sf_dir)).agg(
        F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )


def _doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flume_elasticsearch_2_spark.operators.topk import doc_lengths

    return doc_lengths(_docs(spark, sf_dir))


# -- segment-index path: build once per sf_dir (temp dir), query many -------
_INDEX_CACHE: dict[str, str] = {}


def _segment_searcher(spark: SparkSession, sf_dir: str):
    import tempfile

    from flume_elasticsearch_2_spark.plans.build_index import build_index
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    if sf_dir not in _INDEX_CACHE:
        d = os.path.join(tempfile.mkdtemp(prefix="fts_idx_"), "segidx")
        build_index(spark, _docs(spark, sf_dir), d, n_shards=4)
        _INDEX_CACHE[sf_dir] = d
    return IndexSearcher(spark, _INDEX_CACHE[sf_dir])


def _segment_query(q: str, mode: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _segment_searcher(spark, sf_dir).search(q, k=10, mode=mode, pruned=True)

    return run


SEGMENT_QUERIES = {
    "bm25_segment_or": ("dup batch scan", "or"),
    "bm25_segment_and": ("join filter window", "and"),
    "bm25_segment_hot": ("batch small scan", "or"),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _bm25_query(qq, mode) for name, (qq, mode) in BM25_QUERIES.items()
    }
    for name, (qq, mode) in SEGMENT_QUERIES.items():
        q[name] = _segment_query(qq, mode)
    q["term_stats"] = _term_stats
    q["corpus_stats"] = _corpus_stats
    q["doc_lengths"] = _doc_lengths
    return q


def oracle_sql() -> dict[str, str]:
    o = {name: bm25_topk_sql(qq, k=10, mode=mode) for name, (qq, mode) in BM25_QUERIES.items()}
    for name, (qq, mode) in SEGMENT_QUERIES.items():
        o[name] = bm25_topk_sql(qq, k=10, mode=mode)
    o["term_stats"] = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
)
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM toks GROUP BY term
"""
    o["corpus_stats"] = """
WITH dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl FROM documents
)
SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl
"""
    o["doc_lengths"] = """
SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl FROM documents
"""
    return o
