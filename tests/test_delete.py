"""ES _delete_by_query (SURVEY §2.4/§2.5): tombstone + immediate merge,
pinned equivalent to a from-scratch rebuild without the matches and to the
DuckDB oracle over the filtered corpus.

Reference analog: the ES 1.x delete-by-query surface behind the sink
(ElasticsearchSink.java:54); tombstone semantics per Lucene deletes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col
from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql
from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.merge import delete_by_query
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

DEL_QUERY = "dup"  # rare term: deletes a small, stats-visible slice
CHECK_QUERY = "batch small scan"


@pytest.fixture(scope="module")
def deleted_index(spark, documents, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("delidx") / "base")
    out = str(tmp_path_factory.mktemp("delidx") / "deleted")
    build_index(spark, documents, base, n_shards=4)
    manifest = delete_by_query(spark, base, out, DEL_QUERY)
    return out, manifest


@pytest.fixture(scope="module")
def survivors(documents):
    return documents.where(~F.array_contains(tokens_col("text"), DEL_QUERY))


def test_delete_removes_matches_and_counts(spark, documents, deleted_index):
    out, manifest = deleted_index
    s = IndexSearcher(spark, out)
    assert s.search(DEL_QUERY, k=10).count() == 0
    n_match = documents.where(F.array_contains(tokens_col("text"), DEL_QUERY)).count()
    assert manifest["deleted_docs"] == n_match > 0
    assert manifest["n_docs"] == documents.count() - n_match


def test_deleted_index_equals_rebuild(spark, survivors, deleted_index, tmp_path_factory):
    """Queries on the deleted index are rank- AND score-identical to an
    index built from scratch on the surviving corpus (stats recomputed)."""
    out, _ = deleted_index
    rebuilt = str(tmp_path_factory.mktemp("delidx2") / "rebuilt")
    # same id space so scores depend only on the surviving docs
    build_index(spark, survivors, rebuilt, n_shards=4, id_space=500)
    a = IndexSearcher(spark, out)
    b = IndexSearcher(spark, rebuilt)
    assert a.n_docs == b.n_docs and abs(a.avgdl - b.avgdl) < 1e-12
    for q, mode in [(CHECK_QUERY, "or"), ("join filter window", "and")]:
        got = [tuple(r) for r in a.search(q, k=10, mode=mode).collect()]
        want = [tuple(r) for r in b.search(q, k=10, mode=mode).collect()]
        assert got == want and got, q


def test_deleted_index_matches_duckdb_filtered_corpus(spark, sf_dir, deleted_index):
    """The serving path over the deleted index == the BM25 oracle over the
    corpus minus the matches (df/avgdl/N all recomputed — the whole point)."""
    out, _ = deleted_index
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    filtered = (
        "(SELECT * FROM documents WHERE NOT list_has_any("
        f"regexp_extract_all(lower(text), '[a-z0-9]+'), ['{DEL_QUERY}']))"
    )
    got = [tuple(r) for r in IndexSearcher(spark, out).search(CHECK_QUERY, k=10).collect()]
    want = [
        tuple(r)
        for r in con.execute(bm25_topk_sql(CHECK_QUERY, k=10, table=filtered)).fetchall()
    ]
    assert got == want and got


def test_matching_ids_equals_declarative_predicate(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("midx") / "idx")
    build_index(spark, documents, d, n_shards=4)
    s = IndexSearcher(spark, d)
    got = sorted(r.doc_id for r in s.matching_ids("dup batch", mode="and").collect())
    toks = tokens_col("text")
    want = sorted(
        r.doc_id
        for r in documents.where(
            F.array_contains(toks, "dup") & F.array_contains(toks, "batch")
        ).select("doc_id").collect()
    )
    assert got == want


def test_delete_cap_enforced(spark, documents, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("capidx") / "base")
    out = str(tmp_path_factory.mktemp("capidx") / "out")
    build_index(spark, documents, base, n_shards=2)
    with pytest.raises(ValueError, match="max_deletes"):
        delete_by_query(spark, base, out, CHECK_QUERY, max_deletes=5)


def test_declarative_survivor_query_matches_deleted_index(spark, survivors, deleted_index):
    """Cross-path: declarative bm25 over the survivor DataFrame equals the
    deleted index's serving path."""
    out, _ = deleted_index
    got = [tuple(r) for r in IndexSearcher(spark, out).search(CHECK_QUERY, k=10).collect()]
    want = [tuple(r) for r in bm25_topk(survivors, CHECK_QUERY, k=10).collect()]
    assert got == want
