"""RRF hybrid retrieval: oracle parity + fusion semantics pins."""

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.hybrid import RRF_C, rrf_fuse, rrf_fuse_sql
from flume_elasticsearch_2_spark.operators.similarity import cosine_topk, cosine_topk_sql
from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

QUERY = "dup batch scan"


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _fused(documents, emb, k=12, depth=30):
    q = list(emb.where("vec_id = 0").first().embedding)
    return rrf_fuse(
        bm25_topk(documents, QUERY, k=depth), cosine_topk(emb, q, k=depth), k=k
    )


def test_rrf_matches_duckdb(documents, emb, duck):
    got = [tuple(r) for r in _fused(documents, emb).collect()]
    sql = rrf_fuse_sql(
        bm25_topk_sql(QUERY, k=30),
        cosine_topk_sql("SELECT embedding FROM embeddings WHERE vec_id = 0", k=30),
        k=12,
    )
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) == 12


def test_rrf_semantics(documents, emb):
    rows = _fused(documents, emb, k=50, depth=20).collect()
    assert rows
    for r in rows:
        # rank 0 = absent; present ranks within depth
        assert 0 <= r["text_rank"] <= 20 and 0 <= r["vec_rank"] <= 20
        assert r["text_rank"] or r["vec_rank"]
        expect = (1 / (RRF_C + r["text_rank"]) if r["text_rank"] else 0.0) + (
            1 / (RRF_C + r["vec_rank"]) if r["vec_rank"] else 0.0
        )
        assert abs(r["rrf"] - expect) < 1e-6
    # docs in both lists outrank docs in one (with comparable ranks):
    both = [r["rrf"] for r in rows if r["text_rank"] and r["vec_rank"]]
    single = [r["rrf"] for r in rows if not (r["text_rank"] and r["vec_rank"])]
    if both and single:
        assert max(both) > max(single) or min(both) > min(single)


def test_rrf_validation(documents, emb):
    with pytest.raises(ValueError, match="positive"):
        _fused(documents, emb, k=0)
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse_sql("SELECT 1", "SELECT 1", c=0)
