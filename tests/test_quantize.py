"""int8 scalar embedding quantization (SURVEY §2.8): codes in range,
dequantization error bounded, quantized cosine oracle-exact vs DuckDB,
recall near exact search."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.quantize import (
    cosine_topk_quantized,
    cosine_topk_quantized_sql,
    quantize_embeddings,
)
from flume_elasticsearch_2_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    return con


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_in_range_and_error_bounded(emb):
    rows = quantize_embeddings(emb).collect()
    assert len(rows) == emb.count()
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for r in rows:
        assert all(0 <= c <= 255 for c in r["codes"])
        # affine round-trip error <= scale/2 per element
        for c, x in zip(r["codes"], orig[r["id"]]):
            assert abs((r["mn"] + c * r["scale"]) - x) <= r["scale"] / 2 + 1e-9


def test_constant_vector_quantizes_exactly(spark):
    df = spark.createDataFrame([(0, [1.5] * 4)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df).collect()[0]
    assert r["scale"] == 0.0 and list(r["codes"]) == [0, 0, 0, 0]
    got = cosine_topk_quantized(df, [1.0, 1.0, 1.0, 1.0], k=1).collect()
    assert got[0]["cosine"] == 1.0  # dequantizes to the constant exactly


def test_quantized_cosine_matches_duckdb(emb, duck):
    qv = list(emb.where("vec_id = 0").first().embedding)
    got = [tuple(r) for r in cosine_topk_quantized(emb, qv, k=10).collect()]
    want = [tuple(r) for r in duck.execute(cosine_topk_quantized_sql(0, k=10)).fetchall()]
    assert got == want


def test_quantized_recall_near_exact(emb):
    qv = list(emb.where("vec_id = 7").first().embedding)
    exact = {r["id"] for r in cosine_topk(emb, qv, k=10).collect()}
    quant = {r["id"] for r in cosine_topk_quantized(emb, qv, k=10).collect()}
    assert len(exact & quant) >= 8  # int8 affine loses little at 64 dims


def test_quantized_plan_is_single_pass(emb):
    from tests.test_plan_hygiene import _plan

    qv = [0.1] * 64
    plan = _plan(cosine_topk_quantized(emb, qv, k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan and "Exchange" not in plan, plan
