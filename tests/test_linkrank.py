"""Fixed-point PageRank: DuckDB parity, partition invariance, and an
independent single-threaded Python fold of the same contract."""

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.linkrank import (
    SCALE,
    hash_edges,
    pagerank,
    pagerank_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_pagerank_matches_duckdb(docs, duck):
    got = [tuple(r) for r in pagerank(docs, iters=5, k=20).collect()]
    want = [tuple(r) for r in duck.execute(pagerank_sql(iters=5, k=20)).fetchall()]
    assert got == want and len(got) == 20


def test_pagerank_partition_invariant(docs):
    """The contract's point: integer arithmetic makes the result independent
    of partitioning (the local stand-in for N vs 4N executors)."""
    a = [tuple(r) for r in pagerank(docs, iters=3, k=15).collect()]
    b = [tuple(r) for r in pagerank(docs.repartition(7), iters=3, k=15).collect()]
    c = [tuple(r) for r in pagerank(docs.coalesce(1), iters=3, k=15).collect()]
    assert a == b == c


def test_pagerank_matches_python_fold(spark):
    """Independent single-threaded reimplementation of the pinned contract
    on a tiny corpus — validates the arithmetic without either engine."""
    from flume_elasticsearch_2_spark.functions.text import md5_long_col  # noqa: F401
    import hashlib

    n, degree, seed, iters = 23, 4, 7, 4
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")

    def md5_60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    edges = []
    for u in range(n):
        for j in range(degree):
            a = md5_60(f"pr:{u}:{j}:a:{seed}") % n
            b = md5_60(f"pr:{u}:{j}:b:{seed}") % n
            edges.append((u, min(a, b)))
    base = (15 * SCALE) // (100 * n)
    r = {u: SCALE // n for u in range(n)}
    for _ in range(iters):
        nxt = {u: base for u in range(n)}
        for u, v in edges:
            nxt[v] += (r[u] * 17) // 80
        r = nxt
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [tuple(x) for x in pagerank(docs, iters=iters, k=10).collect()]
    assert got == [tuple(w) for w in want]


def test_edges_constant_outdegree(docs):
    ed = hash_edges(docs, docs.count())
    out = ed.groupBy("src").count().select("count").distinct().collect()
    assert [r["count"] for r in out] == [4]
    # dst stays in range
    mm = ed.selectExpr("min(dst) AS lo", "max(dst) AS hi").collect()[0]
    assert mm["lo"] >= 0 and mm["hi"] < docs.count()


def test_pagerank_mass_and_skew(docs):
    from pyspark.sql import functions as F

    n = docs.count()
    full = pagerank(docs, iters=5, k=n)
    s = full.agg(F.sum("rank_fp")).collect()[0][0]
    # floor losses only ever shrink mass, a hair per node per iteration
    assert 0.98 * SCALE < s <= SCALE
    top = full.limit(1).collect()[0]["rank_fp"]
    assert top > 2 * (SCALE // n)  # hub-skewed, not uniform


def test_pagerank_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pagerank(empty).count() == 0


def test_pagerank_reliable_checkpoint_identical(spark, documents, tmp_path):
    """checkpoint_dir variant is bit-identical to the localCheckpoint
    default (int64 fixed-point ranks)."""
    from flume_elasticsearch_2_spark.operators.linkrank import pagerank

    docs = documents.limit(60)
    want = [tuple(r) for r in pagerank(docs, iters=3, k=10).collect()]
    got = [
        tuple(r)
        for r in pagerank(
            docs, iters=3, k=10, checkpoint_dir=str(tmp_path / "ckpr")
        ).collect()
    ]
    assert got == want
