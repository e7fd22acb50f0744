from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, m


def _brute(ids, m, q, k):
    q = np.asarray(q, dtype=np.float64)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order]


def test_cosine_topk_matches_numpy(spark, embeddings, emb_np):
    ids, m = emb_np
    q = list(embeddings.where("vec_id = 3").first().embedding)
    got = [(r.id, r.cosine) for r in cosine_topk(embeddings, q, k=10).collect()]
    exp = _brute(ids, m, q, 10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[1] - e[1]) < 1e-5


def test_lsh_topk_recall(spark, embeddings, emb_np):
    ids, m = emb_np
    q = list(embeddings.where("vec_id = 3").first().embedding)
    exact = {d for d, _ in _brute(ids, m, q, 10)}
    ann = {r.id for r in cosine_topk_lsh(embeddings, q, k=10, n_planes=4, n_tables=8).collect()}
    # the query vector itself (cosine 1.0) is always in its own bucket
    assert 3 in ann
    # recall@10 against brute force — near-uniform random embeddings are the
    # LSH worst case (neighbors at cosine ~0.35), so the bar is modest here;
    # scores of returned candidates are exact (next test)
    recall = len(exact & ann) / 10
    assert recall >= 0.4, f"LSH recall {recall} too low"


def test_lsh_results_are_subset_exact_scores(spark, embeddings, emb_np):
    ids, m = emb_np
    q = list(embeddings.where("vec_id = 7").first().embedding)
    ann = [(r.id, r.cosine) for r in cosine_topk_lsh(embeddings, q, k=5).collect()]
    full = dict(_brute(ids, m, q, len(ids)))
    for i, c in ann:
        assert abs(full[i] - c) < 1e-5  # scores are exact even if set is approximate


def test_embedding_near_dup_exact(spark, embeddings, emb_np):
    ids, m = emb_np
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu = np.triu_indices(len(ids), 1)
    expected = {
        (int(ids[a]), int(ids[b]))
        for a, b in zip(*iu)
        if sims[a, b] >= 0.45
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(embeddings, threshold=0.45, exact=True).collect()
    }
    assert got == expected and got, "expect some pairs at 0.45 on this corpus"


def test_embedding_near_dup_lsh_subset(spark, embeddings):
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(embeddings, threshold=0.45, exact=True).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            embeddings, threshold=0.45, n_planes=4, n_tables=8
        ).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.5


def test_ivf_topk_recall_and_subset(spark, embeddings, emb_np):
    from flume_elasticsearch_2_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_centroids,
    )

    ids, m = emb_np
    q = list(embeddings.where("vec_id = 3").first().embedding)
    exact = {i for i, _ in _brute(ids, m, q, 10)}
    C = ivf_centroids(embeddings, n_centroids=8, iters=4)
    assert C.shape[1] == m.shape[1]
    # probing every centroid must recover the exact answer
    full = cosine_topk_ivf(embeddings, q, k=10, n_centroids=8, nprobe=8, centroids=C)
    assert {r.id for r in full.collect()} == exact
    # partial probe: survivors' scores are exact cosines (subset property)
    part = cosine_topk_ivf(embeddings, q, k=5, n_centroids=8, nprobe=3, centroids=C)
    brute_map = dict(_brute(ids, m, q, len(ids)))
    for r in part.collect():
        assert abs(r.cosine - brute_map[r.id]) < 1e-5


def test_ivf_assignment_deterministic(spark, embeddings):
    from flume_elasticsearch_2_spark.operators.similarity import (
        ivf_assign_col,
        ivf_centroids,
    )

    C1 = ivf_centroids(embeddings, n_centroids=8)
    C2 = ivf_centroids(embeddings.repartition(7), n_centroids=8)
    assert np.allclose(C1, C2)  # parallelism-independent training sample
    a = embeddings.select("vec_id", ivf_assign_col(F.col("embedding"), C1).alias("c"))
    counts = {r.c for r in a.select("c").distinct().collect()}
    assert counts <= set(range(8)) and len(counts) > 1


def test_lsh_multiprobe_exhaustive_equals_brute(spark, embeddings, emb_np):
    """probe_hamming = n_planes probes every bucket -> rank-identical to the
    exact baseline; intermediate radii only grow the candidate set."""
    ids, m = emb_np
    q = list(embeddings.where("vec_id = 11").first().embedding)
    exact = [(r.id, r.cosine) for r in cosine_topk(embeddings, q, k=10).collect()]
    allb = [
        (r.id, r.cosine)
        for r in cosine_topk_lsh(embeddings, q, k=10, n_planes=8, probe_hamming=8).collect()
    ]
    assert allb == exact
    base = {r.id for r in cosine_topk_lsh(embeddings, q, k=10, n_planes=8).collect()}
    wider = {r.id for r in cosine_topk_lsh(embeddings, q, k=10, n_planes=8, probe_hamming=1).collect()}
    exact_ids = {i for i, _ in exact}
    assert len(wider & exact_ids) >= len(base & exact_ids)  # recall is monotone in radius


def test_ivf_build_search_roundtrip(spark, embeddings, tmp_path):
    from flume_elasticsearch_2_spark.operators.similarity import ivf_build, ivf_search

    d = str(tmp_path / "ivf")
    C = ivf_build(embeddings, d, n_centroids=8)
    assert C.shape[0] == 8
    q = list(embeddings.where("vec_id = 5").first().embedding)
    exact = [(r.id, r.cosine) for r in cosine_topk(embeddings, q, k=10).collect()]
    # full probe over the materialized index == exhaustive
    got = [(r.id, r.cosine) for r in ivf_search(spark, d, q, k=10, nprobe=8).collect()]
    assert got == exact
    # partial probe: subset of corpus, exact scores for what it returns
    part = [(r.id, r.cosine) for r in ivf_search(spark, d, q, k=5, nprobe=2).collect()]
    full = dict(exact)
    exact_all = {r.id: r.cosine for r in cosine_topk(embeddings, q, k=10**6).collect()}
    for i, c in part:
        assert abs(exact_all[i] - c) < 1e-9


# -- SemDeDup ------------------------------------------------------------------


def _np_semdedup(ids, m, C, threshold):
    """NumPy reference of the semdedup drop rule (rounded as the engines)."""
    from flume_elasticsearch_2_spark.functions.rounding import round_half_up6

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    sims = np.array([[round_half_up6(s) for s in row] for row in mn @ Cn.T])
    cluster = sims.argmax(axis=1)  # first index on ties, as array_position
    cent = sims.max(axis=1)
    survivors = []
    for i in range(len(ids)):
        drop = False
        for j in range(len(ids)):
            if i == j or cluster[i] != cluster[j]:
                continue
            pc = round_half_up6(float(mn[i] @ mn[j]))
            if pc >= threshold and (
                cent[j] < cent[i] or (cent[j] == cent[i] and ids[j] < ids[i])
            ):
                drop = True
                break
        if not drop:
            survivors.append((int(ids[i]), int(cluster[i]), float(cent[i])))
    return sorted(survivors)


def test_semdedup_matches_numpy_and_duckdb(spark, embeddings, emb_np, sf_dir):
    import duckdb

    from flume_elasticsearch_2_spark.operators.similarity import (
        fixed_centroids,
        ivf_centroids,
        semdedup,
        semdedup_sql,
    )

    ids, m = emb_np
    for C in (fixed_centroids(64, 8), ivf_centroids(embeddings, 8)):
        got = [
            (r.id, r.cluster, r.cent_sim)
            for r in semdedup(embeddings, centroids=C, threshold=0.4).collect()
        ]
        want = _np_semdedup(ids, m, C, 0.4)
        assert [(i, c) for i, c, _ in got] == [(i, c) for i, c, _ in want]
        assert [s for *_, s in got] == pytest.approx([s for *_, s in want], abs=2e-6)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        duck = [tuple(r) for r in con.sql(semdedup_sql(C, threshold=0.4)).fetchall()]
        assert [(i, int(c), s) for i, c, s in duck] == got
    # non-vacuous: something was actually dropped
    assert len(got) < len(ids)


def test_semdedup_partition_invariant(spark, embeddings):
    from flume_elasticsearch_2_spark.operators.similarity import (
        fixed_centroids,
        semdedup,
    )

    C = fixed_centroids(64, 8)
    a = [tuple(r) for r in semdedup(embeddings, centroids=C, threshold=0.4).collect()]
    b = [
        tuple(r)
        for r in semdedup(
            embeddings.repartition(13), centroids=C, threshold=0.4
        ).collect()
    ]
    assert a == b


def test_semdedup_exact_duplicates_keep_one(spark):
    """Two identical vectors (cosine 1.0) in one cluster: exactly one
    survives, and it's the lower id (equal cent_sim -> id tie-break)."""
    from flume_elasticsearch_2_spark.operators.similarity import (
        fixed_centroids,
        semdedup,
    )

    C = fixed_centroids(4, 2)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.9, 0.1, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [(r.id) for r in semdedup(df, centroids=C, threshold=0.999).collect()]
    assert 1 in got and 2 not in got
    assert 3 in got and 4 in got
