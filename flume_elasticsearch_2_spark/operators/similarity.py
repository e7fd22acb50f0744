"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators: brute-force cosine top-k as the exact
baseline, a random-hyperplane LSH bucketed variant as the scale path, and
embedding-cosine near-duplicate pairs for dedup.

Scale notes:
* brute force: one broadcast of the query vector; per-row JVM dot product via
  higher-order ``aggregate``/``zip_with`` (no Python), global top-k collapses
  to TakeOrderedAndProject. O(N·d) flops distributed over executors — the
  right baseline and the verifier for ANN recall.
* LSH: signature = sign bits against ``h`` fixed random hyperplanes →
  candidates share a bucket (multi-probe over ``t`` independent tables).
  At 10^12 rows the bucket join replaces the full scan; recall measured
  against the brute-force baseline in tests.
* near-dup pairs: bucket join + exact cosine verify, mirroring the
  MinHash→Jaccard verify pattern in dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. JVM-side arithmetic;
    deterministic (-cosine, id) tie-break; cosine rounded to 6 decimals."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    # rank on the UNROUNDED cosine — the oracle's ORDER BY is unrounded, so
    # a rounded sort key could order round-level ties differently
    scored = df.select(
        F.col(id_col).alias("id"), cosine_col(F.col(vec_col), q).alias("__raw")
    )
    return (
        scored.orderBy(F.col("__raw").desc(), F.col("id").asc()).limit(k)
        .select("id", F.round("__raw", 6).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id against fixed hyperplanes, pure JVM arithmetic."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN top-k: score only rows whose LSH bucket is within ``probe_hamming``
    bit flips of the query's bucket in at least one of ``n_tables`` hyperplane
    tables (multi-probe LSH), then exact cosine on the survivors.

    ``probe_hamming=0`` probes exactly the query's bucket per table (classic
    LSH); each +1 trades compute for recall by also probing buckets one more
    sign-flip away (vectors near a hyperplane land on either side).
    ``probe_hamming >= n_planes`` probes every bucket — exhaustive, rank-
    identical to :func:`cosine_topk`; that configuration is the DuckDB-oracle
    entry (``cosine_topk_lsh_exhaustive``), mirroring the full-probe IVF
    trick. The probe predicate is one JVM ``bit_count(bucket XOR qb)`` per
    table — no per-row Python."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        qb = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, qv)) >= 0))
        bucket = lsh_bucket_col(F.col(vec_col), planes)
        if probe_hamming <= 0:
            c = bucket == F.lit(qb)
        else:
            c = F.bit_count(bucket.bitwiseXOR(F.lit(qb))) <= F.lit(probe_hamming)
        cond = c if cond is None else (cond | c)
    return cosine_topk(df.where(cond), query_vec, k, id_col, vec_col)


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: spherical k-means (Lloyd) on a
    driver-side sample. Sample = first ``sample`` rows by id (stable at any
    parallelism), init = seeded choice from the sample. Returns L2-normalized
    centroids (n_centroids, dim).

    At 10^12 rows the sample collect is the only driver-side step; training
    is O(sample * k * dim) NumPy."""
    rows = df.orderBy(F.col(id_col)).limit(sample).select(vec_col).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_assign_col(vec_col: Column, centroids: np.ndarray) -> Column:
    """Cluster id per row: vectorized Arrow UDF, one BLAS matmul per batch
    (the assignment is the map-side of an IVF index build; at scale the
    result is a partition/bucket column for the vector table)."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.copy()

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

    return _assign(vec_col)


def cosine_topk_ivf(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: score only rows whose coarse cluster is among the
    query's ``nprobe`` nearest centroids, then exact cosine on survivors.

    Scale shape: the cluster column prunes ~(1 - nprobe/n_centroids) of the
    corpus before any per-row arithmetic; with the table written partitioned
    by cluster the probe becomes partition pruning at the scan. Recall vs
    the brute-force baseline is a test metric (like the LSH path)."""
    C = centroids if centroids is not None else ivf_centroids(
        df, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(C @ q))[:nprobe].tolist()
    assigned = df.withColumn("_ivf", ivf_assign_col(F.col(vec_col), C))
    return cosine_topk(
        assigned.where(F.col("_ivf").isin(probes)), query_vec, k, id_col, vec_col
    )


def ivf_build(
    df: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize an IVF index: the vector table written to Parquet
    PARTITIONED BY coarse cluster, plus a ``centroids.json`` sidecar.

    This is the build-once/query-many shape the inverted-index side already
    has (reference analog: ES builds the Lucene index once and serves many
    queries, /root/reference/elasticsearch-sink/.../ElasticsearchSink.java:60):
    assignment (one BLAS matmul per Arrow batch) and the cluster shuffle are
    paid ONCE at build; every subsequent probe is hive-partition pruning at
    the scan — ``nprobe`` of ``n_centroids`` directories read, no per-row
    arithmetic on non-probed rows and, unlike the unmaterialized path, no IO
    on them either. At 10^12 rows each cluster partition is further split by
    Parquet file size, so probe parallelism survives."""
    import json
    import os

    C = ivf_centroids(df, n_centroids, sample, iters, seed, id_col, vec_col)
    assigned = df.withColumn("ivf_cluster", ivf_assign_col(F.col(vec_col), C))
    assigned.write.mode("overwrite").partitionBy("ivf_cluster").parquet(
        os.path.join(out_dir, "vectors")
    )
    with open(os.path.join(out_dir, "centroids.json"), "w") as fh:
        json.dump({"n_centroids": len(C), "dim": int(C.shape[1]), "seed": seed,
                   "centroids": C.tolist()}, fh)
    return C


def ivf_load_centroids(index_dir: str) -> np.ndarray:
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        return np.asarray(json.load(fh)["centroids"], dtype=np.float64)


def ivf_search(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized IVF index: read ONLY the ``nprobe`` probed
    cluster partitions (hive-partition pruning — asserted in
    tests/test_plan_hygiene.py), exact cosine on the survivors. With
    ``nprobe == n_centroids`` this is exhaustive and rank-identical to
    :func:`cosine_topk` (the oracle configuration)."""
    C = ivf_load_centroids(index_dir)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probes = [int(p) for p in np.argsort(-(C @ q))[:nprobe]]
    vecs = spark.read.parquet(f"{index_dir}/vectors").where(
        F.col("ivf_cluster").isin(probes)
    )
    return cosine_topk(vecs, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold.

    ``exact=True`` verifies over the full cross join (test/small-scale
    oracle); default path restricts to LSH bucket collisions first, so the
    quadratic verify touches only candidate pairs."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if exact:
        pairs = base.alias("a").join(base.alias("b"), F.col("a.id") < F.col("b.id"))
    else:
        dim = len(df.select(vec_col).first()[0])
        with_buckets = base.select(
            "id",
            "v",
            F.posexplode(
                F.array(
                    *[
                        lsh_bucket_col(F.col("v"), hyperplanes(dim, n_planes, seed + 1000 * t))
                        for t in range(n_tables)
                    ]
                )
            ).alias("tbl", "bucket"),
        )
        # dedup cross-table collisions on the ID PAIR ALONE — the vectors
        # are functionally determined by the ids, and carrying two
        # d-dimensional arrays through the distinct() shuffle would multiply
        # its volume ~2d-fold; vectors are joined back once per unique pair
        id_pairs = (
            with_buckets.select("id", "tbl", "bucket").alias("a")
            .join(
                with_buckets.select("id", "tbl", "bucket").alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        return (
            id_pairs.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    return (
        pairs.withColumn("cosine", F.round(cosine_col(F.col("a.v"), F.col("b.v")), 6))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def cosine_topk_sql(
    query_vec_sql: str,
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`cosine_topk`. ``query_vec_sql`` is a scalar
    subquery yielding the query vector (e.g. ``SELECT embedding FROM
    embeddings WHERE vec_id = 0``). Same unrounded ORDER BY contract."""
    return f"""
WITH q AS (SELECT ({query_vec_sql}) AS qe),
d AS (
  SELECT e.{id_col} AS id,
         sum(e.{vec_col}[t.i]::DOUBLE * q.qe[t.i]::DOUBLE) AS dot,
         sqrt(sum(e.{vec_col}[t.i]::DOUBLE * e.{vec_col}[t.i]::DOUBLE)) AS na,
         sqrt(sum(q.qe[t.i]::DOUBLE * q.qe[t.i]::DOUBLE)) AS nb
  FROM {table} e, q, unnest(range(1, {int(dim) + 1})) AS t(i)
  GROUP BY e.{id_col}
)
SELECT id, round(dot / (na * nb), 6) AS cosine
FROM d ORDER BY dot / (na * nb) DESC, id ASC LIMIT {int(k)}
"""


def fixed_centroids(dim: int, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Data-INDEPENDENT centroids: seeded Gaussian directions, L2-normalized.
    A Voronoi partition of random directions — the statically-reproducible
    clustering for oracle-checked :func:`semdedup` entries (the SQL twin
    embeds the same literals without seeing the data); production use
    passes :func:`ivf_centroids` output instead for balanced clusters."""
    rng = np.random.RandomState(seed)
    C = rng.standard_normal((n_centroids, dim))
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def semdedup(
    df: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster cosine thresholding. Docs land in
    the cluster of their most-cosine-similar centroid; within a cluster,
    of any pair with cosine >= ``threshold`` the member MORE similar to
    the centroid is dropped (the paper's keep-low-centroid-similarity
    choice — keeps the "edge" example), made fully deterministic here:

    drop(a) iff exists same-cluster b != a with round(cos(a,b),6) >=
    threshold and (cent(b) < cent(a) or (cent(b) == cent(a) and
    b.id < a.id)), where cent(x) = round(cosine(x, centroid), 6).

    Returns survivors ``(id, cluster, cent_sim)`` ordered by id. Centroids
    come from :func:`ivf_centroids` (driver-side seeded spherical k-means)
    unless passed in; cluster assignment is a pure JVM expression
    (argmax of the rounded per-centroid cosines, first index on ties) so
    the DuckDB twin :func:`semdedup_sql` reproduces it bit-for-bit.

    Scale shape: the candidate pair space is the SemDeDup design itself —
    quadratic ONLY within a cluster, never across the corpus; at 10^12
    rows ``n_centroids`` scales with the corpus (the paper runs 50k
    clusters) so per-cluster sizes stay bounded. One shuffle on the
    cluster key for the pair join; the drop set is distinct ids only and
    survivors come from a left_anti join (no driver-side collect). Skewed
    clusters are visible as the max group and are re-split by raising
    ``n_centroids`` — the same lever the paper uses.
    """
    C = centroids if centroids is not None else ivf_centroids(
        df, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    cent_cols = [
        F.round(cosine_col(F.col("v"), F.array(*[F.lit(float(x)) for x in c])), 6)
        for c in C
    ]
    sims = F.array(*cent_cols)
    assign = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).select(
        "id",
        "v",
        (F.array_position(sims, F.array_max(sims)) - 1).alias("cluster"),
        F.array_max(sims).alias("cent_sim"),
    )
    a = assign.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("cluster").alias("cl_a"), F.col("cent_sim").alias("ca"),
    )
    b = assign.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("cluster").alias("cl_b"), F.col("cent_sim").alias("cb"),
    )
    dropped = (
        a.join(b, (F.col("cl_a") == F.col("cl_b")) & (F.col("id_a") != F.col("id_b")))
        .where(F.round(cosine_col(F.col("va"), F.col("vb")), 6) >= threshold)
        .where(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("id"))
        .distinct()
    )
    return (
        assign.join(dropped, "id", "left_anti")
        .select("id", "cluster", "cent_sim")
        .orderBy("id")
    )


def semdedup_sql(
    centroids: np.ndarray,
    threshold: float = 0.95,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`semdedup` — same centroid literals, same
    rounded-cosine argmax assignment (list_position of the max = first
    index on ties, as Spark array_position), same deterministic drop rule."""
    cent_rows = ", ".join(
        f"({ci}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for ci, c in enumerate(centroids)
    )
    rng = f"unnest(range(1, {int(dim) + 1})) AS t(i)"
    return f"""
WITH base AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}),
cent AS (SELECT * FROM (VALUES {cent_rows}) c(ci, cv)),
sims AS (
  SELECT b.id, c.ci,
         round(sum(b.v[t.i]::DOUBLE * c.cv[t.i])
               / (sqrt(sum(b.v[t.i]::DOUBLE * b.v[t.i]::DOUBLE))
                  * sqrt(sum(c.cv[t.i] * c.cv[t.i]))), 6) AS s
  FROM base b, cent c, {rng}
  GROUP BY b.id, c.ci
),
assign AS (
  SELECT id,
         list_position(ls, list_aggregate(ls, 'max')) - 1 AS cluster,
         list_aggregate(ls, 'max') AS cent_sim
  FROM (SELECT id, list(s ORDER BY ci) AS ls FROM sims GROUP BY id)
),
pair AS (
  SELECT a.id AS id_a, a.cent_sim AS ca, b.id AS id_b, b.cent_sim AS cb,
         round(sum(va.v[t.i]::DOUBLE * vb.v[t.i]::DOUBLE)
               / (sqrt(sum(va.v[t.i]::DOUBLE * va.v[t.i]::DOUBLE))
                  * sqrt(sum(vb.v[t.i]::DOUBLE * vb.v[t.i]::DOUBLE))), 6) AS pc
  FROM assign a
  JOIN assign b ON a.cluster = b.cluster AND a.id != b.id
  JOIN base va ON va.id = a.id
  JOIN base vb ON vb.id = b.id, {rng}
  GROUP BY a.id, a.cent_sim, b.id, b.cent_sim
),
dropped AS (
  SELECT DISTINCT id_a AS id FROM pair
  WHERE pc >= {float(threshold)!r}
    AND (cb < ca OR (cb = ca AND id_b < id_a))
)
SELECT a.id, a.cluster, a.cent_sim
FROM assign a ANTI JOIN dropped d ON a.id = d.id
ORDER BY a.id
"""
