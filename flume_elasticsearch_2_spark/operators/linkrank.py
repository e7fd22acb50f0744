"""Link-graph PageRank over the corpus — fixed-point, bit-reproducible.

Common-Crawl-style training pipelines rank pages by link centrality
(PageRank / harmonic centrality over the host graph) as a quality signal
before selection; this module provides that operator for the engine's
corpus. The reference pipeline delegates every ranking signal to ES
(/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66-67); the
link-graph signal is the web-scale companion the brief's training-pipeline
axis asks for.

Determinism contract (the interesting part)
-------------------------------------------
Floating-point PageRank is NOT reproducible across partitionings: per-node
contribution sums are folded in shuffle arrival order, so the same job on
local[8] vs local[32] (or N vs 4N executors) drifts in the last ulps and
can flip ranks/rounding. This implementation does every iteration in
FIXED-POINT INT64 (ranks in units of 1/SCALE, SCALE = 10^15):

* per-edge contribution = ``(r_src * 17) DIV 80``   (damping 0.85 over a
  constant out-degree of 4 → 17/80 exactly; integer multiply + truncating
  division, exact in int64 since r <= SCALE and SCALE*17 < 2^63)
* teleport base = ``(15 * SCALE) DIV (100 * n)``    (one Python integer)
* new rank = ``base + SUM(contribution)``           (integer sum —
  ASSOCIATIVE, so partition order, executor count, and engine are all
  irrelevant; Spark, DuckDB, and a single-threaded fold agree bit-for-bit)

Floor losses mean total mass drifts a few * n ulps below SCALE per
iteration; that is part of the pinned contract, not an error term.

Graph shape
-----------
The corpus carries no explicit hyperlinks, so edges derive deterministically
from the doc ids (the brief's "synthesise deterministically at small scale"
rule): each doc u emits ``degree`` edges, edge j pointing at
``min(h(u,j,'a'), h(u,j,'b')) mod n`` where h is the engine's 60-bit md5
(functions/text.py:161 — bit-identical in Spark and DuckDB). Taking the min
of two uniform draws skews in-degree toward low ids — a hub-heavy graph, so
ranks spread instead of collapsing to uniform. Self-loops are KEPT so every
node has out-degree exactly ``degree`` (no dangling-mass term; a self-loop
just returns 17/80 of the node's own rank).

Scale shape (10^12 docs)
------------------------
Edges are materialized once and hash-partitioned by ``src``; each iteration
is ONE shuffle: join ranks (keyed by node == src partitioning) to edges,
then a map-side-combined integer sum keyed by dst. Ranks are
``localCheckpoint``-ed per round to truncate the lineage (iterative plans
otherwise re-derive the whole prefix). Because arithmetic is integer, the
two-cluster-size run produces byte-identical ranks — reproducibility is
structural, not best-effort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col

SCALE = 10**15
_DAMP_NUM, _DAMP_DEN = 17, 80  # 0.85 / out-degree 4


def hash_edges(
    docs: DataFrame, n: int, id_col: str = "doc_id", degree: int = 4, seed: int = 7
) -> DataFrame:
    """(src, dst) — ``degree`` deterministic hub-skewed edges per doc."""
    base = docs.select(F.col(id_col).cast("long").alias("src")).select(
        "src",
        F.explode(F.array(*[F.lit(j) for j in range(degree)])).alias("j"),
    )

    def h(tag: str):
        return md5_long_col(
            F.concat_ws(
                ":", F.lit("pr"), F.col("src"), F.col("j"), F.lit(tag), F.lit(str(seed))
            )
        ) % F.lit(int(n))

    return base.select("src", F.least(h("a"), h("b")).alias("dst"))


def pagerank(
    docs: DataFrame,
    iters: int = 5,
    k: int = 20,
    id_col: str = "doc_id",
    degree: int = 4,
    seed: int = 7,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Top-``k`` nodes by fixed-point PageRank after ``iters`` iterations.

    Returns (node, rank_fp) — rank_fp is the EXACT int64 fixed-point rank
    (units of 1/SCALE), ordered by (rank_fp DESC, node ASC). Integer output
    keeps the driver compare bit-exact; callers wanting a float divide by
    SCALE themselves. ``checkpoint_dir`` selects RELIABLE per-iteration
    checkpointing (executor-loss-safe; plans/lineage.py
    iterative_checkpointer) over the default ``localCheckpoint``.
    """
    from ..plans.lineage import iterative_checkpointer

    ck = iterative_checkpointer(docs.sparkSession, checkpoint_dir)
    n = docs.count()
    if n == 0:
        return docs.sparkSession.createDataFrame([], "node long, rank_fp long")
    nodes = docs.select(F.col(id_col).cast("long").alias("node"))
    edges = (
        hash_edges(docs, n, id_col, degree, seed)
        .repartition("src")
        .persist()
    )
    edges.count()  # materialize once; every iteration reuses the same shuffle
    base = (15 * SCALE) // (100 * n)
    ranks = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    for _ in range(int(iters)):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr(f"(r * {_DAMP_NUM}) DIV {_DAMP_DEN}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # the previous ranks frame is fully consumed by this checkpoint —
        # its checkpoint files are freed once the new one materializes
        ranks = ck(
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("r"),
            ),
            supersedes=ranks,
        )
    edges.unpersist()
    return (
        ranks.orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(int(k))
        .select("node", F.col("r").alias("rank_fp"))
    )


def pagerank_sql(
    iters: int = 5,
    k: int = 20,
    table: str = "documents",
    id_col: str = "doc_id",
    degree: int = 4,
    seed: int = 7,
    n: int | None = None,
) -> str:
    """DuckDB oracle for :func:`pagerank` — iterations UNROLLED as CTEs
    (r0..r{iters}), same integer arithmetic. ``n`` defaults to a scalar
    subquery so the oracle stays self-contained."""
    n_expr = str(int(n)) if n is not None else f"(SELECT count(*) FROM {table})"
    js = ", ".join(str(j) for j in range(degree))

    def h(tag: str) -> str:
        md5 = MD5_LONG_SQL.format(
            expr=f"'pr:' || CAST(src AS VARCHAR) || ':' || CAST(j AS VARCHAR) "
            f"|| ':{tag}:{seed}'"
        )
        return f"({md5} % {n_expr})"

    parts = [
        f"nodes AS (SELECT CAST({id_col} AS BIGINT) AS node FROM {table})",
        f"""edges AS (
  SELECT CAST({id_col} AS BIGINT) AS src, j, least({h('a')}, {h('b')}) AS dst
  FROM {table}, (SELECT unnest([{js}]) AS j)
)""",
        f"params AS (SELECT (15 * {SCALE}) // (100 * {n_expr}) AS base)",
        f"r0 AS (SELECT node, {SCALE} // {n_expr} AS r FROM nodes)",
    ]
    for i in range(1, int(iters) + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         (SELECT base FROM params)
           + coalesce(sum((p.r * {_DAMP_NUM}) // {_DAMP_DEN}), 0) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{i - 1} p ON p.node = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, CAST(r AS BIGINT) AS rank_fp
FROM r{int(iters)}
ORDER BY r DESC, node ASC
LIMIT {int(k)}
"""
    )
