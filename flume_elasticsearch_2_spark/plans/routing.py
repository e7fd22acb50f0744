"""ES 1.x custom routing (SURVEY §2; delegation site
ElasticsearchSink.java:54 — 1.x clients set ``?routing=`` on index and
search): all docs sharing a routing value land in ONE physical partition,
and a routed query touches ONLY that partition.

Spark-first shape: the routed index is a hive layout of ROUTE SUB-INDEXES
(``route=K/`` each a self-contained doc-range-sharded index built by the
normal builder), with ``route = md5_60(routing_value) % n_routes`` — the
house cross-engine hash, so the route of a value is computable identically
in Python (query time), Spark (build time) and DuckDB (the oracle).

* ``routed_searcher(value)`` → a plain :class:`IndexSearcher` over the one
  route directory: the ENTIRE serving surface (BMW top-k, phrase, facets,
  …) works routed, and reads touch exactly one route's files — the
  partition-pruning win routing exists for. Scoring uses the route's LOCAL
  stats, which is exactly ES ``query_then_fetch`` + routing behavior.
* ``routed_search_all`` (no routing given) → ``search_generations`` across
  every route with dfs_query_then_fetch global stats — rank- and
  score-identical to the unrouted merged index (the generations contract,
  pinned by tests), so adding routing never changes unrouted results.

Reference bug-parity note: ES 1.x hashes with DJB2 on the routing string;
the exact hash is internal layout, not API surface — what is API is the
colocation + single-partition-read contract, which this keeps.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import MD5_LONG_SQL, md5_long_col

ROUTING_MANIFEST = "routing.json"


def route_of(value: Any, n_routes: int) -> int:
    """Python twin of the 60-bit md5 prefix hash → route id. Must match
    :func:`route_col` / :func:`route_sql` bit-for-bit (test-pinned)."""
    h = int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)
    return h % int(n_routes)


def route_col(field: str, n_routes: int):
    """Spark column: the route id of a doc's routing field (NULL routing
    values raise at build — ES requires routing when the mapping does)."""
    return F.pmod(md5_long_col(F.col(field).cast("string")), F.lit(int(n_routes)))


def route_sql(field: str, n_routes: int) -> str:
    """DuckDB twin of :func:`route_col`."""
    h = MD5_LONG_SQL.format(expr=f"CAST({field} AS VARCHAR)")
    return f"(({h}) % {int(n_routes)})"


def build_routed_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    routing_field: str,
    n_routes: int = 4,
    n_shards: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build ``n_routes`` self-contained sub-indexes under
    ``index_dir/route=K`` (each by the normal partial-postings builder) and
    a root manifest recording the routing scheme.

    Scale shape: the route split is ONE narrow column on the existing scan;
    each sub-build is the proven one-exchange pipeline over ~1/n_routes of
    the corpus. id_space is pinned GLOBALLY so doc ids stay disjoint across
    routes — the generations contract ``routed_search_all`` relies on."""
    if int(n_routes) < 1:
        raise ValueError("n_routes must be >= 1")
    from .build_index import build_segments_partial

    n_null = docs.where(F.col(routing_field).isNull()).limit(1).count()
    if n_null:
        raise ValueError(
            f"routing field {routing_field!r} has NULL values — ES rejects "
            "docs without routing when routing is required; fill or drop them"
        )
    routed = docs.withColumn("__route", route_col(routing_field, n_routes)).persist()
    try:
        mx = routed.agg(F.max(F.col(id_col))).collect()[0][0]
        # empty corpus: a valid routed index with zero built routes — every
        # routed search answers 0 hits (the manifest contract below)
        id_space = int(mx) + 1 if mx is not None else 1
        # routes with no docs are recorded, not built: an empty ES shard
        # answers searches with 0 hits, and a search routed to an empty
        # route must do the same instead of failing on a missing index
        present = sorted(
            r["__route"]
            for r in routed.select("__route").distinct().collect()
        )
        manifests = {}
        for r in present:
            sub = routed.where(F.col("__route") == r).drop("__route")
            manifests[int(r)] = build_segments_partial(
                spark, sub, f"{index_dir}/route={r}", n_shards=n_shards,
                id_col=id_col, text_col=text_col, id_space=id_space,
            )
    finally:
        routed.unpersist()
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "routing_field": routing_field,
        "n_routes": int(n_routes),
        "n_shards_per_route": int(n_shards),
        "id_space": id_space,
        "built_routes": [int(r) for r in present],
    }
    with open(os.path.join(index_dir, ROUTING_MANIFEST), "w") as f:
        json.dump(meta, f)
    return {**meta, "routes": manifests}


def _read_routing(index_dir: str) -> dict:
    p = os.path.join(index_dir, ROUTING_MANIFEST)
    if not os.path.exists(p):
        raise ValueError(f"{index_dir} is not a routed index ({ROUTING_MANIFEST} missing)")
    with open(p) as f:
        return json.load(f)


def routed_searcher(spark: SparkSession, index_dir: str, routing_value: Any):
    """The single-route :class:`IndexSearcher` for a routing value — every
    read under it touches ONLY ``route=<h(value)>/`` (the pruning contract);
    scores use the route's local stats (ES query_then_fetch + routing)."""
    from .query_index import IndexSearcher

    meta = _read_routing(index_dir)
    r = route_of(routing_value, meta["n_routes"])
    if r not in meta.get("built_routes", list(range(meta["n_routes"]))):
        raise ValueError(
            f"route {r} (value {routing_value!r}) is empty — use routed_search, "
            "which answers an empty route with 0 hits as an empty ES shard does"
        )
    return IndexSearcher(spark, f"{index_dir}/route={r}")


def routed_search(
    spark: SparkSession,
    index_dir: str,
    routing_value: Any,
    query: str,
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Routed top-k search: one sub-index, local stats, full BMW pruning.
    A value routed to an EMPTY route returns 0 hits (empty ES shard)."""
    meta = _read_routing(index_dir)
    r = route_of(routing_value, meta["n_routes"])
    if r not in meta.get("built_routes", list(range(meta["n_routes"]))):
        return spark.createDataFrame([], "doc_id long, score double")
    return routed_searcher(spark, index_dir, routing_value).search(query, k=k, mode=mode)


def routed_search_all(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Search WITHOUT routing: dfs_query_then_fetch across every route —
    rank- and score-identical to the unrouted merged index."""
    from .query_index import search_generations

    meta = _read_routing(index_dir)
    routes = meta.get("built_routes", list(range(meta["n_routes"])))
    dirs = [f"{index_dir}/route={r}" for r in routes]
    return search_generations(spark, dirs, query, k=k, mode=mode)


def routed_search_sql(
    routing_field: str,
    n_routes: int,
    routing_value: Any,
    query: str,
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`routed_search`: BM25 over ONLY the route's
    docs (stats local to the route — the subquery IS the corpus), route
    membership via the identical md5 hash."""
    from ..operators.topk import bm25_topk_sql

    r = route_of(routing_value, n_routes)
    sub = (
        f"(SELECT * FROM {table} "
        f"WHERE {route_sql(routing_field, n_routes)} = {r}) AS routed"
    )
    return bm25_topk_sql(query, k=k, mode=mode, table=sub)
