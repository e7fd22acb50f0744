"""ES 1.x index warmers (SURVEY §2.5): registered search bodies executed
against every new commit point before it serves traffic.

Reference analog: the ``_warmer`` admin API of the ES 1.x deployment behind
the sink (delegation site
/root/reference/elasticsearch-sink/src/main/java/org/apache/flume/sink/elasticsearch/ElasticsearchSink.java:54)
— PUT ``/{index}/_warmer/{name}`` registers a body; ES replays every
registered body on each refresh so segment caches (filter bitsets,
fielddata) are hot before queries land.

This engine's analog is honest about what warming buys on Spark: a warmer
run replays the body through the ordinary DSL front door against the NEW
generation, which (a) validates the body still parses against the index
(schema drift fails at warm time, not at query time — the operational win
warmers actually deliver), and (b) faults the touched postings/doc parquet
into the OS page cache on the executors that will serve them. There is no
silent query rewriting: warmers inherit the full parsed DSL subset AND its
loud refusals.

Scale shape: each warmer is one ordinary serving query (per-shard BMW
scatter, k rows back); the counts are submitted as CONCURRENT Spark jobs
from a driver thread pool, so N warmers overlap on idle executors instead
of serializing N blocking actions (Spark's scheduler interleaves jobs from
separate driver threads). Body PARSING stays sequential and up front — a
refused body aborts the warm run before any job is submitted. The registry
itself is driver-side JSON — metadata-scale, like ES cluster state.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame


class WarmerRegistry:
    """name -> search body, with the ES 1.x ``_warmer`` PUT/DELETE surface
    (same persistence contract as :class:`~.alias.AliasRegistry`)."""

    def __init__(self) -> None:
        self._warmers: dict[str, dict[str, Any]] = {}

    def put(self, name: str, body: dict) -> None:
        """PUT ``/_warmer/{name}``. The body must be a dict; it is parsed
        lazily at warm time (ES also accepts bodies its current mappings
        cannot serve and fails at warm time)."""
        if not isinstance(body, dict) or not body:
            raise ValueError(f"warmer {name!r} body must be a non-empty dict")
        self._warmers[name] = body

    def delete(self, name: str) -> None:
        """DELETE ``/_warmer/{name}`` — missing names are a no-op, as ES
        treats wildcard deletes."""
        self._warmers.pop(name, None)

    def get(self, name: str) -> dict[str, Any]:
        if name not in self._warmers:
            raise KeyError(f"unknown warmer {name!r}")
        return self._warmers[name]

    def warmers(self) -> dict[str, dict[str, Any]]:
        """The ``GET _warmer`` view."""
        return dict(self._warmers)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._warmers, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "WarmerRegistry":
        """Re-validates every loaded body through :meth:`put` (mirroring
        ``IndexTemplateRegistry.load``): a hand-edited cluster-state file
        cannot smuggle a value ``save()`` would never write — a non-dict
        or empty body refuses at load time, not later at warm time."""
        reg = cls()
        with open(path) as f:
            loaded = json.load(f)
        if not isinstance(loaded, dict):
            raise ValueError(f"warmer state file {path!r} must hold a JSON object")
        for name, body in loaded.items():
            reg.put(name, body)
        return reg


def run_warmers(searcher, registry: WarmerRegistry) -> DataFrame:
    """Replay every registered warmer body against ``searcher`` (the new
    generation's :class:`~..plans.query_index.IndexSearcher`) through the
    serving DSL front door; returns one row per warmer ``(warmer, hits)``
    ordered by name. A body the DSL refuses propagates its ValueError —
    a warmer that cannot run is an operational signal, never skipped."""
    from concurrent.futures import ThreadPoolExecutor

    from .dsl import dsl_search_index

    names = sorted(registry.warmers())
    # parse/plan every body FIRST (sequential, loud): a refused warmer
    # aborts before any job is submitted
    frames = [(n, dsl_search_index(searcher, registry.get(n))) for n in names]
    if not frames:
        return searcher.spark.createDataFrame([], "warmer string, hits long")
    # counts as concurrent jobs — Spark schedules jobs from separate
    # driver threads in parallel, so warmers overlap on idle executors
    with ThreadPoolExecutor(max_workers=min(8, len(frames))) as ex:
        counts = list(ex.map(lambda nf: int(nf[1].count()), frames))
    rows = [(n, c) for (n, _), c in zip(frames, counts)]
    return searcher.spark.createDataFrame(rows, "warmer string, hits long")
