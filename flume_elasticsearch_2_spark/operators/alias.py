"""ES 1.x index aliases with filters (SURVEY §2.5; reference delegation
site ElasticsearchSink.java:54 — the deployed ES resolves aliases on every
request; filtered aliases are the 1.x multi-tenancy idiom).

An alias names a target plus an optional DSL filter; searching the alias
is EXACTLY searching the target with the alias filter ANDed in. ES applies
the filter by wrapping the request query in a filtered query — this module
does the same body rewrite (``{"filtered": {"query": ..., "filter": ...}}``,
the already-supported 1.x wrapper), so aliased search reuses the tested
executors verbatim on all three paths (declarative / serving / oracle) and
adds zero new query semantics of its own.

The registry is a plain dict with optional JSON persistence next to an
index directory (the `_aliases` API analog). Scale: alias resolution is
driver-side dict/JSON work — nothing distributed happens here.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame

__all__ = [
    "AliasRegistry",
    "aliased_body",
    "search_alias",
    "search_alias_index",
    "search_alias_sql",
]


class AliasRegistry:
    """name -> (target, filter) with the ES `_aliases` actions surface."""

    def __init__(self) -> None:
        self._aliases: dict[str, dict[str, Any]] = {}

    def update(self, actions: list[dict]) -> None:
        """Apply an ES 1.x ``_aliases`` actions body: ``add`` / ``remove``."""
        for action in actions:
            if len(action) != 1:
                raise ValueError("each action is exactly {'add': ...} or {'remove': ...}")
            (op, spec), = action.items()
            if op == "add":
                extra = set(spec) - {"index", "alias", "filter"}
                if extra:
                    raise ValueError(f"alias add keys {sorted(extra)} unsupported")
                self._aliases[spec["alias"]] = {
                    "index": spec["index"],
                    "filter": spec.get("filter"),
                }
            elif op == "remove":
                self._aliases.pop(spec["alias"], None)
            else:
                raise ValueError(f"alias action {op!r} (add/remove)")

    def get(self, alias: str) -> dict[str, Any]:
        if alias not in self._aliases:
            raise KeyError(f"unknown alias {alias!r}")
        return self._aliases[alias]

    def aliases(self) -> dict[str, dict[str, Any]]:
        """The `GET _aliases` view."""
        return dict(self._aliases)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._aliases, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "AliasRegistry":
        reg = cls()
        with open(path) as f:
            reg._aliases = json.load(f)
        return reg


def aliased_body(registry: AliasRegistry, alias: str, body: dict) -> dict:
    """Rewrite a search body for an alias: the alias filter ANDs into the
    request query — appended to an existing ``bool``/``filtered`` filter
    list, else the query is wrapped in the 1.x ``filtered`` form (exactly
    what ES does)."""
    flt = registry.get(alias).get("filter")
    if flt is None:
        return body
    if "query" not in body:
        raise ValueError("alias search body needs a query")
    extra = [flt] if isinstance(flt, dict) else list(flt)
    q = body["query"]
    if isinstance(q, dict) and len(q) == 1:
        (kind, val), = q.items()
        if kind in ("bool", "filtered"):
            cur = val.get("filter", [])
            cur = [cur] if isinstance(cur, dict) else list(cur)
            return {**body, "query": {kind: {**val, "filter": cur + extra}}}
    return {**body, "query": {"filtered": {"query": q, "filter": extra}}}


def search_alias(
    registry: AliasRegistry, alias: str, docs: DataFrame, body: dict
) -> DataFrame:
    """Declarative aliased search (``docs`` is the alias target's corpus)."""
    from .dsl import dsl_search

    return dsl_search(docs, aliased_body(registry, alias, body))


def search_alias_index(registry: AliasRegistry, alias: str, searcher, body: dict) -> DataFrame:
    """Serving-path aliased search against the target index."""
    from .dsl import dsl_search_index

    return dsl_search_index(searcher, aliased_body(registry, alias, body))


def search_alias_sql(
    registry: AliasRegistry, alias: str, body: dict, table: str = "documents"
) -> str:
    """DuckDB oracle for the aliased search (same rewrite, oracle executor)."""
    from .dsl import dsl_search_sql

    return dsl_search_sql(aliased_body(registry, alias, body), table=table)
