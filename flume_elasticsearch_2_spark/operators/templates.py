"""ES 1.x search templates (``_search/template`` and the ``template``
query): a JSON search body with ``{{param}}`` mustache placeholders,
rendered with a params map and then executed as a plain DSL body.

Reference analog: the template surface of the delegated ES deployment
(delegation site ElasticsearchSink.java:54,66 — any 1.x client feature);
ES 1.1 shipped search templates with exactly this mustache-variable
subset.

Subset (loudly enforced, matching operators/dsl.py's no-silent-best-effort
contract): a string value that IS ``"{{name}}"`` substitutes the param
VERBATIM (any JSON type — numbers stay numbers, lists stay lists, so
``"size": "{{k}}"`` renders to an int); a string CONTAINING placeholders
string-interpolates scalar params; missing params raise; mustache
sections/partials (``{{#..}}``, ``{{>..}}``) are out of subset and raise.
Rendering is pure JSON-tree rewriting on the driver — zero cost at corpus
scale; every executor then routes through the ordinary DSL front door, so
templates inherit the full parsed subset and its guards for free.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

from .dsl import dsl_search, dsl_search_index, dsl_search_sql

_VAR_RE = re.compile(r"\{\{\s*([A-Za-z0-9_.]+)\s*\}\}")


def render_template(node: Any, params: dict[str, Any]) -> Any:
    """Render mustache ``{{var}}`` placeholders in a JSON tree."""
    if isinstance(node, dict):
        return {k: render_template(v, params) for k, v in node.items()}
    if isinstance(node, list):
        return [render_template(v, params) for v in node]
    if not isinstance(node, str):
        return node
    if "{{" not in node:
        return node
    if re.search(r"\{\{\s*[#^/>&!]", node):
        raise ValueError(f"mustache sections/partials are out of subset: {node!r}")
    whole = _VAR_RE.fullmatch(node.strip())
    if whole:
        name = whole.group(1)
        if name not in params:
            raise ValueError(f"template param {name!r} missing")
        return params[name]

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"template param {name!r} missing")
        v = params[name]
        if isinstance(v, (dict, list)):
            raise ValueError(f"param {name!r} is structured but interpolated "
                             f"into a string: {node!r}")
        return str(v)

    out = _VAR_RE.sub(sub, node)
    if "{{" in out:
        raise ValueError(f"unparsable mustache syntax in {node!r}")
    return out


def _render_body(body: dict) -> dict:
    """Unwrap the 1.x template envelope: ``{"template": {...body with
    placeholders...}, "params": {...}}`` (also accepts the query-level
    ``{"query": {"template": {"query": {...}, "params": {...}}}}`` form)."""
    if set(body) >= {"template"} and set(body) <= {"template", "params"}:
        return render_template(body["template"], body.get("params", {}))
    q = body.get("query")
    if isinstance(q, dict) and set(q) == {"template"}:
        t = q["template"]
        inner = render_template(t.get("query"), t.get("params", {}))
        rendered = {k: v for k, v in body.items() if k != "query"}
        rendered = render_template(rendered, t.get("params", {}))
        rendered["query"] = inner
        return rendered
    raise ValueError("not a template body: expected top-level 'template' "
                     "(+'params') or query.template")


def dsl_template_search(docs: DataFrame, body: dict, **kw) -> DataFrame:
    """Declarative executor: render, then the ordinary DSL front door."""
    return dsl_search(docs, _render_body(body), **kw)


def dsl_template_search_sql(body: dict, **kw) -> str:
    """DuckDB oracle: render, then the ordinary DSL SQL generator."""
    return dsl_search_sql(_render_body(body), **kw)


def dsl_template_search_index(searcher, body: dict, **kw) -> DataFrame:
    """Serving executor: render, then the index-backed DSL path."""
    return dsl_search_index(searcher, _render_body(body), **kw)
