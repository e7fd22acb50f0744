"""ES 1.x terms LOOKUP filter: ``{"terms": {"<field>": {"index": ...,
"type": ..., "id": ..., "path": ...}}}`` — the terms list is fetched from
ONE stored document at query time, then applied as an ordinary terms
filter (TermsLookupFilterParser in ES 1.x; delegation site
ElasticsearchSink.java:54).

Relational re-expression: the lookup "index/type/id" is a row of another
table selected by its id column; "path" is a column of that row — an
``array`` column yields the whole list, a scalar column a one-term list.

Pinned ES semantics:

- the lookup doc is fetched FIRST (ES does a realtime GET); a MISSING doc
  yields an empty terms list, so the filter matches NOTHING (ES 1.x
  behavior — no error);
- a NULL path value likewise yields the empty list;
- more than one row under the id is a data-model error (ids are unique in
  ES) and raises;
- docs with a NULL filter field never match (terms-filter null rule).

Scale shape (10^12 rows): the lookup fetch is a one-row GET — an id
predicate pushed to the lookup table's Parquet scan (plan-pinned in
tests) — and the resolved list is inlined as a literal IN-list on the
corpus scan, so the whole filter is ONE pushed-down predicate: no join,
no shuffle, no UDF. This mirrors ES exactly: ES also resolves the lookup
on the coordinating node and broadcasts the literal terms to shards. The
driver-side collect is bounded at one row by contract.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

__all__ = ["resolve_terms_lookup", "terms_lookup_filter", "terms_lookup_filter_sql"]


def resolve_terms_lookup(
    lookup: DataFrame,
    lookup_id: Any,
    path_col: str,
    lookup_id_col: str = "doc_id",
) -> list:
    """Fetch the terms list from the single lookup row (the ES realtime
    GET): [] when the doc is missing or the path value is NULL; the array
    elements for an array column; a one-element list for a scalar."""
    rows = (
        lookup.where(F.col(lookup_id_col) == F.lit(lookup_id))
        .select(path_col)
        .limit(2)
        .collect()
    )
    if len(rows) > 1:
        raise ValueError(
            f"terms lookup id {lookup_id!r} is not unique in the lookup table"
        )
    if not rows or rows[0][0] is None:
        return []
    v = rows[0][0]
    return list(v) if isinstance(v, (list, tuple)) else [v]


def terms_lookup_filter(
    docs: DataFrame,
    lookup: DataFrame,
    field: str,
    lookup_id: Any,
    path_col: str,
    lookup_id_col: str = "doc_id",
    select: list[str] | None = None,
    order_col: str = "doc_id",
) -> DataFrame:
    """Docs whose ``field`` is IN the lookup doc's terms (module contract);
    returns ``select`` columns (default all), ordered by ``order_col``."""
    terms = resolve_terms_lookup(lookup, lookup_id, path_col, lookup_id_col)
    pred = F.col(field).isin(terms) if terms else F.lit(False)
    return (
        docs.where(pred)
        .select(*(select or docs.columns))
        .orderBy(order_col)
    )


def terms_lookup_filter_sql(
    field: str,
    lookup_id: Any,
    path_col: str,
    array_path: bool = False,
    table: str = "documents",
    lookup_table: str = "documents",
    lookup_id_col: str = "doc_id",
    select: str = "*",
    order_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`terms_lookup_filter` — the lookup is the
    equivalent one-row subquery (unnested when ``array_path``); SQL IN
    over an empty subquery is false for every row, matching the
    missing-doc contract."""
    idlit = (
        "'" + lookup_id.replace("'", "''") + "'"
        if isinstance(lookup_id, str)
        else repr(lookup_id)
    )
    sel = f"unnest({path_col})" if array_path else path_col
    inner = (
        f"SELECT {sel} FROM {lookup_table} "
        f"WHERE {lookup_id_col} = {idlit} AND {path_col} IS NOT NULL"
    )
    return f"""
SELECT {select} FROM {table}
WHERE {field} IN ({inner})
ORDER BY {order_col}
"""
