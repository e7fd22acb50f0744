"""ES 1.x ``_bulk`` API: apply a batch of index / create / update / delete
actions to the document corpus — the exact surface the reference sink
drives (``ElasticsearchSink.java:54-85``: ``prepareBulk()`` +
``prepareIndex(...).setId(map.get("IR_SID"))`` per event, i.e. explicit-id
upserts, with ``hasFailures()`` escalated to an exception).

Design: the action batch is CLIENT-sized (the reference's ``batchSize``
default is 1000, ``ElasticsearchSink.java:40``), so the in-batch ordering
semantics are folded on the driver into one tiny per-id program — at most
one of REPLACE(doc) / PATCH(partial) / DELETE per id — and the fold is
SHARED between the Spark executor and the DuckDB oracle generator, so both
engines apply byte-identical programs. The corpus-sized work is purely
relational: one broadcast LEFT JOIN for patches, one broadcast anti-join
for removals/creates, one union for inserted docs. No shuffle of the
corpus, no driver-side corpus collect — at 100 TB this is a map-side job.

In-batch fold rules (ES 1.x semantics, conflicts resolved per action in
order; the narrow data-dependent corners are parameterized):

- ``index``  → full replace-or-insert (upsert), unconditional.
- ``delete`` → remove if present (missing id is ES ``not_found``, a no-op).
- ``update`` → partial merge into the existing doc (explicit ``null``
  values are out of the subset and raise). An update whose id has no prior
  in-batch full doc and is absent from the corpus is a per-action failure:
  ``missing="skip"`` drops it (the deterministic, SQL-expressible form the
  driver entry uses); ``missing="error"`` raises like the reference sink's
  ``hasFailures()`` escalation.
- ``create`` → insert-if-absent. A create whose id already exists in the
  corpus fails per-action: ``conflict="skip"`` keeps the existing doc,
  ``conflict="error"`` raises. create after an in-batch delete/index is
  resolved by the fold (delete+create = plain upsert).

Out-of-subset interleavings raise loudly (no silent best-effort, matching
operators/dsl.py's contract): ``update`` after ``delete`` with no
intervening insert, and ``update``/``create`` adjacent to an in-batch
``create``/bare-``update`` for the same id (those outcomes fork on corpus
membership in a way one folded program cannot express).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, functions as F

_OPS = ("index", "create", "update", "delete")


def parse_bulk(ndjson: str) -> list[tuple[str, int, dict | None]]:
    """Parse ES ``_bulk`` NDJSON (action line, then a source line for
    index/create, ``{"doc": ...}`` for update, nothing for delete) into
    ``(op, id, doc)`` triples."""
    lines = [ln for ln in ndjson.splitlines() if ln.strip()]
    out: list[tuple[str, int, dict | None]] = []
    i = 0
    while i < len(lines):
        action = json.loads(lines[i])
        if len(action) != 1 or next(iter(action)) not in _OPS:
            raise ValueError(f"bulk action line must be one of {_OPS}, got {lines[i]!r}")
        op = next(iter(action))
        meta = action[op]
        if "_id" not in meta:
            raise ValueError("bulk actions need an explicit _id (the reference "
                             "sink always sets one, ElasticsearchSink.java:67)")
        doc_id = int(meta["_id"])
        i += 1
        if op == "delete":
            out.append((op, doc_id, None))
            continue
        if i >= len(lines):
            raise ValueError(f"bulk {op} action missing its source line")
        src = json.loads(lines[i])
        i += 1
        if op == "update":
            if set(src) != {"doc"}:
                raise ValueError("bulk update source must be {'doc': ...} "
                                 "(scripted updates out of subset)")
            src = src["doc"]
        out.append((op, doc_id, src))
    return out


def fold_actions(
    actions: list[tuple[str, int, dict | None]],
) -> dict[int, tuple[str, dict | None]]:
    """Fold an ordered action batch into one final op per id — REPLACE(doc)
    (unconditional upsert), CREATE(doc) (insert-if-absent), PATCH(partial)
    (merge-if-present) or DELETE. Shared by the Spark executor and the SQL
    oracle generator so both engines run the identical program."""
    state: dict[int, tuple[str, dict | None]] = {}
    for op, doc_id, doc in actions:
        if op not in _OPS:
            raise ValueError(f"unknown bulk op {op!r}")
        if doc is not None and any(v is None for v in doc.values()):
            raise ValueError("explicit null values in bulk sources are out of "
                             "the subset (partial merge cannot distinguish "
                             "null-set from not-set)")
        prior = state.get(doc_id)
        if op == "index":
            state[doc_id] = ("REPLACE", dict(doc))
        elif op == "delete":
            state[doc_id] = ("DELETE", None)
        elif op == "update":
            if prior is None:
                state[doc_id] = ("PATCH", dict(doc))
            elif prior[0] == "REPLACE":
                state[doc_id] = ("REPLACE", {**prior[1], **doc})
            elif prior[0] == "CREATE":
                # if the create conflicts (id exists), ES fails it per-item
                # and the update then patches the EXISTING doc — the merged
                # outcome forks on corpus membership, same as create-after-
                # update below; out of the folded subset
                raise ValueError(f"bulk update after create for id {doc_id} "
                                 "forks on corpus membership — out of subset")
            elif prior[0] == "PATCH":
                state[doc_id] = ("PATCH", {**prior[1], **doc})
            else:  # DELETE
                raise ValueError(f"bulk update after delete for id {doc_id} "
                                 "(no document to update) is out of subset")
        elif op == "create":
            if prior is None:
                state[doc_id] = ("CREATE", dict(doc))
            elif prior[0] == "DELETE":
                # delete removed any existing doc, so the create always
                # succeeds: plain upsert
                state[doc_id] = ("REPLACE", dict(doc))
            elif prior[0] in ("REPLACE", "CREATE"):
                pass  # per-action conflict inside the batch: keep prior
            else:  # PATCH
                raise ValueError(f"bulk create after update for id {doc_id} "
                                 "forks on corpus membership — out of subset")
    return state


def _check_fields(folded: dict[int, tuple[str, dict | None]], columns: list[str],
                  id_col: str) -> None:
    for doc_id, (kind, doc) in folded.items():
        if doc is None:
            continue
        unknown = sorted(set(doc) - set(columns) - {id_col})
        if unknown:
            raise ValueError(f"bulk source for id {doc_id} has fields {unknown} "
                             f"outside the corpus schema {columns}")


def apply_bulk(
    docs: DataFrame,
    actions: list[tuple[str, int, dict | None]],
    id_col: str = "doc_id",
    missing: str = "skip",
    conflict: str = "skip",
) -> DataFrame:
    """Apply a folded bulk batch to the corpus; returns the resulting corpus
    (same schema), id-ascending. See the module docstring for semantics.

    ``missing``/``conflict`` = ``skip`` (per-action failure drops the
    action, deterministic and SQL-expressible) or ``error`` (raise like the
    reference sink's ``hasFailures()`` escalation — costs one bounded
    id-IN-list existence probe, batch-sized, like the ES coordinator's
    per-item responses)."""
    if missing not in ("skip", "error") or conflict not in ("skip", "error"):
        raise ValueError("missing/conflict must be 'skip' or 'error'")
    folded = fold_actions(actions)
    cols = [c for c in docs.columns]
    other = [c for c in cols if c != id_col]
    _check_fields(folded, cols, id_col)
    spark = docs.sparkSession

    patch = {i: d for i, (k, d) in folded.items() if k == "PATCH"}
    replace = {i: d for i, (k, d) in folded.items() if k == "REPLACE"}
    create = {i: d for i, (k, d) in folded.items() if k == "CREATE"}
    delete = [i for i, (k, _) in folded.items() if k == "DELETE"]
    for i, d in [*replace.items(), *create.items()]:
        miss = sorted(set(other) - set(d))
        if miss:
            raise ValueError(f"bulk full doc for id {i} missing corpus fields "
                             f"{miss} (fixed-schema corpus: supply every column)")

    # one batch-sized id-IN existence probe (Parquet row-group pruned — the
    # ES coordinator's per-item responses): resolves create conflicts in BOTH
    # modes (the insert-if-absent join must never broadcast the corpus side)
    # and update-on-missing failures in error mode
    probe_ids = sorted({*create, *(patch if missing == "error" else ())})
    existing = {
        r[0] for r in docs.where(F.col(id_col).isin(probe_ids))
        .select(id_col).collect()
    } if probe_ids else set()
    if missing == "error":
        miss_ids = sorted(set(patch) - existing)
        if miss_ids:
            raise ValueError(f"bulk update on missing ids {miss_ids}")
    conf_ids = sorted(set(create) & existing)
    if conflict == "error" and conf_ids:
        raise ValueError(f"bulk create conflicts on existing ids {conf_ids}")
    create = {i: d for i, d in create.items() if i not in existing}

    base = docs
    removed = sorted({*replace, *delete})
    if removed:
        base = base.where(~F.col(id_col).isin(removed))
    if patch:
        # one broadcast LEFT JOIN: NULL patch column = field not set
        rows = [tuple([i] + [d.get(c) for c in other]) for i, d in sorted(patch.items())]
        ptypes = ", ".join(f"`{c}` {t}" for c, t in
                           zip([id_col] + other,
                               [f.dataType.simpleString() for f in
                                [docs.schema[id_col]] + [docs.schema[c] for c in other]]))
        pdf = spark.createDataFrame(rows, ptypes)
        pdf = pdf.select(F.col(id_col).alias("__pid"),
                         *[F.col(c).alias(f"__p_{c}") for c in other])
        base = (
            base.join(F.broadcast(pdf), base[id_col] == pdf["__pid"], "left")
            .select(F.col(id_col),
                    *[F.coalesce(F.col(f"__p_{c}"), F.col(c)).alias(c) for c in other])
        )
    inserts = []
    if replace:
        inserts += [tuple([i] + [d[c] for c in other]) for i, d in sorted(replace.items())]
    new_df = None
    if inserts:
        new_df = spark.createDataFrame(inserts, docs.select(id_col, *other).schema)
    if create:
        # insert-if-absent vs the ORIGINAL corpus (ES create conflicts
        # against the live index; an in-batch index/delete already owns the
        # id in the fold, so a surviving CREATE has no in-batch prior and
        # the original corpus IS the live state). Conflicts were resolved by
        # the batch-sized probe above — never by broadcasting the corpus.
        crows = [tuple([i] + [d[c] for c in other]) for i, d in sorted(create.items())]
        cdf = spark.createDataFrame(crows, docs.select(id_col, *other).schema)
        new_df = cdf if new_df is None else new_df.unionByName(cdf)
    base = base.select(id_col, *other)
    if new_df is not None:
        base = base.unionByName(new_df)
    return base.orderBy(id_col)


def _sql_lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def apply_bulk_sql(
    actions: list[tuple[str, int, dict | None]],
    columns: list[str],
    id_col: str = "doc_id",
    table: str = "documents",
    order_by: bool = True,
) -> str:
    """DuckDB oracle for :func:`apply_bulk` (``skip`` mode — the
    deterministic, SQL-expressible per-action-failure semantics): the SAME
    :func:`fold_actions` program rendered as VALUES CTEs + one LEFT JOIN +
    UNION ALL. ``order_by=False`` yields a subquery-composable form (e.g.
    ``bm25_topk_sql(table=f"({sql})")`` scores the post-bulk corpus)."""
    folded = fold_actions(actions)
    other = [c for c in columns if c != id_col]
    _check_fields(folded, columns, id_col)
    patch = {i: d for i, (k, d) in folded.items() if k == "PATCH"}
    replace = {i: d for i, (k, d) in folded.items() if k == "REPLACE"}
    create = {i: d for i, (k, d) in folded.items() if k == "CREATE"}
    delete = [i for i, (k, _) in folded.items() if k == "DELETE"]
    for i, d in [*replace.items(), *create.items()]:
        miss = sorted(set(other) - set(d))
        if miss:
            raise ValueError(f"bulk full doc for id {i} missing corpus fields "
                             f"{miss} (fixed-schema corpus: supply every column)")

    removed = sorted({*replace, *delete})
    base_where = f"WHERE {id_col} NOT IN ({', '.join(map(str, removed))})" if removed else ""
    parts = []
    if patch:
        vals = ", ".join(
            "(" + ", ".join([str(i)] + [_sql_lit(d.get(c)) for c in other]) + ")"
            for i, d in sorted(patch.items())
        )
        sel = ", ".join(f"coalesce(p.{c}, b.{c}) AS {c}" for c in other)
        parts.append(
            f"SELECT b.{id_col}, {sel} FROM (SELECT * FROM {table} {base_where}) b "
            f"LEFT JOIN (VALUES {vals}) p({id_col}, {', '.join(other)}) "
            f"ON b.{id_col} = p.{id_col}"
        )
    else:
        parts.append(f"SELECT {id_col}, {', '.join(other)} FROM {table} {base_where}")
    if replace:
        vals = ", ".join(
            "(" + ", ".join([str(i)] + [_sql_lit(d[c]) for c in other]) + ")"
            for i, d in sorted(replace.items())
        )
        parts.append(f"SELECT * FROM (VALUES {vals}) r({id_col}, {', '.join(other)})")
    if create:
        vals = ", ".join(
            "(" + ", ".join([str(i)] + [_sql_lit(d[c]) for c in other]) + ")"
            for i, d in sorted(create.items())
        )
        parts.append(
            f"SELECT * FROM (VALUES {vals}) c({id_col}, {', '.join(other)}) "
            f"WHERE c.{id_col} NOT IN (SELECT {id_col} FROM {table})"
        )
    sql = " UNION ALL ".join(f"({p})" for p in parts)
    if order_by:
        sql = f"SELECT * FROM ({sql}) ORDER BY {id_col}"
    return sql
