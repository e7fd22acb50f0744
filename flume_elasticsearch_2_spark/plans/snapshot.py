"""Index snapshot / restore (SURVEY §2.5 admin surface): the ES
``_snapshot`` lifecycle re-expressed over the engine's immutable segment
directories.

Reference analog: the delegated ES 1.x snapshot/restore API
(ElasticsearchSink.java:54). ES snapshots copy immutable Lucene segment
files plus a commit-point metadata blob; this engine's index directory IS
that shape already (Parquet segments + ``manifest.json`` commit point,
plans/build_index.py), so a snapshot is a verified copy and a restore is
the same copy back behind an atomic rename — queries on a restored index
are bit-identical because the files are.

Scale shape: segment files are immutable after the manifest commit, so the
copy needs no locks and parallelizes per file; on a real deployment the
copy targets object storage (the ES "repository") — here the filesystem
copy stands in, and the CONTRACT (manifest-gated completeness check,
atomic visibility of the restored index, refuse-don't-clobber) is what the
tests pin.
"""

from __future__ import annotations

import json
import os
import shutil

from .fscommit import COMMIT_FS

_SECTIONS = ("docs", "postings", "terms")


def _check_index_dir(d: str) -> dict:
    """A directory is a valid snapshot source/target state iff the commit
    point and every section it gates are present — either the single-field
    layout (docs/postings/terms at top level) or the multi-field layout
    (one complete ``field=<f>/`` subtree per field, build_index.py)."""
    if not os.path.exists(os.path.join(d, "manifest.json")):
        raise ValueError(f"{d!r} is not a committed index (missing manifest.json)")
    field_dirs = sorted(
        os.path.join(d, e) for e in os.listdir(d) if e.startswith("field=")
    )
    roots = field_dirs or [d]
    for root in roots:
        for part in _SECTIONS:
            if not os.path.exists(os.path.join(root, part)):
                raise ValueError(
                    f"{d!r} is not a committed index (missing "
                    f"{os.path.relpath(os.path.join(root, part), d)})"
                )
    with open(os.path.join(d, "manifest.json")) as fh:
        return json.load(fh)


def snapshot_index(index_dir: str, snapshot_dir: str) -> dict:
    """Copy a COMMITTED index to ``snapshot_dir`` (refuses an uncommitted or
    partial source; refuses to clobber an existing snapshot). Returns the
    snapshotted manifest. The copy is staged at ``snapshot_dir + '.tmp'``
    and renamed in, so a killed snapshot never leaves a half snapshot that
    looks restorable."""
    manifest = _check_index_dir(index_dir)
    if os.path.exists(snapshot_dir):
        raise ValueError(f"snapshot target {snapshot_dir!r} already exists")
    tmp = snapshot_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(index_dir, tmp)
    COMMIT_FS.publish(tmp, snapshot_dir)
    return manifest


def restore_index(snapshot_dir: str, index_dir: str, overwrite: bool = False) -> dict:
    """Restore a snapshot into ``index_dir`` behind an atomic rename.
    Refuses to clobber an existing index unless ``overwrite=True`` (the ES
    restore-onto-existing-index refusal). Returns the restored manifest."""
    manifest = _check_index_dir(snapshot_dir)
    if os.path.exists(index_dir) and not overwrite:
        raise ValueError(
            f"restore target {index_dir!r} exists (pass overwrite=True)"
        )
    tmp = index_dir + ".restore-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(snapshot_dir, tmp)
    if os.path.exists(index_dir):
        # a committed index stays visible at EVERY instant: the live dir is
        # renamed aside (atomic), the restored copy renamed in (atomic), and
        # only then is the old copy deleted — a crash anywhere leaves either
        # the old or the new index at `index_dir` (plus at worst a stale
        # .restore-* dir to garbage-collect), never nothing
        old = index_dir + ".restore-old"
        COMMIT_FS.remove(old)
        COMMIT_FS.move(index_dir, old)
        COMMIT_FS.move(tmp, index_dir)
        COMMIT_FS.remove(old)
    else:
        COMMIT_FS.move(tmp, index_dir)
    return manifest


def reindex(
    spark,
    src_index_dir: str,
    dst_index_dir: str,
    n_shards: int,
    doc_filter: tuple | list | None = None,
    store_positions: bool | None = None,
    overwrite: bool = False,
):
    """ES ``_reindex``: rebuild an index FROM another index's stored
    documents (ES reads each doc's ``_source`` — so the source index must
    store the analyzed text, exactly ES's _source-enabled requirement;
    refused loudly otherwise). ``doc_filter`` is the reindex-with-query
    form ((col, op, value) triples, the engine's shared filter dialect);
    ``store_positions`` defaults to the SOURCE index's setting. Returns
    the new manifest.

    Scale shape: one pushdown-filtered scan of the source docs table
    feeding the standard partial-postings build — the source's postings
    are never read (they cannot be: analysis settings may differ), which
    is exactly why ES reindex is a _source replay too."""
    from .build_index import build_segments_partial

    src_manifest = _check_index_dir(src_index_dir)
    if os.path.exists(dst_index_dir) and not overwrite:
        # the build stage would silently rmtree an existing index — enforce
        # the same refuse-don't-clobber contract as restore_index
        raise ValueError(
            f"reindex target {dst_index_dir!r} exists (pass overwrite=True)"
        )
    docs = spark.read.parquet(f"{src_index_dir}/docs")
    if "text" not in docs.columns:
        raise ValueError(
            "reindex needs the source index to store the text field "
            "(build with orig_ids carrying 'text' — the ES _source-enabled "
            "requirement)"
        )
    if doc_filter:
        # a single triple is (str, str, value); anything else is a sequence
        # of triples — classify by shape, not type, so a tuple OF triples
        # does not get misread as one triple
        if (
            isinstance(doc_filter, tuple)
            and len(doc_filter) == 3
            and isinstance(doc_filter[0], str)
        ):
            triples = [doc_filter]
        else:
            triples = list(doc_filter)
        from ..operators.dsl import _filters_col

        docs = docs.where(_filters_col(triples))
    stored_cols = [c for c in docs.columns if c not in ("shard", "dl")]
    docs = docs.select(*stored_cols)
    if store_positions is None:
        store_positions = bool(src_manifest.get("positions"))
    return build_segments_partial(
        spark,
        docs,
        dst_index_dir,
        n_shards=int(n_shards),
        orig_ids=docs,
        id_space=int(src_manifest["id_space"]),
        store_positions=store_positions,
    )
