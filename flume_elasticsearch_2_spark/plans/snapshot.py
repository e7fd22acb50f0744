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

_REQUIRED = ("manifest.json", "docs", "postings", "terms")


def _check_index_dir(d: str) -> dict:
    """A directory is a valid snapshot source/target state iff the commit
    point and every section it gates are present."""
    for part in _REQUIRED:
        if not os.path.exists(os.path.join(d, part)):
            raise ValueError(f"{d!r} is not a committed index (missing {part})")
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
    os.rename(tmp, snapshot_dir)
    return manifest


def restore_index(snapshot_dir: str, index_dir: str, overwrite: bool = False) -> dict:
    """Restore a snapshot into ``index_dir`` behind an atomic rename.
    Refuses to clobber an existing index unless ``overwrite=True`` (the ES
    restore-onto-existing-index refusal). Returns the restored manifest."""
    manifest = _check_index_dir(snapshot_dir)
    if os.path.exists(index_dir):
        if not overwrite:
            raise ValueError(
                f"restore target {index_dir!r} exists (pass overwrite=True)"
            )
    tmp = index_dir + ".restore-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(snapshot_dir, tmp)
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.rename(tmp, index_dir)
    return manifest
