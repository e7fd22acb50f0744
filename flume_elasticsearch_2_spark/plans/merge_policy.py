"""Tiered merge scheduling (SURVEY.md §2.4 I5): WHICH generations to merge.

``plans/merge.py`` gives the mechanism (k-way generation merge with
tombstones); this module gives the policy — a Lucene-4.7
TieredMergePolicy-style selector (the policy the reference's ES deployment
ran under the hood at its delegation site,
/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66) so a
continuously-ingesting pipeline keeps a bounded generation count without
merging everything after every micro-batch:

* generations are bucketed into TIERS by size: tier = floor(log_B(docs /
  floor_docs)), i.e. each tier spans a B-fold size range;
* a tier holding more than ``segs_per_tier`` generations triggers ONE merge
  of its ``max_merge_at_once`` smallest members (merging small generations
  first maximizes write-amortization, exactly Lucene's preference);
* merged output lands in a higher tier, so total write amplification is
  O(log_B(corpus / floor)) per doc — the Lucene/LSM argument.

Pure functions + a thin driver loop over ``merge_indexes``; policy decisions
are unit-tested without Spark.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any

from pyspark.sql import SparkSession

from .merge import merge_indexes


def generation_sizes(gen_dirs: list[str]) -> dict[str, int]:
    """doc count per generation directory (from each committed manifest)."""
    out = {}
    for d in gen_dirs:
        with open(os.path.join(d, "manifest.json")) as fh:
            out[d] = int(json.load(fh)["n_docs"])
    return out


def plan_merges(
    gen_docs: dict[str, int],
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    floor_docs: int = 1000,
    tier_base: float = 10.0,
) -> list[list[str]]:
    """One round of merge selection: list of merge groups (each a list of
    generation dirs, smallest-first within its tier). Deterministic: ties
    broken by name. Empty list = nothing to do (the steady state)."""
    tiers: dict[int, list[tuple[int, str]]] = {}
    for name, n in gen_docs.items():
        t = 0 if n <= floor_docs else int(math.floor(math.log(n / floor_docs, tier_base))) + 1
        tiers.setdefault(t, []).append((n, name))
    plans: list[list[str]] = []
    for t in sorted(tiers):
        members = sorted(tiers[t])  # by (docs, name): smallest first
        if len(members) > segs_per_tier:
            group = [name for _, name in members[:max_merge_at_once]]
            if len(group) >= 2:
                plans.append(group)
    return plans


def auto_merge(
    spark: SparkSession,
    gen_dirs: list[str],
    out_root: str,
    dedup_key: str | None = None,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    floor_docs: int = 1000,
    tier_base: float = 10.0,
    max_rounds: int = 32,
) -> list[str]:
    """Apply :func:`plan_merges` repeatedly until no tier overflows.

    Returns the surviving generation list (merged outputs replace their
    inputs; input generation dirs are left on disk for the caller to GC
    after queries drain — the Lucene commit-point contract). Merged outputs
    are written under ``out_root/merged_NNNN``.

    Generations must be ordered OLDEST FIRST when ``dedup_key`` is used —
    group members keep that order so newest-wins stays correct."""
    order = {d: i for i, d in enumerate(gen_dirs)}
    live = list(gen_dirs)
    counter = 0
    for _ in range(max_rounds):
        plans = plan_merges(
            generation_sizes(live), segs_per_tier, max_merge_at_once, floor_docs, tier_base
        )
        if not plans:
            return live
        for group in plans:
            group_in_order = sorted(group, key=lambda d: order[d])
            out_dir = os.path.join(out_root, f"merged_{counter:04d}")
            counter += 1
            merge_indexes(spark, group_in_order, out_dir, dedup_key=dedup_key)
            # the merged output inherits the NEWEST member's recency
            order[out_dir] = max(order[d] for d in group)
            live = [d for d in live if d not in group] + [out_dir]
            live.sort(key=lambda d: order[d])
    raise RuntimeError(f"auto_merge did not converge in {max_rounds} rounds")


def optimize(
    spark: SparkSession,
    gen_dirs: list[str],
    out_root: str,
    max_num_segments: int = 1,
    dedup_key: str | None = None,
    only_expunge_deletes: bool = False,
) -> list[str]:
    """ES 1.x ``_optimize`` API (force merge; the admin call 1.x operators
    ran nightly against the reference's ES deployment — delegation site
    ElasticsearchSink.java:54): merge the live generations down to
    ``max_num_segments`` regardless of :func:`plan_merges`' tier thresholds.
    ``max_num_segments=1`` is the classic full optimize.

    Deterministic selection contract (pinned by tests): the LARGEST
    ``max_num_segments - 1`` generations survive untouched (ties broken by
    recency, then name) and every remaining generation merges into ONE new
    generation at ``out_root/optimized_0000`` — Lucene's forceMerge also
    prefers rewriting small segments over large ones, since bytes rewritten
    is the cost that matters. Already at or below the target: no-op, no
    bytes move (ES returns immediately too).

    ``only_expunge_deletes`` REFUSES loudly: this engine reclaims deletions
    eagerly at ``_delete_by_query``/merge time (immutable segments + atomic
    manifest swap), so a committed generation never carries live tombstones
    and there is nothing to expunge — a silent no-op would misreport the
    ES semantics instead of documenting the model difference.

    Input dirs are left on disk for the caller to GC after queries drain
    (the commit-point contract shared with :func:`auto_merge`). Returns the
    surviving generation list ordered oldest-first by original recency.
    """
    if only_expunge_deletes:
        raise ValueError(
            "only_expunge_deletes is meaningless here: deletions are "
            "reclaimed eagerly at delete/merge time, committed generations "
            "never hold live tombstones (see plans/merge.py delete_by_query)"
        )
    if max_num_segments < 1:
        raise ValueError(f"max_num_segments must be >= 1, got {max_num_segments}")
    if len(gen_dirs) <= max_num_segments:
        return list(gen_dirs)
    order = {d: i for i, d in enumerate(gen_dirs)}
    sizes = generation_sizes(gen_dirs)
    # survivors: largest first; ties newest-then-name so selection is stable
    by_size = sorted(gen_dirs, key=lambda d: (-sizes[d], -order[d], d))
    keep = set(by_size[: max_num_segments - 1])
    group = [d for d in gen_dirs if d not in keep]  # oldest-first for dedup_key
    # first free optimized_NNNN: a nightly re-run against the same out_root
    # must not collide with a prior run's output (review finding — the
    # fixed name made night 2 do the whole merge then fail at the commit
    # rename; a prior output may itself be IN gen_dirs this round)
    counter = 0
    while os.path.exists(os.path.join(out_root, f"optimized_{counter:04d}")):
        counter += 1
    out_dir = os.path.join(out_root, f"optimized_{counter:04d}")
    merge_indexes(spark, group, out_dir, dedup_key=dedup_key)
    merged_order = max(order[d] for d in group)
    live = [(order[d], d) for d in keep] + [(merged_order, out_dir)]
    return [d for _, d in sorted(live)]
