"""Segment-generation merge (SURVEY.md §2.4 I5): the Lucene/ES background
segment merge rebuilt as one Spark job.

The reference delegates flush-then-merge to ES (delegation site
/root/reference/elasticsearch-sink/.../ElasticsearchSink.java:66-67; Lucene
4.7 TieredMergePolicy semantics). Here an index *generation* is a committed
index directory (manifest-gated, I7); merging generations built over the
SAME doc-id space and sharding config (``n_shards``, ``id_space`` — pin the
latter via ``build_index(..., id_space=...)``) is:

    read postings of every generation
      -> decode each term's blocks back to a packed run (NumPy, no Python
         loops per posting)
      -> shuffle runs by (shard, term)      [the only exchange]
      -> run-merge encoder (same kernel as the partial-postings build)
      -> write merged segments + union'd docs + recomputed terms + manifest

Doc ids must be disjoint across generations (they are, when generations
come from disjoint input chunks of one id space — the streaming/chunked
ingest contract). Identical query results to a single-shot build over the
union corpus, by test.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import BLOCK_SIZE, svb_decode
from .build_index import (
    PARTIAL_SCHEMA,
    POSTINGS_SCHEMA,
    _make_run_merge_encoder,
    shard_start,
)


def _decode_to_runs(id_space: int, n_shards: int):
    """mapInPandas body: committed postings rows -> packed runs
    (shard, term, run_min, ids, tfs) with shard-local absolute uint32 ids."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                deltas = svb_decode(row.doc_bytes, n).astype(np.uint64)
                ids = np.cumsum(deltas).astype(np.uint32)  # local absolute
                tfs = svb_decode(row.tf_bytes, n)
                base = shard_start(int(row.shard), id_space, n_shards)
                rows.append(
                    (
                        int(row.shard),
                        row.term,
                        int(row.block_first_doc[0]) if len(row.block_first_doc) else base,
                        ids.tobytes(),
                        tfs.tobytes(),
                    )
                )
            yield pd.DataFrame(rows, columns=["shard", "term", "run_min", "ids", "tfs"])

    return decode


def merge_indexes(
    spark: SparkSession, index_dirs: list[str], out_dir: str
) -> dict[str, Any]:
    """Merge committed index generations into one index at ``out_dir``."""
    t0 = time.time()
    manifests = []
    for d in index_dirs:
        with open(os.path.join(d, "manifest.json")) as fh:
            manifests.append(json.load(fh))
    n_shards = {int(m["n_shards"]) for m in manifests}
    id_spaces = {int(m["id_space"]) for m in manifests}
    if len(n_shards) != 1 or len(id_spaces) != 1:
        raise ValueError(
            "generations must share n_shards and id_space to merge per (shard, term); "
            f"got n_shards={sorted(n_shards)} id_space={sorted(id_spaces)} — "
            "pin id_space at build time (build_index(..., id_space=...))"
        )
    n_shards_v, id_space = n_shards.pop(), id_spaces.pop()

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)

    # --- docs: union (disjoint ids by contract) ----------------------------
    docs = spark.read.parquet(f"{index_dirs[0]}/docs")
    for d in index_dirs[1:]:
        docs = docs.unionByName(
            spark.read.parquet(f"{d}/docs"), allowMissingColumns=True
        )
    docs = docs.persist()
    stats = docs.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["a"])
    docs.repartition(n_shards_v, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{tmp}/docs")
    docs.unpersist()

    # --- postings: decode to runs, one (shard, term) exchange, re-encode ---
    postings = spark.read.parquet(f"{index_dirs[0]}/postings")
    for d in index_dirs[1:]:
        postings = postings.unionByName(spark.read.parquet(f"{d}/postings"))
    nparts = max(n_shards_v, 2 * spark.sparkContext.defaultParallelism)
    merged = (
        postings.mapInPandas(_decode_to_runs(id_space, n_shards_v), PARTIAL_SCHEMA)
        .repartition(nparts, "shard", "term")
        .sortWithinPartitions("shard", "term", "run_min")
        .withColumn("term", F.concat_ws("\x00", F.col("shard").cast("string"), F.col("term")))
        .select("term", "run_min", "ids", "tfs")
        .mapInPandas(_make_run_merge_encoder(id_space, n_shards_v), POSTINGS_SCHEMA)
        .withColumn("split", F.split("term", "\x00", 2))
        .select(
            F.element_at("split", 1).cast("int").alias("shard"),
            F.element_at("split", 2).alias("term"),
            "n",
            "cf",
            "doc_bytes",
            "tf_bytes",
            "block_first_doc",
            "block_last_doc",
            "block_max_tf",
        )
    )
    (
        merged.repartition(n_shards_v, "shard")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{tmp}/postings")
    )

    terms_df = (
        spark.read.parquet(f"{tmp}/postings")
        .groupBy("term")
        .agg(F.sum("n").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
    )
    terms_df.coalesce(max(1, n_shards_v // 4)).write.mode("overwrite").parquet(f"{tmp}/terms")

    manifest = {
        "format_version": 1,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "id_space": id_space,
        "n_shards": n_shards_v,
        "block_size": BLOCK_SIZE,
        "merged_generations": len(index_dirs),
        "built_wall_s": round(time.time() - t0, 3),
    }
    with open(f"{tmp}/manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return manifest
