"""Inverted-index build (SURVEY.md §2.4 I1-I7): the [delegated] ES/Lucene
indexing layer rebuilt Spark-first.

Reference delegation site: /root/reference/elasticsearch-sink/.../
ElasticsearchSink.java:54,66-67,82 (bulk index into ES); semantics per public
Lucene 4.7 docs + IR literature.

Design (scale-first):

* **Doc-range sharding** ("shard" = contiguous doc-id bucket,
  ``shard = doc_id * n_shards // n_docs``). Posting lists are built per
  ``(term, shard)`` group, so the heaviest possible group is bounded by the
  shard's doc count *by construction* — a Zipfian hot stopword can never
  concentrate more than ``n_docs / n_shards`` postings on one reducer. This
  is the skew-handling the north_rule demands (SURVEY §2.4 I4: stopword
  splitting), realized structurally instead of with ad-hoc salt keys, and it
  doubles as ES-style doc sharding for scatter/gather queries (Q6): each
  shard is a self-contained mini-index over its doc range, so query-time
  reassembly of a hot term's postings is an ordered concat across shards.
* **One shuffle** for the whole build: ``groupBy(term) → (doc_id, tf)`` rows
  are shuffled once by ``(term, shard)``; doc lengths / stats / term stats
  ride the same aggregation tree (partial map-side combine).
* **Compression** inside ``mapInPandas``: per (term, shard) the sorted doc
  ids are delta + Stream-VByte encoded (codec.py, vectorized NumPy) with
  per-128-doc block-max metadata for BMW pruning (I3).
* **Segment layout** (all Parquet; atomic commit via manifest.json last, I7):

      index_dir/
        manifest.json                 # commit point: config + stats + paths
        docs/         doc_id, orig_id, dl, shard      (partitioned by shard)
        terms/        term, df, cf                     (global term stats)
        postings/     shard=K/ term, n, doc_bytes, tf_bytes,
                      block_first_doc[], block_last_doc[], block_max_tf[]
                      (sorted by term within each file → row-group pruning
                       for `term IN (...)` predicate pushdown)
        lineage/      chunk_id, fingerprint, status, n_docs, wall_ms ...

* **Chunked tokenize + lineage resume** (S4 intended semantics, fixing
  reference bugs §8.1/8.5: the reference checkpoints only at stop() and
  never advances its file pointer): see ``lineage.py`` /
  ``build_index_chunked`` — the expensive tokenize+tf stage is persisted per
  input chunk with a lineage record written after each chunk's durable
  write; a restarted build skips ``status=done`` chunks.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import BLOCK_SIZE, encode_postings
from ..functions.tokenizer import tokens_col

POSTINGS_SCHEMA = (
    "term string, n long, cf long, doc_bytes binary, tf_bytes binary, "
    "block_first_doc array<long>, block_last_doc array<long>, block_max_tf array<int>"
)


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) + (doc_id, dl) in one pass over the tokens.

    Returns (tf_df, dl_df). Token explosion and the (doc_id, term) count are
    all JVM-side; the count benefits from partial aggregation before the
    shuffle (map-side combine), which is what keeps a Zipfian corpus from
    shuffling one row per token occurrence.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), tokens_col(text_col).alias("toks")
    )
    dl = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    return tf, dl


def shard_start(shard: int, id_space: int, n_shards: int) -> int:
    """First doc id belonging to ``shard`` under range sharding
    ``shard = doc_id * n_shards // id_space`` (ceil division)."""
    return -(-shard * id_space // n_shards)


def _make_encode_partition(id_space: int, n_shards: int):
    """mapInPandas body factory: partition is hash-partitioned by
    (shard, term) and sorted by (shard, term, doc_id); encode each group's
    postings. Doc ids are stored SHARD-LOCAL (minus shard_start) so the
    uint32 codec holds as long as a single shard stays under 2^32 docs —
    the global id space can be arbitrarily large (10^12 target).

    Single pass, no per-group Spark overhead; carries incomplete trailing
    groups across Arrow batches so group boundaries never split.
    """

    def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(pdf)]])
        rows: list[dict[str, Any]] = []
        for s, e in zip(starts, ends):
            key = terms[s]
            shard = int(key.split("\x00", 1)[0])
            base = shard_start(shard, id_space, n_shards)
            ids = doc_ids[s:e]
            local = (ids - base).astype(np.uint32)
            fs = tfs[s:e].astype(np.uint32)
            enc = encode_postings(local, fs)
            rows.append(
                {
                    "term": key,
                    "n": int(enc.n),
                    "cf": int(fs.sum()),
                    "doc_bytes": enc.doc_bytes,
                    "tf_bytes": enc.tf_bytes,
                    "block_first_doc": (enc.block_first_doc + base).tolist(),
                    "block_last_doc": (enc.block_last_doc + base).tolist(),
                    "block_max_tf": enc.block_max_tf.tolist(),
                }
            )
        return pd.DataFrame(rows)

    def _encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # hold back the final group — it may continue in the next batch
            last_term = pdf["term"].iloc[-1]
            tail_mask = pdf["term"].to_numpy() == last_term
            first_tail = len(pdf) - int(
                tail_mask[::-1].argmin() if not tail_mask.all() else len(pdf)
            )
            carry = pdf.iloc[first_tail:].reset_index(drop=True)
            head = pdf.iloc[:first_tail]
            if len(head):
                yield _encode_groups(head)
        if carry is not None and len(carry):
            yield _encode_groups(carry)

    return _encode_partition


def build_segments(
    spark: SparkSession,
    tf: DataFrame,
    dl: DataFrame,
    index_dir: str,
    n_shards: int,
    orig_ids: DataFrame | None = None,
) -> dict[str, Any]:
    """Shuffle tf rows by (shard, term), encode posting lists, write segments.

    ``tf``: (doc_id, term, tf); ``dl``: (doc_id, dl); ``orig_ids`` optional
    (doc_id, orig_id) mapping for fetch-phase display.
    """
    t0 = time.time()
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)

    # tf/dl are usually lazy views over the tokenizer — without a persist the
    # tokenize+explode+count pipeline would re-run for every consumer below
    # (stats, docs write, postings encode). MEMORY_AND_DISK keeps a 10^12-doc
    # build from OOMing; the chunked build (resume.py) stages tf to Parquet
    # instead, which is the preferred shape at full scale.
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dl = dl.persist(StorageLevel.MEMORY_AND_DISK)

    stats_row = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"), F.max("doc_id").alias("max_doc_id")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])
    id_space = int(stats_row["max_doc_id"]) + 1
    shard_expr = (F.col("doc_id") * n_shards / F.lit(id_space)).cast("int").alias("shard")

    docs_out = dl.select("doc_id", "dl", shard_expr)
    if orig_ids is not None:
        docs_out = docs_out.join(orig_ids, "doc_id")
    docs_out.repartition(n_shards, "shard").write.mode("overwrite").partitionBy("shard").parquet(
        f"{tmp}/docs"
    )

    # the one big shuffle: (shard, term) — doc-range sharding bounds group size
    sharded = tf.withColumn("shard", (F.col("doc_id") * n_shards / F.lit(id_space)).cast("int"))
    nparts = max(n_shards, spark.sparkContext.defaultParallelism)
    encoded = (
        sharded.repartition(nparts, "shard", "term")
        .sortWithinPartitions("shard", "term", "doc_id")
        .withColumn("term", F.concat_ws("\x00", F.col("shard").cast("string"), F.col("term")))
        .select("term", "doc_id", "tf")
        .mapInPandas(_make_encode_partition(id_space, n_shards), POSTINGS_SCHEMA)
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
        encoded.repartition(n_shards, "shard")
        .sortWithinPartitions("term")  # row-group min/max stats prune `term IN`
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{tmp}/postings")
    )

    # global term stats (df, cf) from a column-pruned read-back of the
    # postings metadata (term, n, cf only — the binary columns are never
    # touched): per-(term, shard) n sums to df. Avoids a second full
    # aggregation pass over tf.
    terms_df = (
        spark.read.parquet(f"{tmp}/postings")
        .groupBy("term")
        .agg(F.sum("n").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
    )
    terms_df.coalesce(max(1, n_shards // 4)).write.mode("overwrite").parquet(f"{tmp}/terms")
    tf.unpersist()
    dl.unpersist()

    manifest = {
        "format_version": 1,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "id_space": id_space,
        "n_shards": n_shards,
        "block_size": BLOCK_SIZE,
        "built_wall_s": round(time.time() - t0, 3),
    }
    with open(f"{tmp}/manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    # atomic-ish commit: manifest written last inside tmp, then dir rename
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.rename(tmp, index_dir)
    return manifest


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    docs_per_shard: int = 1_000_000,
) -> dict[str, Any]:
    """End-to-end single-shot build from a document DataFrame.

    ``n_shards`` defaults to ``ceil(n_docs / docs_per_shard)`` clamped to at
    least the session's default parallelism / 4 — at 10^12 docs that yields
    ~10^6 shards of ~1M docs; in the sandbox, a handful.
    """
    if n_shards is None:
        n = docs.count()
        n_shards = max(4, min(spark.sparkContext.defaultParallelism, math.ceil(n / docs_per_shard)))
    tf, dl = term_frequencies(docs, id_col=id_col, text_col=text_col)
    return build_segments(spark, tf, dl, index_dir, n_shards)


def assign_doc_ids(
    docs: DataFrame, orig_col: str = "url", n_parts: int | None = None
) -> DataFrame:
    """Deterministic dense doc_id for keyed corpora (SURVEY §1.3).

    Range-partition by the original key, sort within partitions, then
    ``partition offset + local row_number`` (zipWithIndex-style, two narrow
    jobs + one tiny collect) — no global sort, deterministic for a given
    key set regardless of input partitioning.
    """
    from pyspark.sql.window import Window

    n_parts = n_parts or docs.sparkSession.sparkContext.defaultParallelism
    parted = docs.repartitionByRange(n_parts, F.col(orig_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = {r["_pid"]: r["c"] for r in parted.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = parted.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(orig_col)
    return (
        parted.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_pid", "_off")
    )
