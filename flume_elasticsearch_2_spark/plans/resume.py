"""Chunked, resumable index build (SURVEY.md §7 step 5, FIXTURES.md §5).

Two-stage pipeline:

* **Stage 1 (expensive, checkpointed):** input files are grouped into
  deterministic chunks (sorted path order). Per not-yet-done chunk:
  read → assign deterministic doc ids (chunk-offset + keyed local order) →
  tokenize → write ``tf`` (doc_id, term, tf) and ``docmeta`` (doc_id, key,
  order col, dl) Parquet under ``work_dir/…/chunk=<id>`` → commit a lineage
  record. A killed job redoes at most one chunk; completed chunks are never
  re-tokenized (verified by a tokenize accumulator in tests).
* **Stage 2 (idempotent):** read all staged chunks, optionally apply
  last-write-wins dedup by key (the ES ``setId(IR_SID)`` upsert semantics,
  /root/reference/elasticsearch-sink/.../ElasticsearchSink.java:67), then
  ``build_segments`` → atomic manifest commit.

At 10^12-doc scale stage 1 is the CPU-bound part (tokenization) and runs
once per chunk ever; stage 2 is shuffle-bound and restartable wholesale.
Doc-id determinism: chunk offsets come from lineage-recorded doc counts in
chunk order, local ids from range-partitioned keyed row_number — the same
corpus yields the same ids at any parallelism (tested).
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build_index import assign_doc_ids, build_segments, term_frequencies
from .lineage import LineageLog


def plan_chunks(input_dir: str, files_per_chunk: int = 8) -> list[dict[str, Any]]:
    """Deterministic chunk plan over a parquet directory."""
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    chunks = []
    for i in range(0, len(files), files_per_chunk):
        group = files[i : i + files_per_chunk]
        fp = ";".join(
            f"{os.path.basename(p)}:{os.path.getsize(p)}:{os.stat(p).st_mtime_ns}"
            for p in group
        )  # size+mtime: an in-place same-size rewrite must invalidate (§8.6)
        chunks.append({"chunk_id": f"{i // files_per_chunk:05d}", "files": group, "fingerprint": fp})
    return chunks


def build_index_chunked(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    work_dir: str,
    key_col: str = "url",
    order_col: str = "warc_ts",
    text_col: str = "text",
    n_shards: int = 8,
    files_per_chunk: int = 8,
    dedup: bool = True,
    fail_after_chunks: int | None = None,
    tokenize_counter=None,
) -> dict[str, Any]:
    """Resumable build. ``fail_after_chunks``/``tokenize_counter`` are test
    hooks (injected failure; accumulator counting tokenized docs)."""
    log = LineageLog(os.path.join(work_dir, "lineage"))
    chunks = plan_chunks(input_dir, files_per_chunk)
    existing = log.load()

    offset = 0
    n_processed = 0
    for ch in chunks:
        cid, fp = ch["chunk_id"], ch["fingerprint"]
        rec = existing.get(cid)
        # staged output is reusable only if the content fingerprint AND the
        # id-space offset both match: when an earlier chunk's doc count
        # changes, every later chunk's ids shift, so its staged tf/docmeta
        # (built under the old prefix sum) would collide — rebuild it
        if rec and rec.get("fingerprint") == fp and int(rec.get("offset", -1)) == offset:
            offset += int(rec["n_docs"])  # committed: reuse staged output
            continue
        t0 = time.time()
        raw = spark.read.parquet(*ch["files"])
        if tokenize_counter is not None:
            cnt = tokenize_counter

            def bump(df: DataFrame) -> DataFrame:
                @F.udf("long")
                def _tick(x):
                    cnt.add(1)
                    return x

                return df.withColumn("_t", _tick(F.monotonically_increasing_id())).drop("_t")

            raw = bump(raw)
        with_ids = assign_doc_ids(raw, orig_col=key_col, tie_cols=[order_col]).withColumn(
            "doc_id", F.col("doc_id") + F.lit(offset)
        )
        with_ids = with_ids.persist()
        n_docs = with_ids.count()
        tf, dl = term_frequencies(with_ids, id_col="doc_id", text_col=text_col)
        tf.write.mode("overwrite").parquet(f"{work_dir}/tf/chunk={cid}")
        meta = with_ids.select(
            "doc_id", F.col(key_col).alias("key"), F.col(order_col).alias("ord")
        ).join(dl, "doc_id")
        meta.write.mode("overwrite").parquet(f"{work_dir}/docmeta/chunk={cid}")
        n_postings = spark.read.parquet(f"{work_dir}/tf/chunk={cid}").count()
        with_ids.unpersist()
        log.commit(
            cid,
            fingerprint=fp,
            offset=offset,
            n_docs=n_docs,
            n_postings=n_postings,
            wall_ms=int((time.time() - t0) * 1000),
        )
        offset += n_docs
        n_processed += 1
        if fail_after_chunks is not None and n_processed >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {n_processed} chunks")

    # ---- stage 2: global dedup + segment build (idempotent) ---------------
    # read ONLY the planned chunks: stale chunk=<id> dirs from a previous
    # run with a different plan must not leak ghost documents into the index
    tf = spark.read.parquet(*[f"{work_dir}/tf/chunk={c['chunk_id']}" for c in chunks])
    meta = spark.read.parquet(
        *[f"{work_dir}/docmeta/chunk={c['chunk_id']}" for c in chunks]
    )
    if dedup:
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy(F.col("ord").desc(), F.col("doc_id").desc())
        winners = (
            meta.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        )
        tf = tf.join(winners.select("doc_id"), "doc_id", "left_semi")
    else:
        winners = meta
    dl_df = winners.select("doc_id", "dl")
    orig = winners.select("doc_id", F.col("key").alias("orig_id"))
    manifest = build_segments(spark, tf, dl_df, index_dir, n_shards, orig_ids=orig)
    manifest["chunks"] = len(chunks)
    return manifest
