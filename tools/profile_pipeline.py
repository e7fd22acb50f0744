"""Per-phase wall-clock profile of the webpages→index pipeline at a given
parallelism — finds the serial fraction that caps scaling efficiency.

    spark-submit --master local[32] --driver-memory 16g --py-files dist/fts_pkg.zip \
        tools/profile_pipeline.py --data-dir /tmp/webpages_200k --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-shards", type=int, default=16)
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.plans.build_index import (
        assign_doc_ids,
        build_segments,
        token_occurrences,
    )
    from flume_elasticsearch_2_spark.plans.pipeline import prepare_webpages

    t_boot = time.time()
    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"fts-profile-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(args.cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    phases: dict[str, float] = {"session_boot": time.time() - t_boot}

    def mark(name: str, t0: float) -> float:
        phases[name] = round(time.time() - t0, 3)
        return time.time()

    pages = spark.read.parquet(args.data_dir)
    t = time.time()
    n_raw = pages.count()
    t = mark("count_raw", t)

    prepared = prepare_webpages(pages).persist(StorageLevel.MEMORY_AND_DISK)
    with_ids = assign_doc_ids(prepared, orig_col="url").persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = with_ids.count()
    prepared.unpersist()
    t = mark("prepare_dedup_ids_persist", t)

    occ, dl = token_occurrences(with_ids, id_col="doc_id", text_col="text")
    dl_m = dl.persist(StorageLevel.MEMORY_AND_DISK)
    stats = dl_m.agg(
        F.count("*").alias("n"), F.avg("dl").alias("a"), F.max("doc_id").alias("m")
    ).collect()[0]
    t = mark("tokenize_dl_stats", t)

    idx_dir = os.path.join(tempfile.mkdtemp(prefix=f"fts_prof_{args.cores}_"), "idx")
    orig = with_ids.select("doc_id", F.col("url").alias("orig_id"))
    manifest = build_segments(spark, occ, dl_m, idx_dir, args.n_shards, orig_ids=orig, occurrences=True)
    t = mark("build_segments_total", t)

    phases["n_raw"] = n_raw
    phases["n_docs"] = n_docs
    phases["manifest_wall"] = manifest["built_wall_s"]
    print(json.dumps({"cores": args.cores, "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
