"""Query-THROUGHPUT scaling evidence: search_many over a large generated
query set at a given parallelism; one JSON line per run.

Complements tools/scaling_bench.py (index-build throughput N vs 4N) on the
query side of the north_rule metric: the same batched scatter/gather job —
same index, same query set — run at two parallelism levels gives
queries/sec at both and the N→4N scaling efficiency.

    python tools/query_throughput_bench.py --index-dir /tmp/qidx --build \
        --sf-dir /root/testdata/sf0.1 --n-shards 32 --cores 8
    python tools/query_throughput_bench.py --index-dir /tmp/qidx --cores 32

The query set is generated deterministically from the index's own term
dictionary (seeded; mixes hot/mid/rare df bands, 1-3 terms, OR and AND), so
runs are comparable without external fixtures. Scoring work per shard task
scales with n_queries; n_shards bounds task parallelism, so use
n_shards >= the largest core count under test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_queries(index_dir: str, n_queries: int, seed: int = 7) -> dict[str, tuple[str, str]]:
    """Deterministic query set from the terms table: df-banded sampling."""
    import numpy as np
    import pyarrow.dataset as pads

    tbl = (
        pads.dataset(f"{index_dir}/terms", format="parquet")
        .to_table(columns=["term", "df"])
        .to_pandas()
        .groupby("term", as_index=False)["df"]
        .sum()
        .sort_values(["df", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    n = len(tbl)
    hot = tbl.iloc[: max(1, n // 20)]["term"].tolist()
    mid = tbl.iloc[n // 20 : n // 2]["term"].tolist()
    rare = tbl.iloc[n // 2 :]["term"].tolist()
    pools = [p for p in (hot, mid, rare) if p]  # tiny dictionaries: skip empty bands
    rng = np.random.RandomState(seed)
    out: dict[str, tuple[str, str]] = {}
    for i in range(n_queries):
        n_terms = int(rng.randint(1, 4))
        pool = pools[int(rng.randint(0, len(pools)))]
        terms = [pool[int(rng.randint(0, len(pool)))] for _ in range(n_terms)]
        mode = "and" if (n_terms > 1 and rng.rand() < 0.3) else "or"
        out[f"q{i:04d}"] = (" ".join(terms), mode)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--n-queries", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--build", action="store_true", help="(re)build the index first")
    args = ap.parse_args()

    from flume_elasticsearch_2_spark.plans.build_index import build_index
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
    from flume_elasticsearch_2_spark.session import get_spark

    spark = get_spark(
        app_name=f"query-scaling-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.build:
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        build_index(spark, docs, args.index_dir, n_shards=args.n_shards)

    queries = gen_queries(args.index_dir, args.n_queries)
    searcher = IndexSearcher(spark, args.index_dir)
    searcher.search_many(dict(list(queries.items())[:8]), k=10).collect()  # warmup

    times = []
    n_rows = 0
    for _ in range(args.reps):
        t0 = time.time()
        n_rows = len(searcher.search_many(queries, k=10).collect())
        times.append(time.time() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "metric": "query_throughput_qps",
                "value": round(args.n_queries / best, 2),
                "unit": "queries/sec",
                "cores": args.cores,
                "n_queries": args.n_queries,
                "n_shards": args.n_shards,
                "best_s": round(best, 3),
                "all_s": [round(t, 3) for t in times],
                "result_rows": n_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
