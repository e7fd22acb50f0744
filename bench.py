"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Covers the engine's pillars: index build throughput (docs/sec), segment
BM25 query latency (p50/p95 over the fixed query set), the declarative
BM25 path, dedup (MinHash LSH + exact Jaccard), and similarity search.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from flume_elasticsearch_2_spark.queryset import QUERY_SET  # noqa: E402


def main() -> None:
    import tempfile

    from flume_elasticsearch_2_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from flume_elasticsearch_2_spark.operators.similarity import cosine_topk
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk
    from flume_elasticsearch_2_spark.plans.build_index import build_index
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher
    from flume_elasticsearch_2_spark.session import get_spark

    spark = get_spark(app_name="fts-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    docs.cache().count()
    # warm the Python workers + Arrow path before the first timed build —
    # the same warm-JVM protocol the scaling bench documents (BENCH.md
    # "Protocol"): a long-lived cluster job runs in steady state, and the
    # one-time worker spawn/JIT otherwise lands entirely on index_build
    docs.limit(100).mapInPandas(lambda it: it, docs.schema).count()
    timings: dict[str, float] = {}
    t_all = time.time()

    # 1. index build
    idx_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "idx")
    t0 = time.time()
    build_index(spark, docs, idx_dir, n_shards=max(4, int(CPUS) // 4))
    timings["index_build"] = time.time() - t0
    timings["index_docs_per_sec"] = round(n_docs / timings["index_build"], 2)

    # 2. segment query latency over the fixed set (one untimed warmup pays
    # the python-worker spawn + parquet footer read; reported as query_cold)
    searcher = IndexSearcher(spark, idx_dir)
    t0 = time.time()
    searcher.search("warmup query terms", k=10).collect()
    timings["query_cold"] = time.time() - t0
    lat = []
    for q, mode in QUERY_SET:
        t0 = time.time()
        searcher.search(q, k=10, mode=mode, pruned=True).collect()
        lat.append(time.time() - t0)
    lat.sort()
    timings["query_p50"] = lat[len(lat) // 2]
    timings["query_p95"] = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

    # batched scatter/gather: the whole query set in ONE Spark job (each
    # shard's postings read once, every query scored there) — the
    # query-THROUGHPUT serving shape; per-query cost amortizes the task
    # launch that dominates the per-query latency numbers above
    t0 = time.time()
    searcher.search_many({f"q{i}": qm for i, qm in enumerate(QUERY_SET)}, k=10).collect()
    timings["query_batch_total"] = time.time() - t0
    timings["query_batch_per_query"] = timings["query_batch_total"] / len(QUERY_SET)

    # driver-local serving path (no Spark job per query): the latency floor
    lat_local = []
    for q, mode in QUERY_SET:
        t0 = time.time()
        searcher.search_local(q, k=10, mode=mode, pruned=True)
        lat_local.append(time.time() - t0)
    lat_local.sort()
    timings["query_local_p50"] = lat_local[len(lat_local) // 2]
    timings["query_local_p95"] = lat_local[min(len(lat_local) - 1, int(len(lat_local) * 0.95))]

    # 2c. positional index + HOT phrase serving latency. "stream value" is
    # the adversarial ExactPhraseScorer case: both terms sit in ~78% of docs,
    # so the candidate intersection is ~60% of the corpus and the position-
    # adjacency check runs over every candidate — the vectorized segmented
    # kernel (plans/query_index._phrase_score_shard) must stay flat here.
    pidx_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "pidx")
    t0 = time.time()
    build_index(spark, docs, pidx_dir, n_shards=max(4, int(CPUS) // 4), store_positions=True)
    timings["index_build_positional"] = time.time() - t0
    psearcher = IndexSearcher(spark, pidx_dir)
    psearcher.search_phrase("stream value", k=10).collect()  # warmup
    t0 = time.time()
    psearcher.search_phrase("stream value", k=10).collect()
    timings["phrase_hot"] = time.time() - t0
    t0 = time.time()
    psearcher.search_phrase_local("stream value", k=10)
    timings["phrase_hot_local"] = time.time() - t0

    # 2d. sloppy phrase on the same adversarial hot pair (round 3, Q29): the
    # greedy successor-chain kernel must stay in the same cost class as the
    # exact adjacency intersection
    t0 = time.time()
    psearcher.search_phrase("stream value", k=10, slop=2).collect()
    timings["phrase_slop_hot"] = time.time() - t0

    # 2d'. match_phrase_prefix on a hot first term + 6-term expansion class
    # (round 3, Q35): the merged-last-slot kernel + class-df sentinels must
    # stay in the phrase kernel's cost class
    psearcher.search_phrase_prefix("stream v", k=10).collect()  # warm
    t0 = time.time()
    psearcher.search_phrase_prefix("stream v", k=10).collect()
    timings["phrase_prefix_hot"] = time.time() - t0

    # 2d''. common terms query (round 3, Q34): rare term drives candidacy,
    # two hot terms score-only — must beat/match the plain-match scatter
    psearcher.search_common("dup batch scan", k=10, cutoff_frequency=0.1).collect()
    t0 = time.time()
    psearcher.search_common("dup batch scan", k=10, cutoff_frequency=0.1).collect()
    timings["common_terms_hot"] = time.time() - t0

    # 2e. multi-field (round 3, Q28): one-pass two-field build, serving
    # multi_match (two BMW scatters + driver max-combine), declarative
    # multi_match (one corpus pass, greatest() combine)
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.tokenizer import tokens_col
    from flume_elasticsearch_2_spark.operators.multifield import bm25_multi_match_topk
    from flume_elasticsearch_2_spark.plans.build_index import build_multifield_index
    from flume_elasticsearch_2_spark.plans.query_index import MultiFieldIndexSearcher

    fdocs = docs.withColumn("title", F.array_join(F.slice(tokens_col("text"), 1, 5), " "))
    mf_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "mfidx")
    t0 = time.time()
    build_multifield_index(spark, fdocs, mf_dir, fields=["text", "title"], n_shards=max(4, int(CPUS) // 4))
    timings["multifield_build"] = time.time() - t0
    mfs = MultiFieldIndexSearcher(spark, mf_dir)
    mfs.multi_match("warmup terms", ["title", "text"], k=10).collect()
    t0 = time.time()
    mfs.multi_match("dup batch scan", ["title", "text"], k=10).collect()
    timings["multi_match_serving"] = time.time() - t0
    t0 = time.time()
    bm25_multi_match_topk(fdocs, "dup batch scan", ["title", "text"], k=10).collect()
    timings["multi_match_dataframe"] = time.time() - t0

    # 2f. scroll-style bulk export (round 3, Q30): full match set (~88% of
    # the corpus for this OR query), doc streams only, two tiny passes
    t0 = time.time()
    n_exported = searcher.scroll_export("batch small scan", page_size=1000).count()
    timings["scroll_export"] = time.time() - t0
    timings["scroll_docs_per_sec"] = round(n_exported / timings["scroll_export"], 2)

    # 3. declarative BM25 path (one query, full plan incl. tokenize)
    t0 = time.time()
    bm25_topk(docs, "dup batch scan", k=10).collect()
    timings["bm25_dataframe"] = time.time() - t0

    # 3a'. round-4 analyzer additions: the english chain (stopwords +
    # Porter via the Arrow-batched memoized stemmer — the one non-JVM
    # analysis stage) and index-time synonyms (expansion-in-corpus,
    # df/idf reshaped; JVM map lookup + flatten)
    t0 = time.time()
    bm25_topk(docs, "queries merged tables values", k=10, analyzer="english").collect()
    timings["bm25_english_porter"] = time.time() - t0

    from flume_elasticsearch_2_spark.operators.synonyms import bm25_synonym_indexed

    t0 = time.time()
    bm25_synonym_indexed(
        docs, "dup batch", ["dup => dup, group", "batch, fast"], k=10
    ).collect()
    timings["bm25_synonym_indexed"] = time.time() - t0

    # 3b. match_phrase, declarative (Lucene ExactPhraseScorer semantics)
    from flume_elasticsearch_2_spark.operators.topk import bm25_phrase_topk

    t0 = time.time()
    bm25_phrase_topk(docs, "part filter", k=10).collect()
    timings["bm25_phrase_dataframe"] = time.time() - t0

    # 3b'. function_score re-rank (field factor rides the scoring scan —
    # same two-pass plan as bm25_dataframe, zero extra jobs)
    from flume_elasticsearch_2_spark.operators.topk import bm25_function_score_topk

    t0 = time.time()
    bm25_function_score_topk(docs, "dup batch scan", "n_chars", modifier="ln1p").collect()
    timings["function_score_dataframe"] = time.time() - t0

    # 3b''. deterministic sampling: quota (one group-key shuffle) and
    # hash-Bernoulli (pure map-side predicate)
    from flume_elasticsearch_2_spark.operators.sampling import hash_sample, stratified_sample

    t0 = time.time()
    stratified_sample(docs, "lang", 100, seed=7).count()
    timings["stratified_sample"] = time.time() - t0
    t0 = time.time()
    hash_sample(docs, 0.25, seed=3).count()
    timings["hash_sample"] = time.time() - t0

    # 3c. facets over a hot query's match scope (~60%+ of the corpus):
    # declarative = one corpus pass; serving = per-shard match-set decode
    # from postings doc streams + (doc_id, field)-only docs read
    from flume_elasticsearch_2_spark.operators.facets import terms_facet

    t0 = time.time()
    terms_facet(docs, "batch small scan", "lang", size=10).collect()
    timings["facet_terms_dataframe"] = time.time() - t0
    t0 = time.time()
    searcher.facet("batch small scan", "dl", kind="stats").collect()
    timings["facet_serving_stats"] = time.time() - t0

    # 3c2. round-5 serving agg partials: significant_terms = one per-shard
    # postings sweep (fg df of every co-occurring term) + metadata bg join;
    # percentile_ranks = one (n, count<=v) row per shard
    t0 = time.time()
    searcher.facet_significant_terms("batch small scan", size=10).collect()
    timings["sig_terms_serving"] = time.time() - t0
    t0 = time.time()
    searcher.facet_percentile_ranks(
        "batch small scan", "dl", (20.0, 60.0, 120.0)
    ).collect()
    timings["percentile_ranks_serving"] = time.time() - t0

    # 3c3. round-5 general or-filter (cross-field disjunction of conjunction
    # branches): one coalesced boolean rides the same scoring scan
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search

    _or_body = {
        "query": {"filtered": {
            "query": {"match": {"text": "batch small scan"}},
            "filter": {"or": [
                {"term": {"lang": "en"}},
                {"and": [{"range": {"n_chars": {"gte": 900}}},
                         {"term": {"source": "web"}}]},
            ]},
        }},
        "size": 10,
    }
    t0 = time.time()
    dsl_search(docs, _or_body).collect()
    timings["dsl_or_filter_dataframe"] = time.time() - t0

    # 3d. nested query (round 3, Q42): zero-join array-expression match over
    # the shaped array<struct> corpus — shaping pays one shuffle, every query
    # after is a pure codegen scan
    from flume_elasticsearch_2_spark.operators.nested import nest_children, nested_query

    t0 = time.time()
    ncorp = nest_children(
        spark.read.parquet(f"{SF_DIR}/orders.parquet"),
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        "o_orderkey", "l_orderkey",
        ["l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"],
    ).persist()
    ncorp.count()
    timings["nested_shape"] = time.time() - t0
    t0 = time.time()
    nested_query(ncorp, [("l_quantity", ">=", 30.0)], "sum", "l_extendedprice", k=10).collect()
    timings["nested_query"] = time.time() - t0
    ncorp.unpersist()

    # 3e. geo_distance (round 3, Q43): sargable lat-band prefilter +
    # haversine refine inside one codegen scan, k-row gather
    from flume_elasticsearch_2_spark.operators.geo import geo_distance_hits, geo_enrich

    gdocs = geo_enrich(docs)
    geo_distance_hits(gdocs, 48.8566, 2.3522, "2000km", k=20).collect()  # warm
    t0 = time.time()
    geo_distance_hits(gdocs, 48.8566, 2.3522, "2000km", k=20).collect()
    timings["geo_distance"] = time.time() - t0

    # 3e2. geohash_grid (round 3, Q43): pure-JVM bit-interleave encode +
    # one map-side-combined groupBy over <=32^prec cells
    from flume_elasticsearch_2_spark.operators.geo import geohash_grid_agg

    t0 = time.time()
    geohash_grid_agg(gdocs, precision=4, size=20).collect()
    timings["geohash_grid"] = time.time() - t0

    # 3e2b. round-5 geo_shape: envelope-envelope interval algebra in one
    # codegen scan over the synthesized envelope shape columns
    from flume_elasticsearch_2_spark.operators.geo import geo_shape_enrich, geo_shape_hits

    sdocs = geo_shape_enrich(docs)
    t0 = time.time()
    geo_shape_hits(
        sdocs,
        {"type": "envelope", "coordinates": [[-30.0, 60.0], [40.0, 20.0]]},
        "intersects", k=20,
    ).collect()
    timings["geo_shape_envelope"] = time.time() - t0

    # 3e3. deterministic HLL cardinality (round 3, Q14): the only shuffle is
    # <=2^p register rows (map-side-combined max) vs the exact distinct
    from flume_elasticsearch_2_spark.operators.aggs import hll_cardinality

    t0 = time.time()
    hll_cardinality(docs, None, "text", p=12).collect()
    timings["hll_cardinality"] = time.time() - t0
    t0 = time.time()
    docs.agg(F.count_distinct("text")).collect()
    timings["exact_distinct"] = time.time() - t0

    # 3e4. custom routing (round 3, Q45): routed query opens ONE route
    # sub-index — compare vs the unrouted dfs search over all routes
    from flume_elasticsearch_2_spark.plans.routing import (
        build_routed_index,
        routed_search,
        routed_search_all,
    )

    rdir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "routed_idx")
    t0 = time.time()
    build_routed_index(spark, docs, rdir, routing_field="lang", n_routes=4, n_shards=2)
    timings["routed_build"] = time.time() - t0
    routed_search(spark, rdir, "en", "batch scan", k=10).collect()  # warm
    t0 = time.time()
    routed_search(spark, rdir, "en", "batch scan", k=10).collect()
    timings["routed_query"] = time.time() - t0
    t0 = time.time()
    routed_search_all(spark, rdir, "batch scan", k=10).collect()
    timings["unrouted_query_all_routes"] = time.time() - t0

    # 3f. fuzzy_like_this (round 3, Q40): vocabulary-scale Levenshtein
    # expansion + the expanded-OR bm25 plan
    from flume_elasticsearch_2_spark.operators.flt import fuzzy_like_this_topk

    t0 = time.time()
    fuzzy_like_this_topk(docs, "bath scen windoq", k=10).collect()
    timings["flt_dataframe"] = time.time() - t0

    # 4. dedup
    t0 = time.time()
    minhash_lsh_pairs(docs, num_hashes=32, bands=8).count()
    timings["minhash_lsh"] = time.time() - t0
    t0 = time.time()
    ngram_jaccard_pairs(docs, threshold=0.05).count()
    timings["ngram_jaccard"] = time.time() - t0
    # composed scale path: LSH candidates DRIVE the exact verify (no shingle
    # self-join in the plan) — the shape a 100 TB dedup actually runs
    t0 = time.time()
    cand = minhash_lsh_pairs(docs, num_hashes=32, bands=8)
    ngram_jaccard_pairs(docs, threshold=0.05, candidates=cand).count()
    timings["lsh_jaccard_verify"] = time.time() - t0
    # winnowing (SWA/MOSS): zero-shuffle fingerprint projection + capped
    # fp-keyed pair join — the partial-overlap complement to MinHash
    from flume_elasticsearch_2_spark.operators.winnow import winnow_pairs

    # widen first: the fingerprint projection is zero-shuffle, so on the
    # single-split sf0.1 parquet it would otherwise run one-task (TESTDATA
    # quirk, not a plan property)
    docs_wide = docs.repartition(int(CPUS)).cache()
    docs_wide.count()
    t0 = time.time()
    winnow_pairs(docs_wide).count()
    timings["winnow_pairs"] = time.time() - t0

    # 4b. webtext key ops: canonicalize (zero-shuffle projection) + LWW
    # crawl-refresh dedup (one canonical-key shuffle) + anchor rollup
    from flume_elasticsearch_2_spark.operators.anchors import anchor_text_topk
    from flume_elasticsearch_2_spark.operators.urls import (
        synth_recrawl,
        synth_webpages,
        url_dedup_latest,
    )

    # incremental dedup: sketch the corpus once to disk, probe a 10% "new
    # batch" — probe cost is batch-sized, corpus side columnar reads only
    from flume_elasticsearch_2_spark.operators.minhash_index import (
        minhash_index_build,
        minhash_index_probe,
    )

    mh_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "mhidx")
    t0 = time.time()
    minhash_index_build(docs_wide.where("doc_id % 10 <> 0"), mh_dir)
    timings["minhash_index_build"] = time.time() - t0
    t0 = time.time()
    minhash_index_probe(
        spark, mh_dir, docs_wide.where("doc_id % 10 = 0"), min_est_jaccard=0.2
    ).count()
    timings["minhash_index_probe"] = time.time() - t0

    web = synth_webpages(docs_wide).unionByName(synth_recrawl(docs_wide))
    t0 = time.time()
    url_dedup_latest(web).count()
    timings["url_dedup_latest"] = time.time() - t0
    t0 = time.time()
    anchor_text_topk(docs_wide, n_docs).count()
    timings["anchor_text_topk"] = time.time() - t0
    docs_wide.unpersist()

    # 5. similarity
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = list(emb.where("vec_id = 0").first().embedding)
    t0 = time.time()
    cosine_topk(emb, qv, k=10).collect()
    timings["cosine_topk"] = time.time() - t0
    # materialized IVF: build once (cluster-partitioned parquet + centroid
    # sidecar), then each probe is hive-partition pruning at the scan
    from flume_elasticsearch_2_spark.operators.similarity import ivf_build, ivf_search

    ivf_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "ivf")
    t0 = time.time()
    ivf_build(emb, ivf_dir, n_centroids=16)
    timings["ivf_build"] = time.time() - t0
    t0 = time.time()
    ivf_search(spark, ivf_dir, qv, k=10, nprobe=4).collect()
    timings["ivf_search_nprobe4"] = time.time() - t0
    # SemDeDup: cluster-confined quadratic — the pair join shuffles once on
    # the cluster key; n_centroids is the per-cluster-size lever at scale
    from flume_elasticsearch_2_spark.operators.similarity import (
        fixed_centroids,
        semdedup,
    )

    t0 = time.time()
    semdedup(emb, centroids=fixed_centroids(64, 16), threshold=0.4).count()
    timings["semdedup"] = time.time() - t0

    # 5b. percolator scale (round 3, Q24): flat analyzed-query scan vs the
    # term-keyed index at two registered-query counts — the indexed path must
    # grow SUB-linearly (row-group IN-list pruning; the flat scan is the
    # O(n_queries) baseline). Synthetic queries: mostly non-matching vocab
    # (tokNNNNN) + a matching slice, the realistic alerting shape.
    from flume_elasticsearch_2_spark.operators.percolate import (
        build_percolator_index,
        percolate,
        percolate_indexed,
        register_queries,
    )

    perc_doc = "batch scan small table dup stream value"

    def _synth_queries(n: int):
        return spark.range(n).select(
            F.col("id").alias("query_id"),
            F.concat_ws(
                " ",
                F.concat(F.lit("tok"), F.pmod(F.col("id"), 50_000).cast("string")),
                F.when(F.pmod(F.col("id"), 97) == 0, F.lit("batch scan")).otherwise(
                    F.concat(F.lit("tok"), (F.pmod(F.col("id"), 50_000) + 50_000).cast("string"))
                ),
            ).alias("query"),
            F.when(F.pmod(F.col("id"), 2) == 0, F.lit("or")).otherwise(F.lit("and")).alias("mode"),
        )

    for n_q in (50_000, 500_000):
        tag = f"{n_q // 1000}k"
        reg_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), f"reg{tag}")
        register_queries(_synth_queries(n_q)).write.mode("overwrite").parquet(reg_dir)
        reg = spark.read.parquet(reg_dir)
        percolate(reg, perc_doc).count()  # warm the footer/scan path
        t0 = time.time()
        percolate(reg, perc_doc).count()
        timings[f"percolate_flat_{tag}"] = time.time() - t0
        pidx = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), f"pidx{tag}")
        build_percolator_index(reg, pidx)
        percolate_indexed(spark, pidx, perc_doc).count()  # warm
        t0 = time.time()
        percolate_indexed(spark, pidx, perc_doc).count()
        timings[f"percolate_idx_{tag}"] = time.time() - t0

    # 5b2. _mpercolate (continuation-3): the whole doc batch against a 50k
    # rule set in ONE term-keyed broadcast join — pairs materialize only on
    # shared terms, never |docs| x |queries|
    from flume_elasticsearch_2_spark.operators.percolate import mpercolate

    reg_m = register_queries(_synth_queries(50_000))
    mpercolate(reg_m, docs).count()  # warm
    t0 = time.time()
    mpercolate(reg_m, docs).count()
    timings["mpercolate_50k_rules"] = time.time() - t0

    # 5b3. terminate_after count + edge-gram autocomplete (continuation-3)
    from flume_elasticsearch_2_spark.operators.topk import match_count_terminated

    t0 = time.time()
    match_count_terminated(docs, "batch small scan", terminate_after=100,
                           n_shards=max(4, int(CPUS) // 4)).collect()
    timings["count_terminated"] = time.time() - t0
    t0 = time.time()
    bm25_topk(docs, "bat", k=10, analyzer="ascii_edge1_6",
              search_analyzer="ascii").collect()
    timings["autocomplete_search"] = time.time() - t0

    # 5c. training-data shaping (round 3): packing is the sequential
    # applyInPandas recurrence (one group exchange), chunking is the
    # zero-shuffle JVM explode, keywords the term-keyed tf-idf join
    from flume_elasticsearch_2_spark.operators.packing import (
        chunk_docs,
        doc_keywords,
        pack_sequences,
    )

    t0 = time.time()
    pack_sequences(docs, budget=2048).count()
    timings["pack_sequences"] = time.time() - t0
    t0 = time.time()
    chunk_docs(docs, window=256, stride=128).count()
    timings["chunk_docs"] = time.time() - t0
    t0 = time.time()
    doc_keywords(docs, k=5).count()
    timings["doc_keywords"] = time.time() - t0

    # 5d. _bulk apply + post-bulk search (round 3, Q46): broadcast-only
    # corpus edit, then the ordinary scoring pass over the applied corpus
    from flume_elasticsearch_2_spark.operators.bulk import apply_bulk

    bulk_actions = (
        [("index", 10_000_000 + i,
          {"text": f"bulk doc {i} batch scan", "lang": "en", "source": "bulk",
           "n_chars": 20}) for i in range(500)]
        + [("update", i, {"lang": "xx"}) for i in range(0, 500, 2)]
        + [("delete", i, None) for i in range(500, 600)]
    )
    t0 = time.time()
    applied = apply_bulk(docs, bulk_actions)
    applied.count()
    timings["bulk_apply_1100"] = time.time() - t0
    t0 = time.time()
    bm25_topk(applied, "batch scan", k=10).collect()
    timings["bulk_search"] = time.time() - t0

    # 5e. composed refinement recipe (round 3): dedup -> Gopher -> C4 ->
    # CCNet keep-set — the modern pretraining-data pipeline as one plan
    from flume_elasticsearch_2_spark.operators.refine import refine_corpus

    t0 = time.time()
    refine_corpus(
        docs,
        {"min_stop_hits": 1},
        {"min_line_words": 40, "min_sentences": 0,
         "require_terminal_punct": False},
    ).count()
    timings["refine_pipeline"] = time.time() - t0

    # 6. end-to-end webpages pipeline (extract → dedup → classify → index)
    # over a 20k-doc synthesized corpus — the north_star path at a size where
    # work dominates scheduler overhead
    from flume_elasticsearch_2_spark.plans.pipeline import index_webpages
    from flume_elasticsearch_2_spark.sources.webpages import write_webpages

    pages_dir = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "webpages")
    write_webpages(spark, 20_000, pages_dir, n_partitions=32)
    pipe_idx = os.path.join(tempfile.mkdtemp(prefix="fts_bench_"), "pipe_idx")
    t0 = time.time()
    manifest = index_webpages(spark, spark.read.parquet(pages_dir), pipe_idx, n_shards=8)
    timings["pipeline_20k"] = time.time() - t0
    timings["pipeline_docs_per_sec"] = manifest["docs_per_sec"]

    total = time.time() - t_all
    out = {
        "metric": "fts_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "n_docs": n_docs,
        "cpus": int(CPUS),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
