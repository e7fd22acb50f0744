"""Segment-generation merge (plans/merge.py, SURVEY §2.4 I5): merging two
half-corpus generations built over a pinned id space must be query-identical
to a single-shot build over the full corpus."""

from __future__ import annotations

import json

import pytest

from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.merge import merge_indexes
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

QUERIES = [
    ("dup", "or"),
    ("batch small scan", "or"),
    ("join filter window", "and"),
    ("the the fast", "or"),
]


@pytest.fixture(scope="module")
def merged_and_full(spark, documents, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    id_space = documents.agg({"doc_id": "max"}).collect()[0][0] + 1
    half_a = documents.where("doc_id % 2 = 0")
    half_b = documents.where("doc_id % 2 = 1")
    a_dir, b_dir = str(root / "gen_a"), str(root / "gen_b")
    build_index(spark, half_a, a_dir, n_shards=4, id_space=id_space)
    build_index(spark, half_b, b_dir, n_shards=4, id_space=id_space)
    merged_dir, full_dir = str(root / "merged"), str(root / "full")
    merge_indexes(spark, [a_dir, b_dir], merged_dir)
    build_index(spark, documents, full_dir, n_shards=4, id_space=id_space)
    return merged_dir, full_dir


def test_merge_manifest(spark, merged_and_full, documents):
    merged_dir, full_dir = merged_and_full
    m = json.load(open(f"{merged_dir}/manifest.json"))
    f = json.load(open(f"{full_dir}/manifest.json"))
    assert m["n_docs"] == f["n_docs"] == documents.count()
    assert abs(m["avgdl"] - f["avgdl"]) < 1e-9
    assert m["merged_generations"] == 2


@pytest.mark.parametrize("query,mode", QUERIES)
def test_merged_equals_full_build(spark, merged_and_full, query, mode):
    merged_dir, full_dir = merged_and_full
    sm = IndexSearcher(spark, merged_dir)
    sf = IndexSearcher(spark, full_dir)
    got = [(r.doc_id, r.score) for r in sm.search(query, k=10, mode=mode).collect()]
    want = [(r.doc_id, r.score) for r in sf.search(query, k=10, mode=mode).collect()]
    assert got == want


def test_merged_postings_identical(spark, merged_and_full):
    """Stronger than query-identity: the merged postings table must be
    byte-identical per (shard, term) to the full build's."""
    merged_dir, full_dir = merged_and_full
    cols = ["shard", "term", "n", "cf", "doc_bytes", "tf_bytes"]
    m = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{merged_dir}/postings").select(cols).collect()
    }
    f = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{full_dir}/postings").select(cols).collect()
    }
    assert m == f


@pytest.fixture(scope="module")
def overwrite_merged_and_ref(spark, documents, tmp_path_factory):
    """Re-crawl scenario: gen2 re-ingests every 5th url with NEW text under
    NEW doc ids; merge with dedup_key='url' must equal a single-shot build
    over the latest-per-url corpus (ES setId upsert at merge time)."""
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial

    root = tmp_path_factory.mktemp("ow_merge")
    n = documents.agg({"doc_id": "max"}).collect()[0][0] + 1
    id_space = 2 * n
    base = documents.select("doc_id", "text", F.concat(F.lit("u"), F.col("doc_id")).alias("url"))
    recrawl = base.where("doc_id % 5 = 0").select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" refreshed dup content")).alias("text"),
        "url",
    )
    g1, g2 = str(root / "gen1"), str(root / "gen2")
    build_segments_partial(
        spark, base, g1, 4, id_space=id_space, orig_ids=base.select("doc_id", "url")
    )
    build_segments_partial(
        spark, recrawl, g2, 4, id_space=id_space, orig_ids=recrawl.select("doc_id", "url")
    )
    merged = str(root / "merged")
    manifest = merge_indexes(spark, [g1, g2], merged, dedup_key="url")
    latest = base.where("doc_id % 5 != 0").unionByName(recrawl)
    ref = str(root / "ref")
    build_segments_partial(
        spark, latest, ref, 4, id_space=id_space, orig_ids=latest.select("doc_id", "url")
    )
    return merged, ref, manifest, base.where("doc_id % 5 = 0").count()


def test_overwrite_merge_manifest(spark, overwrite_merged_and_ref, documents):
    merged, ref, manifest, n_overwritten = overwrite_merged_and_ref
    rm = json.load(open(f"{ref}/manifest.json"))
    assert manifest["tombstoned_docs"] == n_overwritten
    assert manifest["n_docs"] == rm["n_docs"] == documents.count()
    assert abs(manifest["avgdl"] - rm["avgdl"]) < 1e-9


def test_overwrite_merge_postings_identical(spark, overwrite_merged_and_ref):
    merged, ref, _, _ = overwrite_merged_and_ref
    cols = ["shard", "term", "n", "cf", "doc_bytes", "tf_bytes"]
    m = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{merged}/postings").select(cols).collect()
    }
    f = {
        (r.shard, r.term): (r.n, r.cf, bytes(r.doc_bytes), bytes(r.tf_bytes))
        for r in spark.read.parquet(f"{ref}/postings").select(cols).collect()
    }
    assert m == f


@pytest.mark.parametrize("query,mode", QUERIES)
def test_overwrite_merge_query_identical(spark, overwrite_merged_and_ref, query, mode):
    merged, ref, _, _ = overwrite_merged_and_ref
    sm, sr = IndexSearcher(spark, merged), IndexSearcher(spark, ref)
    got = [(r.doc_id, r.score) for r in sm.search(query, k=10, mode=mode).collect()]
    want = [(r.doc_id, r.score) for r in sr.search(query, k=10, mode=mode).collect()]
    assert got == want


def test_null_keys_never_tombstoned(spark, documents, tmp_path_factory):
    """A generation built without the key column (union fills NULL) or a
    legitimately-null key must NOT collapse into one duplicate group — every
    null-key doc survives the dedup_key merge."""
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial

    root = tmp_path_factory.mktemp("null_merge")
    n = documents.agg({"doc_id": "max"}).collect()[0][0] + 1
    id_space = 2 * n
    half_a = documents.where("doc_id % 2 = 0").select("doc_id", "text")
    half_b = documents.where("doc_id % 2 = 1").select("doc_id", "text")
    g1, g2 = str(root / "g1"), str(root / "g2")
    # gen1 has NO url column; gen2 has urls
    build_segments_partial(spark, half_a, g1, 4, id_space=id_space)
    build_segments_partial(
        spark, half_b, g2, 4, id_space=id_space,
        orig_ids=half_b.select("doc_id", F.concat(F.lit("u"), F.col("doc_id")).alias("url")),
    )
    merged = str(root / "m")
    manifest = merge_indexes(spark, [g1, g2], merged, dedup_key="url")
    assert manifest["tombstoned_docs"] == 0
    assert manifest["n_docs"] == documents.count()


def test_merge_policy_tier_selection():
    """Pure policy: overflowing tiers merge their smallest members first;
    balanced tiers are left alone; deterministic ordering."""
    from flume_elasticsearch_2_spark.plans.merge_policy import plan_merges

    # 12 tiny generations (tier 0) + 2 big ones: only tier 0 overflows
    gens = {f"g{i:02d}": 100 + i for i in range(12)}
    gens["big_a"] = 50_000
    gens["big_b"] = 80_000
    plans = plan_merges(gens, segs_per_tier=10, max_merge_at_once=10, floor_docs=1000)
    assert len(plans) == 1
    assert plans[0] == [f"g{i:02d}" for i in range(10)]  # 10 smallest of tier 0
    # steady state: nothing to merge
    assert plan_merges({"a": 100, "b": 200, "big": 50_000}, segs_per_tier=10) == []
    # write amplification shape: merging the group lands in a higher tier
    merged = {"m": sum(gens[f"g{i:02d}"] for i in range(10)), "g10": 110, "g11": 111,
              "big_a": 50_000, "big_b": 80_000}
    assert plan_merges(merged, segs_per_tier=10) == []


def test_auto_merge_end_to_end(spark, documents, tmp_path_factory):
    """auto_merge collapses an overflowing tier of real generations and the
    merged index answers queries identically to a single-shot build."""
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
    from flume_elasticsearch_2_spark.plans.merge_policy import auto_merge
    from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("amerge")
    id_space = documents.agg({"doc_id": "max"}).collect()[0][0] + 1
    # 4 quarter-corpus generations, segs_per_tier=3 -> one merge round
    gens = []
    for i in range(4):
        part = documents.where(F.col("doc_id") % 4 == i)
        d = str(root / f"gen{i}")
        build_segments_partial(spark, part, d, 4, id_space=id_space)
        gens.append(d)
    live = auto_merge(
        spark, gens, str(root / "out"), segs_per_tier=3, max_merge_at_once=4,
        floor_docs=10_000,
    )
    assert len(live) == 1 and "merged_" in live[0]
    single = str(root / "single")
    build_segments_partial(spark, documents, single, 4, id_space=id_space)
    sm, ss = IndexSearcher(spark, live[0]), IndexSearcher(spark, single)
    for q in ["dup batch scan", "order fast"]:
        got = [(r.doc_id, r.score) for r in sm.search(q, k=10).collect()]
        want = [(r.doc_id, r.score) for r in ss.search(q, k=10).collect()]
        assert got == want and want, q


# -- ES 1.x _optimize (force merge) ------------------------------------------


@pytest.fixture(scope="module")
def uneven_generations(spark, documents, tmp_path_factory):
    """Three generations over disjoint id ranges with distinct sizes
    (100 / 150 / 250 docs), shared id space."""
    root = tmp_path_factory.mktemp("opt")
    dirs, cuts = [], [(0, 100), (100, 250), (250, 500)]
    for i, (lo, hi) in enumerate(cuts):
        d = str(root / f"gen{i}")
        build_index(
            spark, documents.where(f"doc_id >= {lo} AND doc_id < {hi}"), d,
            n_shards=4, id_space=500,
        )
        dirs.append(d)
    return dirs


def test_optimize_to_one_equals_plain_merge(spark, uneven_generations, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.merge_policy import optimize
    from flume_elasticsearch_2_spark.plans.query_index import search_generations

    root = tmp_path_factory.mktemp("opt_out")
    live = optimize(spark, uneven_generations, str(root), max_num_segments=1)
    assert len(live) == 1 and live[0].endswith("optimized_0000")
    for q, mode in [("dup batch scan", "or"), ("join filter window", "and")]:
        got = [tuple(r) for r in search_generations(spark, live, q, k=10, mode=mode).collect()]
        want = [
            tuple(r)
            for r in search_generations(spark, uneven_generations, q, k=10, mode=mode).collect()
        ]
        assert got == want and want, q


def test_optimize_partial_keeps_largest_untouched(spark, uneven_generations, tmp_path_factory):
    """max_num_segments=2: the 250-doc generation survives AS-IS (same dir,
    no rewrite) and the two smallest merge into one."""
    import json
    import os

    from flume_elasticsearch_2_spark.plans.merge_policy import optimize
    from flume_elasticsearch_2_spark.plans.query_index import search_generations

    root = tmp_path_factory.mktemp("opt_out2")
    big = uneven_generations[2]
    mtime_before = os.path.getmtime(os.path.join(big, "manifest.json"))
    live = optimize(spark, uneven_generations, str(root), max_num_segments=2)
    assert len(live) == 2 and big in live
    assert os.path.getmtime(os.path.join(big, "manifest.json")) == mtime_before
    merged = [d for d in live if d != big][0]
    with open(os.path.join(merged, "manifest.json")) as fh:
        assert json.load(fh)["n_docs"] == 250  # 100 + 150
    got = [tuple(r) for r in search_generations(spark, live, "dup batch scan", k=10).collect()]
    want = [
        tuple(r)
        for r in search_generations(spark, uneven_generations, "dup batch scan", k=10).collect()
    ]
    assert got == want and want


def test_optimize_noop_and_refusals(spark, uneven_generations, tmp_path_factory):
    from flume_elasticsearch_2_spark.plans.merge_policy import optimize

    root = str(tmp_path_factory.mktemp("opt_out3"))
    # already at/below target: the input list comes back, nothing written
    assert optimize(spark, uneven_generations, root, max_num_segments=3) == list(
        uneven_generations
    )
    with pytest.raises(ValueError, match="only_expunge_deletes"):
        optimize(spark, uneven_generations, root, only_expunge_deletes=True)
    with pytest.raises(ValueError, match="max_num_segments"):
        optimize(spark, uneven_generations, root, max_num_segments=0)


def test_optimize_rerun_does_not_collide(spark, uneven_generations, tmp_path_factory):
    """Review regression: a second optimize() against the SAME out_root
    picks the next free optimized_NNNN instead of crashing on the commit
    rename into the prior run's output."""
    from flume_elasticsearch_2_spark.plans.merge_policy import optimize

    root = str(tmp_path_factory.mktemp("opt_rerun"))
    live1 = optimize(spark, uneven_generations, root, max_num_segments=2)
    merged1 = [d for d in live1 if d.endswith("optimized_0000")]
    assert merged1
    # night 2: prior output participates in the next full optimize
    live2 = optimize(spark, live1, root, max_num_segments=1)
    assert len(live2) == 1 and live2[0].endswith("optimized_0001")
