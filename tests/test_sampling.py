"""Deterministic sampling operators (training-data pipeline family):
per-group quota sample + seeded Bernoulli-by-key-hash, oracle-checked and
pinned for the property that makes them pipeline-safe — the selected KEY SET
is invariant under repartitioning and re-runs."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.sampling import (
    hash_sample,
    hash_sample_sql,
    stratified_sample,
    stratified_sample_sql,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.mark.parametrize("seed", [None, 7, 8])
def test_stratified_sample_matches_duckdb(documents, duck, seed):
    got = sorted(
        (r.doc_id, r.lang)
        for r in stratified_sample(documents, "lang", 10, seed=seed)
        .select("doc_id", "lang")
        .collect()
    )
    want = sorted(
        (int(d), s)
        for d, s in duck.sql(
            stratified_sample_sql("lang", 10, seed=seed, columns="doc_id, lang")
        ).fetchall()
    )
    assert got == want and got


def test_stratified_sample_quota_and_determinism(documents):
    out = stratified_sample(documents, "lang", 7, seed=3).select("doc_id", "lang")
    counts = {r.lang: r.cnt for r in out.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    n_docs = documents.count()
    for lang, c in counts.items():
        assert c <= 7, lang
    # repartition-invariant: same key set at a different parallelism
    again = stratified_sample(documents.repartition(13), "lang", 7, seed=3)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    assert sum(counts.values()) < n_docs


def test_hash_sample_matches_duckdb_and_is_stable(documents, duck):
    got = sorted(r.doc_id for r in hash_sample(documents, 0.3, seed=1).select("doc_id").collect())
    want = sorted(
        int(d) for (d,) in duck.sql(hash_sample_sql(0.3, seed=1, columns="doc_id")).fetchall()
    )
    assert got == want and got
    # repartition-stable (the row-based df.sample property failure this fixes)
    again = sorted(
        r.doc_id
        for r in hash_sample(documents.repartition(17), 0.3, seed=1).select("doc_id").collect()
    )
    assert got == again
    # uniform hash: kept fraction concentrates near the target
    n = documents.count()
    assert 0.2 * n < len(got) < 0.4 * n
    # different seeds draw (near-)independent sets
    other = set(
        r.doc_id for r in hash_sample(documents, 0.3, seed=2).select("doc_id").collect()
    )
    assert set(got) != other


def test_sampling_validation():
    with pytest.raises(ValueError):
        hash_sample_sql(1.5)
    with pytest.raises(ValueError):
        stratified_sample_sql("lang", 0)


# -- domain-mixture sampling -------------------------------------------------------


def test_mix_sample_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.sampling import (
        mix_sample,
        mix_sample_sql,
    )

    w = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    got = sorted(r["doc_id"] for r in mix_sample(documents, w, seed=7).collect())
    want = sorted(
        r[0] for r in duck.execute(
            mix_sample_sql(w, seed=7, columns="doc_id")
        ).fetchall()
    )
    assert got == want and got


def test_mix_sample_fractions_behave(documents):
    from flume_elasticsearch_2_spark.operators.sampling import mix_sample

    n_by_src = {r["source"]: r["count"]
                for r in documents.groupBy("source").count().collect()}
    kept = mix_sample(documents, {"src0": 1.0, "src1": 0.5}, seed=3)
    k_by_src = {r["source"]: r["count"]
                for r in kept.groupBy("source").count().collect()}
    assert k_by_src.get("src0") == n_by_src["src0"]        # fraction 1.0 keeps all
    assert "src2" not in k_by_src                           # default 0.0 drops
    assert 0 < k_by_src.get("src1", 0) < n_by_src["src1"]
    # monotone: the 0.5 kept set is a subset of the 0.8 kept set (same seed)
    k8 = {r["doc_id"] for r in
          mix_sample(documents, {"src1": 0.8}, seed=3).collect()}
    k5 = {r["doc_id"] for r in
          mix_sample(documents, {"src1": 0.5}, seed=3).collect()}
    assert k5 <= k8


def test_mix_sample_validation(documents):
    from flume_elasticsearch_2_spark.operators.sampling import (
        mix_sample,
        mix_sample_sql,
    )

    with pytest.raises(ValueError, match="at least one"):
        mix_sample(documents, {})
    with pytest.raises(ValueError, match="fractions"):
        mix_sample(documents, {"src0": 1.5})
    with pytest.raises(ValueError, match="fractions"):
        mix_sample_sql({"src0": 0.5}, default=-0.1)


# -- shuffle_export ------------------------------------------------------------


def test_shuffle_export_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.sampling import (
        shuffle_export,
        shuffle_export_sql,
    )

    p1 = [tuple(r) for r in shuffle_export(documents, 20, seed=3).collect()]
    w1 = [tuple(r) for r in duck.execute(shuffle_export_sql(20, seed=3)).fetchall()]
    assert p1 == w1 and len(p1) == 20
    cur = (p1[-1][0], p1[-1][1])
    p2 = [tuple(r) for r in shuffle_export(documents, 20, seed=3, after=cur).collect()]
    w2 = [
        tuple(r)
        for r in duck.execute(shuffle_export_sql(20, seed=3, after=cur)).fetchall()
    ]
    assert p2 == w2
    # keyset paging: pages are disjoint and concatenation == one big page
    assert not {x[1] for x in p1} & {x[1] for x in p2}
    big = [tuple(r) for r in shuffle_export(documents, 40, seed=3).collect()]
    assert p1 + p2 == big


def test_shuffle_export_partition_invariant_and_seeded(documents):
    from flume_elasticsearch_2_spark.operators.sampling import shuffle_export

    a = [r["doc_id"] for r in shuffle_export(documents, 30, seed=1).collect()]
    b = [
        r["doc_id"]
        for r in shuffle_export(documents.repartition(7), 30, seed=1).collect()
    ]
    c = [r["doc_id"] for r in shuffle_export(documents, 30, seed=2).collect()]
    assert a == b
    assert a != c  # a different seed is a different permutation
    assert a != sorted(a)  # and it is actually shuffled


def test_shuffle_export_validation(documents):
    from flume_elasticsearch_2_spark.operators.sampling import (
        shuffle_export,
        shuffle_export_sql,
    )

    with pytest.raises(ValueError, match="size"):
        shuffle_export(documents, 0)
    with pytest.raises(ValueError, match="size"):
        shuffle_export_sql(-1)


# -- token_budget_select -------------------------------------------------------


def test_token_budget_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.sampling import (
        token_budget_select,
        token_budget_select_sql,
    )

    for budget in (150, 400):
        got = [tuple(r) for r in token_budget_select(documents, budget).collect()]
        want = [
            tuple(r) for r in duck.execute(token_budget_select_sql(budget)).fetchall()
        ]
        assert got == want and got, budget


def test_token_budget_greedy_prefix_semantics(documents):
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.operators.sampling import token_budget_select

    budget = 300
    out = token_budget_select(documents, budget)
    rows = out.collect()
    # hard cap holds per group
    per_group = out.groupBy("group").agg(F.max("cum_tokens").alias("m")).collect()
    assert all(r["m"] <= budget for r in per_group)
    # strict prefix: within a group, kept docs are the TOP-n_tokens docs
    # (longest first) — no doc outside the kept set is longer than a kept one
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group"], []).append(r["n_tokens"])
    one = sorted(by_group)[0]
    kept_min = min(by_group[one])
    all_lens = sorted(
        (r["n_tokens"] for r in documents.selectExpr(
            "source AS g", "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n_tokens"
        ).where(F.col("g") == one).collect()),
        reverse=True,
    )
    assert all_lens[: len(by_group[one])] == sorted(by_group[one], reverse=True)
    assert kept_min >= 0


def test_token_budget_validation(documents):
    from flume_elasticsearch_2_spark.operators.sampling import (
        token_budget_select,
        token_budget_select_sql,
    )

    with pytest.raises(ValueError, match="budget"):
        token_budget_select(documents, 0)
    with pytest.raises(ValueError, match="budget"):
        token_budget_select_sql(-5)
