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
