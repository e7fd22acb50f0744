"""ES _mget + _stats APIs (SURVEY §2.5): fetch-by-id and index statistics,
oracle-checked and serving-vs-declarative.

Reference analog: the ES GET/mget and index-stats surfaces behind the sink
(ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.admin import (
    corpus_index_stats,
    index_stats_sql,
    mget,
    mget_sql,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

IDS = [3, 141, 0, 141, 499, 10**9]  # dup + missing id exercised


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("admidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars", "text"),
    )
    return IndexSearcher(spark, d)


def test_mget_matches_duckdb(documents, duck):
    got = [tuple(r) for r in mget(documents, IDS).collect()]
    want = [tuple(r) for r in duck.execute(mget_sql(IDS)).fetchall()]
    assert got == want
    assert len(got) == 4  # dup collapsed, missing id absent


def test_mget_serving_equals_declarative(documents, searcher):
    cols = ["doc_id", "lang", "n_chars", "text"]
    got = [tuple(r) for r in searcher.mget(IDS, columns=cols).collect()]
    want = [tuple(r) for r in mget(documents, IDS, columns=cols).collect()]
    assert got == want


def test_mget_pushes_id_filter_to_scan(searcher):
    df = searcher.mget([1, 2, 3])
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [In(doc_id" in plan, plan


def test_index_stats_matches_duckdb(documents, duck):
    got = [tuple(r) for r in corpus_index_stats(documents).collect()]
    want = [tuple(r) for r in duck.execute(index_stats_sql()).fetchall()]
    assert got == want


def test_index_stats_serving_equals_declarative(documents, searcher):
    got = [tuple(r) for r in searcher.index_stats().collect()]
    want = [tuple(r) for r in corpus_index_stats(documents).collect()]
    assert got == want


# -- _termvector (per-doc term stats) ----------------------------------------


def test_termvectors_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.admin import termvectors, termvectors_sql

    for did in [3, 0, 499]:
        got = [tuple(r) for r in termvectors(documents, did).collect()]
        want = [tuple(r) for r in duck.execute(termvectors_sql(did)).fetchall()]
        assert got == want and got, did


def test_termvectors_serving_equals_declarative(documents, searcher):
    """Serving reads (df, cf) from the prebuilt dictionary — parity proves
    the build-time cf IS the corpus ttf the declarative pass computes."""
    from flume_elasticsearch_2_spark.operators.admin import termvectors

    for did in [3, 141]:
        got = [tuple(r) for r in searcher.termvectors(did).collect()]
        want = [tuple(r) for r in termvectors(documents, did).collect()]
        assert got == want and got, did


def test_termvectors_missing_doc_empty(documents, searcher):
    from flume_elasticsearch_2_spark.operators.admin import termvectors

    assert termvectors(documents, 10**9).count() == 0
    assert searcher.termvectors(10**9).count() == 0


def test_mtermvectors_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.admin import mtermvectors, mtermvectors_sql

    ids = [3, 141, 0, 141, 10**9]  # dup + missing exercised
    got = [tuple(r) for r in mtermvectors(documents, ids).collect()]
    want = [tuple(r) for r in duck.execute(mtermvectors_sql(ids)).fetchall()]
    assert got == want and got
    assert {r[0] for r in got} == {0, 3, 141}  # missing id absent


def test_mtermvectors_serving_equals_declarative(documents, searcher):
    from flume_elasticsearch_2_spark.operators.admin import mtermvectors

    ids = [3, 141, 499]
    got = [tuple(r) for r in searcher.mtermvectors(ids).collect()]
    want = [tuple(r) for r in mtermvectors(documents, ids).collect()]
    assert got == want and got


def test_mtermvectors_consistent_with_single(documents):
    from flume_elasticsearch_2_spark.operators.admin import mtermvectors, termvectors

    multi = [
        (r["term"], r["term_freq"], r["doc_freq"], r["ttf"])
        for r in mtermvectors(documents, [3]).collect()
    ]
    single = [tuple(r) for r in termvectors(documents, 3).collect()]
    assert multi == single


def test_segments_report_matches_corpus_oracle(spark, searcher, duck):
    """_segments analog: every per-shard number the report reads from the
    committed tree is recomputable from the corpus with the range-sharding
    arithmetic (shard = doc_id * n_shards // id_space)."""
    from flume_elasticsearch_2_spark.operators.admin import (
        segments_report,
        segments_report_sql,
    )

    got = [tuple(r) for r in segments_report(spark, searcher.index_dir).collect()]
    want = [tuple(r) for r in duck.sql(segments_report_sql(n_shards=4)).fetchall()]
    assert got == want
    assert len(got) == 4  # dense ids at 4 shards: every shard populated
    # conservation law: Σ sum_dl == corpus token count
    n_toks = duck.sql(
        "SELECT sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) FROM documents"
    ).fetchone()[0]
    assert sum(r[2] for r in got) == n_toks


def test_cat_indices_and_count(spark, documents, tmp_path_factory):
    """_cat/indices + _cat/count are manifest-only reads whose logical
    columns agree with the corpus; store_bytes is physical and positive."""
    from flume_elasticsearch_2_spark.operators.admin import cat_count, cat_indices
    from flume_elasticsearch_2_spark.plans.build_index import build_index

    root = tmp_path_factory.mktemp("cat")
    n = documents.count()
    half = n // 2
    d1, d2 = str(root / "g1"), str(root / "g2")
    build_index(spark, documents.where(f"doc_id < {half}"), d1, n_shards=4, id_space=n)
    build_index(spark, documents.where(f"doc_id >= {half}"), d2, n_shards=4, id_space=n)
    rows = cat_indices(spark, {"g2": d2, "g1": d1}).collect()
    assert [r["index"] for r in rows] == ["g1", "g2"]  # name-ordered
    assert [r.docs_count for r in rows] == [half, n - half]
    assert all(r.pri == 4 and r.store_bytes > 0 for r in rows)
    assert cat_count(spark, {"g1": d1, "g2": d2}).collect()[0]["count"] == n


def test_field_stats_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.admin import field_stats, field_stats_sql

    fields = ["lang", "n_chars", "source"]
    got = [tuple(r) for r in field_stats(documents, fields).collect()]
    want = duck.sql(field_stats_sql(fields)).fetchall()
    assert got == [tuple(r) for r in want] and got


def test_field_stats_counts_non_null_and_refuses_unknown(spark, documents):
    from flume_elasticsearch_2_spark.operators.admin import field_stats
    from pyspark.sql import functions as F

    # null out half of one field: doc_count must drop to the non-null count
    d = documents.withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, F.col("lang"))
    )
    row = {r.field: r for r in field_stats(d, ["lang"]).collect()}["lang"]
    assert row.doc_count == documents.where("doc_id % 2 = 0").count()
    with pytest.raises(ValueError, match="field_stats fields"):
        field_stats(documents, ["nope"])


# -- ES 1.x _template registry + auto-create settings ------------------------


def test_index_template_registry(tmp_path):
    from flume_elasticsearch_2_spark.operators.admin import IndexTemplateRegistry

    reg = IndexTemplateRegistry()
    reg.put("base", "web*", {"number_of_shards": 8}, order=0)
    reg.put("hot", "web_hot*", {"number_of_shards": 2, "store_positions": True}, order=1)
    # order merge: higher order overrides per key
    assert reg.resolve("web_hot_2026") == {"number_of_shards": 2, "store_positions": True}
    assert reg.resolve("web_archive") == {"number_of_shards": 8}
    assert reg.resolve("unrelated") == {}
    with pytest.raises(ValueError, match="unsupported"):
        reg.put("bad", "x*", {"refresh_interval": "1s"})
    reg.delete("hot")
    assert reg.resolve("web_hot_2026") == {"number_of_shards": 8}
    p = str(tmp_path / "templates.json")
    reg.save(p)
    from flume_elasticsearch_2_spark.operators.admin import IndexTemplateRegistry as R2

    assert R2.load(p).templates() == reg.templates()


def test_build_from_templates_and_health(spark, documents, tmp_path_factory):
    """Templates drive the auto-create build knobs (request overrides win,
    as ES); cluster_health reads green from the committed tree and red from
    a missing manifest."""
    from flume_elasticsearch_2_spark.operators.admin import (
        IndexTemplateRegistry,
        build_index_from_templates,
        cluster_health,
    )

    root = tmp_path_factory.mktemp("tmpl")
    reg = IndexTemplateRegistry()
    reg.put("web", "web*", {"number_of_shards": 2})
    d1 = str(root / "web_a")
    m = build_index_from_templates(spark, documents, d1, "web_a", reg)
    assert m["n_shards"] == 2
    d2 = str(root / "web_b")
    m2 = build_index_from_templates(
        spark, documents, d2, "web_b", reg, n_shards=4
    )
    assert m2["n_shards"] == 4  # explicit override beats the template
    rows = {r["index"]: r for r in cluster_health(
        spark, {"web_a": d1, "web_b": d2, "ghost": str(root / "nope")}
    ).collect()}
    assert rows["web_a"].status == "green" and rows["web_a"].n_shards == 2
    assert rows["web_b"].status == "green" and rows["web_b"].n_docs == documents.count()
    assert rows["ghost"].status == "red" and rows["ghost"].n_docs == 0


def test_template_value_types_refuse(tmp_path):
    """Review regression: setting VALUES refuse loudly — a JSON string
    'false' must never coerce to store_positions=True, and load()
    re-validates hand-edited files."""
    import json

    from flume_elasticsearch_2_spark.operators.admin import IndexTemplateRegistry

    reg = IndexTemplateRegistry()
    with pytest.raises(ValueError, match="store_positions must be a bool"):
        reg.put("t", "x*", {"store_positions": "false"})
    with pytest.raises(ValueError, match="number_of_shards must be a positive int"):
        reg.put("t", "x*", {"number_of_shards": "8"})
    with pytest.raises(ValueError, match="number_of_shards must be a positive int"):
        reg.put("t", "x*", {"number_of_shards": 0})
    p = str(tmp_path / "tampered.json")
    with open(p, "w") as f:
        json.dump({"t": {"template": "x*", "order": 0,
                         "settings": {"store_positions": "false"}}}, f)
    with pytest.raises(ValueError, match="store_positions must be a bool"):
        IndexTemplateRegistry.load(p)


def test_field_stats_refuses_nonportable_types(spark, documents):
    from flume_elasticsearch_2_spark.operators.admin import field_stats
    from pyspark.sql import functions as F

    d = documents.withColumn("ratio", F.col("n_chars") / 7.0)
    with pytest.raises(ValueError, match="non-portable-render"):
        field_stats(d, ["ratio"])


def test_cluster_health_malformed_shard_dir_is_red(spark, documents, tmp_path_factory):
    """Driver-advice r3: a docs/ entry named shard=<non-integer> (e.g.
    shard=__HIVE_DEFAULT_PARTITION__) must report red, never raise — a
    health probe cannot throw on the unhealthy state it detects."""
    import os

    from flume_elasticsearch_2_spark.operators.admin import cluster_health
    from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial

    d = str(tmp_path_factory.mktemp("sick") / "idx")
    build_segments_partial(
        spark, documents, d, n_shards=2,
        orig_ids=documents.select("doc_id", "lang", "text"),
    )
    os.makedirs(os.path.join(d, "docs", "shard=__HIVE_DEFAULT_PARTITION__"))
    rows = {r["index"]: r for r in cluster_health(spark, {"sick": d}).collect()}
    assert rows["sick"].status == "red"


def test_field_stats_empty_fields_refuses(documents):
    """Driver-advice r3: zero fields must refuse loudly, not die inside
    docs.agg() with an opaque py4j error."""
    from flume_elasticsearch_2_spark.operators.admin import field_stats

    with pytest.raises(ValueError, match="at least one field"):
        field_stats(documents, [])
