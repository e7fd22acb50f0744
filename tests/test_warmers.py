"""ES 1.x _warmer registry + warm-on-commit replay (operators/warmers.py)."""

from __future__ import annotations

import pytest

from flume_elasticsearch_2_spark.operators.warmers import WarmerRegistry, run_warmers
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warmidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "text"),
    )
    return IndexSearcher(spark, d)


def test_registry_surface(tmp_path):
    reg = WarmerRegistry()
    reg.put("w1", {"query": {"match": {"text": "dup"}}})
    reg.put("w2", {"query": {"match": {"text": "batch scan"}}, "size": 3})
    assert sorted(reg.warmers()) == ["w1", "w2"]
    reg.delete("nope")  # missing name: no-op, as ES wildcard deletes
    reg.delete("w1")
    assert sorted(reg.warmers()) == ["w2"]
    with pytest.raises(ValueError, match="non-empty dict"):
        reg.put("bad", {})
    with pytest.raises(KeyError):
        reg.get("w1")
    p = str(tmp_path / "warmers.json")
    reg.save(p)
    assert WarmerRegistry.load(p).warmers() == reg.warmers()


def test_run_warmers_replays_bodies(spark, searcher):
    """Each warmer's hit count equals running its body directly; rows are
    name-ordered."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search_index

    reg = WarmerRegistry()
    bodies = {
        "b_match": {"query": {"match": {"text": "dup batch"}}, "size": 5},
        "a_filtered": {
            "query": {
                "filtered": {
                    "query": {"match": {"text": "dup"}},
                    "filter": {"term": {"lang": "en"}},
                }
            }
        },
    }
    for n, b in bodies.items():
        reg.put(n, b)
    rows = run_warmers(searcher, reg).collect()
    assert [r.warmer for r in rows] == ["a_filtered", "b_match"]
    for r in rows:
        assert r.hits == dsl_search_index(searcher, bodies[r.warmer]).count()
        assert r.hits > 0


def test_unrunnable_warmer_raises(searcher):
    """A body outside the parsed subset fails the warm run loudly — the
    schema-drift signal warmers exist to surface."""
    reg = WarmerRegistry()
    reg.put("bad", {"query": {"match": {"no_such_field": "x"}}})
    with pytest.raises((ValueError, KeyError)):
        run_warmers(searcher, reg)


def test_load_revalidates_bodies(tmp_path):
    """A hand-edited state file cannot smuggle bodies put() would refuse
    (driver-advice r3: load used to assign the parsed JSON directly)."""
    import json

    p = str(tmp_path / "warmers.json")
    with open(p, "w") as f:
        json.dump({"ok": {"query": {"match_all": {}}}, "bad": []}, f)
    with pytest.raises(ValueError, match="non-empty dict"):
        WarmerRegistry.load(p)
    with open(p, "w") as f:
        json.dump(["not", "a", "dict"], f)
    with pytest.raises(ValueError, match="JSON object"):
        WarmerRegistry.load(p)
