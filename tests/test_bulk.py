"""ES 1.x _bulk API (SURVEY §2.5): index/create/update/delete batches
applied to the corpus, oracle-checked — the exact surface the reference
sink drives (ElasticsearchSink.java:54-85, explicit-id upserts via
prepareIndex().setId())."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.bulk import (
    apply_bulk,
    apply_bulk_sql,
    fold_actions,
    parse_bulk,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _doc(text="replacement body", lang="en", source="bulk", n_chars=17):
    return {"text": text, "lang": lang, "source": source, "n_chars": n_chars}


ACTIONS = [
    ("index", 9001, _doc("brand new document")),
    ("index", 5, _doc("replaced existing")),
    ("update", 7, {"lang": "xx"}),
    ("update", 888888, {"lang": "yy"}),          # missing id -> skip
    ("delete", 3, None),
    ("delete", 777777, None),                    # missing id -> no-op
    ("create", 9002, _doc("created document")),
    ("create", 11, _doc("conflicting create")),  # exists -> skip, keep base
    ("index", 9003, _doc("indexed then patched")),
    ("update", 9003, {"n_chars": 123}),          # fold -> REPLACE(merged)
    ("delete", 12, None),
    ("create", 12, _doc("delete then create")),  # fold -> REPLACE
    ("update", 13, {"source": "s1"}),
    ("update", 13, {"lang": "zz"}),              # fold -> merged PATCH
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_fold_compresses_in_order():
    folded = fold_actions(ACTIONS)
    assert folded[9003] == ("REPLACE", {**_doc("indexed then patched"), "n_chars": 123})
    assert folded[12][0] == "REPLACE"
    assert folded[13] == ("PATCH", {"source": "s1", "lang": "zz"})
    assert folded[3] == ("DELETE", None)
    assert folded[11][0] == "CREATE"


def test_apply_bulk_matches_duckdb(documents, duck):
    got = [tuple(r) for r in apply_bulk(documents, ACTIONS).collect()]
    want = [
        tuple(r)
        for r in duck.execute(apply_bulk_sql(ACTIONS, COLS)).fetchall()
    ]
    assert got == want
    by_id = {r[0]: r for r in got}
    n_base = documents.count()
    assert 3 not in by_id and 9001 in by_id and 9002 in by_id
    assert by_id[5][1] == "replaced existing"
    assert by_id[7][2] == "xx"
    assert by_id[9003][4] == 123
    assert by_id[11][1] != "conflicting create"   # conflict skipped
    assert 888888 not in by_id                    # missing update skipped
    assert by_id[13][2] == "zz" and by_id[13][3] == "s1"
    assert len(got) == n_base - 1 + 3             # -deleted(3) +9001 +9002 +... 12 replaced


def test_error_modes(documents):
    with pytest.raises(ValueError, match="missing ids"):
        apply_bulk(documents, [("update", 888888, {"lang": "yy"})], missing="error")
    with pytest.raises(ValueError, match="create conflicts"):
        apply_bulk(documents, [("create", 11, _doc())], conflict="error")
    # the same batch in skip mode applies cleanly
    assert apply_bulk(documents, [("create", 11, _doc())]).count() == documents.count()


@pytest.mark.parametrize(
    "actions, msg",
    [
        ([("delete", 1, None), ("update", 1, {"lang": "x"})], "update after delete"),
        ([("update", 1, {"lang": "x"}), ("create", 1, _doc())], "create after update"),
        ([("update", 1, {"lang": None})], "null values"),
        ([("update", 1, {"bogus": "x"})], "outside the corpus schema"),
        ([("index", 1, {"text": "only text"})], "missing corpus fields"),
    ],
)
def test_out_of_subset_raises(documents, actions, msg):
    with pytest.raises(ValueError, match=msg):
        apply_bulk(documents, actions).collect()
    if "missing corpus" in msg or "null" in msg or "schema" in msg:
        with pytest.raises(ValueError, match=msg):
            apply_bulk_sql(actions, COLS)


def test_parse_bulk_ndjson():
    nd = "\n".join(
        [
            '{"index": {"_id": 4}}',
            '{"text": "t", "lang": "en", "source": "s", "n_chars": 1}',
            '{"delete": {"_id": 9}}',
            '{"update": {"_id": 7}}',
            '{"doc": {"lang": "fr"}}',
            '{"create": {"_id": 8}}',
            '{"text": "u", "lang": "de", "source": "s", "n_chars": 1}',
        ]
    )
    got = parse_bulk(nd)
    assert [a[:2] for a in got] == [("index", 4), ("delete", 9), ("update", 7), ("create", 8)]
    assert got[2][2] == {"lang": "fr"}


@pytest.mark.parametrize(
    "nd, msg",
    [
        ('{"index": {}}\n{"text": "t"}', "explicit _id"),
        ('{"bogus": {"_id": 1}}', "must be one of"),
        ('{"index": {"_id": 1}}', "missing its source"),
        ('{"update": {"_id": 1}}\n{"lang": "x"}', "update source must be"),
    ],
)
def test_parse_bulk_rejects(nd, msg):
    with pytest.raises(ValueError, match=msg):
        parse_bulk(nd)


def test_bulk_then_search_matches_oracle(documents, duck):
    """End-to-end: BM25 over the post-bulk corpus equals the BM25 oracle
    over the SQL-applied corpus (the subquery-composable order_by=False
    form) — the reference's bulk-index-then-search lifecycle."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk, bm25_topk_sql

    actions = [
        ("index", 9100, _doc("window filter batch window scan")),
        ("delete", 0, None),
    ]
    applied = apply_bulk(documents, actions)
    got = [(r.doc_id, r.score) for r in bm25_topk(applied, "window scan", k=10).collect()]
    sub = apply_bulk_sql(actions, COLS, order_by=False)
    want = [
        (i, s)
        for i, s in duck.execute(
            bm25_topk_sql("window scan", k=10, table=f"({sub})")
        ).fetchall()
    ]
    assert got == want
    assert 9100 in {i for i, _ in got}


# -- review regressions ------------------------------------------------------------


def test_update_after_create_refuses():
    """Review regression: when the create conflicts (skip mode) ES would
    still patch the EXISTING doc — the merged fold silently dropped the
    update; the interleaving forks on corpus membership and must refuse."""
    with pytest.raises(ValueError, match="update after create"):
        fold_actions([("create", 11, _doc()), ("update", 11, {"lang": "xx"})])


def test_create_never_broadcasts_corpus(documents):
    """Review regression: insert-if-absent resolves via the batch-sized
    id-IN probe, never an anti-join that broadcasts the corpus id column —
    the plan must contain NO join at all for a creates-only batch."""
    from tests.test_plan_hygiene import _plan

    out = apply_bulk(documents, [
        ("create", 90002, _doc()), ("create", 11, _doc()),  # one new, one conflict
    ])
    plan = _plan(out)
    assert "Join" not in plan, plan
    n = documents.count()
    assert out.count() == n + 1  # conflict skipped via the probe
