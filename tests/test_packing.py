"""Training-data shaping ops (SURVEY §2.6): sequence packing, document
chunking, tf-idf keywords — oracle-checked (packing via a recursive-CTE
replay of the greedy recurrence) and parallelism-invariant."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.packing import (
    chunk_docs,
    chunk_docs_sql,
    doc_keywords,
    doc_keywords_sql,
    pack_sequences,
    pack_sequences_sql,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_pack_sequences_matches_duckdb(documents, duck):
    got = [tuple(r) for r in pack_sequences(documents, budget=64).collect()]
    want = [tuple(r) for r in duck.execute(pack_sequences_sql(budget=64)).fetchall()]
    assert got == want
    assert len(got) == documents.count()


def test_pack_bins_respect_budget(documents):
    rows = pack_sequences(documents, budget=64).collect()
    fills: dict[tuple, int] = {}
    sizes: dict[tuple, int] = {}
    for r in rows:
        key = (r["group"], r["bin"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
        sizes[key] = sizes.get(key, 0) + 1
    # a bin only exceeds the budget when it holds a single oversized doc
    for key, fill in fills.items():
        assert fill <= 64 or sizes[key] == 1, (key, fill, sizes[key])
    # greedy tightness: consecutive bins could not be merged
    assert any(fill > 32 for fill in fills.values())


def test_pack_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, "en", "a " * 100), (1, "en", "b c"), (2, "en", "d " * 100), (3, "en", "e")],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r["bin"] for r in pack_sequences(df, budget=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # oversized docs isolate; 3 won't fit after 2


def test_pack_parallelism_invariant(documents):
    a = [tuple(r) for r in pack_sequences(documents, budget=64).collect()]
    b = [tuple(r) for r in pack_sequences(documents.repartition(7), budget=64).collect()]
    assert a == b


def test_chunk_docs_matches_duckdb(documents, duck):
    got = [tuple(r) for r in chunk_docs(documents, window=32, stride=16).collect()]
    want = [
        tuple(r) for r in duck.execute(chunk_docs_sql(window=32, stride=16)).fetchall()
    ]
    assert got == want
    assert len(got) > documents.count()  # overlap multiplies chunks


def test_chunk_docs_shapes(spark):
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, ""), (2, "one")],
        "doc_id long, text string",
    )
    rows = chunk_docs(df, window=4, stride=3).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # empty doc yields nothing
    assert [r["chunk_text"] for r in by_doc[2]] == ["one"]
    # starts 0,3,6,9 -> windows of 4,4,4,1
    assert [r["n_tokens"] for r in by_doc[0]] == [4, 4, 4, 1]
    assert by_doc[0][1]["chunk_text"] == "t3 t4 t5 t6"
    # disjoint default: stride == window
    dis = chunk_docs(df, window=4).collect()
    assert [r["n_tokens"] for r in dis if r["doc_id"] == 0] == [4, 4, 2]


@pytest.mark.parametrize("kw", [{"window": 0}, {"window": 4, "stride": 0}])
def test_chunk_validation(documents, kw):
    with pytest.raises(ValueError):
        chunk_docs(documents, **kw)
    with pytest.raises(ValueError):
        chunk_docs_sql(**kw)


def test_doc_keywords_matches_duckdb(documents, duck):
    got = [tuple(r) for r in doc_keywords(documents, k=3).collect()]
    want = [tuple(r) for r in duck.execute(doc_keywords_sql(k=3)).fetchall()]
    assert got == want
    per_doc = {}
    for r in got:
        per_doc.setdefault(r[0], []).append(r[1])
    assert all(ranks == sorted(ranks) and len(ranks) <= 3 for ranks in per_doc.values())


def test_pack_validation(documents):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(documents, budget=0)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences_sql(budget=0)


def test_pack_non_string_group(spark):
    """Review regression: the applyInPandas schema derives the group type
    from the column (hash-bucket int groups must work, as the docstring
    promises)."""
    import duckdb as _d

    df = spark.createDataFrame(
        [(i, i % 3, "tok " * (i % 7 + 1)) for i in range(30)],
        "doc_id long, bucket long, text string",
    )
    got = [tuple(r) for r in pack_sequences(df, budget=8, group_col="bucket").collect()]
    con = _d.connect()
    con.register("documents", df.toPandas())
    want = con.sql(pack_sequences_sql(budget=8, group_col="bucket")).fetchall()
    assert got == want and len(got) == 30
