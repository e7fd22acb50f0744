"""Property fuzz over the serving path: random supported DSL bodies must be
rank- and score-identical between the segment index (BMW scatter, filter
pushdown, doc-stream must_not masks) and the declarative engine.

Complements test_dsl_fuzz.py (declarative vs oracle): this one stresses the
serving code paths, which carry the most intricate machinery."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.operators.dsl import dsl_search, dsl_search_index
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

TERMS = ["batch", "scan", "dup", "small", "slow", "window", "join", "filter", "the", "zzzq"]
LANGS = ["en", "fr", "de", "zh"]

terms_st = st.lists(st.sampled_from(TERMS), min_size=1, max_size=3)


@st.composite
def body_st(draw):
    q = " ".join(draw(terms_st))
    op = draw(st.sampled_from(["or", "and"]))
    shape = draw(
        st.sampled_from(
            ["match", "bool", "paged", "query_string", "common", "phrase_prefix"]
        )
    )
    if shape == "match":
        body = {"query": {"match": {"text": {"query": q, "operator": op}}}}
    elif shape == "common":
        body = {"query": {"common": {"text": {
            "query": q,
            "cutoff_frequency": draw(st.sampled_from([0.02, 0.1, 0.5, 0.8])),
            "low_freq_operator": op,
        }}}}
    elif shape == "phrase_prefix":
        firsts = draw(st.lists(st.sampled_from(TERMS), min_size=0, max_size=2))
        base = draw(st.sampled_from(TERMS))
        prefix = base[: draw(st.integers(1, len(base)))]
        body = {"query": {"match_phrase_prefix": {"text": {
            "query": " ".join(firsts + [prefix]),
            "slop": draw(st.sampled_from([0, 1, 2])),
        }}}}
    elif shape == "query_string":
        joiner = " AND " if op == "and" else " "
        body = {"query": {"query_string": {"query": joiner.join(draw(terms_st))}}}
    elif shape == "paged":
        body = {"query": {"match": {"text": q}}, "from": draw(st.integers(0, 15))}
    else:
        b = {"must": [{"match": {"text": {"query": q, "operator": op}}}]}
        flt = []
        if draw(st.booleans()):
            flt.append({"term": {"lang": draw(st.sampled_from(LANGS))}})
        if draw(st.booleans()):
            lo = draw(st.integers(0, 2000))
            flt.append({"range": {"n_chars": {"gte": lo, "lt": lo + draw(st.integers(1, 4000))}}})
        if draw(st.booleans()):
            # round 5: general or / not-over-or nodes on the serving path
            inner = [{"term": {"lang": draw(st.sampled_from(LANGS))}},
                     {"range": {"n_chars": {"gte": draw(st.integers(0, 2500))}}}]
            flt.append({"or": inner} if draw(st.booleans())
                       else {"not": {"or": inner}})
        if flt:
            b["filter"] = flt
        if draw(st.booleans()):
            b["must_not"] = [{"term": {"text": draw(st.sampled_from(TERMS))}}]
        body = {"query": {"bool": b}}
    body["size"] = draw(st.integers(1, 15))
    return body


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "n_chars", "text"),
        store_positions=True,
    )
    return IndexSearcher(spark, d)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(body=body_st())
def test_random_bodies_serving_equals_declarative(documents, searcher, body):
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want, body
