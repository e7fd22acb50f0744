"""Property fuzz over the ES query-DSL front door: random bodies from the
supported grammar must agree with the DuckDB oracle exactly.

Complements test_dsl.py's fixed shapes: hypothesis explores operator/
filter/paging combinations (including empty-result and all-match corners)
that hand-picked cases miss."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.operators.dsl import dsl_search, dsl_search_sql

TERMS = ["batch", "scan", "dup", "small", "slow", "window", "join", "filter", "the", "zzzq"]
LANGS = ["en", "fr", "de", "zh", "es"]

terms_st = st.lists(st.sampled_from(TERMS), min_size=1, max_size=3)


def match_clause(draw):
    q = " ".join(draw(terms_st))
    if draw(st.booleans()):
        return {"match": {"text": q}}
    opts = {"query": q, "operator": draw(st.sampled_from(["or", "and"]))}
    if opts["operator"] == "or" and draw(st.booleans()):
        opts["minimum_should_match"] = draw(st.integers(1, 3))
    return {"match": {"text": opts}}


filter_st = st.lists(
    st.one_of(
        st.sampled_from(LANGS).map(lambda v: {"term": {"lang": v}}),
        st.lists(st.sampled_from(LANGS), min_size=1, max_size=3, unique=True).map(
            lambda v: {"terms": {"lang": sorted(v)}}
        ),
        st.tuples(st.integers(0, 3000), st.integers(0, 4000)).map(
            lambda lo_hi: {"range": {"n_chars": {"gte": lo_hi[0], "lt": lo_hi[0] + lo_hi[1] + 1}}}
        ),
        # round 5: general cross-field or (conjunction branches), nested
        # not-inside-or, and not-over-or — the compound filter nodes
        st.tuples(st.sampled_from(LANGS), st.integers(0, 3000)).map(
            lambda lv: {"or": [{"term": {"lang": lv[0]}},
                               {"range": {"n_chars": {"gte": lv[1]}}}]}
        ),
        st.tuples(
            st.sampled_from(LANGS), st.sampled_from(LANGS), st.integers(0, 2500)
        ).map(
            lambda t: {"or": [
                {"and": [{"term": {"lang": t[0]}},
                         {"range": {"n_chars": {"lt": t[2]}}}]},
                {"not": {"term": {"lang": t[1]}}},
            ]}
        ),
        st.tuples(st.sampled_from(LANGS), st.integers(0, 3000)).map(
            lambda lv: {"not": {"or": [{"term": {"lang": lv[0]}},
                                       {"range": {"n_chars": {"lt": lv[1]}}}]}}
        ),
    ),
    max_size=2,
)


@st.composite
def body_st(draw):
    shape = draw(
        st.sampled_from(
            ["match", "bool", "match_all_filtered", "paged", "common", "phrase_prefix"]
        )
    )
    if shape == "match":
        body = {"query": match_clause(draw)}
    elif shape == "bool":
        b = {"must": [match_clause(draw)], "filter": draw(filter_st)}
        if draw(st.booleans()):
            b["must_not"] = [{"term": {"text": draw(st.sampled_from(TERMS))}}]
        body = {"query": {"bool": b}}
    elif shape == "match_all_filtered":
        body = {"query": {"bool": {"filter": draw(filter_st)}}}
    elif shape == "common":
        # round 3 (Q34): random df split point + low operator
        body = {"query": {"common": {"text": {
            "query": " ".join(draw(terms_st)),
            "cutoff_frequency": draw(st.sampled_from([0.02, 0.1, 0.5, 0.8, 3.0])),
            "low_freq_operator": draw(st.sampled_from(["or", "and"])),
        }}}}
    elif shape == "phrase_prefix":
        # round 3 (Q35): random first terms + a prefix of a known term
        firsts = draw(st.lists(st.sampled_from(TERMS), min_size=0, max_size=2))
        base = draw(st.sampled_from(TERMS))
        prefix = base[: draw(st.integers(1, len(base)))]
        body = {"query": {"match_phrase_prefix": {"text": {
            "query": " ".join(firsts + [prefix]),
            "slop": draw(st.sampled_from([0, 0, 1, 2])),
        }}}}
    else:
        body = {"query": match_clause(draw), "from": draw(st.integers(0, 20))}
    body["size"] = draw(st.integers(1, 20))
    return body


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(body=body_st())
def test_random_bodies_match_oracle(documents, duck, body):
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want, body
