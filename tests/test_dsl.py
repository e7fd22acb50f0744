"""ES query-DSL front door (SURVEY §2.5): search bodies routed to native
operators, checked vs the DuckDB oracle and serving-vs-declarative.

Reference analog: the JSON query DSL the reference deployment's ES clients
send (delegation site ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.dsl import (
    dsl_search,
    dsl_search_index,
    dsl_search_sql,
    parse_body,
)
from flume_elasticsearch_2_spark.plans.build_index import build_segments_partial
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

# body -> also runnable on the serving path?
BODIES: list[tuple[str, dict, bool]] = [
    ("plain_match", {"query": {"match": {"text": "dup batch scan"}}}, True),
    (
        "match_and_op",
        {"query": {"match": {"text": {"query": "join filter window", "operator": "and"}}}, "size": 5},
        True,
    ),
    ("match_phrase", {"query": {"match_phrase": {"text": "part filter"}}}, True),
    ("term_on_text", {"query": {"term": {"text": "dup"}}}, True),
    (
        # pre-0.19.9 text / text_phrase / text_phrase_prefix spellings, kept
        # as deprecated aliases of match/* through ES 1.x (MatchQueryParser
        # registers both names)
        "text_alias_0x",
        {"query": {"text": {"text": "dup batch scan"}}},
        True,
    ),
    ("text_phrase_alias_0x", {"query": {"text_phrase": {"text": "part filter"}}}, True),
    (
        "text_phrase_prefix_alias_0x",
        {"query": {"text_phrase_prefix": {"text": "batch s"}}},
        True,
    ),
    (
        # a LONE span_term degenerates to the term query (every occurrence
        # is a width-1 span, span freq == tf)
        "span_term_lone",
        {"query": {"span_term": {"text": "dup"}}},
        True,
    ),
    ("prefix", {"query": {"prefix": {"text": "ba"}}}, True),
    ("wildcard", {"query": {"wildcard": {"text": "s*r*"}}}, True),
    (
        "regexp",
        {"query": {"regexp": {"text": {"value": "s(can|mall|ort)"}}}, "size": 8},
        True,
    ),
    (
        "span_near",
        {"query": {"span_near": {
            "clauses": [{"span_term": {"text": "batch"}},
                        {"span_term": {"text": "scan"}}],
            "slop": 3, "in_order": True}}, "size": 10},
        True,
    ),
    (
        # 1.x prefix FILTER on a stored field (vs the prefix QUERY above,
        # which expands the analyzed term dictionary)
        "prefix_filter",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"prefix": {"source": "src1"}}]}},
         "size": 8},
        True,
    ),
    (
        "prefix_filter_long_form",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"prefix": {"source": {"value": "src1"}}}]}},
         "size": 8},
        True,
    ),
    (
        # 1.x regexp FILTER: whole-string anchored, verbatim stored field
        "regexp_filter",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"regexp": {"source": "src1[0-5]"}}]}},
         "size": 8},
        True,
    ),
    (
        "regexp_filter_alternation",
        {"query": {"bool": {"must": [{"match": {"text": "scan"}}],
                            "filter": [{"regexp": {"source": {"value": "src(2|4|17)"}}}]}},
         "size": 8},
        True,
    ),
    (
        # 1.x numeric_range filter: fielddata-backed alias of range
        "numeric_range_filter",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"numeric_range": {"n_chars": {"gte": 100,
                                                                      "lt": 100000}}}]}},
         "size": 8},
        True,
    ),
    (
        # legacy 1.x from/to + include_lower/include_upper range spelling
        "range_from_to_filter",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"range": {"n_chars": {"from": 100, "to": 5000,
                                                              "include_upper": False}}}]}},
         "size": 8},
        True,
    ),
    (
        "fuzzy",
        {"query": {"fuzzy": {"text": {"value": "part", "fuzziness": 2}}}},
        True,
    ),
    (
        "common_terms",
        {"query": {"common": {"text": {
            "query": "dup batch scan", "cutoff_frequency": 0.1}}}, "size": 30},
        True,
    ),
    (
        # cutoff 0.77 at sf0.001: low = {dup df=25, small df=377}, high =
        # {batch df=386} — 'and' requires BOTH low terms, batch scores only
        "common_terms_and",
        {"query": {"common": {"text": {
            "query": "dup small batch", "cutoff_frequency": 0.77,
            "low_freq_operator": "and"}}}, "size": 10},
        True,
    ),
    (
        # common terms as the scored bool clause, composed with filter +
        # must_not (candidate restriction; stats/df-split stay index-wide)
        "common_filtered",
        {"query": {"bool": {
            "must": [{"common": {"text": {
                "query": "dup batch scan", "cutoff_frequency": 0.1}}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
            "must_not": [{"match": {"text": "slow"}}],
        }}, "size": 30},
        True,
    ),
    (
        "bool_full",
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": "dup batch scan"}}],
                    "filter": [
                        {"term": {"lang": "en"}},
                        {"range": {"n_chars": {"gte": 100, "lt": 100000}}},
                    ],
                    "must_not": [{"term": {"text": "slow"}}],
                }
            }
        },
        True,
    ),
    (
        "bool_should_boosted",
        {
            "query": {
                "bool": {
                    "should": [
                        {"term": {"text": {"value": "dup", "boost": 2.0}}},
                        {"term": {"text": "batch"}},
                        {"term": {"text": "scan"}},
                    ],
                    "minimum_should_match": 2,
                }
            }
        },
        True,
    ),
    ("match_all", {"query": {"match_all": {}}, "size": 7}, False),
    ("ids", {"query": {"ids": {"values": [3, 1, 4, 1, 5]}}}, False),
    (
        "match_all_filtered",
        {
            "query": {"bool": {"filter": [{"terms": {"lang": ["en", "fr"]}}]}},
            "size": 6,
            "from": 2,
        },
        False,
    ),
    (
        "sorted",
        {"query": {"match": {"text": "batch small scan"}},
         "sort": [{"n_chars": {"order": "desc"}}], "size": 5},
        True,
    ),
    (
        "paged",
        {"query": {"match": {"text": "batch small scan"}}, "from": 5, "size": 5},
        True,
    ),
    (
        "highlighted",
        {"query": {"match": {"text": "dup batch"}},
         "highlight": {"fields": {"text": {}}}},
        True,
    ),
    (
        "exists_filter",
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": "dup batch"}}],
                    "filter": [{"exists": {"field": "lang"}}],
                }
            }
        },
        True,
    ),
    (
        "should_match_clauses",
        {
            "query": {
                "bool": {
                    "should": [
                        {"match": {"text": "dup batch"}},
                        {"term": {"text": {"value": "scan", "boost": 2.0}}},
                    ]
                }
            }
        },
        True,
    ),
    (
        "source_filtered",
        {"query": {"match": {"text": "dup batch scan"}},
         "_source": ["lang", "n_chars"], "size": 5},
        True,
    ),
    (
        "source_matchall",
        {"query": {"bool": {"filter": [{"term": {"lang": "en"}}]}},
         "_source": ["n_chars"], "size": 6},
        False,
    ),
    (
        # 1.x compound filters: and-flatten + null-safe not
        "filtered_and_not",
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch"}},
            "filter": {"and": [{"range": {"n_chars": {"gte": 100}}},
                               {"not": {"term": {"lang": "de"}}}]}}},
         "size": 10},
        True,
    ),
    (
        # 1.x or filter: same-field term branches == the terms filter
        "bool_or_filter",
        {"query": {"bool": {
            "must": [{"match": {"text": "dup batch scan"}}],
            "filter": [{"or": [{"term": {"lang": "en"}},
                               {"term": {"lang": "fr"}}]}]}},
         "size": 10},
        True,
    ),
    (
        # round 5: GENERAL or filter — cross-field disjunction of
        # conjunctions (the most common still-refusing 1.x body shape,
        # delegation site ElasticsearchSink.java:54)
        "or_filter_cross_field",
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch scan"}},
            "filter": {"or": [
                {"term": {"lang": "en"}},
                {"and": [{"range": {"n_chars": {"gte": 900}}},
                         {"term": {"source": "web"}}]},
            ]}}},
         "size": 10},
        True,
    ),
    (
        # or long form {"filters": [...]} + nested not-inside-or branch
        "or_filter_long_form",
        {"query": {"filtered": {
            "query": {"match": {"text": "batch scan"}},
            "filter": {"or": {"filters": [
                {"not": {"term": {"lang": "en"}}},
                {"prefix": {"source": "we"}},
            ]}}}},
         "size": 10},
        True,
    ),
    (
        # not over a compound (NOT node): De-Morgan-free general negation
        "not_over_or_filter",
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch scan"}},
            "filter": {"not": {"or": [
                {"term": {"lang": "en"}},
                {"range": {"n_chars": {"lt": 400}}},
            ]}}}},
         "size": 10},
        True,
    ),
    (
        # not long form {"not": {"filter": {...}}} (NotFilterParser)
        "not_filter_long_form",
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch scan"}},
            "filter": {"not": {"filter": {"range": {"n_chars": {"gte": 200,
                                                                "lt": 2000}}}}}}},
         "size": 10},
        True,
    ),
    (
        "toplevel_exists",
        {"query": {"exists": {"field": "lang"}}, "size": 6},
        False,
    ),
    (
        "toplevel_terms",
        {"query": {"terms": {"lang": ["en", "fr"]}}, "size": 6},
        False,
    ),
    (
        "post_filter_term",
        {"query": {"match": {"text": "dup batch scan"}},
         "post_filter": {"term": {"lang": "en"}}, "size": 10},
        True,
    ),
    (
        "post_filter_range_composed",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch"}}],
                            "filter": [{"exists": {"field": "lang"}}]}},
         "post_filter": {"range": {"n_chars": {"gte": 200}}}, "size": 10},
        True,
    ),
    (
        "min_score",
        {"query": {"match": {"text": "dup batch scan"}}, "size": 30,
         "min_score": 3.0},
        True,
    ),
    (
        "min_score_filtered_bool",
        {"query": {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                            "filter": [{"range": {"n_chars": {"gte": 100}}}]}},
         "size": 30, "min_score": 2.0},
        True,
    ),
    (
        "fuzzy_like_this",
        {"query": {"fuzzy_like_this": {"like_text": "bath scen windoq",
                                       "fuzziness": 1}}, "size": 8},
        True,
    ),
    (
        "fuzzy_like_this_prefix_guard",
        {"query": {"fuzzy_like_this": {"like_text": "batch dup", "fuzziness": 1,
                                       "prefix_length": 2, "fields": ["text"]}}, "size": 6},
        True,
    ),
    (
        "script_score",
        {"query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "script_score": {"script": "_score * (1 + log(1 + doc['n_chars'].value / 100))"},
        }}, "size": 8},
        False,  # function_score is declarative-only (house precedent)
    ),
    (
        "script_score_no_score_ref",
        {"query": {"function_score": {
            "query": {"match": {"text": "dup batch"}},
            "script_score": {"script": "sqrt(doc['n_chars'].value) + max(1, 2)"},
        }}, "size": 5},
        False,
    ),
    (
        # 1.x custom_score: alias of function_score.script_score
        "custom_score_1x",
        {"query": {"custom_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "script": "_score * (1 + log(1 + doc['n_chars'].value / 100))",
        }}, "size": 8},
        False,
    ),
    (
        # 1.x custom_boost_factor: score × constant (rank-preserving)
        "custom_boost_factor_1x",
        {"query": {"custom_boost_factor": {
            "query": {"match": {"text": "dup batch scan"}},
            "boost_factor": 2.5,
        }}, "size": 8},
        False,
    ),
    (
        "decay_gauss",
        {"query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "gauss": {"n_chars": {"origin": 400, "scale": 250, "offset": 20,
                                  "decay": 0.4}},
        }}, "size": 8},
        True,  # field-driven function_score serves exactly (BMW off)
    ),
    (
        "decay_linear_sum",
        {"query": {"function_score": {
            "query": {"match": {"text": "dup batch"}},
            "linear": {"n_chars": {"origin": 300, "scale": 200}},
            "boost_mode": "sum",
        }}, "size": 8},
        True,
    ),
    (
        "decay_exp_defaults",
        {"query": {"function_score": {
            "query": {"match": {"text": {"query": "scan window", "operator": "and"}}},
            "exp": {"n_chars": {"origin": 500, "scale": 150}},
        }}, "size": 8},
        True,
    ),
    (
        "script_fields",
        {"query": {"match": {"text": "dup batch scan"}},
         "script_fields": {"kchars": {"script": "doc['n_chars'].value / 1000"},
                           "ln_chars": {"script": "log1p(doc['n_chars'].value)"}},
         "size": 5},
        True,
    ),
    (
        "script_fields_matchall",
        {"query": {"bool": {"filter": [{"term": {"lang": "en"}}]}},
         "_source": ["n_chars"],
         "script_fields": {"neg": {"script": "-min(doc['n_chars'].value, 150)"}},
         "size": 6},
        False,
    ),
    (
        # sqs infix | = OR; connectors may arrive unspaced
        "sqs_or",
        {"query": {"simple_query_string": {"query": "dup|batch | scan"}}},
        True,
    ),
    (
        # sqs infix + = AND (unlike query_string's prefix +)
        "sqs_and",
        {"query": {"simple_query_string": {"query": "dup + batch"}}, "size": 8},
        True,
    ),
    (
        "sqs_not_default_and",
        {"query": {"simple_query_string": {
            "query": "dup batch -slow", "default_operator": "and",
            "flags": "AND|NOT|WHITESPACE"}}},
        True,
    ),
    (
        "sqs_phrase",
        {"query": {"simple_query_string": {
            "query": '"batch scan"', "fields": ["text"]}}},
        True,
    ),
    (
        "sqs_prefix",
        {"query": {"simple_query_string": {"query": "merg*"}}, "size": 10},
        True,
    ),
    (
        # all-punctuation query + zero_terms_query=all -> match_all
        "match_ztq_all",
        {"query": {"match": {"text": {"query": "!!! ...", "zero_terms_query": "all"}}},
         "size": 7},
        False,  # rewrites to match_all, which serving refuses (declarative-only)
    ),
    (
        # the default (none): same query yields zero hits
        "match_ztq_none",
        {"query": {"match": {"text": {"query": "!!! ...",
                                      "zero_terms_query": "none"}}}},
        True,
    ),
    (
        "highlight_fragment",
        {"query": {"match": {"text": "dup batch"}}, "size": 6,
         "highlight": {"fields": {"text": {"fragment_size": 50,
                                           "number_of_fragments": 1}}}},
        True,
    ),
    (
        # non-empty analysis: the option is inert
        "match_ztq_inert",
        {"query": {"match": {"text": {"query": "dup batch",
                                      "zero_terms_query": "all"}}}, "size": 6},
        True,
    ),
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


@pytest.fixture(scope="module")
def searcher(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dslidx") / "segidx")
    build_segments_partial(
        spark, documents, d, n_shards=4,
        orig_ids=documents.select("doc_id", "lang", "source", "n_chars", "text"),
        store_positions=True,
    )
    return IndexSearcher(spark, d)


@pytest.mark.parametrize("name,body,_srv", BODIES, ids=[b[0] for b in BODIES])
def test_dsl_matches_duckdb(documents, duck, name, body, _srv):
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want, name
    # fuzzy legitimately misses at sf0.001; match_ztq_none's CONTRACT is 0 hits
    assert got or name in ("fuzzy", "match_ztq_none"), (
        f"{name}: empty result weakens the check"
    )


@pytest.mark.parametrize(
    "name,body",
    [(n, b) for n, b, srv in BODIES if srv],
    ids=[n for n, _, srv in BODIES if srv],
)
def test_dsl_serving_equals_declarative(documents, searcher, name, body):
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want, name


def test_dsl_mlt_routes(documents, searcher):
    text = documents.where("doc_id = 7").collect()[0].text
    body = {"query": {"more_like_this": {"like": text, "min_doc_freq": 1}}, "size": 10}
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want and got


@pytest.mark.parametrize(
    "bad",
    [
        {"query": {"match": {"title": "x"}}},
        {"query": {"match": {"text": {"query": "a", "zero_terms_query": "bogus"}}}},
        {"query": {"regexp": {"text": "a\\d+"}}},  # backslash outside the 3-engine subset
        {"query": {"bool": {"must": [{"match": {"text": "a"}}, {"match": {"text": "b"}}]}}},
        {"query": {"match": {"text": "a"}}, "aggs": {}},
        {"query": {"bool": {"filter": [{"limit": {"value": 5}}]}}},
        {"query": {"match_phrase": {"text": "a b"}}, "sort": [{"n_chars": "asc"}]},
        {"query": {"span_near": {"clauses": [{"span_term": {"text": "a"}},
                                             {"span_term": {"text": "b"}}],
                                 "in_order": False}}},
        {"query": {"span_near": {"clauses": [{"span_term": {"text": "a b"}},
                                             {"span_term": {"text": "c"}}],
                                 "in_order": True}}},
        # range spellings refuse to mix; both-null from/to; non-bool flags
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"range": {"n_chars": {"from": 1, "gte": 2}}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"range": {"n_chars": {"from": None, "to": None}}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"numeric_range": {"n_chars": {"from": 1, "include_lower": "true"}}}]}}},
        # 1.x field query: unknown options / missing query / non-analyzed field
        {"query": {"field": {"text": {"query": "a", "boost": 2.0}}}},
        {"query": {"field": {"text": {}}}},
        {"query": {"field": {"lang": "en"}}},
        # lone span_term inherits the term guard: analyzed text field only
        {"query": {"span_term": {"lang": "en"}}},
        # 1.x custom_score / custom_boost_factor alias guards
        {"query": {"custom_score": {"query": {"match": {"text": "a"}},
                                    "script": "_score * 2", "lang": "mvel"}}},
        {"query": {"custom_score": {"query": {"match": {"text": "a"}}}}},
        {"query": {"custom_boost_factor": {"query": {"match": {"text": "a"}},
                                           "boost_factor": -1}}},
        {"query": {"custom_boost_factor": {"query": {"match": {"text": "a"}},
                                           "boost_factor": "2"}}},
        {"query": {"custom_boost_factor": {"boost_factor": 2}}},
        # script_score excludes boost_mode / other functions; scripts parse-fail loudly
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "script_score": {"script": "_score * 2"},
                                      "boost_mode": "sum"}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "script_score": {"script": "_score * 2"},
                                      "random_score": {"seed": 1}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      # exp() became supported in r4; sinh stays out
                                      "script_score": {"script": "sinh(_score)"}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "script_score": {"script": "_source.text"}}}},
        # decay: ONE function, numeric origins only, params validated
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "gauss": {"n_chars": {"origin": 1, "scale": 2}},
                                      "linear": {"n_chars": {"origin": 1, "scale": 2}}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "gauss": {"n_chars": {"origin": 1, "scale": 2}},
                                      "random_score": {"seed": 7}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "gauss": {"created_at": {"origin": "now",
                                                               "scale": "7d"}}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "gauss": {"n_chars": {"scale": 2}}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "exp": {"n_chars": {"origin": 1, "scale": 0}}}}},
        {"query": {"function_score": {"query": {"match": {"text": "a"}},
                                      "linear": {"n_chars": {"origin": 1, "scale": 2,
                                                             "decay": 1.5}}}}},
        # post_filter merges into spec.filters -> sort/highlight reject it
        {"query": {"match": {"text": "a"}}, "post_filter": {"term": {"lang": "en"}},
         "sort": [{"n_chars": "desc"}]},
        {"query": {"match": {"text": "a"}}, "post_filter": {"term": {"lang": "en"}},
         "highlight": {"fields": {"text": {}}}},
        # compound filters (round 5: general or / not-over-compound are now
        # SUPPORTED — only malformed compounds still refuse)
        {"query": {"filtered": {"query": {"match": {"text": "a"}},
                                "filter": {"or": []}}}},
        {"query": {"filtered": {"query": {"match": {"text": "a"}},
                                "filter": {"or": {"filters": []}}}}},
        {"query": {"filtered": {"query": {"match": {"text": "a"}},
                                "filter": {"or": [{"and": []}]}}}},
        # top-level filter queries: analyzed text field refused
        {"query": {"terms": {"text": ["a", "b"]}}},
        {"query": {"exists": {"field": "text"}}},
        # prefix/regexp FILTERS: empty prefix, non-string prefix, regexp
        # outside the three-engine-safe subset (backslash escape / anchor)
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"prefix": {"source": ""}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"prefix": {"source": 7}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"regexp": {"source": "src\\d+"}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"regexp": {"source": "^src1"}}]}}},
        {"query": {"bool": {"must": [{"match": {"text": "a"}}],
                            "filter": [{"regexp": {"source": {"value": "src1", "flags": "ALL"}}}]}}},
        # min_score composes with scored match/bool only
        {"query": {"match_all": {}}, "min_score": 1.0},
        {"query": {"match": {"text": "a"}}, "min_score": 1.0,
         "sort": [{"n_chars": "desc"}]},
        {"query": {"match_phrase": {"text": "a b"}}, "min_score": 1.0},
        # fuzzy_like_this: 1.x min_similarity float form unsupported; text field only
        {"query": {"fuzzy_like_this": {"like_text": "a", "min_similarity": 0.5}}},
        {"query": {"fuzzy_like_this": {"like_text": "a", "fields": ["lang"]}}},
        {"query": {"fuzzy_like_this": {"fuzziness": 1}}},
        # script_fields: no _score, no shadowing, match/match_all only
        {"query": {"match": {"text": "a"}},
         "script_fields": {"s": {"script": "_score + 1"}}},
        {"query": {"match": {"text": "a"}},
         "script_fields": {"score": {"script": "doc['n_chars'].value"}}},
        {"query": {"match_phrase": {"text": "a b"}},
         "script_fields": {"s": {"script": "doc['n_chars'].value"}}},
    ],
)
def test_dsl_rejects_unsupported_loudly(bad):
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body(bad)


# -- aggs ---------------------------------------------------------------------

AGG_BODIES = [
    (
        # ES standalone metric aggs — the most common agg bodies
        "metric_avg_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"a": {"avg": {"field": "n_chars"}}}},
    ),
    (
        "metric_min_matchall",
        {"aggs": {"a": {"min": {"field": "n_chars"}}}},
    ),
    (
        "metric_sum_scoped",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"a": {"sum": {"field": "n_chars"}}}},
    ),
    (
        "metric_max_scoped",
        {"query": {"match": {"text": "dup"}},
         "aggs": {"a": {"max": {"field": "n_chars"}}}},
    ),
    (
        # ES global agg: the sub-agg ignores the body's query scope
        "global_stats",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"all": {"global": {},
                          "aggs": {"len": {"stats": {"field": "n_chars"}}}}}},
    ),
    (
        # ES histogram min_doc_count:0 + extended_bounds — empty buckets kept
        "histogram_empty_buckets",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"h": {"histogram": {"field": "n_chars", "interval": 500,
                                      "min_doc_count": 0,
                                      "extended_bounds": {"min": 0, "max": 4000}}}}},
    ),
    (
        "histogram_min_doc_count",
        {"aggs": {"h": {"histogram": {"field": "n_chars", "interval": 200,
                                      "min_doc_count": 3}}}},
    ),
    (
        "terms_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"langs": {"terms": {"field": "lang", "size": 5}}}},
    ),
    (
        # ES terms-agg options: bucket floor + ascending count order
        "terms_min_doc_count_order",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"langs": {"terms": {"field": "lang", "size": 10,
                                      "min_doc_count": 3,
                                      "order": {"_count": "asc"}}}}},
    ),
    (
        # include: whole-value regex over the bucket key (three-engine subset)
        "terms_include",
        {"aggs": {"langs": {"terms": {"field": "lang", "size": 10,
                                      "include": "(en|fr|de)"}}}},
    ),
    (
        "terms_exclude_term_order",
        {"aggs": {"langs": {"terms": {"field": "lang", "size": 10,
                                      "exclude": "e.*",
                                      "order": {"_term": "desc"}}}}},
    ),
    (
        "stats_matchall",
        {"aggs": {"len": {"stats": {"field": "n_chars"}}}},
    ),
    (
        "histogram_facets_key",
        {"query": {"match": {"text": {"query": "join filter window", "operator": "and"}}},
         "facets": {"h": {"histogram": {"field": "n_chars", "interval": 500}}}},
    ),
    (
        "nested_terms_stats",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"by_lang": {"terms": {"field": "lang", "size": 4},
                              "aggs": {"chars": {"stats": {"field": "n_chars"}}}}}},
    ),
    (
        "nested_terms_stats_matchall",
        {"aggs": {"by_lang": {"terms": {"field": "lang"},
                              "aggs": {"c": {"stats": {"field": "n_chars"}}}}}},
    ),
    (
        "range_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"len": {"range": {"field": "n_chars",
                                    "ranges": [{"to": 200},
                                               {"from": 200, "to": 1000},
                                               {"from": 1000}]}}}},
    ),
    (
        "range_matchall",
        {"aggs": {"len": {"range": {"field": "n_chars",
                                    "ranges": [{"to": 500, "key": "short"},
                                               {"from": 500, "key": "long"}]}}}},
    ),
    (
        "filters_scoped",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"byf": {"filters": {"filters": {
             "en": {"term": {"lang": "en"}},
             "big": {"range": {"n_chars": {"gte": 1000}}},
             "webby": {"terms": {"source": ["web", "news"]}},
             "sourced": {"exists": {"field": "source"}}}}}}},
    ),
    (
        "cardinality_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"nsrc": {"cardinality": {"field": "source"}}}},
    ),
    (
        "cardinality_matchall",
        {"aggs": {"nsrc": {"cardinality": {"field": "source",
                                           "precision_threshold": 3000}}}},
    ),
    (
        "missing_scoped",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"nosrc": {"missing": {"field": "source"}}}},
    ),
    (
        "extended_stats_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"len": {"extended_stats": {"field": "n_chars"}}}},
    ),
    (
        "extended_stats_matchall",
        {"aggs": {"len": {"extended_stats": {"field": "n_chars"}}}},
    ),
    (
        "value_count_scoped",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"n": {"value_count": {"field": "source"}}}},
    ),
    (
        # 1.x query FACET: docs matching another match query within scope
        "query_facet_scoped",
        {"query": {"match": {"text": "batch scan"}},
         "facets": {"qf": {"query": {"match": {"text": "dup"}}}}},
    ),
    (
        "query_facet_and_modes",
        {"query": {"match": {"text": {"query": "join filter", "operator": "and"}}},
         "facets": {"qf": {"query": {"match": {"text": {"query": "dup small",
                                                        "operator": "and"}}}}}},
    ),
    (
        # 1.x filter FACET (one bucket) rewritten to the filters agg
        "filter_facet_single",
        {"query": {"match": {"text": "batch scan"}},
         "facets": {"f": {"filter": {"term": {"lang": "en"}}}}},
    ),
]

# round 5: percentiles / significant_terms / top_hits / script-valued
# metrics all gained mergeable-partial serving forms — the declarative-only
# list is EMPTY for this fixture (ip_range remains declarative-only but is
# structural: no stored index carries an ip column; pinned in
# test_dsl_aggs_serving_ip_range_refuses below)
AGG_BODIES_DECLARATIVE: list = []

AGG_BODIES_SERVING_R5 = [
    (
        # metric agg with a script value: the script AST's NumPy engine
        # runs inside the shard tasks (round 5)
        "metric_script_avg",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"a": {"avg": {"script": "log1p(doc['n_chars'].value)"}}}},
    ),
    (
        "scripted_metric_sum",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"m": {"scripted_metric": {
             "map_script": "doc['n_chars'].value > 500 ? 1 : 0",
             "reduce": "sum"}}}},
    ),
    (
        "percentiles_scoped",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"p": {"percentiles": {"field": "n_chars",
                                        "percents": [5, 50, 95]}}}},
    ),
    (
        "percentiles_matchall",
        {"aggs": {"p": {"percentiles": {"field": "n_chars"}}}},
    ),
    (
        "significant_terms",
        {"query": {"match": {"text": "dup batch scan"}},
         "aggs": {"sig": {"significant_terms": {"field": "text", "size": 8}}}},
    ),
    (
        "top_hits_nested",
        {"query": {"match": {"text": "batch scan"}},
         "aggs": {"by_lang": {"terms": {"field": "lang"},
                              "aggs": {"h": {"top_hits": {
                                  "size": 2,
                                  "sort": [{"n_chars": {"order": "desc"}}]}}}}}},
    ),
]


@pytest.mark.parametrize(
    "name,body",
    AGG_BODIES + AGG_BODIES_SERVING_R5,
    ids=[b[0] for b in AGG_BODIES + AGG_BODIES_SERVING_R5],
)
def test_dsl_aggs_match_duckdb_and_serving(documents, duck, searcher, name, body):
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_index,
        dsl_aggregation_sql,
    )

    got = [tuple(r) for r in dsl_aggregation(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_aggregation_sql(body)).fetchall()]
    assert got == want and got, name
    srv = [tuple(r) for r in dsl_aggregation_index(searcher, body).collect()]
    assert srv == got, name


def test_dsl_aggs_serving_ip_range_refuses(searcher):
    """ip_range stays declarative-only STRUCTURALLY (no stored index
    carries an ip column) — the one remaining serving agg refusal."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation_index

    body = {"query": {"match": {"text": "a"}},
            "aggs": {"r": {"ip_range": {"field": "ip",
                                        "ranges": [{"to": "10.0.0.0"}]}}}}
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_aggregation_index(searcher, body)


def test_dsl_aggs_rejects_unsupported():
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation_sql

    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql({"aggs": {"a": {"geo_distance": {"field": "lang"}}}})
    # terms-agg options validated loudly
    for bad_terms in (
        {"field": "lang", "order": {"_key": "asc"}},
        {"field": "lang", "order": {"_count": "down"}},
        {"field": "lang", "shard_size": 5},
        {"field": "lang", "include": 5},
    ):
        with pytest.raises(ValueError, match="unsupported DSL"):
            dsl_aggregation_sql({"aggs": {"a": {"terms": bad_terms}}})
    # include/exclude restricted to the three-engine regex subset
    with pytest.raises(ValueError, match="regexp pattern"):
        dsl_aggregation_sql(
            {"aggs": {"a": {"terms": {"field": "lang", "include": "en\\d"}}}}
        )
    # significant_terms needs a foreground (match) scope and the text field
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql({"aggs": {"a": {"significant_terms": {"field": "text"}}}})
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql(
            {"query": {"match": {"text": "a"}},
             "aggs": {"a": {"significant_terms": {"field": "lang"}}}}
        )
    # top_hits needs exactly one sort field
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql(
            {"aggs": {"a": {"terms": {"field": "lang"},
                            "aggs": {"h": {"top_hits": {"size": 2}}}}}}
        )
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql(
            {"query": {"match_phrase": {"text": "a b"}},
             "aggs": {"a": {"terms": {"field": "lang"}}}}
        )
    # nesting: terms buckets only, stats sub-agg only, one level
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql(
            {"aggs": {"a": {"stats": {"field": "n_chars"},
                            "aggs": {"b": {"stats": {"field": "n_chars"}}}}}}
        )
    # two bucket levels are supported since the agg-tree wave; THREE are not
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_aggregation_sql(
            {"aggs": {"a": {"terms": {"field": "lang"},
                            "aggs": {"b": {"terms": {"field": "source"},
                                           "aggs": {"c": {"terms": {
                                               "field": "lang"}}}}}}}}
        )


# -- 1.x wrappers + query_string ---------------------------------------------

QS_BODIES = [
    ("qs_or", {"query": {"query_string": {"query": "dup batch scan"}}}, True),
    ("qs_and_op", {"query": {"query_string": {"query": "join AND filter AND window"}}}, True),
    ("qs_required", {"query": {"query_string": {"query": "+join +filter"}}}, True),
    ("qs_negated", {"query": {"query_string": {"query": "dup batch -slow"}}}, True),
    ("qs_phrase", {"query": {"query_string": {"query": '"part filter"'}}}, True),
    ("qs_wildcard", {"query": {"query_string": {"query": "s*r*"}}}, True),
    ("qs_field", {"query": {"query_string": {"query": "text:dup text:batch"}}}, True),
    ("qs_default_and", {"query": {"query_string": {"query": "join filter", "default_operator": "and"}}}, True),
    (
        # ES 1.x field query: {"field": {"<f>": <qs>}} == query_string scoped
        # to one field (FieldQueryParser delegates to the query_string parser)
        "field_query_1x",
        {"query": {"field": {"text": "dup batch -slow"}}},
        True,
    ),
    (
        "field_query_long_form",
        {"query": {"field": {"text": {"query": "join filter",
                                      "default_operator": "and"}}}},
        True,
    ),
    (
        "filtered_1x",
        {"query": {"filtered": {
            "query": {"match": {"text": "dup batch scan"}},
            "filter": {"term": {"lang": "en"}},
        }}},
        True,
    ),
    (
        "filtered_no_query",
        {"query": {"filtered": {"filter": {"range": {"n_chars": {"gte": 500}}}}}, "size": 5},
        False,
    ),
    (
        "constant_score",
        {"query": {"constant_score": {"filter": {"term": {"lang": "fr"}}, "boost": 2.5}}, "size": 5},
        False,
    ),
    ("range_toplevel", {"query": {"range": {"n_chars": {"gte": 100, "lt": 2000}}}, "size": 5}, False),
]


@pytest.mark.parametrize("name,body,_srv", QS_BODIES, ids=[b[0] for b in QS_BODIES])
def test_1x_wrappers_match_duckdb(documents, duck, name, body, _srv):
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got, name


@pytest.mark.parametrize(
    "name,body",
    [(n, b) for n, b, srv in QS_BODIES if srv],
    ids=[n for n, _, srv in QS_BODIES if srv],
)
def test_1x_wrappers_serving_equals_declarative(documents, searcher, name, body):
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want, name


@pytest.mark.parametrize(
    "qs",
    [
        "a AND b OR c",          # mixed operators
        "+dup batch",            # required mixed with optional
        "NOT dup",               # NOT keyword
        "lang:en",               # non-text field
        's*r* batch',            # wildcard not alone
        '"part filter" extra',   # phrase not the whole string
        "-slow",                 # no positive clause
    ],
)
def test_query_string_rejects_unsupported(qs):
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"query_string": {"query": qs}}})


@pytest.mark.parametrize(
    "opts",
    [
        {"query": "du*p", "fields": ["text", "title"]},  # syntax ops need 1 field
        {"query": '"a b"', "fields": ["text", "title"]},
        {"query": "a", "fields": ["text^2", "title"]},   # field boost
        {"query": "a", "fields": ["text", "nope"]},      # not analyzed
        {"query": "a", "tie_breaker": 0.3},              # tb without fields
        {"query": "a", "use_dis_max": True},             # udm without fields
        {"query": "a", "fields": ["text", "title"],
         "use_dis_max": False, "tie_breaker": 0.5},      # contradiction
    ],
)
def test_query_string_fields_rejects(opts):
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body(
            {"query": {"query_string": opts}}, analyzed_fields=["text", "title"]
        )


@pytest.mark.parametrize(
    "opts",
    [
        {"query": "dup + batch | scan"},            # mixed connectors
        {"query": "dup (batch scan)"},              # parens outside subset
        {"query": "part~2"},                        # fuzzy ~ outside subset
        {"query": "-slow"},                         # no positive clause
        {"query": "du*p"},                          # * not a trailing prefix
        {"query": "merg* batch"},                   # prefix not alone
        {"query": "dup -slow", "flags": "OR|AND"},  # NOT disabled by flags
        {"query": '"batch scan"', "flags": "OR"},   # PHRASE disabled
        {"query": "dup + batch", "flags": "OR|NOT"},   # AND disabled
        {"query": "dup batch", "flags": "NOPE"},    # unknown flag
        {"query": "dup", "fields": ["lang"]},       # non-analyzed field
        {"query": "dup", "analyze_wildcard": True},  # unsupported option
        {"query": 7},                               # non-string query
    ],
)
def test_simple_query_string_rejects_unsupported(opts):
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"simple_query_string": opts}})


def test_simple_query_string_equals_query_string_on_shared_shapes(documents):
    """Where the two mini-languages overlap (bare terms + -negation), the
    routed spec is identical — sqs is a syntax, not a new scorer."""
    sqs = parse_body({"query": {"simple_query_string": {"query": "dup batch -slow"}}})
    qs = parse_body({"query": {"query_string": {"query": "dup batch -slow"}}})
    assert (sqs.kind, sqs.query, sqs.mode, sqs.must_not_text) == (
        qs.kind, qs.query, qs.mode, qs.must_not_text
    )


RESCORE_BODY = {
    "query": {"match": {"text": "batch small scan"}},
    "rescore": {
        "window_size": 25,
        "query": {
            "rescore_query": {"match_phrase": {"text": "batch small"}},
            "rescore_weight": 2.0,
        },
    },
}


def test_dsl_rescore_matches_duckdb_and_serving(documents, duck, searcher):
    got = [tuple(r) for r in dsl_search(documents, RESCORE_BODY).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(RESCORE_BODY)).fetchall()]
    assert got == want and got
    srv = [tuple(r) for r in dsl_search_index(searcher, RESCORE_BODY).collect()]
    assert srv == got


def test_dsl_rescore_rejects_bad_compositions():
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"match_phrase": {"text": "a b"}},
                    "rescore": RESCORE_BODY["rescore"]})
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"match": {"text": "a"}},
                    "rescore": {"query": {"rescore_query": {"match": {"text": "b"}}}}})


@pytest.mark.parametrize(
    "body",
    [
        {"query": {"match": {"text": "dup batch"}}, "from": 10000, "size": 5},  # page past corpus
        {"query": {"match": {"text": "zzzq"}}, "size": 5},                       # no matches
        {"query": {"match": {"text": "dup"}}, "size": 10000},                    # size > matches
        {"query": {"bool": {"filter": [{"term": {"lang": "nosuchlang"}}]}}},     # empty filter set
    ],
    ids=["from_past_end", "no_matches", "size_over", "empty_filter"],
)
def test_dsl_edge_pages_match_oracle(documents, duck, body):
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want


# -- round-3 fixes: must_not-only bool, guard gaps, null-safe != --------------


MUST_NOT_ONLY = {
    "query": {"bool": {"must_not": [{"match": {"text": "dup"}}]}},
    "size": 600,
}


def test_must_not_only_bool_excludes(documents, duck):
    """A bool with must_not but no scored clause must NOT silently return
    everything: it is match_all minus the excluded analyzed term (the r2
    ADVICE finding — both executors previously dropped the clause)."""
    got = [tuple(r) for r in dsl_search(documents, MUST_NOT_ONLY).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(MUST_NOT_ONLY)).fetchall()]
    assert got == want and got
    n_all = documents.count()
    assert len(got) < n_all  # the negated term's docs are really gone
    from flume_elasticsearch_2_spark.operators.topk import match_count

    n_dup = match_count(documents, "dup").collect()[0].n_matching
    assert len(got) == n_all - n_dup


def test_rescore_and_highlight_reject_msm_and_boost():
    base = {"query": {"match": {"text": {"query": "a b", "minimum_should_match": 2}}}}
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({**base, "rescore": RESCORE_BODY["rescore"]})
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({**base, "highlight": {"fields": {"text": {}}}})
    boosted = {"query": {"match": {"text": {"query": "a b", "boost": 2.0}}}}
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({**boosted, "rescore": RESCORE_BODY["rescore"]})
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({**boosted, "highlight": {"fields": {"text": {}}}})


def test_must_not_stored_field_keeps_nulls(spark):
    """ES must_not(term) on a stored field keeps docs MISSING the field;
    a null-rejecting != would drop them. Both executors and the oracle must
    agree on the null-safe semantics."""
    rows = [
        (0, "alpha beta", "en"),
        (1, "alpha gamma", "fr"),
        (2, "alpha delta", None),  # lang missing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "alpha"}}],
                "must_not": [{"term": {"lang": "fr"}}],
            }
        }
    }
    got = sorted(r.doc_id for r in dsl_search(df, body).collect())
    assert got == [0, 2]  # the NULL-lang doc survives
    import duckdb as _d

    con = _d.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(r[0] for r in con.execute(dsl_search_sql(body)).fetchall())
    assert want == [0, 2]


def test_missing_filter_selects_null_fields(spark):
    """ES 1.x missing filter: docs with a NULL stored field; exists is its
    complement — parity across Spark, serving triples, and the oracle."""
    rows = [(0, "alpha beta", "en"), (1, "alpha gamma", None), (2, "alpha", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    body_missing = {
        "query": {"bool": {"must": [{"match": {"text": "alpha"}}],
                           "filter": [{"missing": {"field": "lang"}}]}}
    }
    body_exists = {
        "query": {"bool": {"must": [{"match": {"text": "alpha"}}],
                           "filter": [{"exists": {"field": "lang"}}]}}
    }
    assert sorted(r.doc_id for r in dsl_search(df, body_missing).collect()) == [1]
    assert sorted(r.doc_id for r in dsl_search(df, body_exists).collect()) == [0, 2]
    import duckdb as _d

    con = _d.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    assert sorted(r[0] for r in con.execute(dsl_search_sql(body_missing)).fetchall()) == [1]
    assert sorted(r[0] for r in con.execute(dsl_search_sql(body_exists)).fetchall()) == [0, 2]


def test_should_match_equals_concatenated_or(documents):
    """BM25 additivity: a should of match clauses == one concatenated OR
    match (duplicate terms accumulate)."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_topk

    body = {"query": {"bool": {"should": [
        {"match": {"text": "dup batch"}}, {"match": {"text": "scan batch"}}]}}}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in bm25_topk(documents, "dup batch scan batch", k=10).collect()]
    assert got == want and got


def test_should_match_msm_guard():
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"bool": {
            "should": [{"match": {"text": "a b"}}],
            "minimum_should_match": 1}}})


def test_source_rejects_bad_compositions():
    base = {"query": {"match": {"text": "a"}}, "_source": ["lang"]}
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({**base, "highlight": {"fields": {"text": {}}}})
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"match_phrase": {"text": "a b"}}, "_source": ["lang"]})
    with pytest.raises(ValueError, match="unsupported DSL"):
        parse_body({"query": {"match": {"text": "a"}}, "_source": "lang"})
    # _source: false is the ids+scores-only no-op
    assert parse_body({"query": {"match": {"text": "a"}}, "_source": False}).source is None


BOOSTING_BODY = {
    "query": {
        "boosting": {
            "positive": {"match": {"text": "batch small scan"}},
            "negative": {"match": {"text": "dup"}},
            "negative_boost": 0.2,
        }
    }
}


def test_boosting_demotes_not_excludes(documents, duck):
    """ES boosting query: negative matches stay in the candidate set at
    negative_boost x their score (vs must_not, which removes them)."""
    got = [tuple(r) for r in dsl_search(documents, BOOSTING_BODY).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(BOOSTING_BODY)).fetchall()]
    assert got == want and got
    # semantics pin on a crafted corpus: demoted doc reranks below, never out
    import duckdb as _d

    rows = [(0, "alpha beta"), (1, "alpha beta bad"), (2, "alpha")]
    body = {
        "query": {
            "boosting": {
                "positive": {"match": {"text": "alpha beta"}},
                "negative": {"term": {"text": "bad"}},
                "negative_boost": 0.1,
            }
        }
    }
    import pyspark.sql  # noqa: F401

    from flume_elasticsearch_2_spark.session import get_spark

    spark = get_spark(app_name="fts-tests", master="local[8]", shuffle_partitions=8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = dsl_search(df, body).collect()
    ids = [r.doc_id for r in hits]
    assert set(ids) == {0, 1, 2} and ids[0] == 0 and ids[-1] == 1  # demoted last
    con = _d.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want2 = [tuple(r) for r in con.execute(dsl_search_sql(body)).fetchall()]
    assert [tuple(r) for r in hits] == want2


def test_boosting_serving_equals_declarative(documents, searcher):
    """Round 5: boosting SERVES — the negative match set decodes per shard
    from its own postings doc streams; parity with the declarative plan,
    including negative_boost=0.0 (demote-to-exclusion)."""
    for body in (
        BOOSTING_BODY,
        {"query": {"boosting": {
            "positive": {"match": {"text": "batch small scan"}},
            "negative": {"match": {"text": "dup"}},
            "negative_boost": 0.0}}},
    ):
        got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
        want = [tuple(r) for r in dsl_search(documents, body).collect()]
        assert got == want and got, body


def _fscore_body(modifier: str, boost_mode: str, **fvf_extra) -> dict:
    return {
        "query": {
            "function_score": {
                "query": {"match": {"text": "dup batch scan"}},
                "field_value_factor": {
                    "field": "n_chars", "factor": 0.5, "modifier": modifier,
                    **fvf_extra,
                },
                "boost_mode": boost_mode,
            }
        },
        "size": 10,
    }


@pytest.mark.parametrize("modifier", ["none", "ln1p", "ln2p", "sqrt", "square", "reciprocal"])
@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_function_score_matches_duckdb(documents, duck, modifier, boost_mode):
    """ES function_score/field_value_factor: combined-score ranking identical
    to the DuckDB oracle for every supported modifier x boost_mode."""
    body = _fscore_body(modifier, boost_mode)
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and len(got) == 10, (modifier, boost_mode)


def test_function_score_reranks_never_widens(documents):
    """The function re-ranks the match set; the id SET equals the base
    match's full candidate set truncated by the combined order — a doc not
    matching the query never enters, whatever its field value."""
    from flume_elasticsearch_2_spark.operators.topk import (
        bm25_function_score_topk,
        bm25_topk,
    )

    base_all = {
        r.doc_id
        for r in bm25_topk(documents, "dup batch scan", k=10_000).collect()
    }
    fs = bm25_function_score_topk(
        documents, "dup batch scan", "n_chars", factor=100.0, boost_mode="sum",
        k=10_000,
    ).collect()
    assert {r.doc_id for r in fs} == base_all  # same candidates, new order


def test_function_score_missing_fills_nulls(spark):
    """NULL field values take the `missing` parameter in both engines."""
    import duckdb as _d

    rows = [(0, "alpha beta", 10.0), (1, "alpha beta", None), (2, "alpha", 5.0)]
    body = {
        "query": {
            "function_score": {
                "query": {"match": {"text": "alpha beta"}},
                "field_value_factor": {"field": "w", "missing": 3.0},
                "boost_mode": "multiply",
            }
        }
    }
    df = spark.createDataFrame(rows, "doc_id long, text string, w double")
    hits = [tuple(r) for r in dsl_search(df, body).collect()]
    con = _d.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, w DOUBLE)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = [tuple(r) for r in con.execute(dsl_search_sql(body)).fetchall()]
    assert hits == want and len(hits) == 3
    # doc 0 (w=10) outranks doc 1 (missing->3) among equal base scores
    assert hits[0][0] == 0 and hits[1][0] == 1


# (field_value_factor/decay now SERVE exactly —
# test_function_score_serving_equals_declarative; random_score/script_score
# rejection is pinned in test_function_score_serving_missing_field_and_guards)


def test_custom_score_alias_equals_function_score(documents):
    """1.x custom_score / custom_boost_factor are pure rewrites: results are
    row-identical to the function_score.script_score they alias."""
    script = "_score * (1 + doc['n_chars'].value / 1000)"
    old = {"query": {"custom_score": {
        "query": {"match": {"text": "dup batch scan"}}, "script": script}}, "size": 8}
    new = {"query": {"function_score": {
        "query": {"match": {"text": "dup batch scan"}},
        "script_score": {"script": script}}}, "size": 8}
    assert [tuple(r) for r in dsl_search(documents, old).collect()] == \
           [tuple(r) for r in dsl_search(documents, new).collect()]

    cbf = {"query": {"custom_boost_factor": {
        "query": {"match": {"text": "dup batch scan"}}, "boost_factor": 2.5}}, "size": 8}
    base = {"query": {"match": {"text": "dup batch scan"}}, "size": 8}
    got = [(r.doc_id, r.score) for r in dsl_search(documents, cbf).collect()]
    want = [(r.doc_id, round(r.score * 2.5, 6))
            for r in dsl_search(documents, base).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want], abs=1e-5)


def test_1x_alias_queries_equal_canonical(documents):
    """text* / field / lone-span_term 1.x spellings are pure rewrites:
    row-identical to the canonical query they alias (parse_body rewrites
    kind before dispatch — dsl.py text/field/span_term branches)."""
    pairs = [
        ({"text": {"text": "dup batch scan"}},
         {"match": {"text": "dup batch scan"}}),
        ({"text_phrase": {"text": "part filter"}},
         {"match_phrase": {"text": "part filter"}}),
        ({"text_phrase_prefix": {"text": "batch s"}},
         {"match_phrase_prefix": {"text": "batch s"}}),
        ({"field": {"text": "dup batch -slow"}},
         {"query_string": {"query": "dup batch -slow"}}),
        ({"field": {"text": {"query": "join filter", "default_operator": "and"}}},
         {"query_string": {"query": "join filter", "default_operator": "and"}}),
        ({"span_term": {"text": "dup"}}, {"term": {"text": "dup"}}),
        ({"bool": {"must": [{"match": {"text": "dup batch"}}],
                   "filter": [{"numeric_range": {"n_chars": {"gte": 100}}}]}},
         {"bool": {"must": [{"match": {"text": "dup batch"}}],
                   "filter": [{"range": {"n_chars": {"gte": 100}}}]}}),
        ({"bool": {"must": [{"match": {"text": "dup batch"}}],
                   "filter": [{"range": {"n_chars": {"from": 100, "to": 5000,
                                                     "include_upper": False}}}]}},
         {"bool": {"must": [{"match": {"text": "dup batch"}}],
                   "filter": [{"range": {"n_chars": {"gte": 100, "lt": 5000}}}]}}),
    ]
    for old_q, new_q in pairs:
        old = [tuple(r) for r in dsl_search(documents, {"query": old_q, "size": 8}).collect()]
        new = [tuple(r) for r in dsl_search(documents, {"query": new_q, "size": 8}).collect()]
        assert old == new and old, old_q


# -- _msearch -----------------------------------------------------------------

MSEARCH_HOMOG = [
    {"query": {"match": {"text": "dup batch scan"}}},
    {"query": {"match": {"text": {"query": "join filter window", "operator": "and"}}}},
    {"query": {"match_phrase": {"text": "part filter"}}},
]
MSEARCH_HETERO = [
    {"query": {"match": {"text": "dup batch scan"}}, "size": 5},
    {"query": {"common": {"text": {"query": "dup batch scan", "cutoff_frequency": 0.1}}}, "size": 30},
    {"query": {"match_phrase_prefix": {"text": "batch s"}}},
    {"query": {"prefix": {"text": "ba"}}},
]


@pytest.mark.parametrize(
    "bodies", [MSEARCH_HOMOG, MSEARCH_HETERO], ids=["homogeneous", "heterogeneous"]
)
def test_msearch_three_paths(documents, duck, searcher, bodies):
    from flume_elasticsearch_2_spark.operators.dsl import (
        msearch,
        msearch_index,
        msearch_sql,
    )

    got = [tuple(r) for r in msearch(documents, bodies).collect()]
    want = [tuple(r) for r in duck.execute(msearch_sql(bodies)).fetchall()]
    srv = [tuple(r) for r in msearch_index(searcher, bodies).collect()]
    assert got == want and srv == got and got


def test_msearch_batches_homogeneous_only():
    from flume_elasticsearch_2_spark.operators.dsl import _msearch_plain_batch

    parsed = _msearch_plain_batch(MSEARCH_HOMOG, "text")
    assert parsed is not None and parsed[1] == 10 and parsed[0]["2"][1] == "phrase"
    assert _msearch_plain_batch(MSEARCH_HETERO, "text") is None
    # differing sizes break the shared-k batch contract
    assert _msearch_plain_batch(
        [{"query": {"match": {"text": "a"}}, "size": 3},
         {"query": {"match": {"text": "b"}}, "size": 4}], "text"
    ) is None


def test_msearch_rejects_reshaping_bodies(documents):
    from flume_elasticsearch_2_spark.operators.dsl import msearch

    with pytest.raises(ValueError, match="hits-shaped"):
        msearch(documents, [
            {"query": {"match": {"text": "dup"}}, "_source": ["lang"]},
        ]).collect()
    with pytest.raises(ValueError):
        msearch(documents, [])


def test_multi_match_most_fields_rejects_explicit_tb():
    from flume_elasticsearch_2_spark.operators.dsl import parse_body

    with pytest.raises(ValueError, match="tie_breaker"):
        parse_body(
            {"query": {"multi_match": {"query": "x", "fields": ["text"],
                                       "type": "most_fields", "tie_breaker": 0.3}}},
            analyzed_fields=["text"],
        )


def test_validate_query_accepts_and_rejects():
    from flume_elasticsearch_2_spark.operators.dsl import validate_query

    ok, err = validate_query({"query": {"match": {"text": "dup batch"}}})
    assert ok and err is None
    for body in BODIES:
        assert validate_query(body[1])[0], body[0]
    bad, err = validate_query({"query": {"match": {"title": "x"}}})
    assert not bad and "unsupported DSL" in err
    bad, err = validate_query({"query": {"geo_distance": {"pin": "0,0"}}})
    assert not bad and err
    ok, _ = validate_query(
        {"query": {"match": {"title": "x"}}}, analyzed_fields=["text", "title"]
    )
    assert ok


def test_function_score_random_score(documents, duck):
    """ES random_score: seeded md5-prefix uniform draw — deterministic,
    seed-sensitive, oracle-exact (the sampling operators' hash family)."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search, dsl_search_sql

    def body(seed, bm="multiply"):
        return {"query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "random_score": {"seed": seed}, "boost_mode": bm}}, "size": 10}

    for seed, bm in [(7, "multiply"), (7, "sum"), (42, "multiply")]:
        got = [tuple(r) for r in dsl_search(documents, body(seed, bm)).collect()]
        want = [tuple(r) for r in duck.execute(dsl_search_sql(body(seed, bm))).fetchall()]
        assert got == want and got, (seed, bm)
    a = [r[0] for r in dsl_search(documents, body(7)).collect()]
    b = [r[0] for r in dsl_search(documents, body(8)).collect()]
    assert a != b  # the seed matters
    with pytest.raises(ValueError):  # determinism contract: explicit seed
        parse_body({"query": {"function_score": {
            "query": {"match": {"text": "a"}}, "random_score": {}}}})


def test_min_score_actually_bites_and_preserves_prefix(documents, duck):
    """min_score drops the low-scoring tail of the SAME ranking (passing
    docs are a prefix of the score-desc order, so post-slice filtering
    equals ES's filter-then-slice)."""
    base = {"query": {"match": {"text": "dup batch scan"}}, "size": 30}
    full = [tuple(r) for r in dsl_search(documents, base).collect()]
    cut = [
        tuple(r)
        for r in dsl_search(documents, {**base, "min_score": 3.0}).collect()
    ]
    assert cut and len(cut) < len(full)
    assert cut == [t for t in full if t[1] >= 3.0]
    want = [
        tuple(r)
        for r in duck.execute(
            dsl_search_sql({**base, "min_score": 3.0})
        ).fetchall()
    ]
    assert cut == want


def _decay_body(kind: str, boost_mode: str = "multiply", **params) -> dict:
    p = {"origin": 400, "scale": 250, "offset": 20, "decay": 0.4, **params}
    return {
        "query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            kind: {"n_chars": p},
            "boost_mode": boost_mode,
        }},
        "size": 12,
    }


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_decay_matches_duckdb(documents, duck, kind, boost_mode):
    """ES decay functions: combined ranking identical to the DuckDB oracle
    for every kind x boost_mode (the λ literal is computed once in Python,
    so exp/ln float64 parity carries the whole expression)."""
    body = _decay_body(kind, boost_mode)
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and len(got) == 12, (kind, boost_mode)


def test_decay_semantics_pinned(spark):
    """The ES formulas, pinned on hand-checkable points: at |v-origin| <=
    offset the multiplier is exactly 1; at distance == scale (past offset)
    it is exactly the decay rate; linear hits 0 at s = scale/(1-rate)."""
    import math

    from flume_elasticsearch_2_spark.operators.topk import decay_col

    rows = [
        (i, None if v is None else float(v))
        for i, v in enumerate([400, 390, 420, 670, 150, 1500, None])
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars double")
    out = {}
    for kind in ("gauss", "exp", "linear"):
        dec = {"kind": kind, "field": "n_chars", "origin": 400.0,
               "scale": 250.0, "offset": 20.0, "decay": 0.4}
        vals = df.select("doc_id", decay_col(dec).alias("m")).collect()
        out[kind] = {r.doc_id: r.m for r in vals}
    for kind in out:
        assert out[kind][0] == 1.0 and out[kind][1] == 1.0 and out[kind][2] == 1.0
        assert out[kind][3] == pytest.approx(0.4, abs=1e-12)  # dist == scale
        assert out[kind][6] == 1.0  # missing field -> 1.0, as ES
    # rate^((dist/scale)^2) vs rate^(dist/scale): gauss decays slower inside
    # the scale radius, faster outside
    assert out["gauss"][4] > out["exp"][4]          # dist 230 < scale
    assert out["gauss"][5] < out["exp"][5]          # dist 1080 > scale
    # linear: zero exactly at offset + scale/(1-rate) past origin
    s = 250.0 / (1.0 - 0.4)
    row = spark.createDataFrame(
        [(0, 400.0 + 20.0 + s)], "doc_id long, n_chars double"
    ).select(decay_col({"kind": "linear", "field": "n_chars", "origin": 400.0,
                        "scale": 250.0, "offset": 20.0, "decay": 0.4}).alias("m"))
    assert row.collect()[0].m == 0.0
    assert math.isclose(out["linear"][3], 0.4)


def test_post_filter_hits_equal_bool_filter_but_aggs_ignore_it(documents, duck):
    """The ES agg/hit split post_filter exists for: the hit page is identical
    to bool.filter's (a hit is collected only if it passes), while an agg in
    the same body sees the UNFILTERED query scope."""
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_aggregation,
        dsl_aggregation_sql,
    )

    pf = {"query": {"match": {"text": "dup batch scan"}},
          "post_filter": {"term": {"lang": "en"}}, "size": 15}
    bf = {"query": {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                             "filter": [{"term": {"lang": "en"}}]}}, "size": 15}
    got_pf = [tuple(r) for r in dsl_search(documents, pf).collect()]
    got_bf = [tuple(r) for r in dsl_search(documents, bf).collect()]
    assert got_pf and got_pf == got_bf
    # aggs ignore post_filter: same agg result with and without it
    agg_body = {"query": {"match": {"text": "dup batch scan"}},
                "aggs": {"langs": {"terms": {"field": "lang", "size": 5}}}}
    with_pf = {**agg_body, "post_filter": {"term": {"lang": "en"}}}
    a = [tuple(r) for r in dsl_aggregation(documents, agg_body).collect()]
    b = [tuple(r) for r in dsl_aggregation(documents, with_pf).collect()]
    assert a == b and len(a) > 1  # >1 lang bucket -> the filter WOULD bite
    assert dsl_aggregation_sql(with_pf) == dsl_aggregation_sql(agg_body)


def test_toplevel_missing_query_matches_null_docs(documents):
    """1.x top-level missing query = constant-score filtered match_all over
    docs lacking the field (synthesized nulls: the corpus has none)."""
    from pyspark.sql import functions as F

    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 5 == 0, F.col("source"))
    )
    hits = dsl_search(with_nulls, {"query": {"missing": {"field": "maybe"}}, "size": 1000})
    got = sorted(r.doc_id for r in hits.collect())
    want = sorted(
        r.doc_id for r in with_nulls.where(F.col("maybe").isNull()).collect()
    )
    assert got == want[: len(got)] and len(got) == min(1000, len(want)) and got
    assert {r.score for r in hits.collect()} == {1.0}  # constant score


def test_histogram_empty_buckets_actually_filled(documents, duck):
    """The spine really contains zero-count buckets (and extended_bounds
    widens past the data span)."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_aggregation

    body = {"query": {"match": {"text": "dup batch scan"}},
            "aggs": {"h": {"histogram": {"field": "n_chars", "interval": 500,
                                         "min_doc_count": 0,
                                         "extended_bounds": {"min": 0, "max": 4000}}}}}
    rows = dsl_aggregation(documents, body).collect()
    buckets = [r.bucket for r in rows]
    assert buckets == list(range(0, 4001, 500))  # contiguous spine incl bounds
    assert any(r["count"] == 0 for r in rows)
    with pytest.raises(ValueError, match="extended_bounds"):
        dsl_aggregation(documents, {"aggs": {"h": {"histogram": {
            "field": "n_chars", "interval": 500,
            "extended_bounds": {"min": 0, "max": 10}}}}})


@pytest.mark.parametrize("modifier", ["none", "ln1p", "sqrt", "reciprocal"])
@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_function_score_serving_equals_declarative(documents, searcher, modifier, boost_mode):
    """field_value_factor on the SERVING path: per-shard full candidate
    scoring with the factor from the shard's own stored docs column —
    identical output to the declarative plan (which the oracle pins)."""
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search_index

    body = _fscore_body(modifier, boost_mode)
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want and len(got) == 10, (modifier, boost_mode)


def test_function_score_serving_missing_field_and_guards(documents, searcher):
    from flume_elasticsearch_2_spark.operators.dsl import dsl_search_index

    with pytest.raises(ValueError, match="stored docs column"):
        dsl_search_index(searcher, {"query": {"function_score": {
            "query": {"match": {"text": "dup"}},
            "field_value_factor": {"field": "nope_col"}}}})
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_search_index(searcher, {"query": {"function_score": {
            "query": {"match": {"text": "dup"}},
            "random_score": {"seed": 7}}}})
    # round 5: script_score SERVES (the NumPy script engine in-shard) —
    # parity with the declarative plan
    body_ss = {"query": {"function_score": {
        "query": {"match": {"text": "dup batch"}},
        "script_score": {"script": "_score * log1p(doc['n_chars'].value)"}}},
        "size": 10}
    got_ss = [tuple(r) for r in dsl_search_index(searcher, body_ss).collect()]
    want_ss = [tuple(r) for r in dsl_search(documents, body_ss).collect()]
    assert got_ss == want_ss and got_ss
    with pytest.raises(ValueError, match="stored docs"):
        dsl_search_index(searcher, {"query": {"function_score": {
            "query": {"match": {"text": "dup"}},
            "script_score": {"script": "doc['nope_col'].value"}}}})


def test_not_filter_keeps_docs_missing_the_field(documents):
    """ES `not` semantics: a doc missing the field does not match the inner
    filter, so `not` KEEPS it — pinned on not-term AND not-terms (the
    not_in op) with synthesized nulls."""
    from pyspark.sql import functions as F

    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 4 == 0, F.col("lang"))
    )
    null_ids = {r.doc_id for r in with_nulls.where(F.col("maybe").isNull())
                .select("doc_id").collect()}
    for flt in ({"not": {"term": {"maybe": "en"}}},
                {"not": {"terms": {"maybe": ["en", "fr"]}}}):
        body = {"query": {"filtered": {"filter": flt}}, "size": 100000}
        got = {r.doc_id for r in dsl_search(with_nulls, body).collect()}
        assert null_ids <= got  # every missing-field doc kept
        assert not any(
            r.maybe == "en"
            for r in with_nulls.where(F.col("doc_id").isin(list(got)))
            .select("maybe").collect()
        )


def test_not_over_compound_keeps_docs_missing_the_field(documents):
    """Round 5: the general NOT node coalesces the inner conjunction to
    FALSE before negating, so docs missing ANY inner field are KEPT (ES
    `not` semantics) — pinned with synthesized nulls on both an or-inner
    and a range-inner, against the DuckDB twin of the same body."""
    import duckdb as _duck

    from pyspark.sql import functions as F

    with_nulls = documents.withColumn(
        "maybe", F.when(F.col("doc_id") % 4 == 0, F.col("n_chars"))
    )
    con = _duck.connect()
    con.register("documents_arrow", with_nulls.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_arrow")
    null_ids = {r.doc_id for r in with_nulls.where(F.col("maybe").isNull())
                .select("doc_id").collect()}
    for flt in (
        {"not": {"or": [{"term": {"lang": "zz"}},
                        {"range": {"maybe": {"gte": 0}}}]}},
        {"not": {"range": {"maybe": {"gte": 0, "lt": 10**9}}}},
    ):
        body = {"query": {"filtered": {"filter": flt}}, "size": 100000}
        got = {r.doc_id for r in dsl_search(with_nulls, body).collect()}
        want = {r[0] for r in con.execute(dsl_search_sql(body)).fetchall()}
        assert null_ids <= got, flt  # every missing-field doc kept
        assert got == want, flt


def test_post_filter_rejected_where_filters_cannot_apply(documents, searcher, duck):
    """Review regression: kinds that cannot honor filters must refuse them
    on EVERY executor — a post_filter (or bool.filter) must never be
    silently dropped (both engines agreeing on the wrong answer is the trap
    oracle tests cannot catch)."""
    bodies = [
        {"query": {"prefix": {"text": "ba"}},
         "post_filter": {"term": {"lang": "en"}}},
        {"query": {"more_like_this": {"like": "dup batch scan window"}},
         "post_filter": {"term": {"lang": "en"}}},
        {"query": {"bool": {"must": [{"match_phrase": {"text": "part filter"}}],
                            "filter": [{"term": {"lang": "en"}}]}}},
    ]
    for body in bodies:
        with pytest.raises(ValueError, match="filters"):
            dsl_search(documents, body)
        with pytest.raises(ValueError, match="filters|oracle"):
            dsl_search_sql(body)
        with pytest.raises(ValueError, match="filters"):
            dsl_search_index(searcher, body)


# -- 1.x query / fquery filters ---------------------------------------------------


FQ_BODIES = [
    {"query": {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                        "filter": [{"fquery": {"query": {"match": {"text": "window"}}}}]}},
     "size": 10},
    {"query": {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                        "filter": [
                            {"query": {"match": {"text": {"query": "window part",
                                                          "operator": "and"}}}},
                            {"term": {"lang": "en"}}]}},
     "size": 10},
]


@pytest.mark.parametrize("body", FQ_BODIES, ids=["fquery_or", "query_and_plus_term"])
def test_query_filter_three_engines(documents, duck, searcher, body):
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.sql(dsl_search_sql(body)).fetchall()]
    assert got == want and got
    serving = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    assert serving == got


def test_query_filter_restricts_candidates_not_scores(documents):
    """Filter context: hits all contain the filter terms, and surviving hits
    keep the UNFILTERED query's exact scores (stats index-wide)."""
    base = {(r.doc_id, r.score)
            for r in dsl_search(documents,
                                {"query": {"match": {"text": "dup batch scan"}},
                                 "size": 500}).collect()}
    got = dsl_search(documents, FQ_BODIES[0]).collect()
    toks = {r["doc_id"]: set(r["text"].lower().split())
            for r in documents.collect()}
    for r in got:
        assert (r.doc_id, r.score) in base        # scoring untouched
        assert "window" in toks[r.doc_id]         # filter applied


def test_query_filter_rejections(documents):
    with pytest.raises(ValueError, match="at most one"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"fquery": {"query": {"match": {"text": "a"}}}},
                       {"query": {"match": {"text": "b"}}}]}}})
    with pytest.raises(ValueError, match="match only"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"fquery": {"query": {"term": {"lang": "en"}}}}]}}})
    with pytest.raises(ValueError, match="plain scored match"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match_phrase": {"text": "part filter"}}],
            "filter": [{"fquery": {"query": {"match": {"text": "a"}}}}]}}})


# -- named queries (_name -> matched_queries) -------------------------------------


NAMED_BODY = {
    "query": {"bool": {"should": [
        {"match": {"text": {"query": "dup batch", "_name": "dups"}}},
        {"match": {"text": {"query": "window scan", "_name": "windows"}}},
        {"term": {"text": "filter"}},
    ]}},
    "size": 10,
}


def test_named_queries_three_engines(documents, duck, searcher):
    got = [tuple(r) for r in dsl_search(documents, NAMED_BODY).collect()]
    want = [tuple(r) for r in duck.sql(dsl_search_sql(NAMED_BODY)).fetchall()]
    assert got == want and got
    serving = [tuple(r) for r in dsl_search_index(searcher, NAMED_BODY).collect()]
    assert serving == got
    # names reflect real term membership
    toks = {r["doc_id"]: set(r["text"].lower().split()) for r in documents.collect()}
    for doc_id, _, names in got:
        ns = set(names.split(",")) if names else set()
        assert ("dups" in ns) == bool({"dup", "batch"} & toks[doc_id])
        assert ("windows" in ns) == bool({"window", "scan"} & toks[doc_id])


def test_named_term_clause_and_scores_unchanged(documents):
    body = {"query": {"bool": {"should": [
        {"term": {"text": {"value": "dup", "_name": "d"}}},
        {"term": {"text": "batch"}}]}}, "size": 10}
    got = dsl_search(documents, body).collect()
    plain = {"query": {"bool": {"should": [
        {"term": {"text": "dup"}}, {"term": {"text": "batch"}}]}}, "size": 10}
    want = dsl_search(documents, plain).collect()
    assert [(r.doc_id, r.score) for r in got] == [(r.doc_id, r.score) for r in want]


def test_named_queries_rejections(documents):
    with pytest.raises(ValueError, match="duplicate _name"):
        dsl_search(documents, {"query": {"bool": {"should": [
            {"match": {"text": {"query": "a", "_name": "x"}}},
            {"match": {"text": {"query": "b", "_name": "x"}}}]}}})
    with pytest.raises(ValueError, match="matched_queries"):
        dsl_search(documents, {"query": {"bool": {"should": [
            {"match": {"text": {"query": "dup", "_name": "x"}}}]}},
            "sort": [{"n_chars": "desc"}]})


def test_fquery_cache_hint_accepted_and_malformed_rejected(documents, duck):
    """Review regressions: the canonical 1.x `_cache` hint parses (ignored —
    identical semantics); a missing inner query raises the dialect's
    ValueError, not a KeyError."""
    body = {"query": {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                               "filter": [{"fquery": {
                                   "query": {"match": {"text": "window"}},
                                   "_cache": True}}]}}, "size": 10}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.sql(dsl_search_sql(body)).fetchall()]
    assert got == want and got
    with pytest.raises(ValueError, match="fquery needs"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}], "filter": [{"fquery": {}}]}}})
    with pytest.raises(ValueError, match="fquery keys"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"fquery": {"query": {"match": {"text": "a"}},
                                   "boost": 2}}]}}})


def test_named_term_requires_normalized_value(documents):
    """Review regression: _name on an unanalyzed term value the tokenizer
    would normalize (e.g. 'Dup') would diverge between the serving path
    (which re-tokenizes) and the declarative/SQL probes — refuse loudly."""
    with pytest.raises(ValueError, match="non-analyzer-normalized"):
        dsl_search(documents, {"query": {"bool": {"should": [
            {"term": {"text": {"value": "Dup", "_name": "d"}}}]}}})


# -- function_score weighted functions array + wrapper query ------------------

def _wf_body(score_mode: str, boost_mode: str = "multiply") -> dict:
    return {
        "query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "functions": [
                {"filter": {"term": {"lang": "en"}}, "boost_factor": 2.0},
                {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 1.5},
                {"weight": 1.1},
            ],
            "score_mode": score_mode,
            "boost_mode": boost_mode,
        }},
        "size": 10,
    }


@pytest.mark.parametrize(
    "score_mode", ["multiply", "sum", "max", "first", "min", "avg"]
)
@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_fscore_functions_three_engines(documents, duck, searcher, score_mode, boost_mode):
    """ES weighted functions array: per-filter constants combined per
    score_mode, folded into the BM25 base per boost_mode — declarative ==
    DuckDB oracle == serving path for every mode pair."""
    body = _wf_body(score_mode, boost_mode)
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    assert got == want == srv and len(got) == 10, (score_mode, boost_mode)


def test_fscore_functions_no_match_keeps_base(documents, duck):
    """A candidate matching NO function keeps factor 1.0 (ES subquery-score
    passthrough): with filters nothing satisfies, the ranking equals the
    plain match query's."""
    from flume_elasticsearch_2_spark.operators.dsl import parse_body  # noqa: F401

    body = {
        "query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "functions": [
                {"filter": {"term": {"lang": "zz-nonexistent"}}, "weight": 9.0},
            ],
            "score_mode": "sum",
        }},
        "size": 10,
    }
    plain = {"query": {"match": {"text": "dup batch scan"}}, "size": 10}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    base = [tuple(r) for r in dsl_search(documents, plain).collect()]
    assert got == base and len(got) == 10


def test_fscore_functions_rejections(documents):
    q = {"match": {"text": "dup"}}
    with pytest.raises(ValueError, match="score_mode only applies"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "field_value_factor": {"field": "n_chars"},
            "score_mode": "sum"}}})
    with pytest.raises(ValueError, match="another function form"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "field_value_factor": {"field": "n_chars"},
            "functions": [{"weight": 2.0}]}}})
    with pytest.raises(ValueError, match="exactly one of boost_factor/weight"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "functions": [
                {"boost_factor": 2.0, "weight": 1.0}]}}})
    with pytest.raises(ValueError, match="non-empty array"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "functions": []}}})
    with pytest.raises(ValueError, match="must be numeric"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "functions": [{"weight": True}]}}})
    with pytest.raises(ValueError, match="function keys"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "functions": [
                {"weight": 1.0, "script_score": {"script": "1"}}]}}})
    with pytest.raises(ValueError, match=r"score_mode 'median'"):
        dsl_search(documents, {"query": {"function_score": {
            "query": q, "functions": [{"weight": 1.0}],
            "score_mode": "median"}}})


# -- custom_filters_score (1.x precursor of function_score) -------------------

def _cfs_body(score_mode: str | None = None) -> dict:
    inner: dict = {
        "query": {"match": {"text": "dup batch scan"}},
        "filters": [
            {"filter": {"term": {"lang": "en"}}, "boost": 2.0},
            {"filter": {"range": {"n_chars": {"gte": 400}}}, "boost": 1.5},
        ],
    }
    if score_mode is not None:
        inner["score_mode"] = score_mode
    return {"query": {"custom_filters_score": inner}, "size": 10}


@pytest.mark.parametrize(
    "score_mode", [None, "first", "min", "max", "total", "avg", "multiply"]
)
def test_custom_filters_score_three_engines(documents, duck, searcher, score_mode):
    """1.x custom_filters_score rewrites onto the weighted-functions spec:
    declarative == oracle == serving for every 1.x score_mode (None = the
    1.x default `first`)."""
    body = _cfs_body(score_mode)
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    assert got == want == srv and len(got) == 10, score_mode


def test_custom_filters_score_equals_function_score(documents):
    """The rewrite is verbatim: cfs(total) == function_score(sum) with the
    same filters as boost_factor functions."""
    fs = {
        "query": {"function_score": {
            "query": {"match": {"text": "dup batch scan"}},
            "functions": [
                {"filter": {"term": {"lang": "en"}}, "boost_factor": 2.0},
                {"filter": {"range": {"n_chars": {"gte": 400}}},
                 "boost_factor": 1.5},
            ],
            "score_mode": "sum",
        }},
        "size": 10,
    }
    got = [tuple(r) for r in dsl_search(documents, _cfs_body("total")).collect()]
    want = [tuple(r) for r in dsl_search(documents, fs).collect()]
    assert got == want and len(got) == 10


def test_custom_filters_score_first_is_array_order(spark):
    """score_mode first takes the FIRST matching filter in array order,
    not the largest: a doc matching both filters gets boost 1.5 here."""
    df = spark.createDataFrame(
        [(1, "dup dup", "en", 500)],
        "doc_id long, text string, lang string, n_chars long",
    )
    body = {"query": {"custom_filters_score": {
        "query": {"match": {"text": "dup"}},
        "filters": [
            {"filter": {"range": {"n_chars": {"gte": 400}}}, "boost": 1.5},
            {"filter": {"term": {"lang": "en"}}, "boost": 9.0},
        ],
        "score_mode": "first",
    }}, "size": 1}
    plain = {"query": {"match": {"text": "dup"}}, "size": 1}
    got = dsl_search(df, body).collect()[0]["score"]
    base = dsl_search(df, plain).collect()[0]["score"]
    assert got == pytest.approx(base * 1.5, rel=1e-6)


def test_custom_filters_score_rejections(documents):
    with pytest.raises(ValueError, match="script scoring unsupported"):
        dsl_search(documents, {"query": {"custom_filters_score": {
            "query": {"match": {"text": "dup"}},
            "filters": [{"filter": {"term": {"lang": "en"}},
                         "script": "2.0"}]}}})
    with pytest.raises(ValueError, match="non-empty filters"):
        dsl_search(documents, {"query": {"custom_filters_score": {
            "query": {"match": {"text": "dup"}}, "filters": []}}})
    with pytest.raises(ValueError, match="needs filter \\+ boost"):
        dsl_search(documents, {"query": {"custom_filters_score": {
            "query": {"match": {"text": "dup"}},
            "filters": [{"filter": {"term": {"lang": "en"}}}]}}})
    with pytest.raises(ValueError, match=r"score_mode 'median'"):
        dsl_search(documents, {"query": {"custom_filters_score": {
            "query": {"match": {"text": "dup"}},
            "filters": [{"filter": {"term": {"lang": "en"}}, "boost": 2.0}],
            "score_mode": "median"}}})
    with pytest.raises(ValueError, match="custom_filters_score keys"):
        dsl_search(documents, {"query": {"custom_filters_score": {
            "query": {"match": {"text": "dup"}},
            "filters": [{"filter": {"term": {"lang": "en"}}, "boost": 2.0}],
            "boost_mode": "sum"}}})


def _b64_query(inner: dict) -> dict:
    import base64 as _b
    import json as _j

    return {"wrapper": {"query": _b.b64encode(_j.dumps(inner).encode()).decode()}}


def test_wrapper_round_trip_three_engines(documents, duck, searcher):
    """wrapper(base64(Q)) is exactly Q on all three paths."""
    inner = {"bool": {"must": [{"match": {"text": "dup batch scan"}}],
                      "filter": [{"range": {"n_chars": {"gte": 100}}}]}}
    body_w = {"query": _b64_query(inner), "size": 10}
    body_p = {"query": inner, "size": 10}
    got_w = [tuple(r) for r in dsl_search(documents, body_w).collect()]
    got_p = [tuple(r) for r in dsl_search(documents, body_p).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body_w)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(searcher, body_w).collect()]
    assert got_w == got_p == want == srv and len(got_w) == 10


def test_wrapper_nested_and_rejections(documents):
    import base64 as _b
    import json as _j

    # depth 3 nesting unwraps fine
    inner = {"match": {"text": "dup batch"}}
    b = inner
    for _ in range(3):
        b = _b64_query(b)
    got = [tuple(r) for r in dsl_search(documents, {"query": b, "size": 5}).collect()]
    plain = [tuple(r) for r in dsl_search(
        documents, {"query": inner, "size": 5}).collect()]
    assert got == plain and got
    # depth 5 refuses
    for _ in range(2):
        b = _b64_query(b)
    with pytest.raises(ValueError, match="deeper than 4"):
        dsl_search(documents, {"query": b})
    with pytest.raises(ValueError, match="does not decode to JSON"):
        dsl_search(documents, {"query": {"wrapper": {
            "query": _b.b64encode(b"not json at all{{").decode()}}})
    with pytest.raises(ValueError, match="must decode to a query object"):
        dsl_search(documents, {"query": {"wrapper": {
            "query": _b.b64encode(_j.dumps([1, 2]).encode()).decode()}}})
    with pytest.raises(ValueError, match="exactly"):
        dsl_search(documents, {"query": {"wrapper": {"query": "x", "extra": 1}}})
    # wrapper in an inner clause position refuses loudly
    with pytest.raises(ValueError, match="unsupported DSL"):
        dsl_search(documents, {"query": {"bool": {"must": [
            _b64_query({"match": {"text": "dup"}})]}}})


# -- script filter + span_first ----------------------------------------------

def test_script_filter_three_way_composition(documents, duck):
    """ES script filter: boolean predicate over stored numerics composed
    with term filter + fquery — declarative == DuckDB oracle."""
    body = {"query": {"bool": {
        "must": [{"match": {"text": "dup batch scan"}}],
        "filter": [
            {"term": {"lang": "en"}},
            {"fquery": {"query": {"match": {"text": "window"}}}},
            {"script": {"script": "doc['n_chars'].value >= 150", "_cache": True}},
        ],
    }}, "size": 10}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got


def test_script_filter_actually_restricts(documents):
    plain = {"query": {"match": {"text": "dup batch scan"}}, "size": 10}
    tight = {"query": {"bool": {
        "must": [{"match": {"text": "dup batch scan"}}],
        "filter": [{"script": {"script": "doc['n_chars'].value > 100000"}}],
    }}, "size": 10}
    assert dsl_search(documents, plain).count() == 10
    assert dsl_search(documents, tight).count() == 0


def test_script_filter_rejections(documents, searcher):
    base = {"query": {"bool": {
        "must": [{"match": {"text": "dup"}}],
        "filter": [{"script": {"script": "doc['n_chars'].value > 1"}}],
    }}, "size": 5}
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_search_index(searcher, base)
    with pytest.raises(ValueError, match="script filter keys"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"script": {"script": "doc['a'].value > 1",
                                   "params": {"x": 1}}}]}}})
    with pytest.raises(ValueError, match="at most one script filter"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"script": {"script": "doc['a'].value > 1"}},
                       {"script": {"script": "doc['b'].value > 1"}}]}}})
    with pytest.raises(ValueError, match="script filter:"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"script": {"script": "doc['a'].value + 1"}}]}}})
    with pytest.raises(ValueError, match="not doc columns"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"script": {"script": "doc['nonexistent_f'].value > 1"}}]}}})
    with pytest.raises(ValueError, match="plain scored match only"):
        dsl_search(documents, {"query": {"bool": {
            "must": [{"match": {"text": "dup"}}],
            "filter": [{"script": {"script": "doc['n_chars'].value > 1"}}]},
        }, "sort": [{"n_chars": "desc"}]})


def test_span_first_three_engines(documents, duck, searcher):
    body = {"query": {"span_first": {
        "match": {"span_term": {"text": "batch"}}, "end": 3}}, "size": 10}
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    srv = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    assert got == want == srv and got


def test_span_first_window_semantics(spark):
    """Pinned: 0-based position p matches iff p < end; sf counts matching
    occurrences; docs with the term only beyond the window drop."""
    from flume_elasticsearch_2_spark.operators.topk import bm25_span_first_topk

    rows = [
        (0, "alpha beta alpha"),   # alpha at 0 and 2
        (1, "beta alpha alpha"),   # alpha at 1 and 2
        (2, "beta beta alpha"),    # alpha at 2 only
        (3, "beta beta beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = {r.doc_id for r in bm25_span_first_topk(df, "alpha", end=2, k=10).collect()}
    assert hits == {0, 1}  # doc 2's only occurrence is at p=2 (span end 3 > 2)
    # sf ordering: doc 0 has 1 match in window, same as doc 1 -> same sf/dl
    hits3 = bm25_span_first_topk(df, "alpha", end=3, k=10).collect()
    assert {r.doc_id for r in hits3} == {0, 1, 2}
    by_id = {r.doc_id: r.score for r in hits3}
    assert by_id[0] == by_id[1] > by_id[2]  # 2 in-window occurrences beat 1


def test_span_first_rejections(documents, searcher):
    with pytest.raises(ValueError, match="single analyzed token"):
        dsl_search(documents, {"query": {"span_first": {
            "match": {"span_term": {"text": "two words"}}, "end": 3}}})
    with pytest.raises(ValueError, match="needs end"):
        dsl_search(documents, {"query": {"span_first": {
            "match": {"span_term": {"text": "batch"}}}}})
    with pytest.raises(ValueError, match="span_term only"):
        dsl_search(documents, {"query": {"span_first": {
            "match": {"span_near": {"clauses": []}}, "end": 3}}})
    with pytest.raises(ValueError, match="end must be >= 1"):
        dsl_search(documents, {"query": {"span_first": {
            "match": {"span_term": {"text": "batch"}}, "end": 0}}})


def test_fields_param_is_source_alias(documents, duck):
    """1.x `fields` ≡ `_source` (the docs table IS the stored-fields store);
    both in one body refuse."""
    f_body = {"query": {"match": {"text": "dup batch"}},
              "fields": ["lang", "n_chars"], "size": 5}
    s_body = {"query": {"match": {"text": "dup batch"}},
              "_source": ["lang", "n_chars"], "size": 5}
    got_f = [tuple(r) for r in dsl_search(documents, f_body).collect()]
    got_s = [tuple(r) for r in dsl_search(documents, s_body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(f_body)).fetchall()]
    assert got_f == got_s == want and got_f
    with pytest.raises(ValueError, match="fields and _source"):
        dsl_search(documents, {**f_body, "_source": ["lang"]})


def test_track_scores_on_sorted_search(documents, duck, searcher):
    """ES track_scores: true — sorted hits carry their BM25 score; hit set/
    order identical to the untracked sort; score equals the plain match
    query's score for the same doc. Serving refuses loudly."""
    body_t = {"query": {"match": {"text": "dup batch scan"}},
              "sort": [{"n_chars": "desc"}], "track_scores": True, "size": 8}
    body_p = {"query": {"match": {"text": "dup batch scan"}},
              "sort": [{"n_chars": "desc"}], "size": 8}
    got = [tuple(r) for r in dsl_search(documents, body_t).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body_t)).fetchall()]
    assert got == want and len(got) == 8
    plain = [tuple(r) for r in dsl_search(documents, body_p).collect()]
    assert [(d, n) for d, n, _ in got] == plain  # same hits, same order
    # scores match the score-ranked query's values for overlapping docs
    by_id = {r.doc_id: r.score for r in dsl_search(
        documents, {"query": {"match": {"text": "dup batch scan"}},
                    "size": 10000}).collect()}
    assert all(abs(by_id[d] - s) < 1e-9 for d, _, s in got)
    with pytest.raises(ValueError, match="declarative-only"):
        dsl_search_index(searcher, body_t)
    with pytest.raises(ValueError, match="sorted scored match only"):
        dsl_search(documents, {"query": {"match": {"text": "a"}},
                               "track_scores": True})
    with pytest.raises(ValueError, match="sorted scored match only"):
        dsl_search(documents, {"query": {"match_all": {}},
                               "sort": [{"n_chars": "desc"}],
                               "track_scores": True})


def test_match_analyzer_option(spark, documents, duck):
    """ES 1.x per-query analyzer override: parse-time rewrite to the
    rendered custom-analyzed stream — declarative == oracle; the english
    chain removes stopwords pre-stem; unknown names refuse loudly."""
    from flume_elasticsearch_2_spark.operators.dsl import (
        dsl_search,
        dsl_search_sql,
        parse_body,
    )

    body = {
        "query": {"match": {"text": {"query": "queries tables scans",
                                     "analyzer": "ascii_sstem"}}},
        "size": 8,
    }
    got = [tuple(r) for r in dsl_search(documents, body).collect()]
    want = [tuple(r) for r in duck.execute(dsl_search_sql(body)).fetchall()]
    assert got == want and got

    # rewrite semantics: spec.query holds the rendered custom tokens
    spec = parse_body({"query": {"match": {"text": {
        "query": "The running queries", "analyzer": "english"}}}})
    assert spec.query == "run queri"  # stopword gone, Porter applied

    # zero_terms_query interacts correctly: an all-stopword query under
    # english analyzes to zero tokens -> ztq=all rewrites to match_all
    spec = parse_body({"query": {"match": {"text": {
        "query": "the and of", "analyzer": "english",
        "zero_terms_query": "all"}}}})
    assert spec.kind == "match_all"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="analyzer"):
        parse_body({"query": {"match": {"text": {
            "query": "x", "analyzer": "klingon"}}}})
    with _pytest.raises(ValueError, match="analyzer"):
        parse_body({"query": {"match": {"text": {
            "query": "x", "analyzer": "ascii_edge9_2"}}}})  # bad bounds
    # edge names accepted and applied
    spec = parse_body({"query": {"match": {"text": {
        "query": "query", "analyzer": "ascii_edge2_3"}}}})
    assert spec.query == "qu que"


def test_boosting_and_mode_serving_parity(documents, searcher):
    """boosting with an AND-mode positive query: serving == declarative
    (the AND candidate constraint and the demotion compose)."""
    body = {"query": {"boosting": {
        "positive": {"match": {"text": {"query": "batch scan", "operator": "and"}}},
        "negative": {"match": {"text": "dup"}},
        "negative_boost": 0.4}}, "size": 10}
    got = [tuple(r) for r in dsl_search_index(searcher, body).collect()]
    want = [tuple(r) for r in dsl_search(documents, body).collect()]
    assert got == want and got
