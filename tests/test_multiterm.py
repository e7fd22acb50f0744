"""Multi-term queries (ES prefix/wildcard/fuzzy, SURVEY §2.5): expansion,
rewrite, and scoring checked three ways — declarative plan vs DuckDB SQL
oracle, serving path vs declarative path (rank identity), and Levenshtein
three-engine parity (Python / Spark / DuckDB) that the fuzzy oracle rests on.

Reference analog: the ES 1.x MultiTermQuery surface behind the sink
(ElasticsearchSink.java:54)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.operators.multiterm import (
    bm25_multiterm_topk,
    expand_pattern,
    levenshtein_py,
    match_term_py,
    multiterm_topk_sql,
    translate_wildcard,
)
from flume_elasticsearch_2_spark.plans.build_index import build_index
from flume_elasticsearch_2_spark.plans.query_index import IndexSearcher

# (pattern, kind, kwargs) — the fixed multi-term case set; the sf0.001
# vocabulary is ~31 terms so expansions are known: prefix 's' -> scan slow
# small sort spark stream, fuzzy 'part'~2 -> part fast sort, ...
CASES = [
    ("s", "prefix", {}),
    ("ba", "prefix", {}),
    ("s", "prefix", {"max_expansions": 3}),  # exercises the (df DESC, term) cap
    ("s*r*", "wildcard", {}),
    ("?a???", "wildcard", {}),
    ("scam", "fuzzy", {"fuzziness": 1}),
    ("part", "fuzzy", {"fuzziness": 2}),
    ("part", "fuzzy", {"fuzziness": 2, "prefix_length": 1}),
    # regexp (ES RegexpQuery, whole-term): group alternation keeps the 's'
    # literal prefix for serving-path range pruning ...
    ("s(can|mall|ort)", "regexp", {}),
    # ... top-level alternation voids the literal prefix (full-dict scan)
    ("b.tch|d.p", "regexp", {}),
    # char class + star + bounded repeat
    ("s[a-z]*k", "regexp", {}),
    ("dupl{0,1}", "regexp", {}),
]
REWRITES = ["constant_score", "scoring_boolean"]


@pytest.fixture(scope="module")
def index_dir(spark, documents, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mtidx") / "segidx")
    build_index(spark, documents, d, n_shards=4)
    return d


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_levenshtein_three_engine_parity(spark, duck):
    """The fuzzy predicate is only oracle-valid if all three engines agree
    on edit distance over the analyzer's token class."""
    words = [
        "scan", "scam", "spark", "sort", "part", "fast", "batch", "a",
        "aa", "ab", "", "window", "windows", "widow", "stream", "steam",
    ]
    pairs = [(a, b) for a in words for b in words]
    rows = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    ).collect()
    for r in rows:
        assert r.d == levenshtein_py(r.a, r.b), (r.a, r.b)
    for a, b in pairs:
        (d,) = duck.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()
        assert d == levenshtein_py(a, b), (a, b)


def test_wildcard_translation_and_validation():
    assert translate_wildcard("s*r?") == "s%r_"
    with pytest.raises(ValueError):
        translate_wildcard("bad pattern")
    with pytest.raises(ValueError):
        translate_wildcard("a%b")


def test_regexp_three_engine_parity(spark, duck):
    """The regexp oracle rests on Java regex (rlike), RE2 (regexp_full_match)
    and Python `re` agreeing on the documented syntax subset over the
    analyzer's token class — checked exhaustively on a fixed vocabulary."""
    words = [
        "scan", "scn", "scnn", "scann", "batch", "bats", "ab", "abb", "abbb",
        "bat", "cat", "cats", "spark", "stack", "dup", "dupl", "a", "sk",
    ]
    pats = [
        "sc.n+", "bat(ch|s)", "ab{1,2}", "[a-c]at.*", "x|batch",
        "s[a-z]*k", "dupl{0,1}", "s(can|mall|ort)",
    ]
    for p in pats:
        py = [w for w in words if match_term_py(w, p, "regexp")]
        jvm = [
            r.w
            for r in spark.createDataFrame([(w,) for w in words], "w string")
            .where(F.col("w").rlike(f"^(?:{p})$"))
            .collect()
        ]
        dd = [
            w
            for w in words
            if duck.sql(f"SELECT regexp_full_match('{w}', '{p}')").fetchone()[0]
        ]
        assert sorted(py) == sorted(jvm) == sorted(dd), p


def test_regexp_validation_and_literal_prefix():
    from flume_elasticsearch_2_spark.operators.multiterm import (
        _normalize_pattern,
        literal_prefix,
    )

    for bad in ["a\\d", "A B", "a(b", "foo\\*", "ab^c", "a$"]:
        with pytest.raises(ValueError):
            _normalize_pattern(bad, "regexp", 0)
    # literal prefix: quantifier makes the last literal optional; top-level
    # alternation voids the prefix entirely (`ab|cd` matches "cd")
    assert literal_prefix("s(can|mall)", "regexp") == "s"
    assert literal_prefix("ab*c", "regexp") == "a"
    assert literal_prefix("ab{0,2}c", "regexp") == "a"
    assert literal_prefix("ab+c", "regexp") == "ab"
    assert literal_prefix("ab|cd", "regexp") == ""
    # the `|` voids the prefix even when a meta precedes it — `b.tch|d.p`
    # matches "dup", which shares nothing with "b" (regression: the scan
    # must not stop at the first meta before seeing a depth-0 alternation)
    assert literal_prefix("b.tch|d.p", "regexp") == ""
    assert literal_prefix("b.tch", "regexp") == "b"
    assert literal_prefix("abc", "regexp") == "abc"


@pytest.mark.parametrize("pattern,kind,kw", CASES)
def test_expansion_serving_equals_declarative(documents, searcher, pattern, kind, kw):
    """Serving-path dictionary expansion (range-pruned terms/ read) must equal
    the declarative corpus aggregation — same matches, same df-ordered cap."""
    decl = expand_pattern(documents, pattern, kind, **kw)
    serv = searcher.expand_terms(pattern, kind, **kw)
    assert serv == decl
    assert decl, f"case {pattern!r}/{kind} should expand to >=1 term on the fixture"


def test_expansion_cap_keeps_top_df():
    # pure matcher sanity: fuzzy prefix guard
    assert match_term_py("part", "part", "fuzzy", 2, 1)
    assert not match_term_py("sort", "part", "fuzzy", 2, 1)  # prefix guard blocks
    assert match_term_py("sort", "part", "fuzzy", 2, 0)


@pytest.mark.parametrize("pattern,kind,kw", CASES)
@pytest.mark.parametrize("rewrite", REWRITES)
def test_declarative_matches_duckdb(documents, duck, pattern, kind, kw, rewrite):
    got = [
        (r.doc_id, r.score)
        for r in bm25_multiterm_topk(
            documents, pattern, kind, k=10, rewrite=rewrite, **kw
        ).collect()
    ]
    exp = [
        (int(d), float(s))
        for d, s in duck.sql(
            multiterm_topk_sql(pattern, kind, k=10, rewrite=rewrite, **kw)
        ).fetchall()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-6
    assert got, f"{pattern!r}/{kind}/{rewrite} should match docs on the fixture"


@pytest.mark.parametrize("pattern,kind,kw", CASES)
@pytest.mark.parametrize("rewrite", REWRITES)
def test_serving_rank_identical_to_declarative(
    documents, searcher, pattern, kind, kw, rewrite
):
    """search_multiterm (dictionary expansion + BMW engine / early-exit id
    scan) is rank-identical to the declarative plan."""
    decl = [
        (r.doc_id, r.score)
        for r in bm25_multiterm_topk(
            documents, pattern, kind, k=10, rewrite=rewrite, **kw
        ).collect()
    ]
    serv = [
        (r.doc_id, r.score)
        for r in searcher.search_multiterm(
            pattern, kind, k=10, rewrite=rewrite, **kw
        ).collect()
    ]
    assert [d for d, _ in serv] == [d for d, _ in decl]
    for (_, a), (_, b) in zip(serv, decl):
        assert abs(a - b) < 1e-6


def test_boost_plumbs_through(documents, searcher):
    got = searcher.search_multiterm("ba", "prefix", k=5, boost=2.5).collect()
    assert got and all(abs(r.score - 2.5) < 1e-9 for r in got)
    decl = bm25_multiterm_topk(documents, "ba", "prefix", k=5, boost=2.5).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in decl]


def test_empty_expansion_returns_empty(documents, searcher):
    assert bm25_multiterm_topk(documents, "zzq", "prefix", k=10).count() == 0
    assert searcher.search_multiterm("zzq", "prefix", k=10).count() == 0


def test_constant_score_early_exit_is_k_smallest_ids(documents, searcher):
    """constant_score = the k smallest matching doc ids at score boost; the
    serving path early-exits after the lowest shards — verify against a
    corpus-computed ground truth."""
    ids = [
        r.doc_id
        for r in documents.select("doc_id")
        .where(F.exists(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t.startswith("ba")))
        .orderBy("doc_id")
        .limit(3)
        .collect()
    ]
    got = [r.doc_id for r in searcher.search_multiterm("ba", "prefix", k=3).collect()]
    assert got == ids


# -- term suggester -----------------------------------------------------------


@pytest.mark.parametrize(
    "term,kw",
    [
        ("scann", {}),  # 'scan' at distance 1 should rank first
        ("sprak", {"max_edits": 2}),
        ("part", {"max_edits": 1}),  # real term excluded, near terms kept
        ("bat", {"max_edits": 2, "prefix_length": 0}),  # unpruned dictionary pass
    ],
)
def test_suggest_matches_duckdb(documents, duck, term, kw):
    from flume_elasticsearch_2_spark.operators.multiterm import (
        term_suggest,
        term_suggest_sql,
    )

    got = [tuple(r) for r in term_suggest(documents, term, **kw).collect()]
    want = [tuple(r) for r in duck.execute(term_suggest_sql(term, **kw)).fetchall()]
    assert got == want


@pytest.mark.parametrize("term", ["scann", "sprak", "bat"])
def test_suggest_serving_equals_declarative(documents, searcher, term):
    from flume_elasticsearch_2_spark.operators.multiterm import term_suggest

    got = [tuple(r) for r in searcher.suggest(term, size=5, max_edits=2).collect()]
    decl = [tuple(r) for r in term_suggest(documents, term, size=5, max_edits=2).collect()]
    assert got == decl


def test_suggest_excludes_input_and_orders_by_distance(documents):
    from flume_elasticsearch_2_spark.operators.multiterm import term_suggest

    rows = term_suggest(documents, "scan", size=10, max_edits=2).collect()
    assert all(r.suggestion != "scan" for r in rows)
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)


# -- completion suggester (type-ahead prefix lookup) -------------------------


def test_completion_suggest_matches_duckdb(spark, documents, duck):
    from flume_elasticsearch_2_spark.operators.multiterm import (
        completion_suggest,
        completion_suggest_sql,
    )

    for prefix, size in [("s", 5), ("sc", 3), ("b", 10), ("zzz", 5)]:
        got = [tuple(r) for r in completion_suggest(documents, prefix, size).collect()]
        want = [
            tuple(r) for r in duck.execute(completion_suggest_sql(prefix, size)).fetchall()
        ]
        assert got == want, prefix
    assert len(completion_suggest(documents, "s", 5).collect()) == 5


def test_completion_serving_equals_declarative(documents, searcher):
    from flume_elasticsearch_2_spark.operators.multiterm import completion_suggest

    for prefix in ["s", "sc", "ba", "zzz"]:
        got = [tuple(r) for r in searcher.complete(prefix, 5).collect()]
        want = [tuple(r) for r in completion_suggest(documents, prefix, 5).collect()]
        assert got == want, prefix


def test_completion_empty_prefix_raises(documents, searcher):
    from flume_elasticsearch_2_spark.operators.multiterm import (
        completion_suggest,
        completion_suggest_sql,
    )

    for bad in ("", "a_b", "a%", "o'x"):  # outside the token class: the SQL
        with pytest.raises(ValueError):   # oracle's LIKE would misinterpret
            completion_suggest(documents, bad)
        with pytest.raises(ValueError):
            searcher.complete(bad)
        with pytest.raises(ValueError):
            completion_suggest_sql(bad)


# -- phrase suggester ("did you mean" for whole inputs) ----------------------

PSUG_CASES = [
    ("dup batch scam", {}),
    ("grup and sot", {"max_edits": 2}),
    ("so fat scam", {"max_edits": 2, "max_candidates": 3}),
    ("scap", {}),                      # single-term degenerate
    ("zzz qqq", {}),                   # nothing within reach -> empty
    ("batch scan", {"prefix_length": 0, "size": 8}),  # unpruned dictionary
    # prefix_length=0 WITH reachable candidates: the serving path must scan
    # the whole dictionary like the declarative twin (review regression)
    ("grup", {"prefix_length": 0, "max_edits": 2}),
]


@pytest.mark.parametrize("text,kw", PSUG_CASES, ids=[c[0] for c in PSUG_CASES])
def test_phrase_suggest_matches_duckdb(documents, duck, text, kw):
    from flume_elasticsearch_2_spark.operators.multiterm import (
        phrase_suggest,
        phrase_suggest_sql,
    )

    got = [tuple(r) for r in phrase_suggest(documents, text, **kw).collect()]
    want = [tuple(r) for r in duck.execute(phrase_suggest_sql(text, **kw)).fetchall()]
    assert got == want, (text, kw)


@pytest.mark.parametrize("text,kw", PSUG_CASES, ids=[c[0] for c in PSUG_CASES])
def test_phrase_suggest_serving_equals_declarative(documents, searcher, text, kw):
    from flume_elasticsearch_2_spark.operators.multiterm import phrase_suggest

    got = [tuple(r) for r in searcher.suggest_phrase(text, **kw).collect()]
    want = [tuple(r) for r in phrase_suggest(documents, text, **kw).collect()]
    assert got == want, (text, kw)


def test_phrase_suggest_excludes_identity_and_single_error(documents):
    """max_errors=1 contract: every suggestion differs from the input in
    EXACTLY one analyzed position, and the input itself never appears."""
    from flume_elasticsearch_2_spark.operators.multiterm import phrase_suggest

    text = "grup and sot"
    rows = phrase_suggest(documents, text, max_edits=2, size=10).collect()
    assert rows
    inp = text.split()
    for r in rows:
        toks = r["suggestion"].split()
        assert len(toks) == len(inp) and toks != inp
        assert sum(1 for a, b in zip(toks, inp) if a != b) == 1


def test_phrase_suggest_lm_prefers_frequent(documents):
    """The unigram LM ranks the more frequent correction first when edit
    distances tie (scan df=405 > scam absent at sf0.001)."""
    from flume_elasticsearch_2_spark.operators.multiterm import phrase_suggest

    rows = phrase_suggest(documents, "dup batch scam").collect()
    assert rows and rows[0]["suggestion"] == "dup batch scan"


# -- the _suggest endpoint ----------------------------------------------------

SUGGEST_BODY = {
    "typo": {"text": "stre", "term": {"field": "text", "max_edits": 2}},
    "didyoumean": {"text": "grup and sot", "phrase": {"max_edits": 2}},
    "typeahead": {"prefix": "s", "completion": {"size": 4}},
}


def test_suggest_body_three_paths(documents, duck, searcher):
    from flume_elasticsearch_2_spark.operators.multiterm import (
        suggest_body,
        suggest_body_index,
        suggest_body_sql,
    )

    got = [tuple(r) for r in suggest_body(documents, SUGGEST_BODY).collect()]
    want = [tuple(r) for r in duck.execute(suggest_body_sql(SUGGEST_BODY)).fetchall()]
    srv = [tuple(r) for r in suggest_body_index(searcher, SUGGEST_BODY).collect()]
    assert got == want and srv == got
    assert {r[0] for r in got} == {"typo", "didyoumean", "typeahead"}


@pytest.mark.parametrize(
    "bad",
    [
        {},
        {"x": {"text": "a"}},                                    # no suggester
        {"x": {"text": "a", "term": {}, "phrase": {}}},          # two suggesters
        {"x": {"text": "a", "completion": {"fuzzy": True}}},     # unknown option
        {"x": {"term": {"field": "text"}}},                      # missing text
        {"x": {"text": "a", "term": {"field": "title"}}},        # non-text field
        {"x": {"prefix": "a", "term": {"field": "text"}}},        # prefix w/ term
        {"x": {"text": "a", "prefix": "b", "completion": {}}},    # both keys
    ],
)
def test_suggest_body_rejects(documents, bad):
    from flume_elasticsearch_2_spark.operators.multiterm import suggest_body

    with pytest.raises(ValueError, match="_suggest"):
        suggest_body(documents, bad)
