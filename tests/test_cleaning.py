"""Training-data cleaning ops: PII redaction (three-engine byte parity on
crafted strings), repetition metrics, duplicated n-gram spans — all vs the
DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators.cleaning import (
    duplicated_ngrams,
    duplicated_ngrams_sql,
    redact_pii_col,
    redact_pii_py,
    redact_pii_sql_expr,
    repetition_metrics,
    repetition_metrics_sql,
)

PII_CASES = [
    "contact me at john.doe+spam@example.co.uk please",
    "server at 192.168.1.254 and 10.0.0.1:8080",
    "call +1 (555) 123-4567 or 555-123-4567 now",
    "mixed: a@b.io on 8.8.8.8 phone 0123456789",
    "no pii here at all",
    "",
    "v1.2.3 release notes",  # version string must NOT match ipv4 (needs 4 octets)
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def test_redact_three_engine_parity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(PII_CASES)], "i int, text string")
    got = {r.i: r.red for r in df.select("i", redact_pii_col("text").alias("red")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, '{t}')" for i, t in enumerate(PII_CASES)) +
                ") v(i, text)")
    want = dict(con.execute(f"SELECT i, {redact_pii_sql_expr()} FROM t").fetchall())
    py = {i: redact_pii_py(t) for i, t in enumerate(PII_CASES)}
    assert got == want == py


def test_redact_replaces_pii_and_preserves_rest(spark):
    out = redact_pii_py("mail a@b.io, ip 1.2.3.4, tel +44 20 7946 0958 end")
    assert out == "mail <PII>, ip <PII>, tel <PII> end"
    assert redact_pii_py("v1.2.3 notes") == "v1.2.3 notes"


def test_redact_corpus_noop_matches_oracle(documents, duck):
    """The synthetic corpus contains no PII — redaction must be the exact
    identity on it (both engines agree on every byte)."""
    got = {r.doc_id: r.red for r in documents.select(
        "doc_id", redact_pii_col("text").alias("red")).collect()}
    want = dict(duck.execute(
        f"SELECT doc_id, {redact_pii_sql_expr()} FROM documents").fetchall())
    assert got == want


@pytest.mark.parametrize("n", [2, 3, 5])
def test_repetition_metrics_match_duckdb(documents, duck, n):
    got = [tuple(r) for r in repetition_metrics(documents, n=n).orderBy("doc_id").collect()]
    want = [tuple(r) for r in duck.execute(
        repetition_metrics_sql(n=n) + " ORDER BY doc_id").fetchall()]
    assert got == want and got


def test_repetition_short_doc_edge(spark):
    df = spark.createDataFrame([(1, "a b"), (2, ""), (3, "x x x x")], "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_metrics(df, n=3).collect()}
    assert rows[1].n_ngrams == 0 and rows[1].repetition_ratio == 0.0
    assert rows[2].n_ngrams == 0
    assert rows[3].n_ngrams == 2 and rows[3].n_distinct == 1  # "x x x" twice
    assert rows[3].repetition_ratio == 0.5


@pytest.mark.parametrize("n,min_df", [(5, 2), (3, 10)])
def test_duplicated_ngrams_match_duckdb(documents, duck, n, min_df):
    got = [tuple(r) for r in duplicated_ngrams(documents, n=n, min_df=min_df).collect()]
    want = [tuple(r) for r in duck.execute(duplicated_ngrams_sql(n=n, min_df=min_df)).fetchall()]
    assert got == want


@pytest.mark.parametrize("n,min_df", [(5, 2), (3, 5)])
def test_doc_dup_fraction_matches_duckdb(documents, duck, n, min_df):
    from flume_elasticsearch_2_spark.operators.cleaning import (
        doc_dup_fraction,
        doc_dup_fraction_sql,
    )

    got = [tuple(r) for r in doc_dup_fraction(documents, n=n, min_df=min_df)
           .orderBy("doc_id").collect()]
    want = [tuple(r) for r in duck.execute(
        doc_dup_fraction_sql(n=n, min_df=min_df) + " ORDER BY 1").fetchall()]
    assert got == want and got


def test_doc_dup_fraction_semantics(spark):
    from flume_elasticsearch_2_spark.operators.cleaning import doc_dup_fraction

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y"), (3, "p q r s t"), (4, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in doc_dup_fraction(df, n=3, min_df=2).collect()}
    # "a b c" appears in docs 1 and 2 -> duplicated; their other grams unique
    assert rows[1].n_dup == 1 and rows[1].n_ngrams == 3
    assert abs(rows[1].dup_fraction - round(1 / 3, 6)) < 1e-9
    assert rows[3].n_dup == 0 and rows[3].dup_fraction == 0.0
    assert rows[4].n_ngrams == 0 and rows[4].dup_fraction == 0.0


def test_clean_corpus_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.cleaning import clean_corpus, clean_corpus_sql

    got = sorted(tuple(r) for r in clean_corpus(documents).collect())
    want = sorted(tuple(r) for r in duck.execute(clean_corpus_sql()).fetchall())
    assert got == want and got
    # the pass actually filters something on this corpus (lang allowlist)
    assert len(got) < documents.count()


def test_clean_corpus_single_stage_plan(documents):
    from flume_elasticsearch_2_spark.operators.cleaning import clean_corpus

    df = clean_corpus(documents)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan and "Join" not in plan
    assert "codegen id" in plan  # the scan->filter->project pass is codegen'd
    assert "In(lang" in plan  # language allowlist pushed to the Parquet scan


# -- PMI collocations -----------------------------------------------------------


def test_collocations_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.cleaning import (
        collocations,
        collocations_sql,
    )

    for k, mc in [(15, 5), (30, 1), (5, 20)]:
        got = [tuple(r) for r in collocations(documents, k=k, min_count=mc).collect()]
        want = [tuple(r) for r in duck.execute(collocations_sql(k=k, min_count=mc)).fetchall()]
        assert got == want and got, (k, mc)


def test_collocations_pmi_semantics(spark):
    """Hand-checkable corpus: 'a b' always adjacent scores above pairs that
    also occur apart; min_count drops singletons."""
    from flume_elasticsearch_2_spark.operators.cleaning import collocations

    tiny = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b c d"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["bigram"]: (r["n"], r["pmi"]) for r in collocations(tiny, 20, 1).collect()}
    assert rows["a b"][0] == 3
    assert rows["a b"][1] > rows["c a"][1]
    capped = {r["bigram"] for r in collocations(tiny, 20, 2).collect()}
    assert "c d" not in capped and "a b" in capped


# -- paragraph-level dedup + decontamination ----------------------------------


def _cmp(sdf, con, sql):
    got = sdf.toPandas()
    got = got.reindex(sorted(got.columns), axis=1)
    want = con.sql(sql).df()
    want = want.reindex(sorted(want.columns), axis=1)
    assert list(got.columns) == list(want.columns)
    assert sorted(map(repr, got.itertuples(index=False, name=None))) == sorted(
        map(repr, want.itertuples(index=False, name=None))
    )
    return got


def test_dedup_paragraphs_chunk_mode_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.cleaning import (
        dedup_paragraphs,
        dedup_paragraphs_sql,
    )

    got = _cmp(
        dedup_paragraphs(documents, chunk_tokens=20, sep=" "),
        duck,
        dedup_paragraphs_sql(chunk_tokens=20, sep=" "),
    )
    # the synthetic corpus HAS near-duplicates: something must be dropped,
    # but most text survives
    assert 0 < got.n_kept.sum() < got.n_paras.sum()


def test_dedup_paragraphs_splitter_semantics(spark):
    import duckdb as _duck
    import pandas as pd

    from flume_elasticsearch_2_spark.operators.cleaning import (
        dedup_paragraphs,
        dedup_paragraphs_sql,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hello world\n\nthe same para\n\nunique one",
                "the same para\n\nanother bit",
                "the same para\n\nthe same para\n\nfresh text",
                "",
            ],
        }
    )
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_deduped)
        for r in dedup_paragraphs(spark.createDataFrame(pdf), splitter="\n\n+").collect()
    }
    # first occurrence (doc 1) keeps everything; later copies drop, even
    # WITHIN one doc (doc 3's double para keeps neither — both duplicate doc 1)
    assert got[1] == (3, 3, "hello world\n\nthe same para\n\nunique one")
    assert got[2] == (2, 1, "another bit")
    assert got[3] == (3, 1, "fresh text")
    assert got[4] == (0, 0, "")
    con = _duck.connect()
    con.register("crafted", pdf)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            dedup_paragraphs_sql(splitter="\n\n+", table="crafted")
        ).fetchall()
    }
    assert got == want


def test_dedup_paragraphs_arg_validation(documents):
    from flume_elasticsearch_2_spark.operators.cleaning import dedup_paragraphs

    with pytest.raises(ValueError):
        dedup_paragraphs(documents)  # neither mode
    with pytest.raises(ValueError):
        dedup_paragraphs(documents, splitter="\n\n", chunk_tokens=10)  # both
    with pytest.raises(ValueError):
        dedup_paragraphs(documents, chunk_tokens=0)


def test_decontaminate_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.cleaning import (
        decontaminate,
        decontaminate_sql,
    )

    bench = documents.where("doc_id % 17 = 3")
    scored = documents.where("doc_id % 17 <> 3")
    got = _cmp(
        decontaminate(scored, bench, n=8),
        duck,
        decontaminate_sql("doc_id % 17 = 3", "doc_id % 17 <> 3", n=8),
    )
    # every scored doc reports, clean docs report 0
    assert len(got) == scored.count()
    assert (got.n_contaminated >= 0).all()


def test_decontaminate_semantics(spark):
    import pandas as pd

    from flume_elasticsearch_2_spark.operators.cleaning import decontaminate

    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "alpha beta gamma delta epsilon",  # shares the bench 3-grams
                    "one two three four five",  # clean
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["alpha beta gamma delta"]})
    )
    got = {r.doc_id: (r.n_contaminated, r.contaminated) for r in decontaminate(train, bench, n=3).collect()}
    # bench has 3-grams {abc, bcd}; doc 1 contains both (distinct), doc 2 none
    assert got == {1: (2, True), 2: (0, False)}


def test_contamination_report_matches_duckdb(spark, documents, sf_dir):
    """Reverse contamination direction: per-benchmark-item hit-gram and
    hit-doc counts match the DuckDB oracle; clean items report 0/0."""
    import duckdb

    from flume_elasticsearch_2_spark.operators.cleaning import (
        contamination_report,
        contamination_report_sql,
    )

    got = [
        tuple(r)
        for r in contamination_report(
            documents.where("doc_id % 17 <> 3"),
            documents.where("doc_id % 17 = 3"),
            n=8,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [
        tuple(r)
        for r in con.sql(
            contamination_report_sql("doc_id % 17 = 3", "doc_id % 17 <> 3", n=8)
        ).fetchall()
    ]
    assert got == want and got
    assert any(r[1] > 0 for r in got)  # contaminated items exist (dup docs)
    # duality with decontaminate: bench grams hit somewhere <-> train docs hit
    from flume_elasticsearch_2_spark.operators.cleaning import decontaminate

    flagged_train = decontaminate(
        documents.where("doc_id % 17 <> 3"),
        documents.where("doc_id % 17 = 3"), n=8,
    ).where("contaminated").count()
    assert (flagged_train > 0) == any(r[2] > 0 for r in got)


def test_contamination_report_sstem_oracle_parity(spark, documents, sf_dir):
    """Driver-advice r3 (medium): with analyzer='ascii_sstem' the oracle
    must stem too — the old bare-token-pattern oracle reported 0 hit-grams
    while the Spark twin stemmed both sides. Now both generators compose
    duckdb_tokens_expr, so the stemmed configs agree AND find hits."""
    import duckdb

    from flume_elasticsearch_2_spark.operators.cleaning import (
        contamination_report,
        contamination_report_sql,
    )

    got = [
        tuple(r)
        for r in contamination_report(
            documents.where("doc_id % 17 <> 3"),
            documents.where("doc_id % 17 = 3"),
            n=5,
            analyzer="ascii_sstem",
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [
        tuple(r)
        for r in con.sql(
            contamination_report_sql(
                "doc_id % 17 = 3", "doc_id % 17 <> 3", n=5, analyzer="ascii_sstem"
            )
        ).fetchall()
    ]
    assert got == want and got
    assert any(r[1] > 0 for r in got)  # the stemmed oracle actually finds hits


def test_duplicated_spans_matches_duckdb(documents, duck):
    from flume_elasticsearch_2_spark.operators.cleaning import (
        duplicated_spans,
        duplicated_spans_sql,
    )

    for n, mdf in ((6, 2), (4, 3)):
        got = [tuple(r) for r in duplicated_spans(documents, n=n, min_df=mdf).collect()]
        want = [
            tuple(r) for r in duck.execute(duplicated_spans_sql(n=n, min_df=mdf)).fetchall()
        ]
        assert got == want and got, (n, mdf)


def test_duplicated_spans_semantics(spark):
    """Crafted corpus: two docs share the exact phrase 'a b c d e f' (two
    overlapping 5-grams -> ONE maximal span covering tokens 6 tokens wide);
    a doc with two far-apart duplicated windows yields TWO islands; unique
    text yields none."""
    from flume_elasticsearch_2_spark.operators.cleaning import duplicated_spans

    shared = "a b c d e f"
    far = "a b c d e x0 x1 x2 x3 x4 x5 x6 x7 b c d e f"
    rows = [
        (1, f"{shared} tail one"),
        (2, f"lead two {shared}"),
        (3, far),
        (4, "totally unique text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.start_token, r.end_token, r.n_grams)
        for r in duplicated_spans(docs, n=5, min_df=2).collect()
    }
    # doc 1: grams at pos 0 ('a b c d e') and 1 ('b c d e f') merge -> [0, 5]
    assert got[1] == (0, 5, 2)
    # doc 2: same two grams shifted by the 2-token lead -> [2, 7]
    assert got[2] == (2, 7, 2)
    # doc 3 holds both shared windows: 'a b c d e' at 0 and 'b c d e f' at
    # 13 — gap 13 > 0 + 5, so two separate islands
    d3 = sorted(
        (r.start_token, r.end_token)
        for r in duplicated_spans(docs, n=5, min_df=2).collect()
        if r.doc_id == 3
    )
    assert d3 == [(0, 4), (13, 17)]
    assert 4 not in got or got[4] is None  # unique doc: no spans


def test_duplicated_spans_properties(spark):
    """Structural invariants on a randomized (seeded) corpus: spans are
    per-doc sorted and NON-overlapping with gaps > n between them (maximal
    merge really merged), every span lies inside its doc's token range, and
    n_grams == span_width - n + 1 exactly when the span is gap-free inside
    (always true post-merge: islands are by construction runs of hits no
    more than n apart, so gram count is bounded by width but at least the
    island's hit count)."""
    import random

    from flume_elasticsearch_2_spark.functions.tokenizer import tokenize
    from flume_elasticsearch_2_spark.operators.cleaning import duplicated_spans

    rng = random.Random(404)
    vocab = [f"w{i}" for i in range(30)]
    shared_a = "p q r s t u v"         # 7 tokens, planted in several docs
    shared_b = "m n o p2 q2"           # 5 tokens
    rows = []
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randint(8, 40))]
        text = " ".join(toks)
        if i % 4 == 0:
            cut = rng.randint(0, len(toks))
            text = " ".join(toks[:cut]) + " " + shared_a + " " + " ".join(toks[cut:])
        if i % 5 == 0:
            text = shared_b + " " + text
        rows.append((i, text.strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = 4
    spans = duplicated_spans(docs, n=n, min_df=2).collect()
    assert spans
    dl = {i: len(tokenize(t)) for i, t in rows}
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, ss in by_doc.items():
        ss = sorted(ss, key=lambda r: r.start_token)
        prev_end = None
        for r in ss:
            assert 0 <= r.start_token <= r.end_token < dl[d], (d, r)
            width = r.end_token - r.start_token + 1
            assert width >= n and 1 <= r.n_grams <= width - n + 1, (d, r)
            if prev_end is not None:
                # maximality: the next span's first hit must NOT have been
                # mergeable into the previous island
                assert r.start_token > prev_end - n + 1 + n, (d, ss)
            prev_end = r.end_token
    # the planted 7-token shared phrase shows up as a span of width >= 7
    planted = [r for r in spans if r.end_token - r.start_token + 1 >= 7]
    assert planted
