"""functions/scripts.py — the ES 1.x script_score/script_fields arithmetic
compiler: grammar, Spark/SQL twin equivalence, loud refusals.

Reference analog: the delegated ES 1.1 evaluates MVEL scoring scripts
(ElasticsearchSink.java:54); here the arithmetic subset compiles to a JVM
Column + an ANSI-SQL twin so both engines evaluate the same float64 tree."""

from __future__ import annotations

import math

import duckdb
import pytest

from flume_elasticsearch_2_spark.functions.scripts import parse_script


def _eval_sql(expr: str) -> float:
    return duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]


@pytest.mark.parametrize(
    "src,expected",
    [
        ("1 + 2 * 3", 7.0),
        ("(1 + 2) * 3", 9.0),
        ("2 * -3", -6.0),
        ("-2 - -3", 1.0),
        ("10 / 4", 2.5),
        ("1 - 2 - 3", -4.0),  # left assoc
        ("100 / 10 / 2", 5.0),
        ("log(1)", 0.0),
        ("log1p(0)", 0.0),
        ("sqrt(16)", 4.0),
        ("abs(-3.5)", 3.5),
        ("min(3, 7)", 3.0),
        ("max(3, 7)", 7.0),
        ("pow(2, 10)", 1024.0),
        ("1e2 + 2.5e-1", 100.25),
        ("min(1 + 1, pow(2, 2)) * max(abs(-1), 0)", 2.0),
    ],
)
def test_constant_expressions_match_in_sql(src, expected):
    sc = parse_script(src)
    assert not sc.fields and not sc.uses_score
    assert _eval_sql(sc.sql()) == pytest.approx(expected, abs=1e-12)


def test_log_is_natural_log():
    sc = parse_script("log(10)")
    assert _eval_sql(sc.sql()) == pytest.approx(math.log(10.0), abs=1e-15)


def test_fields_and_score_are_tracked():
    sc = parse_script("_score * (1 + log(1 + doc['n_chars'].value / 100))")
    assert sc.fields == {"n_chars"} and sc.uses_score
    # field access follows ES doc-values semantics: NULL reads as 0.0
    assert "coalesce(CAST(t.n_chars AS DOUBLE), 0.0)" in sc.sql("s", "t.")
    assert "(s)" in sc.sql("s", "t.")


def test_missing_field_reads_as_zero_in_sql():
    sc = parse_script("doc['x'].value + 5")
    got = duckdb.sql(
        f"SELECT {sc.sql(None, '')} AS v FROM (SELECT CAST(NULL AS DOUBLE) AS x)"
    ).fetchone()[0]
    assert got == 5.0


@pytest.mark.parametrize(
    "bad",
    [
        "",  # empty
        "1 +",  # dangling operator
        "foo",  # unknown name
        "sinh(1)",  # unsupported function (exp/floor/ceil joined in r4)
        "min(1)",  # arity
        "pow(1, 2, 3)",  # arity
        "doc['a'].count",  # only .value is doc-values access
        "doc[\"a\"].value",  # single quotes only (the 1.x literal form)
        "_source.text",  # no _source access
        "a = 1",  # no assignment
        "1 > 2",  # no comparisons
        "(1 + 2",  # unbalanced
        "1 2",  # trailing input
    ],
)
def test_bad_scripts_raise(bad):
    with pytest.raises(ValueError):
        parse_script(bad)


def test_score_binding_is_required():
    sc = parse_script("_score * 2")
    with pytest.raises(ValueError):
        sc.sql(None)
    with pytest.raises(ValueError):
        sc.spark_col(None)


def test_spark_column_twin_matches_sql(spark):
    # one end-to-end twin check through a real Spark plan
    import pandas as pd
    from pyspark.sql import functions as F

    src = "max(log1p(doc['v'].value), 0) + _score / 4 - min(doc['v'].value, 2)"
    sc = parse_script(src)
    df = spark.createDataFrame(
        pd.DataFrame({"v": [0.0, 1.0, 7.5, None], "s": [1.0, 2.0, 3.0, 4.0]})
    )
    got = sorted(
        r.out for r in df.select(sc.spark_col(F.col("s")).alias("out")).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT {sc.sql('s', '')} FROM (VALUES (0.0, 1.0), (1.0, 2.0), "
            "(7.5, 3.0), (CAST(NULL AS DOUBLE), 4.0)) AS t(v, s)"
        ).fetchall()
    )
    assert got == pytest.approx(want, abs=1e-12)


# -- boolean predicate layer (ES script filter) -------------------------------

from flume_elasticsearch_2_spark.functions.scripts import parse_predicate


@pytest.mark.parametrize("src,rows,expected", [
    ("doc['a'].value > 1", [(0.0,), (1.0,), (2.0,), (None,)], [False, False, True, False]),
    ("doc['a'].value >= 1 && doc['a'].value != 2", [(0.0,), (1.0,), (2.0,), (3.0,)],
     [False, True, False, True]),
    ("doc['a'].value == 0 || doc['a'].value > 2", [(0.0,), (1.0,), (3.0,), (None,)],
     [True, False, True, True]),  # NULL coalesces to 0.0 -> matches == 0
    ("!(doc['a'].value <= 1)", [(0.0,), (1.0,), (2.0,)], [False, False, True]),
    ("(doc['a'].value > 0 || doc['a'].value < -5) && doc['a'].value * 2 <= 4",
     [(1.0,), (2.0,), (3.0,), (-10.0,)], [True, True, False, True]),
    ("log1p(doc['a'].value) > 1", [(1.0,), (2.0,), (3.0,)], [False, True, True]),
])
def test_predicate_duckdb_matches_expectation(src, rows, expected):
    import duckdb as _d

    con = _d.connect()
    con.execute("CREATE TABLE t(a DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    got = [r[0] for r in con.execute(
        f"SELECT {parse_predicate(src).sql()} FROM t").fetchall()]
    assert got == expected, (src, got)


def test_predicate_spark_twin_matches_sql(spark):
    import duckdb as _d

    rows = [(float(i) - 3.0,) for i in range(9)] + [(None,)]
    srcs = [
        "doc['a'].value > 1",
        "doc['a'].value >= -1 && doc['a'].value < 2",
        "doc['a'].value == 0 || !(doc['a'].value != 3)",
        "(doc['a'].value + 1) * 2 <= doc['a'].value + 4",
        "min(doc['a'].value, 2) == 2",
    ]
    df = spark.createDataFrame(rows, "a double")
    con = _d.connect()
    con.execute("CREATE TABLE t(a DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    for src in srcs:
        p = parse_predicate(src)
        got = [bool(r[0]) for r in df.select(p.spark_col()).collect()]
        want = [bool(r[0]) for r in con.execute(f"SELECT {p.sql()} FROM t").fetchall()]
        assert got == want, src


@pytest.mark.parametrize("bad", [
    "doc['a'].value",                 # no comparison
    "_score > 1",                     # _score out of scope in filter context
    "doc['a'].value > 1 &&",          # dangling operator
    "doc['a'].value = 1",             # single = is not an operator
    "doc['a'].value > 1 || foo",      # bare name
    "doc['a'].value > (1 && 2)",      # boolean inside arithmetic
])
def test_bad_predicates_raise(bad):
    with pytest.raises(ValueError):
        parse_predicate(bad)


# -- round-4 MVEL widening: ternary, %, Math. spellings, exp/floor/ceil ------


@pytest.mark.parametrize(
    "src",
    [
        "doc['n_chars'].value > 100 ? 1.5 : 0.5",
        "doc['n_chars'].value % 7.0",
        "-7.5 % 2.0",
        "Math.log(doc['n_chars'].value + 1.0) * Math.sqrt(4.0)",
        "exp(1.0) + floor(2.7) - ceil(2.2)",
        "doc['n_chars'].value > 50 && doc['n_chars'].value < 500 ? "
        "Math.pow(2.0, 3.0) : Math.abs(-1.0)",
        "(doc['n_chars'].value % 2.0 == 0.0 ? 10.0 : 1.0) + _score",
    ],
)
def test_r4_constructs_parity(spark, documents, sf_dir, src):
    """New constructs evaluate bit-identically in Spark and DuckDB over the
    real docs table (same harness as the base grammar parity test)."""
    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.scripts import parse_script

    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sc = parse_script(src)
    got = {
        r.doc_id: r.v
        for r in documents.select(
            "doc_id", sc.spark_col(score=F.lit(2.0)).alias("v")
        ).collect()
    }
    want = dict(
        duck.execute(
            f"SELECT doc_id, {sc.sql(score_expr='2.0')} AS v FROM documents"
        ).fetchall()
    )
    # transcendentals (exp/log) differ by ULPs between JVM and DuckDB libm —
    # the same 1e-12 contract the base twin test pins (scores round to 6
    # decimals before any driver hash, so ULPs never surface there)
    assert sorted(got) == sorted(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=1e-12), (src, k)


def test_r4_type_errors_raise():
    from flume_elasticsearch_2_spark.functions.scripts import (
        parse_predicate,
        parse_script,
    )

    for bad in [
        "1 ? 2.0 : 3.0",             # numeric condition
        "1 + (doc['a'].value > 2)",  # bool into arithmetic
        "!5",                        # bool negation of a number
        "doc['a'].value > 1 ? (2 > 1) : 0.0",  # bool branch
        "Math.sinh(1)",              # unknown Math static
    ]:
        with pytest.raises(ValueError):
            parse_script(bad)
    # a scoring script must be numeric; a filter script must be boolean
    with pytest.raises(ValueError, match="must evaluate to a number"):
        parse_script("doc['a'].value > 1")
    with pytest.raises(ValueError, match="must evaluate to a boolean"):
        parse_predicate("doc['a'].value + 1")
    # ternary INSIDE a predicate comparison is fine (numeric subexpr)
    p = parse_predicate("(doc['a'].value > 1 ? 2.0 : 0.0) > 1.0")
    assert p.fields == {"a"}


# -- round-5 third engine: NumPy (the serving-path metric partials) ----------


@pytest.mark.parametrize(
    "src",
    [
        "log1p(doc['n_chars'].value)",
        "doc['n_chars'].value > 100 ? 1.5 : 0.5",
        "doc['n_chars'].value % 7.0",
        "-7.5 % 2.0",
        "Math.log(doc['n_chars'].value + 1.0) * Math.sqrt(4.0)",
        "exp(1.0) + floor(2.7) - ceil(2.2)",
        "doc['n_chars'].value > 50 && doc['n_chars'].value < 500 ? "
        "Math.pow(2.0, 3.0) : Math.abs(-1.0)",
        "min(doc['n_chars'].value, 300.0) + max(doc['n_chars'].value, 10.0)",
        "sqrt(doc['n_chars'].value) % 3.0",
    ],
)
def test_numpy_engine_matches_spark(spark, documents, src):
    """Script.numpy_vals (round 5, the serving metric-partials engine) is
    value-identical to the JVM column over the real docs table — same
    coalesce-to-0, Java-remainder %, double floor/ceil pins."""
    import numpy as np

    from flume_elasticsearch_2_spark.functions.scripts import parse_script

    sc = parse_script(src)
    rows = documents.select(
        "doc_id", *[c for c in sorted(sc.fields)],
        sc.spark_col(None).alias("v"),
    ).collect()
    env = {
        f: np.array([float(r[f]) if r[f] is not None else np.nan for r in rows])
        for f in sc.fields
    }
    got = np.asarray(sc.numpy_vals(env), dtype=np.float64)
    if got.ndim == 0:
        got = np.full(len(rows), float(got))
    want = np.array([r.v for r in rows], dtype=np.float64)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12), src


def test_numpy_engine_nan_coalesces_to_zero():
    import numpy as np

    from flume_elasticsearch_2_spark.functions.scripts import parse_script

    sc = parse_script("doc['x'].value + 1.0")
    out = sc.numpy_vals({"x": np.array([np.nan, 2.0])})
    assert out.tolist() == [1.0, 3.0]
