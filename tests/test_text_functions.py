from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from flume_elasticsearch_2_spark.functions.text import (
    classify_col,
    extract_text_arrow,
    extract_text_col,
    fingerprint_col,
    lang_id_col,
    quality_cols,
    token_count_col,
)
from flume_elasticsearch_2_spark.sources.webpages import generate_webpages


def test_extract_text_invariant(spark):
    """input_hint per-row invariant: extract_text(html) == text byte-identical."""
    wp = generate_webpages(spark, 500, n_partitions=4)
    bad = wp.withColumn("ext", extract_text_col("html")).where(
        F.col("ext") != F.col("text")
    )
    assert bad.count() == 0


def test_extract_text_arrow_agrees(spark):
    wp = generate_webpages(spark, 200, n_partitions=2)
    bad = wp.withColumn("ext", extract_text_arrow("html")).where(
        F.col("ext") != F.col("text")
    )
    assert bad.count() == 0


def test_webpages_deterministic_across_parallelism(spark):
    a = generate_webpages(spark, 300, n_partitions=2).orderBy("url", "warc_ts").collect()
    b = generate_webpages(spark, 300, n_partitions=8).orderBy("url", "warc_ts").collect()
    assert a == b


def test_webpages_has_dups_and_hot_terms(spark):
    wp = generate_webpages(spark, 500, n_partitions=4)
    n_urls = wp.select("url").distinct().count()
    assert n_urls < 500  # dup injection
    hot_df = (
        wp.select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") == "hot00")
        .count()
    )
    assert hot_df > 0


def test_md5_long_matches_duckdb_on_adversarial_strings(spark):
    """The 60-bit md5-prefix hash must agree bit-for-bit between Spark and
    DuckDB for any string — it is the foundation of the MinHash/SimHash/LSH
    oracle family. Pins unicode, controls, quotes, long strings, digits."""
    import random

    from pyspark.sql import functions as F

    from flume_elasticsearch_2_spark.functions.text import md5_long_col

    rng = random.Random(123)
    alphabet = "abc 0123456789 \t'\"\\%_<>=,;:ÀÉüß東京🎉\u00a0\u2028"
    vals = ["", " ", "a"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 200))) for _ in range(200)
    ]
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select("s", md5_long_col("s").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        exp = con.execute("SELECT ('0x' || substr(md5(?),1,15))::BIGINT", [v]).fetchone()[0]
        assert got[v] == exp, repr(v)


def test_fingerprint_md5_matches_duckdb(spark, documents, sf_dir):
    got = {
        r.doc_id: r.fp
        for r in documents.select("doc_id", fingerprint_col("text").alias("fp")).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.sql(
            f"""SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text),
            '[a-z0-9]+'), ' ')) FROM '{sf_dir}/documents.parquet'"""
        ).fetchall()
    )
    assert got == exp


def test_quality_and_lang(spark, documents):
    q = quality_cols("text")
    row = (
        documents.select(
            token_count_col("text").alias("tc"),
            q["alpha_ratio"].alias("ar"),
            q["punct_ratio"].alias("pr"),
            lang_id_col("text").alias("lang"),
        )
        .first()
    )
    assert row.tc > 0 and 0 <= row.ar <= 1 and 0 <= row.pr <= 1
    assert row.lang in {"en", "fr", "es", "de", "zh", "und"}


def test_classify(spark, documents):
    rules = [("dup", "has_dup"), ("batch", "has_batch")]
    counts = dict(
        documents.select(classify_col("text", rules).alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    assert set(counts) <= {"has_dup", "has_batch", "other"}
    assert sum(counts.values()) == documents.count()


def test_bpe_token_count_matches_python_re(spark, documents):
    import re

    from flume_elasticsearch_2_spark.functions.text import BPE_PATTERN, bpe_token_count_col

    pat = re.compile(BPE_PATTERN)
    rows = documents.select("doc_id", "text", bpe_token_count_col("text").alias("n")).collect()
    assert rows
    for r in rows[:50]:
        assert r.n == len(pat.findall(r.text)), r.doc_id


def test_unicode_analyzer_three_engine_parity(spark):
    """Opt-in unicode analyzer: Spark (Java \\p{L}\\p{N}), DuckDB (RE2
    \\pL\\pN) and Python ([^\\W_]) must tokenize multilingual text
    identically — accented Latin, Greek, Cyrillic, CJK, digits (incl.
    Arabic-Indic), ligatures, titlecase digraphs, combining marks.

    Known divergence, deliberately excluded: U+0130 (İ) — DuckDB's utf8proc
    lowercases it to a single 'i' while Java/Python produce 'i' + combining
    dot (U+0307), which splits the token. ES handles this with a dedicated
    turkish analyzer; same posture here."""
    import duckdb

    from flume_elasticsearch_2_spark.functions.tokenizer import tokenize, tokens_col

    samples = [
        "Čaféß ÜBER Ñoño 北京 mixed ASCII 123 naïve déjà-vu résumé",
        "ΕΛΛΗΝΙΚΆ Кириллица ǅungla ﬁ ligature",
        "snake_case under_score é combining",
        "٣٤٥ arabic digits ½ fraction Ⅻ roman",
        "",
    ]
    df = spark.createDataFrame(list(enumerate(samples)), "i int, text string")
    got_spark = {
        r.i: r.t
        for r in df.select("i", tokens_col("text", analyzer="unicode").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        py = tokenize(s, analyzer="unicode")
        duck = con.sql(
            "SELECT regexp_extract_all(lower(?::VARCHAR), '[\\pL\\pN]+')", params=[s]
        ).fetchone()[0]
        assert got_spark[i] == py, (s, got_spark[i], py)
        assert duck == py, (s, duck, py)


def test_ascii_analyzer_unchanged_by_default(spark):
    """Default analyzer stays byte-identical to round 1: pure-ASCII text
    tokenizes the same under both analyzers."""
    from flume_elasticsearch_2_spark.functions.tokenizer import tokenize

    s = "The Quick-Brown fox 123 jumps_over"
    assert tokenize(s) == tokenize(s, analyzer="unicode") == [
        "the", "quick", "brown", "fox", "123", "jumps", "over"
    ]
