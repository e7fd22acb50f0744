"""URL parse / canonicalize / host rollup / crawl-refresh dedup
(operators/urls.py): pinned canonical forms, DuckDB parity, window
semantics, and plan hygiene (projection stays zero-shuffle)."""

from __future__ import annotations

import duckdb
import pytest

from flume_elasticsearch_2_spark.operators import urls as U


@pytest.fixture(scope="module")
def web(spark, documents):
    return U.synth_webpages(documents)


def test_canonical_pinned_forms(spark):
    cases = [
        # (raw, canonical) — one per rule in the module docstring
        ("https://WWW.Ex.COM/A/p1", "https://www.ex.com/A/p1"),
        ("http://ex.com:80/a?utm_source=f&ref=rss", "http://ex.com/a?ref=rss"),
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("https://cdn.ex.com:8443/p?b=2&a=1#frag", "https://cdn.ex.com:8443/p?a=1&b=2"),
        ("https://news.ex.co.uk/p?gclid=x", "https://news.ex.co.uk/p"),
        ("https://ex.com?fbclid=1", "https://ex.com/"),  # empty path -> '/'
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),  # all dropped
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r.canon_url for r in U.canonicalize_urls(df).collect()]
    assert got == [c for _, c in cases]


def test_canonical_edge_parity(spark):
    # review-found edge cases: utm-PREFIX must be the literal underscore
    # (LIKE's '_' wildcard dropped utmz/utma in the oracle only); a '?'
    # inside the fragment is NOT a query; >5-digit runs are not a port
    cases = [
        ("https://ex.com/p?utmz=1", "https://ex.com/p?utmz=1"),  # kept!
        ("https://app.com/#/route?tab=1", "https://app.com/"),
        ("http://ex.com:99999999999/p", "http://ex.com/p"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r.canon_url for r in U.canonicalize_urls(df).collect()]
    assert got == [c for _, c in cases]
    # and the DuckDB twin agrees byte-for-byte
    con = duckdb.connect()
    vals = ", ".join(f"('{r}')" for r, _ in cases)
    odf = con.sql(
        f"SELECT {U.canonical_url_sql('url')} AS c FROM (VALUES {vals}) t(url)"
    ).df()
    assert list(odf.c) == [c for _, c in cases]


def test_parse_and_reg_domain(spark):
    df = spark.createDataFrame(
        [("https://news.bbc.co.uk:8080/x/y?q=1#f",), ("http://localhost/p",)],
        "url string",
    )
    rows = U.parse_urls(df).collect()
    r = rows[0]
    assert (r.scheme, r.host, r.port, r.reg_domain, r.path, r.query) == (
        "https", "news.bbc.co.uk", 8080, "bbc.co.uk", "/x/y", "q=1"
    )
    r2 = rows[1]
    assert (r2.host, r2.port, r2.reg_domain) == ("localhost", None, "localhost")


def test_canonicalize_duckdb_parity(web, sf_dir):
    sdf = (
        U.canonicalize_urls(web)
        .select("doc_id", "canon_url")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from parquet_scan('{sf_dir}/documents.parquet')"
    )
    odf = (
        con.sql(
            f"SELECT doc_id, {U.canonical_url_sql('url')} AS canon_url "
            f"FROM ({U.synth_webpages_sql()})"
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sdf.equals(odf)


def test_host_profile_counts(web, documents):
    prof = {r.host: r for r in U.host_profile(web).collect()}
    n = documents.count()
    # every host carries the docs of its mess-variant class
    assert sum(r.n_docs for r in prof.values()) == n
    cuk = [h for h in prof if h.endswith(".co.uk")]
    assert cuk and all(prof[h].reg_domain.count(".") == 2 for h in cuk)
    com = [h for h in prof if h.endswith(".com")]
    assert com and all(prof[h].reg_domain.count(".") == 1 for h in com)


def test_url_dedup_latest_semantics(spark, web, documents):
    both = web.unionByName(U.synth_recrawl(documents))
    out = U.url_dedup_latest(both)
    rows = out.collect()
    n = documents.count()
    assert len(rows) == n  # one row per page
    dup = [r for r in rows if r.n_copies == 2]
    # exactly the doc_id % 4 == 1 class collides, and the recrawl (newer,
    # id + 1e9) wins every collision
    assert len(dup) == documents.where("doc_id % 4 = 1").count()
    assert all(r.doc_id >= 1_000_000_000 for r in dup)
    assert all(r.n_copies == 1 for r in rows if r not in dup)


def test_canonicalize_plan_is_zero_shuffle(web):
    plan = U.canonicalize_urls(web)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan


def test_host_profile_plan_partial_agg(web):
    plan = U.host_profile(web)._jdf.queryExecution().executedPlan().toString()
    # map-side combine before the single shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial" in plan.lower()
