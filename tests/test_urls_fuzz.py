"""Property fuzz over URL canonicalization (operators/urls.py): hypothesis
builds URLs from bounded components and pins the contracts hand-picked
cases can miss:

1. IDEMPOTENCE — ``canon(canon(u)) == canon(u)`` (an equivalence key that
   moves under its own map silently splits dedup groups);
2. MESS-INVARIANCE — host/scheme case, default ports, fragments, and
   tracking params never change the key;
3. CROSS-ENGINE — Spark and the DuckDB oracle agree byte-for-byte on every
   generated URL (the driver gate checks one fixed synth corpus; this
   explores the component space).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.operators import urls as U

label_st = st.sampled_from(["ex", "news", "cdn", "a1", "site9"])
tld_st = st.sampled_from([".com", ".org", ".co.uk", ".net"])
path_st = st.sampled_from(["", "/", "/p/1", "/a/b/c", "/Idx.HTML"])
param_st = st.sampled_from(
    ["a=1", "b=2", "q=x", "id=7", "utm_source=f", "utm_b=2", "gclid=z", "fbclid=1", "ref=rss"]
)


@st.composite
def url_st(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(label_st) + "." + draw(label_st) + draw(tld_st)
    if draw(st.booleans()):
        host = host.upper()
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":65535"]))
    path = draw(path_st)
    params = draw(st.lists(param_st, max_size=4, unique=True))
    query = "?" + "&".join(params) if params else ""
    frag = draw(st.sampled_from(["", "#f", "#/route?tab=1"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def _canon_many(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.canon_url for r in U.canonicalize_urls(df).collect()]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(url_st(), min_size=1, max_size=8, unique=True))
def test_canonical_idempotent_and_cross_engine(spark, urls):
    once = _canon_many(spark, urls)
    twice = _canon_many(spark, once)
    assert twice == once  # idempotence
    con = duckdb.connect()
    vals = ", ".join("('" + u.replace("'", "''") + "')" for u in urls)
    oracle = list(
        con.sql(
            f"SELECT {U.canonical_url_sql('url')} AS c FROM (VALUES {vals}) t(url)"
        ).df()["c"]
    )
    assert oracle == once  # cross-engine byte parity


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(url_st())
def test_canonical_mess_invariance(spark, url):
    # strip the fragment, lower scheme+host, drop tracking params by hand:
    # the canonical key must not change
    base = url.split("#")[0]
    if "?" in base:
        pre, q = base.split("?", 1)
        kept = [
            p for p in q.split("&")
            if p and not p.startswith("utm_")
            and p.split("=")[0] not in ("gclid", "fbclid")
        ]
        hand = pre + ("?" + "&".join(kept) if kept else "")
    else:
        hand = base
    got = _canon_many(spark, [url, hand])
    assert got[0] == got[1]
