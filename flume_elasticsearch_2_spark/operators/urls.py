"""URL parsing, canonicalization, and domain rollups for web-crawl corpora.

The input contract (BASELINE.json ``input_hint``) is a Common-Crawl-style
table keyed by ``url`` — and every real crawl pipeline normalizes that key
before anything else: the same page is fetched as ``HTTP://Host:80/p?utm_…``
and ``http://host/p``, and un-canonicalized keys silently break dedup,
per-domain caps, and link-graph construction downstream. Reference analog:
the Flume source keys each record by its fields verbatim
(FileSource.java:170-172) and leaves normalization to the consumer; here it
is a first-class operator family:

- :func:`parse_urls` — decompose ``url`` into ``scheme`` / ``host`` /
  ``port`` / ``reg_domain`` (registered domain: last two host labels, or
  three when the second-level label is a public-suffix class like ``co`` /
  ``ac``) / ``path`` / ``query``. Pure regexp projection.
- :func:`canonicalize_urls` — the equivalence key: lowercase scheme+host,
  strip the scheme's default port (``:80`` http / ``:443`` https), drop the
  fragment, drop tracking params (``utm_*`` / ``gclid`` / ``fbclid``), sort
  the surviving query params bytewise, re-assemble. Deterministic, so the
  key is stable across re-runs and engines.
- :func:`host_profile` — per-host rollup (doc count, char volume) with the
  registered domain attached: the shape per-domain quotas and crawl-health
  dashboards read.
- :func:`url_dedup_latest` — last-write-wins by canonical url on the crawl
  timestamp: keep the newest capture of each page, count how many captures
  collapsed. The crawl-refresh dedup every CC-style pipeline runs before
  indexing.

Every step is exactly SQL-expressible (same regexps, same list ops — both
engines agree ``split('', '&') = ['']``, bytewise ``array_sort``, negative
``element_at``), so all four are driver-oracle-checkable.

Scale shape: parse + canonicalize are zero-shuffle JVM projections (regexp +
array ops inside whole-stage codegen — no UDF, no driver work, safe at
10^12 rows). ``host_profile`` is ONE partial-agg shuffle on the host key.
``url_dedup_latest`` is ONE hash shuffle on the canonical key with a window
whose sort key is (ts, doc_id) — never the payload (the dedup_exact lesson,
operators/dedup.py) — and per-key state is bounded by capture count, not
corpus size. Hot hosts skew the PROFILE reducer at worst by host
cardinality; the dedup key is the full url, which Zipf-distributes far
flatter than hosts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# Tracking params dropped by canonicalization: prefix-matched utm_*, plus
# exact-key click identifiers. Kept deliberately tiny and documented — the
# point is the determinism of the rule, not an exhaustive adtech list.
_TRACKING_PREFIX = "utm_"
_TRACKING_KEYS = ("gclid", "fbclid")

# Second-level labels that act as public-suffix classes (news.bbc.co.uk ->
# registered domain bbc.co.uk). A pragmatic subset of the PSL: the operator
# contract is "deterministic + documented", not "IANA-complete".
_SUFFIX_SLD = ("co", "com", "org", "net", "ac", "gov", "edu")

_DEFAULT_PORTS = {"http": 80, "https": 443}

# One regexp family, shared verbatim by both engines (Java regex and RE2
# agree on this subset: no lookaround, no backrefs).
_RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RE_HOST = r"^([^:]*)"
# 1-5 digits: a longer run is not a port (and would overflow int32
# asymmetrically: Spark cast -> NULL, DuckDB CAST -> error)
_RE_PORT = r":([0-9]{1,5})$"
_RE_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# first '?' with no '#' before it — a '?' inside the fragment is NOT a query
_RE_QUERY = r"^[^#?]*\?([^#]*)"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _RE_SCHEME, 1))


def _hostport(url: Column) -> Column:
    return F.regexp_extract(url, _RE_HOSTPORT, 1)


def _host(url: Column) -> Column:
    return F.lower(F.regexp_extract(_hostport(url), _RE_HOST, 1))


def _port(url: Column) -> Column:
    p = F.regexp_extract(_hostport(url), _RE_PORT, 1)
    return F.when(p != "", p.cast("int"))


def _path(url: Column) -> Column:
    return F.regexp_extract(url, _RE_PATH, 1)


def _query(url: Column) -> Column:
    return F.regexp_extract(url, _RE_QUERY, 1)


def reg_domain_col(host: Column) -> Column:
    """Registered domain of a lowercase host: last 2 labels, or last 3 when
    the second-to-last is a public-suffix class (co.uk / ac.jp / ...)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    take3 = (n >= 3) & F.element_at(labels, -2).isin(*_SUFFIX_SLD)
    return F.when(n <= 2, host).otherwise(F.when(take3, last3).otherwise(last2))


def _reg_domain_sql(host: str) -> str:
    sld = ", ".join(f"'{s}'" for s in _SUFFIX_SLD)
    return (
        f"CASE WHEN len(str_split({host}, '.')) <= 2 THEN {host} "
        f"WHEN len(str_split({host}, '.')) >= 3 AND str_split({host}, '.')[-2] IN ({sld}) "
        f"THEN str_split({host}, '.')[-3] || '.' || str_split({host}, '.')[-2] || '.' || str_split({host}, '.')[-1] "
        f"ELSE str_split({host}, '.')[-2] || '.' || str_split({host}, '.')[-1] END"
    )


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose ``url_col`` into scheme/host/port/reg_domain/path/query
    columns. Zero-shuffle codegen projection."""
    u = F.col(url_col)
    host = _host(u)
    return df.withColumns(
        {
            "scheme": _scheme(u),
            "host": host,
            "port": _port(u),
            "reg_domain": reg_domain_col(host),
            "path": _path(u),
            "query": _query(u),
        }
    )


_PARSE_SQL_HOST = "lower(regexp_extract(regexp_extract({u}, '{hp}', 1), '{h}', 1))"


def parse_urls_sql_cols(url_col: str = "url") -> dict[str, str]:
    """DuckDB expressions mirroring :func:`parse_urls`, keyed by out column."""
    host = _PARSE_SQL_HOST.format(u=url_col, hp=_RE_HOSTPORT, h=_RE_HOST)
    port = (
        f"CASE WHEN regexp_extract(regexp_extract({url_col}, '{_RE_HOSTPORT}', 1), '{_RE_PORT}', 1) <> '' "
        f"THEN CAST(regexp_extract(regexp_extract({url_col}, '{_RE_HOSTPORT}', 1), '{_RE_PORT}', 1) AS INT) END"
    )
    return {
        "scheme": f"lower(regexp_extract({url_col}, '{_RE_SCHEME}', 1))",
        "host": host,
        "port": port,
        "reg_domain": _reg_domain_sql(host),
        "path": f"regexp_extract({url_col}, '{_RE_PATH}', 1)",
        "query": f"regexp_extract({url_col}, '^[^#?]*\\?([^#]*)', 1)",
    }


def _kept_params(query: Column) -> Column:
    parts = F.split(query, "&")
    keep = F.filter(
        parts,
        lambda p: (p != "")
        & ~p.startswith(_TRACKING_PREFIX)
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*_TRACKING_KEYS),
    )
    return F.array_sort(keep)


def canonical_url_col(url_col: str = "url") -> Column:
    """The canonical-url expression (see module docstring for the rule)."""
    u = F.col(url_col)
    scheme, host, port = _scheme(u), _host(u), _port(u)
    path = _path(u)
    kept = _kept_params(_query(u))
    port_part = F.when(
        port.isNotNull()
        & ~(
            ((scheme == "http") & (port == _DEFAULT_PORTS["http"]))
            | ((scheme == "https") & (port == _DEFAULT_PORTS["https"]))
        ),
        F.concat(F.lit(":"), port.cast("string")),
    ).otherwise(F.lit(""))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)


def canonical_url_sql(url_col: str = "url") -> str:
    """DuckDB expression bit-identical to :func:`canonical_url_col`."""
    c = parse_urls_sql_cols(url_col)
    scheme, host, port, path, query = (
        c["scheme"], c["host"], c["port"], c["path"], c["query"],
    )
    keys = ", ".join(f"'{k}'" for k in _TRACKING_KEYS)
    kept = (
        f"list_sort(list_filter(str_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(p, '{_TRACKING_PREFIX}') "
        f"AND regexp_extract(p, '^([^=]*)', 1) NOT IN ({keys})))"
    )
    port_part = (
        f"CASE WHEN {port} IS NOT NULL AND NOT (({scheme} = 'http' AND {port} = 80) "
        f"OR ({scheme} = 'https' AND {port} = 443)) "
        f"THEN ':' || CAST({port} AS VARCHAR) ELSE '' END"
    )
    path_part = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query_part = (
        f"CASE WHEN len({kept}) > 0 THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    return f"{scheme} || '://' || {host} || {port_part} || {path_part} || {query_part}"


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Add ``out_col`` = the canonical form of ``url_col``. Zero-shuffle."""
    return df.withColumn(out_col, canonical_url_col(url_col))


def host_profile(
    df: DataFrame, url_col: str = "url", size_col: str = "n_chars"
) -> DataFrame:
    """Per-host rollup: ``(reg_domain, host, n_docs, sum_chars)``. One
    partial-agg shuffle on the host key."""
    u = F.col(url_col)
    host = _host(u)
    return (
        df.select(
            host.alias("host"),
            reg_domain_col(host).alias("reg_domain"),
            F.col(size_col),
        )
        .groupBy("reg_domain", "host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).cast("long").alias("sum_chars"),
        )
    )


def host_profile_sql(table: str, url_col: str = "url", size_col: str = "n_chars") -> str:
    c = parse_urls_sql_cols(url_col)
    return (
        f"SELECT {_reg_domain_sql(c['host'])} AS reg_domain, {c['host']} AS host, "
        f"COUNT(*) AS n_docs, CAST(SUM({size_col}) AS BIGINT) AS sum_chars "
        f"FROM {table} GROUP BY 1, 2"
    )


def url_dedup_latest(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """LWW by canonical url: one row per canonical key — the newest capture's
    ``id_col`` (ties broken by the larger id, pinned) plus ``n_copies``, the
    number of captures that collapsed into it. One shuffle on the canonical
    key; the window sorts (ts, id), never the payload."""
    canon = canonicalize_urls(df, url_col).select(
        "canon_url", F.col(ts_col).alias("_ts"), F.col(id_col)
    )
    w = Window.partitionBy("canon_url").orderBy(F.desc("_ts"), F.desc(id_col))
    return (
        canon.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("canon_url")))
        .where(F.col("_rn") == 1)
        .select("canon_url", id_col, F.col("n_copies").cast("long"))
    )


def url_dedup_latest_sql(
    table: str, url_col: str = "url", ts_col: str = "warc_ts", id_col: str = "doc_id"
) -> str:
    canon = canonical_url_sql(url_col)
    return (
        f"SELECT canon_url, {id_col}, n_copies FROM ("
        f"SELECT {canon} AS canon_url, {id_col}, "
        f"ROW_NUMBER() OVER (PARTITION BY {canon} ORDER BY {ts_col} DESC, {id_col} DESC) AS rn, "
        f"CAST(COUNT(*) OVER (PARTITION BY {canon}) AS BIGINT) AS n_copies "
        f"FROM {table}) WHERE rn = 1"
    )


# -- deterministic webpages-shaped synth (tests + driver entries) ---------------
#
# The driver tables carry no url column; these helpers derive the input_hint
# shape (url, warc_ts, text, lang, ...) deterministically from `documents`,
# identically in both engines, with deliberately MESSY urls (case, default
# ports, tracking params, fragments, a co.uk host) so canonicalization does
# real work. doc_id % 4 picks the mess variant.

_TS_EPOCH = 1_700_000_000


def synth_webpages(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id").cast("string")
    src, lang = F.col("source"), F.col("lang")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://WWW."), src, F.lit(".COM/"), lang, F.lit("/p"), d),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://"), src, F.lit(".com:80/"), lang, F.lit("/p"), d,
                F.lit("?utm_source=feed&ref=rss"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://cdn."), src, F.lit(".com:8443/p"), d, F.lit("?b=2&a=1#frag")),
        )
        .otherwise(F.concat(F.lit("https://news."), src, F.lit(".co.uk/p"), d, F.lit("?gclid=x")))
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.timestamp_seconds(F.lit(_TS_EPOCH) + F.col("doc_id")).alias("warc_ts"),
        "text", "lang", "n_chars",
    )


def synth_webpages_sql(table: str = "documents") -> str:
    return (
        "SELECT doc_id, CASE doc_id % 4 "
        "WHEN 0 THEN 'https://WWW.' || source || '.COM/' || lang || '/p' || CAST(doc_id AS VARCHAR) "
        "WHEN 1 THEN 'http://' || source || '.com:80/' || lang || '/p' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&ref=rss' "
        "WHEN 2 THEN 'https://cdn.' || source || '.com:8443/p' || CAST(doc_id AS VARCHAR) || '?b=2&a=1#frag' "
        "ELSE 'https://news.' || source || '.co.uk/p' || CAST(doc_id AS VARCHAR) || '?gclid=x' END AS url, "
        f"to_timestamp({_TS_EPOCH} + doc_id) AS warc_ts, text, lang, n_chars "
        f"FROM {table}"
    )


def synth_recrawl(docs: DataFrame) -> DataFrame:
    """A later 'crawl refresh' of the ``doc_id % 4 == 1`` pages, with the url
    already clean — canonical-equal to the messy first capture, 10^6 s newer.
    The re-capture's synthetic id is ``doc_id + 10^9`` (distinct, pinned)."""
    d = F.col("doc_id").cast("string")
    return docs.where(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".com/"), F.col("lang"),
            F.lit("/p"), d, F.lit("?ref=rss"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(_TS_EPOCH + 1_000_000) + F.col("doc_id")).alias("warc_ts"),
        "text", "lang", "n_chars",
    )


def synth_recrawl_sql(table: str = "documents") -> str:
    return (
        "SELECT doc_id + 1000000000 AS doc_id, "
        "'http://' || source || '.com/' || lang || '/p' || CAST(doc_id AS VARCHAR) || '?ref=rss' AS url, "
        f"to_timestamp({_TS_EPOCH + 1_000_000} + doc_id) AS warc_ts, text, lang, n_chars "
        f"FROM {table} WHERE doc_id % 4 = 1"
    )
