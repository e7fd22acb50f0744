"""ES document-fetch + index-admin APIs (SURVEY §2.5): ``_mget`` (stored
fields by id) and ``_stats`` (index-level statistics).

Reference analog: the ES GET/mget and index-stats surfaces behind the sink
(delegation site ElasticsearchSink.java:54; SystemUtil.java's client issues
the same transport calls). Both are metadata/fetch-scale — no scoring.

Scale shape: ``mget`` is an id-IN-list read — on both paths the predicate
reaches the Parquet scan (``PushedFilters: In(doc_id ...)``), so row-group
stats skip everything but the owning ranges; doc-range sharding means the
ids' row groups cluster in few shards. ``_stats`` aggregates the corpus in
one exploded-distinct pass (declarative) or reads the prebuilt dictionary +
manifest (serving — zero corpus passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import duckdb_token_pattern, tokens_col

MGET_COLS = ["doc_id", "lang", "n_chars", "text"]


def mget(
    docs: DataFrame,
    ids: list[int],
    columns: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``_mget``: stored fields for the given ids, id-ascending (missing
    ids simply absent, the ES found=false analog)."""
    cols = columns or MGET_COLS
    ids = sorted({int(i) for i in ids})
    return (
        docs.where(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"), *[c for c in cols if c != id_col])
        .orderBy("doc_id")
    )


def mget_sql(ids: list[int], columns: list[str] | None = None, table: str = "documents") -> str:
    """DuckDB oracle for :func:`mget`."""
    cols = columns or MGET_COLS
    id_list = ", ".join(str(int(i)) for i in sorted({int(i) for i in ids}))
    return (
        f"SELECT {', '.join(cols)} FROM {table} "
        f"WHERE doc_id IN ({id_list}) ORDER BY doc_id"
    )


def corpus_index_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``_stats`` computed from the corpus (the declarative twin of the
    index-backed :meth:`IndexSearcher.index_stats`): one row
    ``(n_docs, avgdl, n_terms, n_postings)`` where n_postings counts
    distinct (doc, term) pairs — the posting-entry count of the index this
    corpus builds. One exploded-distinct aggregation + one narrow agg."""
    toks = tokens_col(text_col, stopwords, analyzer)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    dl_stats = base.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size("toks")), 6).alias("avgdl"),
    )
    post = base.select("doc_id", F.explode(F.array_distinct("toks")).alias("term")).agg(
        F.count_distinct("term").alias("n_terms"),
        F.count("*").cast("long").alias("n_postings"),
    )
    return dl_stats.crossJoin(post)


def index_stats_sql(
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`corpus_index_stats` /
    :meth:`IndexSearcher.index_stats`."""
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH post AS (
  SELECT DISTINCT doc_id, unnest({tok_expr}) AS term FROM {table}
)
SELECT (SELECT count(*) FROM {table}) AS n_docs,
       (SELECT round(avg(len({tok_expr})), 6) FROM {table}) AS avgdl,
       count(DISTINCT term) AS n_terms,
       CAST(count(*) AS BIGINT) AS n_postings
FROM post
"""


def termvectors(
    docs: DataFrame,
    doc_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``_termvector`` (1.x; ``_termvectors`` in 2.x) with
    ``term_statistics=true``: for one document, every analyzed term with its
    in-document frequency plus corpus-wide doc frequency and total term
    frequency. Returns (term, term_freq, doc_freq, ttf) ordered by term —
    the ES response's lexicographic term order.

    Plan shape (this IS a single-doc GET API, so the driver plays the ES
    coordinating node): the doc's text is one pushdown-pruned row fetch; its
    analyzed Counter then drives ONE corpus aggregation whose explode is
    filtered to the doc's distinct terms BEFORE the (term) shuffle — the
    exchange carries at most |doc vocabulary| × |input partitions| rows,
    never the corpus. The serving twin (:meth:`IndexSearcher.termvectors`)
    does zero corpus work: stored-field fetch + IN-pruned dictionary read
    (Lucene stores totalTermFreq in the term dictionary for exactly this).

    Reference analog: the ES termvector surface behind the sink
    (ElasticsearchSink.java:54).
    """
    from collections import Counter

    from ..functions.tokenizer import tokenize

    spark = docs.sparkSession
    empty = spark.createDataFrame(
        [], "term string, term_freq long, doc_freq long, ttf long"
    )
    row = docs.where(F.col(id_col) == int(doc_id)).select(text_col).limit(1).collect()
    if not row or row[0][0] is None:
        return empty
    tfs = Counter(tokenize(row[0][0], stopwords, analyzer))
    terms = sorted(tfs)
    if not terms:
        return empty
    toks = tokens_col(text_col, stopwords, analyzer)
    stats = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.count("*").cast("long").alias("ttf"),
        )
        .collect()
    )
    by_term = {r["term"]: (int(r["doc_freq"]), int(r["ttf"])) for r in stats}
    return spark.createDataFrame(
        [(t, int(tfs[t]), *by_term[t]) for t in terms],
        "term string, term_freq long, doc_freq long, ttf long",
    )


def termvectors_sql(
    doc_id: int,
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`termvectors`."""
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
doc AS (
  SELECT term, count(*) AS term_freq FROM toks
  WHERE doc_id = {int(doc_id)} GROUP BY term
),
stats AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq, CAST(count(*) AS BIGINT) AS ttf
  FROM toks WHERE term IN (SELECT term FROM doc) GROUP BY term
)
SELECT doc.term, doc.term_freq, stats.doc_freq, stats.ttf
FROM doc JOIN stats USING (term)
ORDER BY doc.term
"""


def mtermvectors(
    docs: DataFrame,
    doc_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> DataFrame:
    """ES ``_mtermvectors``: :func:`termvectors` for several ids in ONE
    round trip — one IN-pushdown stored-field fetch, one corpus aggregation
    IN-pruned to the UNION of the docs' terms (the whole batch costs one
    doc's plan shape). Returns (doc_id, term, term_freq, doc_freq, ttf)
    ordered (doc_id, term); missing ids are absent (found=false)."""
    from collections import Counter

    from ..functions.tokenizer import tokenize

    spark = docs.sparkSession
    empty = spark.createDataFrame(
        [], "doc_id long, term string, term_freq long, doc_freq long, ttf long"
    )
    ids = sorted({int(i) for i in doc_ids})
    rows = (
        docs.where(F.col(id_col).isin(ids))
        .select(F.col(id_col).alias("doc_id"), text_col)
        .collect()
    )
    tfs = {
        int(r["doc_id"]): Counter(tokenize(r[text_col] or "", stopwords, analyzer))
        for r in rows
    }
    all_terms = sorted({t for c in tfs.values() for t in c})
    if not all_terms:
        return empty
    toks = tokens_col(text_col, stopwords, analyzer)
    stats = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.count("*").cast("long").alias("ttf"),
        )
        .collect()
    )
    by_term = {r["term"]: (int(r["doc_freq"]), int(r["ttf"])) for r in stats}
    out = [
        (did, t, int(tfs[did][t]), *by_term[t])
        for did in sorted(tfs)
        for t in sorted(tfs[did])
    ]
    return spark.createDataFrame(
        out, "doc_id long, term string, term_freq long, doc_freq long, ttf long"
    )


def mtermvectors_sql(
    doc_ids: list[int],
    table: str = "documents",
    stopwords: list[str] | None = None,
    analyzer: str = "ascii",
) -> str:
    """DuckDB oracle for :func:`mtermvectors`."""
    ids = ", ".join(str(int(i)) for i in sorted({int(i) for i in doc_ids}))
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM {table}
),
doc AS (
  SELECT doc_id, term, count(*) AS term_freq FROM toks
  WHERE doc_id IN ({ids}) GROUP BY doc_id, term
),
stats AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq, CAST(count(*) AS BIGINT) AS ttf
  FROM toks WHERE term IN (SELECT DISTINCT term FROM doc) GROUP BY term
)
SELECT doc.doc_id, doc.term, doc.term_freq, stats.doc_freq, stats.ttf
FROM doc JOIN stats USING (term)
ORDER BY doc.doc_id, doc.term
"""


def field_stats(docs: DataFrame, fields: list[str]) -> DataFrame:
    """ES 1.x ``_field_stats`` API (shipped 1.6; the query-planning probe
    1.x clients use before building range filters): per field —
    ``(field, doc_count, min_value, max_value)`` ordered by field name.
    ``doc_count`` counts docs with a non-null value; min/max are rendered
    as strings so mixed-type field sets share one schema (ES renders
    ``min_value_as_string`` the same way).

    Plan: ONE map-side-combined global aggregate computes every field's
    three stats in a single corpus pass (a 1-row result), then a driver-side
    unpivot to per-field rows — at 10^12 docs exactly one scalar row crosses
    the wire per partition. The SERVING form is this function over the
    index's column-pruned stored-docs sidecar (zero postings reads), which
    is precisely what ES reads from doc values."""
    if not fields:
        # zero aggregates would surface as an opaque py4j error from
        # docs.agg(); refuse loudly like every other invalid input
        raise ValueError("field_stats requires at least one field")
    missing = sorted(set(fields) - set(docs.columns))
    if missing:
        raise ValueError(f"field_stats fields {missing} not in {sorted(docs.columns)}")
    # string rendering is part of the contract, so only types whose
    # to-string form is engine-independent are accepted: integral types,
    # strings, dates. Float ('1.0E-4' vs '0.0001'), boolean ('true' vs
    # 'True') and timestamp renderings diverge between Spark and SQL
    # engines — refused loudly instead of silently hash-mismatching
    # (review finding).
    ok_types = {"tinyint", "smallint", "int", "bigint", "string", "date"}
    dt = dict(docs.dtypes)
    bad = sorted(f for f in fields if dt[f] not in ok_types)
    if bad:
        raise ValueError(
            f"field_stats fields {bad} have non-portable-render types "
            f"({[dt[f] for f in bad]}); supported: {sorted(ok_types)}"
        )
    aggs = []
    for i, f in enumerate(sorted(fields)):
        aggs += [
            F.count(F.col(f)).cast("long").alias(f"c{i}"),
            F.min(F.col(f)).cast("string").alias(f"mn{i}"),
            F.max(F.col(f)).cast("string").alias(f"mx{i}"),
        ]
    row = docs.agg(*aggs).collect()[0]
    rows = [
        (f, int(row[f"c{i}"]), row[f"mn{i}"], row[f"mx{i}"])
        for i, f in enumerate(sorted(fields))
    ]
    return docs.sparkSession.createDataFrame(
        rows, "field string, doc_count long, min_value string, max_value string"
    )


def field_stats_sql(fields: list[str], table: str = "documents") -> str:
    """DuckDB oracle for :func:`field_stats` — one scalar select per field,
    UNION ALL'd in the same name order."""
    selects = [
        f"SELECT '{f}' AS field, CAST(count({f}) AS BIGINT) AS doc_count, "
        f"CAST(min({f}) AS VARCHAR) AS min_value, "
        f"CAST(max({f}) AS VARCHAR) AS max_value FROM {table}"
        for f in sorted(fields)
    ]
    return " UNION ALL ".join(selects) + " ORDER BY field"


def cat_indices(spark, indexes: dict[str, str]) -> DataFrame:
    """ES 1.x ``_cat/indices`` (the ops one-liner against the reference's ES
    node, README.md:17's monitoring story): one row per index —
    ``(index, pri, docs_count, store_bytes)`` ordered by index name.

    Pure metadata: each row comes from the index's committed manifest.json
    plus a directory byte walk — ZERO corpus or postings reads, exactly what
    the real _cat endpoint reads from cluster state. ``store_bytes`` is a
    physical quantity (compression-dependent), so oracle-backed callers
    project it away and check the logical columns."""
    import json
    import os

    rows = []
    for name in sorted(indexes):
        d = indexes[name]
        with open(os.path.join(d, "manifest.json")) as fh:
            m = json.load(fh)
        nbytes = 0
        for root, _dirs, files in os.walk(d):
            nbytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        rows.append((name, int(m["n_shards"]), int(m["n_docs"]), int(nbytes)))
    return spark.createDataFrame(
        rows, "index string, pri int, docs_count long, store_bytes long"
    )


def cat_indices_sql(names: list[str], count_predicates: list[str], n_shards: int,
                    table: str = "documents") -> str:
    """DuckDB oracle for the LOGICAL columns of :func:`cat_indices` —
    ``count_predicates[i]`` recomputes index i's doc count from the corpus
    (the generation-split predicate)."""
    if len(names) != len(count_predicates):
        raise ValueError("names and count_predicates must align")
    selects = [
        f"SELECT '{n}' AS index, {int(n_shards)} AS pri, "
        f"CAST(count(*) FILTER ({p}) AS BIGINT) AS docs_count FROM {table}"
        for n, p in zip(names, count_predicates)
    ]
    return " UNION ALL ".join(selects) + " ORDER BY index"


def cat_count(spark, indexes: dict[str, str]) -> DataFrame:
    """ES 1.x ``_cat/count``: total docs across the given indexes, from the
    committed manifests only (zero data reads). One row ``(count)``."""
    import json
    import os

    total = 0
    for d in indexes.values():
        with open(os.path.join(d, "manifest.json")) as fh:
            total += int(json.load(fh)["n_docs"])
    return spark.createDataFrame([(int(total),)], "count long")


def cat_count_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`cat_count` over generations that partition
    ``table``."""
    return f"SELECT CAST(count(*) AS BIGINT) AS count FROM {table}"


class IndexTemplateRegistry:
    """ES 1.x ``_template`` API (PUT/GET/DELETE ``_template/{name}``): build
    settings applied automatically to every new index whose name matches the
    template's glob pattern. Delegation site ElasticsearchSink.java:66 —
    ``prepareIndex(indexName.toLowerCase(), ...)`` creates indexes on first
    write, so 1.x deployments control their settings exclusively through
    templates.

    The supported settings are this engine's build knobs
    (``number_of_shards`` -> n_shards, ``store_positions``); unknown
    settings refuse at PUT time. Matching templates merge LOWEST ``order``
    first so higher-order values override per key — the ES contract.
    Persistence mirrors :class:`~.alias.AliasRegistry` (driver-side JSON,
    metadata-scale, like ES cluster state)."""

    _SETTINGS = {"number_of_shards", "store_positions"}

    def __init__(self) -> None:
        self._templates: dict[str, dict] = {}

    def put(self, name: str, template: str, settings: dict, order: int = 0) -> None:
        if not template:
            raise ValueError("template pattern must be non-empty")
        extra = set(settings) - self._SETTINGS
        if extra:
            raise ValueError(
                f"template settings {sorted(extra)} unsupported "
                f"(supported: {sorted(self._SETTINGS)})"
            )
        # value TYPES refuse loudly too (review finding): a JSON string
        # "false" would otherwise coerce to bool("false") == True at build
        if "number_of_shards" in settings:
            v = settings["number_of_shards"]
            if not isinstance(v, int) or isinstance(v, bool) or v < 1:
                raise ValueError(f"number_of_shards must be a positive int, got {v!r}")
        if "store_positions" in settings and not isinstance(
            settings["store_positions"], bool
        ):
            raise ValueError(
                f"store_positions must be a bool, got {settings['store_positions']!r}"
            )
        self._templates[name] = {
            "template": template,
            "settings": dict(settings),
            "order": int(order),
        }

    def delete(self, name: str) -> None:
        self._templates.pop(name, None)

    def get(self, name: str) -> dict:
        if name not in self._templates:
            raise KeyError(f"unknown template {name!r}")
        return self._templates[name]

    def templates(self) -> dict[str, dict]:
        return dict(self._templates)

    def resolve(self, index_name: str) -> dict:
        """Merged settings for a new index named ``index_name``: matching
        templates apply in (order ASC, name ASC) so higher order wins per
        key — deterministic even for equal orders (ES leaves that tie
        undefined; pinning name ASC removes the ambiguity loudly
        documented)."""
        import fnmatch

        merged: dict = {}
        for name, t in sorted(
            self._templates.items(), key=lambda kv: (kv[1]["order"], kv[0])
        ):
            if fnmatch.fnmatchcase(index_name, t["template"]):
                merged.update(t["settings"])
        return merged

    def save(self, path: str) -> None:
        import json as _json
        import os as _os

        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(self._templates, f, indent=1, sort_keys=True)
        _os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "IndexTemplateRegistry":
        import json as _json

        reg = cls()
        with open(path) as f:
            loaded = _json.load(f)
        # re-validate through put() so a hand-edited cluster-state file
        # cannot smuggle in values save() would never have written
        for name, t in loaded.items():
            reg.put(name, t["template"], t["settings"], t.get("order", 0))
        return reg


def build_index_from_templates(
    spark,
    docs: DataFrame,
    index_dir: str,
    index_name: str,
    registry: IndexTemplateRegistry,
    **overrides,
):
    """Create an index the way the 1.x auto-create path does: resolve the
    registry's matching templates for ``index_name``, translate to build
    knobs, apply explicit ``overrides`` on top (the request body wins over
    templates, as in ES), and run the proven builder."""
    from ..plans.build_index import build_index

    settings = registry.resolve(index_name)
    kwargs: dict = {}
    if "number_of_shards" in settings:
        kwargs["n_shards"] = int(settings["number_of_shards"])
    if "store_positions" in settings:
        kwargs["store_positions"] = bool(settings["store_positions"])
    kwargs.update(overrides)
    return build_index(spark, docs, index_dir, **kwargs)


def cluster_health(spark, indexes: dict[str, str]) -> DataFrame:
    """ES ``_cluster/health`` analog over this engine's commit-point model:
    one row per index ``(index, status, n_shards, n_docs)`` ordered by name.
    ``green`` = committed manifest present and every shard's docs partition
    exists on disk; ``red`` = missing/uncommitted (a crashed build's .tmp
    never looks healthy — the atomic-rename contract). There is no
    ``yellow``: immutable segments have no replica-lag state."""
    import json
    import os

    rows = []
    for name in sorted(indexes):
        d = indexes[name]
        mpath = os.path.join(d, "manifest.json")
        if not os.path.exists(mpath):
            rows.append((name, "red", 0, 0))
            continue
        with open(mpath) as fh:
            m = json.load(fh)
        # a generation may legitimately hold ZERO docs in some shards (e.g.
        # an id-range slice of a shared id space), so health checks that the
        # docs tree exists and every present shard dir is in range — never
        # that every shard is populated
        docs_dir = os.path.join(d, "docs")
        ok = os.path.isdir(docs_dir)
        if ok:
            for e in os.listdir(docs_dir):
                if e.startswith("shard="):
                    # a malformed shard dir (shard=__HIVE_DEFAULT_PARTITION__,
                    # a stray temp name) IS the unhealthy state this probe
                    # exists to detect — report red, never throw
                    try:
                        s = int(e.split("=", 1)[1])
                    except ValueError:
                        ok = False
                        continue
                    if not (0 <= s < int(m["n_shards"])):
                        ok = False
        rows.append(
            (name, "green" if ok else "red", int(m["n_shards"]), int(m["n_docs"]))
        )
    return spark.createDataFrame(
        rows, "index string, status string, n_shards int, n_docs long"
    )


def segments_report(spark, index_dir: str) -> DataFrame:
    """ES 1.x ``_segments`` analog: per-shard segment diagnostics read from
    the COMMITTED index tree — ``(shard, n_docs, sum_dl, n_terms,
    n_postings)`` ordered by shard. ``n_terms`` counts the shard's posting
    lists, ``n_postings`` their entries (Σ per-list n); ``sum_dl`` is the
    shard's token mass (== Σ cf, the codec's conservation law — pinned in
    tests as a structural invariant the corpus oracle can check).

    Scale shape: two map-side-combined groupBys over column-pruned scans of
    the docs sidecar (doc_id is never read — just dl + the shard partition
    column) and the postings metadata (n only; the byte blobs are pruned),
    then a shard-count-sized join. At 10^6 shards this moves 10^6 rows.

    Oracle: doc-range sharding is pure arithmetic
    (``shard = doc_id * n_shards // id_space``, plans/build_index.py
    shard_start), so every reported number is recomputable from the corpus
    in SQL — :func:`segments_report_sql`.
    """
    docs = spark.read.parquet(f"{index_dir}/docs")
    posts = spark.read.parquet(f"{index_dir}/postings")
    d = docs.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    p = posts.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("n").cast("long").alias("n_postings"),
    )
    return (
        d.join(p, "shard", "left")
        .select(
            "shard", "n_docs", "sum_dl",
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce("n_postings", F.lit(0)).cast("long").alias("n_postings"),
        )
        .orderBy("shard")
    )


def segments_report_sql(
    n_shards: int,
    table: str = "documents",
    analyzer: str = "ascii",
    stopwords: list[str] | None = None,
) -> str:
    """DuckDB oracle for :func:`segments_report` over an index built from
    ``table`` with default ``id_space`` (max id + 1): recompute each
    shard's doc count, token mass, distinct terms and (doc, term) postings
    from the corpus with the same range-sharding arithmetic."""
    tok_expr = f"regexp_extract_all(lower(text), '{duckdb_token_pattern(analyzer)}')"
    if stopwords:
        stop_list = ", ".join(f"'{t}'" for t in sorted(set(stopwords)))
        tok_expr = f"list_filter({tok_expr}, t -> t NOT IN ({stop_list}))"
    return f"""
WITH space AS (SELECT max(doc_id) + 1 AS id_space FROM {table}),
sp AS (
  SELECT doc_id, CAST(doc_id * {int(n_shards)} // space.id_space AS INT) AS shard,
         {tok_expr} AS toks
  FROM {table}, space
),
toks AS (SELECT doc_id, shard, unnest(toks) AS term FROM sp),
post AS (SELECT shard, term, count(DISTINCT doc_id) AS df FROM toks GROUP BY shard, term)
SELECT sp.shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(sp.toks)) AS BIGINT) AS sum_dl,
       CAST(coalesce(any_value(p.n_terms), 0) AS BIGINT) AS n_terms,
       CAST(coalesce(any_value(p.n_postings), 0) AS BIGINT) AS n_postings
FROM sp
LEFT JOIN (
  SELECT shard, count(*) AS n_terms, sum(df) AS n_postings FROM post GROUP BY shard
) p USING (shard)
GROUP BY sp.shard
ORDER BY sp.shard
"""
