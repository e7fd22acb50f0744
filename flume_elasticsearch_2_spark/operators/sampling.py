"""Deterministic corpus sampling for training-data pipelines.

A 100 TB web corpus is never trained on whole: pipelines cap over-represented
strata (per-language / per-domain quotas) and downsample globally, and both
steps must be DETERMINISTIC so a re-run of the pipeline (or a resumed one —
plans/resume.py) selects the same rows. Two operators:

- :func:`stratified_sample` — per-group quota: the ``n_per_group`` smallest
  rows of each group under a deterministic order (either a plain column or
  the seeded 60-bit md5 hash of a key column for a pseudo-random-but-
  reproducible draw). The balanced-corpus shape (e.g. at most N docs per
  language).
- :func:`hash_sample` — seeded Bernoulli by key hash: keep a row iff
  ``md5_60bit(key || ':' || seed) < fraction * 2^60``. Sampling by KEY (not
  by row position) means the decision is stable under repartitioning,
  re-ordering, and incremental re-runs — the property row-based
  ``df.sample`` cannot give — and the same key set is kept at any
  parallelism.

Both are exactly SQL-expressible (the md5-prefix hash is bit-identical in
DuckDB — functions/text.py:161), so both are driver-oracle-checkable.

Scale shape: ``stratified_sample`` is ONE hash-partition shuffle on the group
key + a per-partition window (rank truncation happens inside the window —
only surviving rows leave the stage); skewed groups bound the reducer at
group size, same as any per-group top-n. ``hash_sample`` is a pure
map-side JVM predicate — zero shuffles, pushes nothing to the driver.

Reference analog: the Flume pipeline has no sampler (the reference indexes
everything, ElasticsearchSink.java:66); these belong to the
training-data-pipeline operator family the brief adds as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import MD5_LONG_SQL, md5_long_col

_SIXTY_BITS = 1 << 60


def _seeded_hash_col(key_col: str, seed: int) -> F.Column:
    return md5_long_col(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(int(seed)))))


def _seeded_hash_sql(key_col: str, seed: int) -> str:
    expr = f"(CAST({key_col} AS VARCHAR) || ':' || '{int(seed)}')"
    return MD5_LONG_SQL.format(expr=expr)


def stratified_sample(
    df: DataFrame,
    by: str,
    n_per_group: int,
    order_col: str = "doc_id",
    seed: int | None = None,
) -> DataFrame:
    """Per-group quota sample: the ``n_per_group`` rows of each ``by`` group
    that are smallest under the deterministic order — ``order_col`` ascending
    when ``seed`` is None (the "earliest ids per group" contract), else the
    seeded md5 hash of ``order_col`` (a reproducible pseudo-random draw;
    different seeds give independent draws). Ties broken by ``order_col`` so
    the output is unique for any input. Returns the sampled rows with their
    original columns."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    rank_col = (
        F.col(order_col)
        if seed is None
        else _seeded_hash_col(order_col, seed)
    )
    w = Window.partitionBy(by).orderBy(rank_col.asc(), F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(n_per_group))
        .drop("_rn")
    )


def stratified_sample_sql(
    by: str,
    n_per_group: int,
    order_col: str = "doc_id",
    seed: int | None = None,
    columns: str = "*",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`stratified_sample`."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    rank = order_col if seed is None else _seeded_hash_sql(order_col, seed)
    return f"""
SELECT {columns} FROM {table}
QUALIFY row_number() OVER (
  PARTITION BY {by} ORDER BY {rank} ASC, {order_col} ASC
) <= {int(n_per_group)}
"""


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Seeded deterministic Bernoulli sample by KEY hash: keep a row iff
    ``md5_60bit(key:seed) < fraction * 2^60``. The kept set depends only on
    (key values, seed) — stable under repartitioning and re-runs, and the
    md5 hash is uniform so the kept fraction concentrates tightly around
    ``fraction``. Pure map-side predicate; zero shuffles."""
    if not 0.0 <= float(fraction) <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(float(fraction) * _SIXTY_BITS)
    return df.where(_seeded_hash_col(key_col, seed) < F.lit(threshold))


def hash_sample_sql(
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    columns: str = "*",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`hash_sample`."""
    if not 0.0 <= float(fraction) <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(float(fraction) * _SIXTY_BITS)
    return f"SELECT {columns} FROM {table} WHERE {_seeded_hash_sql(key_col, seed)} < {threshold}"

def mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Domain-mixture sampling (the pretraining source-reweighting op, cf.
    the public Pile/GPT-3 mixture methodology): per-group KEEP fraction from
    ``weights`` (group value -> fraction in [0, 1]; groups absent from the
    map keep ``default``). The kept set is the seeded deterministic
    Bernoulli of :func:`hash_sample` with a per-group threshold — stable
    under repartitioning/re-runs, disjoint-monotone across fractions (a
    row kept at 0.3 is kept at 0.5: same hash, higher bar).

    Scale shape: ONE pure map-side predicate riding the scan (a CASE over
    the literal weights map picks the threshold) — zero shuffles, zero
    joins; the mixture spec is driver-literal like every sampling config."""
    fr = {str(g): float(f) for g, f in weights.items()}
    if not fr:
        raise ValueError("mix_sample needs at least one group weight")
    bad = {g: f for g, f in fr.items() if not 0.0 <= f <= 1.0}
    if bad or not 0.0 <= float(default) <= 1.0:
        raise ValueError(f"fractions must be in [0, 1], got {bad or default}")
    thr = F.lit(int(float(default) * _SIXTY_BITS))
    for g in sorted(fr):
        thr = F.when(F.col(group_col).cast("string") == g,
                     F.lit(int(fr[g] * _SIXTY_BITS))).otherwise(thr)
    return df.where(_seeded_hash_col(key_col, seed) < thr)


def mix_sample_sql(
    weights: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
    columns: str = "*",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`mix_sample` (same thresholds, same hash)."""
    fr = {str(g): float(f) for g, f in weights.items()}
    if not fr:
        raise ValueError("mix_sample needs at least one group weight")
    bad = {g: f for g, f in fr.items() if not 0.0 <= f <= 1.0}
    if bad or not 0.0 <= float(default) <= 1.0:
        raise ValueError(f"fractions must be in [0, 1], got {bad or default}")
    cases = " ".join(
        f"WHEN CAST({group_col} AS VARCHAR) = '{g}' THEN {int(fr[g] * _SIXTY_BITS)}"
        for g in sorted(fr)
    )
    thr = f"CASE {cases} ELSE {int(float(default) * _SIXTY_BITS)} END"
    return f"SELECT {columns} FROM {table} WHERE {_seeded_hash_sql(key_col, seed)} < ({thr})"


def shuffle_export(
    df: DataFrame,
    size: int,
    key_col: str = "doc_id",
    seed: int = 0,
    after: tuple[int, int] | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training export, keyset-paged.

    Training pipelines need a REPRODUCIBLE pseudo-random epoch order over
    the corpus; ``ORDER BY rand()`` is neither reproducible nor resumable.
    This orders rows by ``(md5_60(key:seed), key)`` — a seeded permutation
    that depends only on key values — and pages with a KEYSET CURSOR
    (``after`` = the last page's final ``(shuffle_key, key)``), the scroll
    pattern that stays cheap at any depth: every page is one map-side
    predicate + a TakeOrderedAndProject, no global offset skip, no state.

    Scale shape (10^12 docs): the hash is a pure projection (zero
    shuffles); the composite-cursor predicate prunes map-side; top-``size``
    merges per-partition heaps on the driver. Pages are identical across
    partitionings and re-runs, so a killed export resumes from its last
    cursor exactly (the same contract the TRS resume path pins).

    Returns (shuffle_key, <row columns...>) in shuffle order.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    h = _seeded_hash_col(key_col, seed)
    out = df.select(h.alias("shuffle_key"), "*")
    if after is not None:
        ak, aid = int(after[0]), int(after[1])
        out = out.where(
            (F.col("shuffle_key") > ak)
            | ((F.col("shuffle_key") == ak) & (F.col(key_col) > aid))
        )
    return out.orderBy(F.col("shuffle_key").asc(), F.col(key_col).asc()).limit(int(size))


def shuffle_export_sql(
    size: int,
    key_col: str = "doc_id",
    seed: int = 0,
    after: tuple[int, int] | None = None,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`shuffle_export` (same hash, same cursor)."""
    if size <= 0:
        raise ValueError("size must be positive")
    h = _seeded_hash_sql(key_col, seed)
    cursor = ""
    if after is not None:
        ak, aid = int(after[0]), int(after[1])
        cursor = f"WHERE ({h} > {ak} OR ({h} = {ak} AND {key_col} > {aid}))"
    return f"""
SELECT {h} AS shuffle_key, *
FROM {table}
{cursor}
ORDER BY shuffle_key ASC, {key_col} ASC
LIMIT {int(size)}
"""


def token_budget_select(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy per-group token-budget selection (data-mixture building):
    within each group, take docs in priority order (longest first,
    ``key`` tiebreak) while the RUNNING token total stays <= ``budget`` —
    the "N tokens per domain" cap every mixture recipe needs.

    A doc whose inclusion would cross the budget is dropped, and so is
    everything after it in priority order (strict greedy prefix, pinned —
    not best-fit repacking, which is order-dependent under parallelism).

    Scale shape: token counts are one JVM projection (no explode); the
    running sum is a window keyed by group — ONE hash-partitioned shuffle
    on ``group_col``; groups are domains, so skew is bounded by the
    biggest domain (salt upstream if one domain dominates).

    Returns (group, key, n_tokens, cum_tokens) for kept docs, ordered.
    """
    from ..functions.tokenizer import tokens_col

    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy("group").orderBy(
        F.col("n_tokens").desc(), F.col("key").asc()
    )
    sized = docs.select(
        F.col(group_col).alias("group"),
        F.col(key_col).alias("key"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") <= int(budget))
        .orderBy(F.col("group").asc(), F.col("cum_tokens").asc())
    )


def token_budget_select_sql(
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`token_budget_select` (same greedy prefix;
    windowed sums CAST to BIGINT — DuckDB widens to HUGEINT)."""
    from ..functions.tokenizer import duckdb_token_pattern

    if budget <= 0:
        raise ValueError("budget must be positive")
    tok = f"len(regexp_extract_all(lower({text_expr}), '{duckdb_token_pattern()}'))"
    return f"""
WITH sized AS (
  SELECT {group_col} AS "group", {key_col} AS key,
         CAST({tok} AS BIGINT) AS n_tokens
  FROM {table}
),
running AS (
  SELECT "group", key, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY "group" ORDER BY n_tokens DESC, key ASC
         ) AS BIGINT) AS cum_tokens
  FROM sized
)
SELECT * FROM running
WHERE cum_tokens <= {int(budget)}
ORDER BY "group" ASC, cum_tokens ASC
"""
