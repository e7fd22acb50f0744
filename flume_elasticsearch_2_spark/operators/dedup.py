"""Deduplication operators for the training-data pipeline.

The reference's only dedup is id-keyed last-write-wins via the ES upsert
(``setId(IR_SID)``, /root/reference/elasticsearch-sink/.../
ElasticsearchSink.java:67 — SURVEY.md §2.2 P6); :func:`dedup_latest_by_key`
is its faithful Spark form. The rest are the near-dup family a 100 TB text
corpus needs: exact content hashing, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes:
* exact / keyed dedup: single hash shuffle on the key; at 10^12 rows this is
  the cheapest possible formulation (map-side partial aggregation for the
  count variant, AQE skew splitting for pathological keys).
* MinHash+LSH: signatures via one Arrow-batched pandas UDF (NumPy matrix
  min over universal-hash family), banding → ``posexplode`` → self-join on
  (band, bucket): only colliding docs are ever paired, so the quadratic
  verify is confined to LSH buckets. Bucket join is a plain hash join that
  AQE splits if a bucket is hot.
* n-gram Jaccard: exact pair scores via shared-shingle equi-join (pairs with
  zero overlap never materialize) + distinct-shingle counts; used standalone
  at small scale and as the verify stage after LSH at large scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from ..functions.text import MD5_LONG_SQL, fingerprint_col, md5_long_col
from ..functions.tokenizer import tokens_col

MERSENNE_P = (1 << 31) - 1  # 31-bit Mersenne prime: a*x+b stays inside int64


def _hash64(c: Column, hash_fn: str) -> Column:
    """64-bit string hash family. ``xxhash64``: fastest, JVM-native (scale
    path). ``md5``: 60-bit md5 prefix reproducible bit-for-bit in DuckDB SQL
    (``functions.text.md5_long_col``) — the oracle-checkable path."""
    if hash_fn == "xxhash64":
        return F.xxhash64(c)
    if hash_fn == "md5":
        return md5_long_col(c)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxhash64' or 'md5')")


def _widen(df: DataFrame) -> DataFrame:
    """Repartition up to default parallelism when the input scan yields
    fewer splits (small/few parquet files): the shingle/signature stages fan
    each doc out ~dl-fold, so inheriting a narrow scan partitioning would
    serialize the expensive map side."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _minhash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash family coefficients, shared by the Spark operator and
    the generated DuckDB oracle SQL (inlined there as a VALUES table)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_hashes).astype(np.int64)
    b = rng.randint(0, MERSENNE_P, size=num_hashes).astype(np.int64)
    return a, b


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact near-dup removal: keep the first doc (lowest sort key) per
    normalized-content fingerprint. Deterministic representative choice.

    The window sort key deliberately EXCLUDES the text payload: within a
    fingerprint group the normalized text is equal by construction, so it
    cannot discriminate, and carrying it in the shuffle sort key would ship
    the full document bytes through the exchange sorter. The remaining
    columns (id/metadata) keep the choice deterministic."""
    other = [c for c in df.columns if c != text_col] or [text_col]
    w = Window.partitionBy("_fp").orderBy(*other)
    return (
        df.withColumn("_fp", fingerprint_col(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def dedup_latest_by_key(df: DataFrame, key: str, order_col: str, tie_col: str | None = None) -> DataFrame:
    """P6: last-write-wins per key — ES ``setId(IR_SID)`` upsert semantics.

    Latest ``order_col`` wins; ties broken by ``tie_col`` descending so the
    result is deterministic (the reference's redelivery order dependence,
    SURVEY §8.5, is resolved explicitly)."""
    order = [F.col(order_col).desc()]
    if tie_col:
        order.append(F.col(tie_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def shingles_col(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (JVM higher-order functions, no UDF).

    NOTE: inlines the tokenize expression 3× (two size guards + the
    transform); prefer :func:`shingles_from_tokens` over a STAGED token
    column when the caller controls the projection — the winnowing staging
    lesson (operators/winnow.py:_mins_col)."""
    return shingles_from_tokens(tokens_col(text), k)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles from an (ideally already-materialized)
    token array column."""
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    # guard: Spark sequence(1, n) DESCENDS for n < 1 — short docs get no shingles
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, signature array<long>[num_hashes]) via universal hashing
    ``(a*x + b) mod p`` over shingle hashes — one NumPy matrix-min per
    Arrow batch, no per-row Python."""
    a, b = _minhash_params(num_hashes, seed)

    @pandas_udf("array<long>")
    def sig_udf(shingle_hashes: pd.Series) -> pd.Series:
        out = []
        for hs in shingle_hashes:
            if hs is None or len(hs) == 0:
                out.append(np.full(num_hashes, MERSENNE_P, dtype=np.int64))
                continue
            # fold 64-bit shingle hashes to 31 bits so the (num_hashes,
            # n_shingles) universal-hash matrix stays in int64 — pure
            # vectorized NumPy, no per-row Python arithmetic
            x = np.asarray(hs, dtype=np.int64) & MERSENNE_P
            m = (a[:, None] * x[None, :] + b[:, None]) % MERSENNE_P
            out.append(m.min(axis=1))
        return pd.Series(out)

    # staged projections: tokenize once, shingle once (the inlined form
    # re-evaluates the regexp per guard/transform reference — winnow lesson)
    hashed = (
        _widen(df)
        .select(F.col(id_col).alias("id"), tokens_col(text_col).alias("_t"))
        .select("id", shingles_from_tokens(F.col("_t"), shingle_k).alias("_s"))
        .select("id", F.transform("_s", lambda s: _hash64(s, hash_fn)).alias("sh"))
    )
    return hashed.select("id", sig_udf("sh").alias("signature"))


def banded_buckets(
    sigs: DataFrame, num_hashes: int, bands: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, band, bucket) — each signature split into ``bands`` row-groups of
    ``num_hashes // bands`` values, each group hashed to one bucket key.
    Shared by the in-corpus pair join and the materialized incremental index
    (operators/minhash_index.py)."""
    r = num_hashes // bands
    return sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: _hash64(
                    F.concat_ws(",", F.transform(F.slice("signature", bi * r + 1, r), lambda v: v.cast("string"))),
                    hash_fn,
                ),
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) whose signatures collide in at
    least one LSH band. rows_per_band = num_hashes // bands."""
    assert num_hashes % bands == 0
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed, hash_fn)
    banded = banded_buckets(sigs, num_hashes, bands, hash_fn)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


# Default hot-shingle cap for the STANDALONE (no-candidates) n-gram Jaccard
# path: a shingle present in more than this many documents is boilerplate
# (stopword trigrams, headers), carries no discriminative signal, and costs
# O(df^2) self-join rows. 10^4 keeps every realistic near-dup signal while
# bounding the heaviest shingle's pair fan-out at ~10^8 rows — survivable —
# instead of the unbounded blowup a Zipfian corpus would otherwise hit.
DEFAULT_MAX_SHINGLE_DF = 10_000
_UNSET = object()  # distinguishes "caller said nothing" from explicit None


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = _UNSET,  # type: ignore[assignment]
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >= t).

    Pairs sharing no shingle never materialize (equi-join on the shingle).

    Scale levers — both applied BEFORE any pairwise join so the quadratic
    blowup of a hot shingle never materializes:

    * ``candidates`` (e.g. LSH output): the pair space is *driven by* the
      candidate set — ``candidates ⋈ sh(id_a) ⋈ sh(id_b)`` — instead of a
      shingle self-join. Cost is O(|candidates| · avg_shingles), independent
      of any shingle's document frequency. This is the verify stage after
      MinHash-LSH at 100 TB.
    * ``max_shingle_df``: drop shingles whose corpus document frequency
      exceeds the cap (standard hot-shingle suppression — any stopword
      trigram appears in a constant fraction of the corpus and contributes
      O(df^2) join rows while carrying no discriminative signal). Jaccard is
      then computed over the capped shingle vocabulary for BOTH the
      intersection and the per-doc sizes, so the metric stays a true Jaccard
      on that vocabulary. DEFAULT on the standalone (no-candidates) path:
      :data:`DEFAULT_MAX_SHINGLE_DF` — a bare call can no longer hit the
      O(df^2) blowup at scale. Pass an EXPLICIT ``None`` for the exact
      full-vocabulary semantics the DuckDB oracle checks (safe at oracle
      scale; opt-in at corpus scale). The candidate-driven path has no
      self-join, so its default stays uncapped (capping would silently
      change the verified Jaccard values)."""
    if max_shingle_df is _UNSET:
        max_shingle_df = None if candidates is not None else DEFAULT_MAX_SHINGLE_DF
    df = _widen(df)
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(text_col, shingle_k)).alias("s")
    )
    if max_shingle_df is not None:
        # hot-shingle suppression: df computed on the full corpus (map-side
        # partial agg), survivors anti-joined; the hot set is tiny by
        # construction (≤ total_postings / cap distinct shingles) → broadcast
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_shingle_df)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    if candidates is not None:
        from pyspark import StorageLevel

        cand = candidates.select("id_a", "id_b")
        # the candidate plan (typically a full MinHash-LSH subtree) is
        # referenced three times below (two id-projection branches + the
        # pair join); without materialization Spark re-executes it each
        # time. Skip if the caller already persisted/checkpointed it.
        if candidates.storageLevel == StorageLevel.NONE:
            cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        ids = (
            cand.select(F.col("id_a").alias("id"))
            .union(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        # prune the shingle table to candidate docs, then drive the pair
        # space from the candidate list itself — no shingle self-join exists
        # in this plan, so a hot shingle costs O(df), not O(df^2)
        sh = sh.join(ids, "id", "left_semi")
        # one corpus tokenize+shingle pass instead of three: sizes and both
        # join sides below all reference this subtree, and the post-prune
        # table is proportional to the CANDIDATE docs (small by
        # construction), so materializing it is cheap at any corpus size
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        inter = (
            cand.join(sh.alias("a"), F.col("id_a") == F.col("a.id"))
            .join(
                sh.alias("b"),
                (F.col("id_b") == F.col("b.id")) & (F.col("a.s") == F.col("b.s")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("inter"))
        )
    else:
        inter = (
            sh.alias("a")
            .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").cast("long").alias("inter"))
        )
    sizes = sh.groupBy("id").agg(F.count("*").cast("long").alias("nsh"))
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("nsh", "nsh_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("nsh", "nsh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("nsh_a") + F.col("nsh_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash_col(text: Column | str, bits: int = 64, hash_fn: str = "xxhash64") -> Column:
    """SimHash over token hashes: per bit, sign of sum over tokens of
    (+1 if bit set else -1), weighted by token multiplicity. ``bits=64``
    with xxhash64; ``bits=60`` with the md5 hash (its 60 informative bits).

    Token hashing stays JVM-side (``transform`` over the token array); the
    O(bits·doc_len) bit-sign aggregation runs as ONE Arrow-batched NumPy
    pass over the hash array — a single (tokens × bits) matrix reduction per
    doc — instead of ``bits`` nested JVM ``aggregate`` traversals (which were
    correct but O(bits·dl) codegen-heavy expression trees)."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: _hash64(t, hash_fn))
    shifts = np.arange(bits, dtype=np.uint64)

    @pandas_udf("long")
    def _simhash(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.uint64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            h = np.asarray(arr, dtype=np.int64).view(np.uint64)
            bitset = (h[:, None] >> shifts[None, :]) & np.uint64(1)
            contrib = (2 * bitset.astype(np.int64) - 1).sum(axis=0)
            out[i] = ((contrib > 0).astype(np.uint64) << shifts).sum()
        return pd.Series(out.view(np.int64))

    return _simhash(hashes)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_tables: int = 4,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup candidates: split the ``bits``-bit hash into
    ``n_tables`` equal-width keys (pigeonhole: hamming <= n_tables-1 pairs
    collide in >=1 table), join per table, verify exact hamming JVM-side."""
    if hash_fn == "md5" and bits > 60:
        # md5_long_col carries only 60 informative bits (15 hex chars); bits
        # above 60 are always 0, silently weakening one pigeonhole table's key
        raise ValueError("hash_fn='md5' supports at most bits=60 (60-bit md5 prefix)")
    assert bits % n_tables == 0
    key_bits = bits // n_tables
    key_mask = (1 << key_bits) - 1
    h = _widen(df).select(F.col(id_col).alias("id"), simhash_col(text_col, bits, hash_fn).alias("sh"))
    keys = h.select(
        "id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), key_bits * i).bitwiseAND(F.lit(key_mask))
                    for i in range(n_tables)
                ]
            )
        ).alias("tbl", "key"),
    )
    pairs = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# DuckDB oracle SQL generators (hash_fn='md5' path). The md5-prefix hash is
# the only primitive both engines share bit-for-bit; the universal-hash
# coefficients are inlined as a VALUES table from the same seed, so the SQL
# below reproduces the Spark operators EXACTLY — full value-hash oracles for
# MinHash-LSH candidates and SimHash near-dup pairs.
# ---------------------------------------------------------------------------

def _shingle_cte(table: str, shingle_k: int) -> str:
    """Distinct k-token shingles per doc (mirrors :func:`shingles_col`)."""
    return f"""
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[u.i:u.i+{shingle_k - 1}], ' ') AS s
  FROM toks, unnest(range(1, greatest(len(ts) - {shingle_k - 2}, 1))) AS u(i)
  WHERE len(ts) >= {shingle_k}
)"""


def minhash_lsh_pairs_sql(
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    table: str = "documents",
) -> str:
    """DuckDB oracle for ``minhash_lsh_pairs(..., hash_fn='md5')``."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    a, b = _minhash_params(num_hashes, seed)
    params = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_hashes))
    x_expr = MD5_LONG_SQL.format(expr="s")
    bucket_expr = MD5_LONG_SQL.format(expr="string_agg(sig::VARCHAR, ',' ORDER BY i)")
    return f"""
WITH {_shingle_cte(table, shingle_k)},
x AS (SELECT doc_id, {x_expr} & {MERSENNE_P} AS x FROM sh),
params(i, a, b) AS (VALUES {params}),
sig AS (
  SELECT d.doc_id AS id, p.i,
         coalesce(min((p.a * x.x + p.b) % {MERSENNE_P}), {MERSENNE_P}) AS sig
  FROM {table} d CROSS JOIN params p LEFT JOIN x ON x.doc_id = d.doc_id
  GROUP BY d.doc_id, p.i
),
banded AS (
  SELECT id, (i // {r})::INT AS band, {bucket_expr} AS bucket
  FROM sig GROUP BY id, (i // {r})
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
"""


def simhash_pairs_sql(
    max_hamming: int = 3,
    n_tables: int = 4,
    bits: int = 60,
    table: str = "documents",
) -> str:
    """DuckDB oracle for ``simhash_near_dup_pairs(..., bits=60,
    hash_fn='md5')`` — per-bit sign aggregation over token md5 hashes with
    multiplicity, pigeonhole table keys, exact hamming verify."""
    assert bits % n_tables == 0
    key_bits = bits // n_tables
    key_mask = (1 << key_bits) - 1
    h_expr = MD5_LONG_SQL.format(expr="t")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM {table}
),
h AS (SELECT doc_id, {h_expr} AS h FROM toks),
bitsum AS (
  SELECT doc_id, u.i AS i, sum(CASE WHEN (h >> u.i) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h, unnest(range(0, {bits})) AS u(i) GROUP BY doc_id, u.i
),
sh0 AS (
  SELECT doc_id, sum(CASE WHEN c > 0 THEN (1::BIGINT << i) ELSE 0 END) AS sh
  FROM bitsum GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id AS id, coalesce(s.sh, 0)::BIGINT AS sh
  FROM {table} d LEFT JOIN sh0 s ON s.doc_id = d.doc_id
),
keys AS (
  SELECT id, sh, u.i::INT AS tbl, (sh >> ({key_bits} * u.i)) & {key_mask} AS key
  FROM sh, unnest(range(0, {n_tables})) AS u(i)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.sh, b.sh))::INT AS hamming
FROM keys a JOIN keys b ON a.tbl = b.tbl AND a.key = b.key AND a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


# -- near-dup cluster resolution (pairs -> components -> canonical docs) ---------


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: (doc_id, cluster_id)
    where cluster_id = the smallest doc id reachable through the pair graph
    — the dedup end-game every pair producer here (minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_near_dup_pairs, embedding_near_dup_pairs)
    feeds at 100 TB, since "remove duplicates" means keep ONE member per
    component, not per pair.

    Algorithm: min-label propagation — label(v) starts as v; each round
    every vertex takes the min of its own and its neighbors' labels; stop
    when no label changes. Rounds = graph diameter, which for near-dup
    clusters is tiny (clusters are near-cliques: LSH links most member
    pairs directly). Each round is ONE key join + ONE map-side-combined min
    aggregation; frames are lineage-truncated each round so the plan stays
    flat instead of growing a 25-join lineage — ``localCheckpoint`` by
    default (executor-local blocks: fine single-node, but one lost
    executor mid-iteration kills the job), or a RELIABLE ``checkpoint()``
    into ``checkpoint_dir`` when given (the 1000-executor contract;
    plans/lineage.py iterative_checkpointer). The alternating large-star/
    small-star variant (Kiveris et al., "Connected Components in MapReduce
    and Beyond") halves round counts on high-diameter graphs — documented
    as the upgrade path; min-label is exact regardless. Raises after
    ``max_iter`` rounds instead of silently returning partial clusters.
    """
    from ..plans.lineage import iterative_checkpointer

    spark = pairs.sparkSession
    ck = iterative_checkpointer(spark, checkpoint_dir)
    sa, sb = F.col(a_col).cast("long"), F.col(b_col).cast("long")
    edges = ck(
        pairs.select(sa.alias("s"), sb.alias("d"))
        .union(pairs.select(sb.alias("s"), sa.alias("d")))
        .distinct()
    )
    labels = ck(
        edges.select(F.col("s").alias("v")).distinct().withColumn("label", F.col("v"))
    )
    released = None  # labels from TWO rounds back: dead once round N lands
    for _ in range(int(max_iter)):
        msgs = edges.join(labels, edges["s"] == labels["v"]).select(
            F.col("d").alias("v"), F.col("label")
        )
        new = ck(
            labels.union(msgs).groupBy("v").agg(F.min("label").alias("label")),
            supersedes=released,
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        released = labels  # still needed above for `changed`; dead next round
        labels = new
        if changed == 0:
            break
    else:
        raise ValueError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the pair graph has pathological diameter — use the large-star/"
            "small-star variant or raise max_iter"
        )
    return labels.select(
        F.col("v").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def connected_components_sql(
    pairs_sql: str, a_col: str = "id_a", b_col: str = "id_b"
) -> str:
    """DuckDB oracle for :func:`connected_components` over any pair-
    producing SQL (a recursive reachability closure; exact, tractable at
    oracle scales)."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({pairs_sql})
),
nodes AS (
  SELECT {a_col} AS v FROM pairs UNION SELECT {b_col} FROM pairs
),
sym AS (
  SELECT {a_col} AS s, {b_col} AS d FROM pairs
  UNION SELECT {b_col}, {a_col} FROM pairs
),
reach(v, r) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.v
)
SELECT v AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY v ORDER BY doc_id
"""


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """The removal half: keep each near-dup cluster's smallest-id member
    plus every unpaired doc — an anti-join of the corpus against the
    non-canonical cluster members (tiny relative to the corpus, but still
    key-joined, never broadcast-assumed)."""
    cc = connected_components(pairs, a_col, b_col)
    losers = cc.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return docs.join(
        losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def dedup_keep_canonical_sql(
    pairs_sql: str,
    table: str = "documents",
    select_cols: str = "doc_id, lang, n_chars",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> str:
    """DuckDB oracle for :func:`dedup_keep_canonical`."""
    cc = connected_components_sql(pairs_sql, a_col, b_col)
    return f"""
SELECT {select_cols} FROM {table}
WHERE doc_id NOT IN (
  SELECT doc_id FROM ({cc}) WHERE doc_id <> cluster_id
)
ORDER BY doc_id
"""


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 40,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — the
    HIGH-DIAMETER scale path promised by :func:`connected_components`:
    converges in O(log² n) rounds regardless of graph diameter, where
    min-label propagation needs diameter rounds (a 10^6-long chain of
    paraphrase edges would take 10^6 propagation rounds but ~40 star
    rounds).

    Each round is two edge rewrites, each ONE groupBy-min + ONE key join:

    - large-star: every node u links its LARGER neighbors to
      m(u) = min(N(u) ∪ {u}) — long chains collapse toward small ids;
    - small-star: every node u links its smaller-or-equal neighbors (and
      itself) to m(u) — stars canonicalize.

    Fixpoint = the edge set stops changing; the surviving edges form stars
    (member → component root = the component's smallest id), so the output
    matches :func:`connected_components` exactly (pinned by test). Frames
    are lineage-truncated per round (``checkpoint_dir`` selects reliable
    checkpointing exactly as in :func:`connected_components`);
    non-convergence raises."""
    from ..plans.lineage import iterative_checkpointer

    spark = pairs.sparkSession
    ck = iterative_checkpointer(spark, checkpoint_dir)
    sa, sb = F.col(a_col).cast("long"), F.col(b_col).cast("long")
    # canonical undirected edge list, self-loops dropped
    edges = ck(
        pairs.select(F.least(sa, sb).alias("u"), F.greatest(sa, sb).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # node universe from the UNFILTERED pairs: a node appearing only in a
    # self-pair must still come out as its own singleton cluster (min-label
    # keeps it; dropping self-loop edges must not drop the node)
    nodes = ck(
        pairs.select(sa.alias("n"))
        .union(pairs.select(sb.alias("n")))
        .distinct()
    )

    def sym(e: DataFrame) -> DataFrame:
        return e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    released = None  # edge set from the PREVIOUS round: dead once its
    # convergence check has run (read after ck(ss), so freed one ck later)
    for _ in range(int(max_rounds)):
        s = sym(edges)
        # m(u) = min over the closed neighborhood
        mins = s.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # large-star: (x, m(u)) for every neighbor x > u
        ls = ck(
            s.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.least(F.col("v"), F.col("m")).alias("u"),
                    F.greatest(F.col("v"), F.col("m")).alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct(),
            supersedes=released,
        )
        s2 = sym(ls)
        mins2 = s2.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # small-star: (x, m(u)) for neighbors x <= u, plus (u, m(u));
        # ls is fully consumed by this checkpoint — freed here
        ss = ck(
            s2.join(mins2, "u")
            .where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("x"), F.col("m"))
            .union(s2.join(mins2, "u").select(F.col("u").alias("x"), F.col("m")).distinct())
            .select(F.least(F.col("x"), F.col("m")).alias("u"),
                    F.greatest(F.col("x"), F.col("m")).alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct(),
            supersedes=ls,
        )
        changed = ss.exceptAll(edges).count() + edges.exceptAll(ss).count()
        released = edges
        edges = ss
        if changed == 0:
            break
    else:
        raise ValueError(
            f"connected_components_star did not converge in {max_rounds} rounds"
        )
    # fixpoint edges are (root, member) stars with root = min id; isolated-
    # after-canonicalization nodes map to themselves
    roots = sym(edges).groupBy("u").agg(F.min("v").alias("mn"))
    comp = roots.select(
        F.col("u").alias("doc_id"), F.least("u", "mn").alias("cluster_id")
    )
    missing = nodes.join(comp, nodes["n"] == comp["doc_id"], "left_anti").select(
        F.col("n").alias("doc_id"), F.col("n").alias("cluster_id")
    )
    return comp.union(missing).orderBy("doc_id")
