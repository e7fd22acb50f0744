"""Materialized MinHash index — incremental near-dup detection for a
growing crawl.

The in-corpus pair join (operators/dedup.py:minhash_lsh_pairs) answers
"which existing docs duplicate each other"; a live pipeline asks a different
question every ingest batch: "which of these NEW pages near-duplicate
something already in the corpus?" — and re-tokenizing/re-sketching 100 TB
per batch to answer it is the thing to avoid. Same trade the BM25 segment
index and the IVF embedding index already make (build once, probe cheap):

- :func:`minhash_index_build` — sketch the corpus ONCE: banded LSH bucket
  keys (``buckets/`` parquet: band, bucket, id) plus the full signatures
  (``signatures/`` parquet: id, signature) and a config manifest. The
  signatures are stored so probes can ESTIMATE Jaccard (fraction of equal
  minhash positions — the unbiased MinHash estimator) without ever touching
  corpus text again.
- :func:`minhash_index_probe` — sketch only the new batch, join its bucket
  keys against the stored ``buckets/`` table, optionally join stored
  signatures to attach ``est_jaccard`` and filter. The corpus-side work is
  an id+bucket columnar read — no tokenize, no shingles, no text.

Config (num_hashes/bands/shingle_k/seed/hash_fn) is pinned in
``manifest.json`` and probes take NO sketch parameters — the new batch is
always sketched with the stored config, so mixed-config garbage candidates
are unrepresentable rather than merely checked for.

Exactly SQL-expressible with ``hash_fn='md5'`` (the driver-oracle config —
the oracle recomputes both sides' sketches and the estimator from scratch).

Scale shape (10^12 docs): build = the signature pass (Arrow-batched NumPy
matrix-min per batch, operators/dedup.py:minhash_signatures) + one write of
``bands × n_docs`` narrow rows. Probe = new-batch-sized sketch work + ONE
hash join keyed (band, bucket) whose corpus side is a two-column scan, +
(optionally) ONE id-keyed join against stored signatures for candidates
only — every join is candidate- or batch-driven, never corpus×corpus. Hot
buckets (boilerplate) bound reducers by bucket df exactly as the in-corpus
join does; the same cap levers apply upstream.

Reference analog: the reference pipeline re-indexes everything it sees
(ElasticsearchSink.java:66) and owns no dedup; this operator family is the
brief's training-pipeline axis, incremental form.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import banded_buckets, minhash_signatures

_MANIFEST = "manifest.json"


def minhash_index_build(
    df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> dict:
    """Sketch ``df`` into ``index_dir`` (buckets/ + signatures/ +
    manifest.json); returns the manifest dict."""
    assert num_hashes % bands == 0
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k, seed, hash_fn
    ).persist()
    sigs.write.mode("overwrite").parquet(f"{index_dir}/signatures")
    banded_buckets(sigs, num_hashes, bands, hash_fn).write.mode("overwrite").parquet(
        f"{index_dir}/buckets"
    )
    n_docs = sigs.count()
    sigs.unpersist()
    manifest = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": seed,
        "hash_fn": hash_fn,
        "n_docs": n_docs,
    }
    with open(os.path.join(index_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def minhash_index_probe(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Candidates ``(new_id, corpus_id)`` — new docs LSH-colliding with the
    stored corpus; with ``min_est_jaccard``, adds ``est_jaccard`` (fraction
    of equal signature positions, rounded 6) and filters to the threshold.
    Sketch work is new-batch-sized; the corpus contributes columnar reads
    only. ``materialize=True`` (default) eagerly localCheckpoints the
    (candidate-sized) result so the batch's signature cache is released
    before returning — per-batch persists must not accumulate across a
    long-lived ingest session; pass False to keep the lazy plan (plan
    inspection / tests)."""
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        m = json.load(f)
    sigs_new = minhash_signatures(
        new_docs, id_col, text_col, m["num_hashes"], m["shingle_k"], m["seed"],
        m["hash_fn"],
    ).persist()
    banded_new = banded_buckets(sigs_new, m["num_hashes"], m["bands"], m["hash_fn"])
    stored = spark.read.parquet(f"{index_dir}/buckets")
    cand = (
        banded_new.alias("n")
        .join(stored.alias("c"), ["band", "bucket"])
        .select(F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .distinct()
    )
    if min_est_jaccard is None:
        if materialize:
            cand = cand.localCheckpoint(eager=True)
            sigs_new.unpersist()
        return cand
    sig_c = spark.read.parquet(f"{index_dir}/signatures")
    est = (
        F.aggregate(
            F.zip_with("n_sig", "c_sig", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(int(m["num_hashes"]))
    )
    out = (
        cand.join(
            sigs_new.select(F.col("id").alias("new_id"), F.col("signature").alias("n_sig")),
            "new_id",
        )
        .join(
            sig_c.select(F.col("id").alias("corpus_id"), F.col("signature").alias("c_sig")),
            "corpus_id",
        )
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= float(min_est_jaccard))
        .select("new_id", "corpus_id", "est_jaccard")
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        sigs_new.unpersist()
    return out


def minhash_index_probe_sql(
    new_pred: str,
    corpus_pred: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    min_est_jaccard: float | None = None,
    table: str = "documents",
) -> str:
    """DuckDB oracle for build(corpus_pred rows) + probe(new_pred rows) with
    ``hash_fn='md5'`` — recomputes both sides' sketches and the estimator
    from first principles (one shared signature derivation, split by the
    predicates at the join). Predicates use an ``{id}`` placeholder, e.g.
    ``"{id} % 4 = 0"``."""
    from ..functions.text import MD5_LONG_SQL
    from .dedup import MERSENNE_P, _minhash_params, _shingle_cte

    assert num_hashes % bands == 0
    r = num_hashes // bands
    a, b = _minhash_params(num_hashes, seed)
    params = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_hashes))
    x_expr = MD5_LONG_SQL.format(expr="s")
    bucket_expr = MD5_LONG_SQL.format(expr="string_agg(sig::VARCHAR, ',' ORDER BY i)")
    est_filter = (
        f"WHERE est_jaccard >= {float(min_est_jaccard)}"
        if min_est_jaccard is not None
        else ""
    )
    sel = (
        "SELECT new_id, corpus_id, est_jaccard FROM est " + est_filter
        if min_est_jaccard is not None
        else "SELECT new_id, corpus_id FROM cand"
    )
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
),
cand AS (
  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
  FROM banded n JOIN banded c ON n.band = c.band AND n.bucket = c.bucket
  WHERE ({new_pred.format(id="n.id")}) AND ({corpus_pred.format(id="c.id")})
),
est AS (
  SELECT cand.new_id, cand.corpus_id,
         round(avg(CASE WHEN sn.sig = sc.sig THEN 1.0 ELSE 0.0 END), 6) AS est_jaccard
  FROM cand
  JOIN sig sn ON sn.id = cand.new_id
  JOIN sig sc ON sc.id = cand.corpus_id AND sc.i = sn.i
  GROUP BY cand.new_id, cand.corpus_id
)
{sel}
"""
