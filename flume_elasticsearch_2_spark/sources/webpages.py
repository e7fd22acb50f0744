"""Deterministic synthetic Common-Crawl-style webpages corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is fully distributed and partition-order independent: every value
derives from the row index ``i`` through splitmix64 hashing (no RNG state),
so the same corpus materializes at any parallelism level — the property the
scaling benchmark (local[8] vs local[32]) and the resume test both rely on.

Text is drawn from a Zipfian(s=1.07) vocabulary of 10 000 terms plus 30 hot
"stopword" terms appearing in ~40% of docs (drives the skew/salting paths);
~1% of docs mix in non-ASCII and digit tokens (tokenizer edge cases); ~2% of
rows are dup injections (same url as the previous row, warc_ts one day
older) for dedup-by-key tests. ``html`` wraps ``text`` so that
``extract_text(html) == text`` byte-identically per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
N_VOCAB = 10_000
N_HOT = 30
ZIPF_S = 1.07
HOT_MASS = 0.09  # 30 hot terms -> each ~40% doc frequency at avg dl ~165
LANGS = ("en", "en", "en", "fr", "es", "zh", "de")  # weighted by repetition
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

WEBPAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the stateless hash behind all sampling."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _vocab_cdf() -> np.ndarray:
    ranks = np.arange(1, N_VOCAB + 1, dtype=np.float64)
    w = ranks ** (-ZIPF_S)
    w = w / w.sum() * (1.0 - HOT_MASS)
    hot = np.full(N_HOT, HOT_MASS / N_HOT)
    return np.cumsum(np.concatenate([hot, w]))


_CDF = _vocab_cdf()
_HOT_TERMS = [f"hot{j:02d}" for j in range(N_HOT)]
_TERMS = np.array(_HOT_TERMS + [f"term{j:05d}" for j in range(N_VOCAB)], dtype=object)
_EXTRA = np.array(["café", "straße", "東京", "42", "a1b2"], dtype=object)


def _gen_rows(idx: np.ndarray) -> pd.DataFrame:
    """Generate rows for absolute indices ``idx`` (vectorized)."""
    h = _splitmix64(idx.astype(np.uint64) * np.uint64(2654435761) + np.uint64(SEED))
    n_tok = 30 + (h % np.uint64(271)).astype(np.int64)
    is_dup = (idx % 50 == 49) & (idx > 0)
    src = np.where(is_dup, idx - 1, idx)  # dup rows copy the previous doc

    # token draws: u_ij = hash(src, j) mapped through the Zipf CDF
    src_n_tok = 30 + (
        _splitmix64(src.astype(np.uint64) * np.uint64(2654435761) + np.uint64(SEED))
        % np.uint64(271)
    ).astype(np.int64)
    texts = []
    for s, L in zip(src, src_n_tok):
        js = np.arange(L, dtype=np.uint64)
        u = _splitmix64(np.uint64(s) * np.uint64(0x51_7C_C1B7) + js * np.uint64(0x2545F491)) / 2.0**64
        # clamp: _CDF[-1] is 1-eps in float64, so u in (CDF[-1], 1) would
        # index one past the end (~3e-16/draw — real at 10^12-row scale)
        toks = _TERMS[np.minimum(np.searchsorted(_CDF, u), len(_TERMS) - 1)]
        if s % 100 == 7:  # ~1% docs: non-ASCII + digit tokens
            extra_ix = _splitmix64(np.uint64(s) + js[: min(3, L)]) % np.uint64(len(_EXTRA))
            toks = np.concatenate([toks, _EXTRA[extra_ix.astype(np.int64)]])
        texts.append(" ".join(toks.tolist()))

    urls = [f"https://site{int(s) % 97}.example/p/{int(s)}" for s in src]
    ts = [
        EPOCH + timedelta(seconds=int(s)) - (timedelta(days=1) if d else timedelta(0))
        for s, d in zip(src, is_dup)
    ]
    html = [
        f"<html><head><title>t{int(s)}</title></head><body><p>{t}</p></body></html>".encode()
        for s, t in zip(src, texts)
    ]
    langs = [LANGS[int(s) % len(LANGS)] for s in src]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
    )


def generate_webpages(
    spark: SparkSession, n_docs: int, n_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` rows."""
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            # cap per-yield size to keep Arrow batches bounded
            for lo in range(0, len(idx), 2000):
                yield _gen_rows(idx[lo : lo + 2000])

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, WEBPAGES_SCHEMA)
    )


def write_webpages(spark: SparkSession, n_docs: int, path: str, n_partitions: int | None = None) -> None:
    generate_webpages(spark, n_docs, n_partitions).write.mode("overwrite").parquet(path)


def read_webpages(
    spark: SparkSession,
    source: str,
    start_snapshot_id: int | None = None,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Read the webpages corpus — Iceberg table (``iceberg:<catalog.tbl>``)
    or a parquet directory path.

    The production input per BASELINE.json ``input_hint`` is an Iceberg
    table: snapshot isolation gives the build a consistent corpus view, and
    ``start/end_snapshot_id`` select an incremental range (the Spark-native
    analog of the reference's new-file discovery + byte-offset watermark,
    FileSource.java:115-121/145 — S1/S4). The Iceberg runtime jars are not
    in this sandbox, so that branch is gated: it raises NotImplementedError
    with the exact spark-submit flags needed, and every test/bench path uses
    the parquet branch, which yields the identical DataFrame schema.
    """
    if source.startswith("iceberg:"):
        tbl = source[len("iceberg:"):]
        reader = spark.read.format("iceberg")
        if start_snapshot_id is not None:
            reader = reader.option("start-snapshot-id", str(start_snapshot_id))
        if end_snapshot_id is not None:
            reader = reader.option("end-snapshot-id", str(end_snapshot_id))
        try:
            return reader.load(tbl)
        except Exception as exc:
            # translate ONLY the missing-runtime failure; a wrong table
            # name / bad snapshot on a configured cluster must surface as-is
            msg = str(exc)
            if "iceberg" in msg.lower() and (
                "Failed to find" in msg or "ClassNotFound" in msg or "data source" in msg
            ):
                raise NotImplementedError(
                    "Iceberg runtime not on the classpath; submit with "
                    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
                    "and a catalog config (spark.sql.catalog.<name>=org.apache.iceberg."
                    "spark.SparkCatalog)"
                ) from exc
            raise
    return spark.read.parquet(source)
