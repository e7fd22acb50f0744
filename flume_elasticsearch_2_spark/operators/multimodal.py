"""Multimodal (image/audio/video) columns for the training-data pipeline.

The reference pipeline moves opaque string payloads through a queue and
delegates interpretation downstream (/root/reference/file-source/.../
FileSource.java:153 — event body is null, everything is headers). This
module generalizes that to the pattern a 100 TB multimodal corpus needs:
media as **opaque ``binary`` columns with typed metadata columns**, and
decode / feature-extract / resize / frame-sample implemented as Arrow-
batched ``mapInPandas`` operators so the bytes cross the JVM↔Python
boundary in columnar batches, never row-at-a-time.

Container constraint: no image/audio codec libraries are installed, so the
*actual* codec step is stubbed two ways (both clearly marked):

* :func:`decode_image_real` raises ``NotImplementedError`` unless PIL is
  importable (import-try gate) — the production slot;
* the ``fake_*`` functions are **deterministic pure-arithmetic fakes** over
  the byte payload (length/first-byte driven), so the Spark-side plumbing —
  schema, partitioning, UDF signature, Arrow batch shape — is fully real
  and oracle-checkable (DuckDB can reproduce the same arithmetic with
  ``octet_length``/modulo, see __spark_entry__.py ``media_features``).

Scale notes (10^12-row target):

* binary payloads dominate partition size — size batches with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` and partitions with
  ``spark.sql.files.maxPartitionBytes``; a 100 MB video row must not meet a
  10k-row Arrow batch. :func:`media_repartition` hash-partitions by doc_id
  with a bytes-per-partition budget.
* feature extraction is embarrassingly parallel (no shuffle): scan →
  mapInPandas → write. The only exchange in this module is the optional
  frame-sample explode, which is a narrow per-row flatMap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _round6(x: np.ndarray) -> np.ndarray:
    """Half-up rounding to 6 decimals (np.round is banker's; DuckDB/Spark
    round half away from zero — ties like n/32000 = 0.0000625 must agree
    with the SQL oracle)."""
    return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)


# canonical media-table schema: binary payload + typed metadata
MEDIA_SCHEMA = (
    "doc_id long, media_type string, data binary, "
    "declared_w int, declared_h int, sample_rate int, n_frames int"
)

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, mean_byte double"
)

AUDIO_FEATURE_SCHEMA = "doc_id long, n_bytes long, sample_rate int, duration_s double, rms double"

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


# ---------------------------------------------------------------------------
# real-codec slots (import-try gated; the production path)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - PIL is not in this container
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:
    _PIL_Image = None


def decode_image_real(data: bytes):
    """Decode real image bytes → (width, height, channels).

    STUB in this container: raises ``NotImplementedError`` when PIL is
    absent. The fake path (:func:`fake_image_dims`) carries the pipeline.
    """
    if _PIL_Image is None:
        raise NotImplementedError(
            "image codec unavailable in this environment; use the deterministic "
            "fake decoder (fake_image_dims) or install Pillow"
        )
    import io

    with _PIL_Image.open(io.BytesIO(data)) as im:  # pragma: no cover
        return im.width, im.height, len(im.getbands())


# ---------------------------------------------------------------------------
# deterministic fake codecs (pure arithmetic over the payload bytes)
# ---------------------------------------------------------------------------


def fake_image_dims(n_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic (width, height, channels) from payload length.

    SQL-equivalent (DuckDB): ``(octet_length(data) % 624) + 16`` etc. —
    keeps the mapInPandas plumbing oracle-checkable without a codec."""
    width = (n_bytes % 624 + 16).astype(np.int32)
    height = ((n_bytes // 7) % 464 + 16).astype(np.int32)
    channels = np.where(n_bytes % 5 == 0, 1, 3).astype(np.int32)
    return width, height, channels


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode + feature extraction as Arrow-batched ``mapInPandas``.

    Output: (doc_id, n_bytes, width, height, channels, mean_byte). The
    ``mean_byte`` is computed over the real payload bytes (vectorized
    NumPy over one concatenated buffer — no per-row Python loop), so the
    batch plumbing is exercised on actual binary data even though the
    codec itself is faked.
    """
    if not fake:
        raise NotImplementedError("real image decode requires a codec library (see module doc)")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["data"]
            n = np.fromiter(
                (0 if b is None else len(b) for b in payloads), count=len(payloads), dtype=np.int64
            )
            w, h, c = fake_image_dims(n)
            # single concatenated buffer -> per-row mean via reduceat
            buf = np.frombuffer(b"".join(b or b"" for b in payloads), dtype=np.uint8)
            starts = np.concatenate([[0], np.cumsum(n)[:-1]])
            nonzero = n > 0
            means = np.zeros(len(pdf), dtype=np.float64)
            if nonzero.any() and len(buf):
                sums = np.add.reduceat(buf.astype(np.float64), starts[nonzero])
                means[nonzero] = sums / n[nonzero]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "width": w,
                    "height": h,
                    "channels": c,
                    "mean_byte": _round6(means),
                }
            )

    return media.select("doc_id", "data").mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


def audio_features(media: DataFrame, bytes_per_sample: int = 2) -> DataFrame:
    """Audio feature extraction (duration from metadata + payload RMS).

    Duration = n_bytes / (sample_rate * bytes_per_sample) — real arithmetic
    on the typed metadata column; RMS over the raw bytes interpreted as
    uint8 (deterministic fake for a PCM decode)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["data"]
            n = np.fromiter(
                (0 if b is None else len(b) for b in payloads), count=len(payloads), dtype=np.int64
            )
            # nullable int: Arrow->pandas may deliver float64 with NaN for
            # null sample_rate (image/video rows) — treat null as 0 (no rate)
            sr = pdf["sample_rate"].fillna(0).to_numpy(dtype=np.int64)
            dur = np.where(sr > 0, n / (sr * float(bytes_per_sample)), 0.0)
            buf = np.frombuffer(b"".join(b or b"" for b in payloads), dtype=np.uint8)
            starts = np.concatenate([[0], np.cumsum(n)[:-1]])
            nonzero = n > 0
            rms = np.zeros(len(pdf), dtype=np.float64)
            if nonzero.any() and len(buf):
                sq = buf.astype(np.float64) ** 2
                sums = np.add.reduceat(sq, starts[nonzero])
                rms[nonzero] = np.sqrt(sums / n[nonzero])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "sample_rate": sr.astype(np.int32),
                    "duration_s": _round6(dur),
                    "rms": _round6(rms),
                }
            )

    return media.select("doc_id", "data", "sample_rate").mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub: metadata transform is real (typed columns updated, new
    byte budget = w*h*channels), pixel resample is the deterministic fake
    (payload truncated/cycled to the target size — a real resizer drops in
    at the marked line)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized_col = []
            for data in pdf["data"]:
                b = bytes(data or b"")
                n = len(b)
                _, _, c = fake_image_dims(np.array([n], dtype=np.int64))
                target = target_w * target_h * int(c[0])
                # REAL RESAMPLE GOES HERE (PIL.Image.resize); deterministic fake:
                resized_col.append(
                    (b * (target // max(n, 1) + 1))[:target] if n else b"\x00" * target
                )
            out = pdf.copy()
            out["data"] = resized_col
            yield out

    # output conforms to MEDIA_SCHEMA: payload + declared dims updated in
    # place, every other typed metadata column passes through (columns
    # pinned to schema order — mapInPandas matches positionally)
    media_cols = ["doc_id", "media_type", "data", "declared_w", "declared_h",
                  "sample_rate", "n_frames"]
    return (
        media.select(*media_cols)
        .mapInPandas(resize, MEDIA_SCHEMA)
        .withColumn("declared_w", F.lit(target_w))
        .withColumn("declared_h", F.lit(target_h))
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: emit every ``every_n``-th frame index of each
    row's declared ``n_frames``, slicing the payload into equal frame spans
    (deterministic fake for a container demux; a real demuxer replaces the
    byte-slice line). Narrow per-row flatMap — no shuffle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, data, n_frames in zip(pdf["doc_id"], pdf["data"], pdf["n_frames"]):
                b = bytes(data or b"")
                nf = int(n_frames or 0)
                if nf <= 0:
                    continue
                span = max(len(b) // nf, 1)
                for fi in range(0, nf, every_n):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    blobs.append(b[fi * span : (fi + 1) * span])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": blobs})

    return media.select("doc_id", "data", "n_frames").mapInPandas(sample, FRAME_SCHEMA)


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition a media table by payload budget: hash-partition on doc_id
    into ``ceil(total_bytes / target_bytes)`` partitions so no partition
    holds more than ~target_bytes of binary payload (binary rows, not row
    counts, are the memory unit at scale)."""
    total = media.agg(F.sum(F.octet_length("data"))).collect()[0][0] or 0
    n = max(1, int(-(-total // target_bytes)))
    return media.repartition(n, "doc_id")


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media corpus derived from the documents table:
    payload = UTF-8 bytes of ``text`` (so DuckDB can recompute everything
    via ``encode(text)``), metadata derived arithmetically. Round-robins
    doc_id across image/audio/video."""
    data = F.encode(F.col("text"), "UTF-8")
    n = F.octet_length(data)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        data.alias("data"),
        (n % 624 + 16).cast("int").alias("declared_w"),
        ((n / 7).cast("long") % 464 + 16).cast("int").alias("declared_h"),
        F.lit(16000).alias("sample_rate"),
        (n % 24 + 1).cast("int").alias("n_frames"),
    )
