"""Multimodal binary-column plumbing: schema, Arrow batch shape, decode
stubs, frame sampling, byte-budget partitioning (operators/multimodal.py).

The codec itself is a deterministic fake (no image/audio libs in the
container); everything Spark-side is real and checked against NumPy
recomputation on collected payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from flume_elasticsearch_2_spark.operators.multimodal import (
    audio_features,
    decode_image_real,
    fake_image_dims,
    image_features,
    media_repartition,
    resize_images,
    sample_frames,
    synth_media_from_documents,
)


@pytest.fixture(scope="module")
def media(spark, documents):
    m = synth_media_from_documents(documents.limit(200)).cache()
    m.count()
    return m


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "data", "declared_w", "declared_h", "sample_rate", "n_frames",
    ]
    types = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert types["data"] == "binary"
    assert types["doc_id"] == "bigint"
    assert types["declared_w"] == "int"


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        image_features(None, fake=False)


def test_image_features_match_numpy(media):
    feats = {r["doc_id"]: r for r in image_features(media).collect()}
    rows = media.select("doc_id", "data").collect()
    assert len(feats) == len(rows)
    for r in rows:
        b = bytes(r["data"])
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(b)
        w, h, c = fake_image_dims(np.array([len(b)], dtype=np.int64))
        assert (f["width"], f["height"], f["channels"]) == (int(w[0]), int(h[0]), int(c[0]))
        assert f["mean_byte"] == pytest.approx(
            round(float(np.frombuffer(b, dtype=np.uint8).mean()), 6), abs=1e-6
        )


def test_image_features_survive_small_arrow_batches(spark, media):
    """Batch-boundary independence: forcing tiny Arrow batches must not
    change any feature row (the mapInPandas body is per-batch vectorized
    but per-row deterministic)."""
    big = {r["doc_id"]: r for r in image_features(media).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = {r["doc_id"]: r for r in image_features(media).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert big == small


def test_audio_features(media):
    out = {r["doc_id"]: r for r in audio_features(media).collect()}
    for r in media.select("doc_id", "data", "sample_rate").collect():
        b = bytes(r["data"])
        f = out[r["doc_id"]]
        assert f["duration_s"] == pytest.approx(len(b) / (r["sample_rate"] * 2.0), abs=1e-6)
        want_rms = float(np.sqrt((np.frombuffer(b, dtype=np.uint8).astype(np.float64) ** 2).mean()))
        assert f["rms"] == pytest.approx(round(want_rms, 6), abs=1e-6)


def test_resize_images(media):
    out = resize_images(media, 32, 24).collect()
    by_id = {r["doc_id"]: r for r in out}
    src = {r["doc_id"]: bytes(r["data"]) for r in media.select("doc_id", "data").collect()}
    for doc_id, r in by_id.items():
        _, _, c = fake_image_dims(np.array([len(src[doc_id])], dtype=np.int64))
        assert len(bytes(r["data"])) == 32 * 24 * int(c[0])
        assert (r["declared_w"], r["declared_h"]) == (32, 24)


def test_sample_frames(media):
    frames = sample_frames(media, every_n=5).collect()
    meta = {r["doc_id"]: (bytes(r["data"]), r["n_frames"]) for r in media.collect()}
    seen: dict[int, list[int]] = {}
    for fr in frames:
        seen.setdefault(fr["doc_id"], []).append(fr["frame_idx"])
        b, nf = meta[fr["doc_id"]]
        span = max(len(b) // nf, 1)
        assert bytes(fr["frame_bytes"]) == b[fr["frame_idx"] * span : (fr["frame_idx"] + 1) * span]
    for doc_id, (b, nf) in meta.items():
        assert sorted(seen[doc_id]) == list(range(0, nf, 5))


def test_media_repartition_bytes_budget(media):
    total = sum(len(bytes(r["data"])) for r in media.select("data").collect())
    budget = max(total // 4, 1)
    parted = media_repartition(media, target_bytes=budget)
    assert parted.rdd.getNumPartitions() == -(-total // budget)
    assert parted.count() == media.count()


def test_audio_features_null_sample_rate(spark):
    from flume_elasticsearch_2_spark.operators.multimodal import audio_features

    media = spark.createDataFrame(
        [(1, "image", b"\x01\x02\x03\x04", 2, 2, None, None),
         (2, "audio", b"\x01\x02\x03\x04", None, None, 16000, None)],
        "doc_id long, media_type string, data binary, declared_w int, "
        "declared_h int, sample_rate int, n_frames int",
    )
    rows = {r.doc_id: r for r in audio_features(media).collect()}
    assert rows[1].sample_rate == 0 and rows[1].duration_s == 0.0
    assert rows[2].duration_s > 0


def test_resize_preserves_media_schema(spark):
    from flume_elasticsearch_2_spark.operators.multimodal import (
        audio_features,
        resize_images,
        synth_media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = synth_media_from_documents(docs)
    resized = resize_images(media, 32, 16)
    assert set(resized.columns) == set(media.columns)
    # downstream operators still work on the resized table
    assert audio_features(resized).count() == 20
