from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flume_elasticsearch_2_spark.codec import (
    BLOCK_SIZE,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    svb_decode,
    svb_encode,
)


def test_svb_roundtrip_basic():
    v = np.array([0, 1, 255, 256, 65535, 65536, 2**24 - 1, 2**24, 2**32 - 1], dtype=np.uint32)
    assert np.array_equal(svb_decode(svb_encode(v), len(v)), v)


def test_svb_empty():
    assert svb_encode(np.array([], dtype=np.uint32)) == b""
    assert svb_decode(b"", 0).size == 0


def test_svb_sizes():
    # 4 one-byte values -> 1 control byte + 4 data bytes
    v = np.array([1, 2, 3, 4], dtype=np.uint32)
    assert len(svb_encode(v)) == 5


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=600))
def test_svb_roundtrip_property(xs):
    v = np.array(xs, dtype=np.uint32)
    assert np.array_equal(svb_decode(svb_encode(v), len(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=500))
def test_delta_roundtrip(ids):
    v = np.array(sorted(ids), dtype=np.uint32)
    assert np.array_equal(delta_decode(delta_encode(v)), v)


@settings(max_examples=50, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=1000),
    st.integers(min_value=1, max_value=50),
)
def test_postings_roundtrip(ids, tfmax):
    doc_ids = np.array(sorted(ids), dtype=np.uint32)
    rng = np.random.RandomState(42)
    tfs = rng.randint(1, tfmax + 1, size=len(doc_ids)).astype(np.uint32)
    enc = encode_postings(doc_ids, tfs)
    out_ids, out_tfs = decode_postings(enc.n, enc.doc_bytes, enc.tf_bytes)
    assert np.array_equal(out_ids, doc_ids)
    assert np.array_equal(out_tfs, tfs)
    # block metadata invariants
    nblocks = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc.block_max_tf) == nblocks
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, len(doc_ids))
        assert enc.block_first_doc[bi] == doc_ids[lo]
        assert enc.block_last_doc[bi] == doc_ids[hi - 1]
        assert enc.block_max_tf[bi] == tfs[lo:hi].max()


def test_compression_is_compact():
    # dense doc ids -> deltas of 1 -> 1 byte each + control overhead
    v = np.arange(10_000, dtype=np.uint32) * 3 + 7
    enc = svb_encode(delta_encode(v))
    assert len(enc) < 10_000 * 1.3  # ~1.25 bytes/doc


def test_positions_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_elasticsearch_2_spark.codec import decode_positions, encode_positions

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(0, 100_000), min_size=1, max_size=40, unique=True),
            min_size=0,
            max_size=30,
        )
    )
    def check(segments):
        segs = [np.sort(np.array(s, dtype=np.uint32)) for s in segments]
        tfs = np.array([len(s) for s in segs], dtype=np.uint32)
        flat = (
            np.concatenate(segs).astype(np.uint32)
            if segs
            else np.zeros(0, dtype=np.uint32)
        )
        buf = encode_positions(flat, tfs)
        out = decode_positions(buf, tfs)
        assert np.array_equal(out, flat)

    check()
