"""Codec unit tests, including the reference's locked byte vectors
(/root/reference/lib/invertedindex/encode_decode_test.go:10-83)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searty_ray.functions import codec


def test_reference_byte_vectors():
    assert codec.compat_encode_uint(0) == bytes([0])
    assert codec.compat_encode_uint(128) == bytes([129, 0])
    assert codec.compat_encode_uint(12345) == bytes([224, 57])
    assert codec.compat_encode_uint(12345678) == bytes([133, 241, 194, 78])


@pytest.mark.parametrize("v", [0, 1, 127, 128, 255, 300, 2**14, 2**21 - 1, 2**35 + 17, 2**63 - 1])
def test_varint_scalar_roundtrip(v):
    assert codec.compat_decode_uint(codec.compat_encode_uint(v)) == v


def test_varint_array_roundtrip():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, 5000, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert len(codec.varint_encode(np.empty(0, dtype=np.uint64))) == 0
    assert len(codec.varint_decode(b"")) == 0


def test_native_posting_roundtrip():
    doc_ids = np.array([3, 7, 1000, 10**12], dtype=np.int64)
    tfs = np.array([2, 1, 3, 1], dtype=np.int32)
    positions = np.array([5, 9, 0, 2, 4, 100, 7], dtype=np.int32)
    d, t, p = codec.decode_posting_list(codec.encode_posting_list(doc_ids, tfs, positions))
    assert (d == doc_ids).all() and (t == tfs).all() and (p == positions).all()


def test_native_posting_with_base():
    doc_ids = np.array([2**20 + 5, 2**20 + 9], dtype=np.int64)
    tfs = np.array([1, 1], dtype=np.int32)
    pos = np.array([0, 3], dtype=np.int32)
    blob = codec.encode_posting_list(doc_ids, tfs, pos, first_doc_base=2**20)
    d, t, p = codec.decode_posting_list(blob, first_doc_base=2**20)
    assert (d == doc_ids).all()


def test_compat_posting_roundtrip():
    pl = [(1, [0, 5]), (9, [3]), (100, [1, 2, 3])]
    assert codec.compat_decode_posting_list(codec.compat_encode_posting_list(pl)) == pl
    assert codec.compat_decode_posting_list(codec.compat_encode_posting_list([])) == []


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.lists(st.integers(0, 1000), min_size=1, max_size=8)),
        max_size=20,
    )
)
def test_native_posting_property(raw):
    # build a valid posting list: unique ascending doc ids, ascending positions
    seen = {}
    for gap, positions in raw:
        doc = (max(seen) + 1 + gap) if seen else gap
        seen[doc] = sorted(set(positions))
    if not seen:
        return
    doc_ids = np.array(sorted(seen), dtype=np.int64)
    tfs = np.array([len(seen[d]) for d in doc_ids], dtype=np.int32)
    pos = np.array([p for d in doc_ids for p in seen[d]], dtype=np.int32)
    d, t, p = codec.decode_posting_list(codec.encode_posting_list(doc_ids, tfs, pos))
    assert (d == doc_ids).all() and (t == tfs).all() and (p == pos).all()
