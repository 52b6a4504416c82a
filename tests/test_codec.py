"""Codec round-trip properties (FIXTURES.md §6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from sparkft.codec import (
    BLOCK,
    block_maxes,
    decode_posting_list,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_posting_list,
    encode_varints,
)

u64 = st.integers(min_value=0, max_value=2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=200))
def test_varint_roundtrip(vals):
    a = np.asarray(vals, dtype=np.uint64)
    assert (decode_varints(encode_varints(a)) == a).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=200))
def test_delta_roundtrip(vals):
    a = np.sort(np.asarray(vals, dtype=np.uint64))
    assert (delta_decode(delta_encode(a)) == a).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(u64, st.integers(1, 10_000), st.integers(1, 100_000)),
        min_size=0,
        max_size=300,
        unique_by=lambda t: t[0],
    )
)
def test_posting_roundtrip(rows):
    rows.sort()
    ids = np.asarray([r[0] for r in rows], dtype=np.uint64)
    tfs = np.asarray([r[1] for r in rows], dtype=np.uint64)
    lens_ = np.asarray([r[2] for r in rows], dtype=np.uint64)
    g, t, l = encode_posting_list(ids, tfs, lens_)
    ids2, tfs2, lens2 = decode_posting_list(g, t, l)
    assert (ids2 == ids).all() and (tfs2 == tfs).all() and (lens2 == lens_).all()


def test_block_maxes():
    n = BLOCK * 2 + 5
    tfn = np.linspace(0.1, 0.9, n)
    ids = np.arange(n, dtype=np.uint64) * 7
    bmax, blast = block_maxes(tfn, ids)
    assert len(bmax) == 3
    assert bmax[0] == tfn[BLOCK - 1]
    assert blast[-1] == ids[-1]
    assert bmax[-1] == tfn[-1]


def test_varint_compression_ratio():
    # dense gaps encode to ~1 byte per posting
    ids = np.cumsum(np.random.default_rng(42).integers(1, 100, 10_000)).astype(np.uint64)
    g = encode_varints(delta_encode(ids))
    assert len(g) < 10_000 * 2
