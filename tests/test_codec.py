"""Byte-exact codec vectors from the reference test suite
(Team1CompressorTest.java:28-100) + vectorized multi-list / segmented decode."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from peterman_search_engine_ray.functions import codec


def test_golden_bytes():
    assert codec.encode([3, 3, 7, 23, 23, 65, 294, 2190, 238923]).hex() == \
        "03000410002a81658e688eb93d"
    assert codec.encode([0]) == b"\x00"
    assert codec.encode([2**31 - 1]).hex() == "87ffffff7f"
    assert codec.encode([1, 1, 1]) == b"\x01\x00\x00"
    assert codec.encode([1, 2, 3]) == b"\x01\x01\x01"


def test_single_byte_range():
    for i in range(128):
        assert codec.encode([i]) == bytes([i])
        assert codec.decode(bytes([i])) == [i]


def test_roundtrip_random():
    vals = np.sort(np.random.RandomState(0).randint(0, 2**31 - 1, 5000))
    assert codec.decode(codec.encode(vals.tolist())) == vals.tolist()


def test_subrange_decode():
    b = codec.encode([3, 3, 7, 23])
    assert codec.decode(b, 0, 2) == [3, 3]
    assert codec.decode(b, 0, 3) == [3, 3, 7]


def test_unsorted_raises():
    with pytest.raises(ValueError):
        codec.encode([5, 3])


def test_multi_list_encode():
    offs = np.array([0, 3, 3, 5])
    vals = np.array([1, 5, 5, 0, 7])
    buf, vbo = codec.encode_deltas(vals, offs)
    lbo = codec.list_byte_offsets(vbo, offs)
    assert codec.decode_deltas(buf, int(lbo[0]), int(lbo[1] - lbo[0])).tolist() == [1, 5, 5]
    assert lbo[1] == lbo[2]  # empty list occupies no bytes
    assert codec.decode_deltas(buf, int(lbo[2]), int(lbo[3] - lbo[2])).tolist() == [0, 7]


def test_segmented_decode_restarts():
    # two independently-coded blocks of one term, decoded in one call
    docs = np.array([10, 20, 30, 5, 6, 100])  # blocks [10,20,30] and [5,6,100]
    buf, _ = codec.encode_deltas(docs, np.array([0, 3, 6]))
    out = codec.decode_deltas(buf, restarts=np.array([0, 3]))
    assert out.tolist() == [10, 20, 30, 5, 6, 100]


@given(st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=200))
def test_roundtrip_property(xs):
    xs = sorted(xs)
    assert codec.decode(codec.encode(xs)) == xs


@given(st.lists(st.lists(st.integers(0, 2**34 - 1), min_size=0,
                         max_size=300), min_size=1, max_size=6))
def test_bitpack_roundtrip_property(lists):
    lists = [np.sort(np.asarray(xs, np.int64)) for xs in lists]
    vals = (np.concatenate(lists) if any(len(x) for x in lists)
            else np.empty(0, np.int64))
    offs = np.concatenate(
        ([0], np.cumsum([len(x) for x in lists]))).astype(np.int64)
    buf, vbo = codec.encode_bitpack(vals, offs)
    # whole-stream decode with restarts at list starts (unique, like the
    # reader's cumsum-of-positive-counts restarts — the shared contract)
    out = codec.decode_bitpack(buf, 0, len(buf),
                               restarts=np.unique(offs[:-1]))
    assert np.array_equal(out, vals)
    # byte offsets are exact at list boundaries: each list's byte range
    # decodes independently
    lbo = codec.list_byte_offsets(vbo, offs)
    for i, want in enumerate(lists):
        got = codec.decode_bitpack(buf, int(lbo[i]),
                                   int(lbo[i + 1] - lbo[i]))
        assert np.array_equal(got, want), i
    assert np.all(np.diff(vbo) >= 0)  # offsets monotone everywhere


def test_bitpack_beats_varbyte_on_dense_postings():
    docs = np.arange(0, 300_000, 3, dtype=np.int64)   # small deltas
    offs = np.append(np.arange(0, docs.size, 128), docs.size)
    bv, _ = codec.encode_deltas(docs, offs)
    bb, _ = codec.encode_bitpack(docs, offs)
    assert len(bb) * 2 < len(bv)        # >2x smaller where it matters


def test_naive_codec_reference_parity():
    # NaiveCompressor.java:11-30 — raw 4-byte big-endian ints
    from peterman_search_engine_ray.functions.codec import (decode_naive,
                                                            encode_naive,
                                                            get_codec)
    buf, offs = encode_naive(np.array([1, 256, 2**31 - 1]))
    assert buf.tobytes().hex() == "00000001" + "00000100" + "7fffffff"
    assert decode_naive(buf).tolist() == [1, 256, 2**31 - 1]
    assert decode_naive(buf, 4, 4).tolist() == [256]
    assert offs.tolist() == [0, 4, 8, 12]
    enc, dec = get_codec("naive")
    assert enc is encode_naive and dec is decode_naive
    with pytest.raises(ValueError):
        get_codec("nope")


@given(st.lists(st.lists(st.integers(0, 2**40 - 1), min_size=0,
                         max_size=300), min_size=1, max_size=6))
def test_rawpack_roundtrip_property(lists):
    """Frame-of-reference packing (no delta — the tf section's codec):
    whole-stream and per-list byte-range decodes round-trip."""
    arrs = [np.asarray(xs, np.int64) for xs in lists]
    vals = (np.concatenate(arrs) if any(len(a) for a in arrs)
            else np.empty(0, np.int64))
    offs = np.concatenate(
        ([0], np.cumsum([len(a) for a in arrs]))).astype(np.int64)
    buf, vbo = codec.encode_rawpack(vals, offs)
    out = codec.decode_rawpack(buf, 0, len(buf))
    assert np.array_equal(out, vals)
    lbo = codec.list_byte_offsets(vbo, offs)
    for i, want in enumerate(arrs):
        got = codec.decode_rawpack(buf, int(lbo[i]),
                                   int(lbo[i + 1] - lbo[i]))
        assert np.array_equal(got, want), i


def test_rawpack_rejects_out_of_range():
    with pytest.raises(ValueError):
        codec.encode_rawpack(np.array([-1], np.int64))
    with pytest.raises(ValueError):
        codec.encode_rawpack(np.array([1 << 40], np.int64))
