"""Delta + variable-byte posting-list codec, numpy-vectorized.

Byte-identical to the reference codec (``index/inverted/DeltaVarLenCompressor.java``):
each value is delta-coded against its predecessor (first value against 0),
and each delta is written as MSB-first 7-bit groups with the continuation
bit (0x80) set on every byte except the last; delta 0 encodes as the single
byte 0x00.  Golden vectors from the reference test suite
(``Team1CompressorTest.java:28-100``) are pinned in tests:

    [3,3,7,23,23,65,294,2190,238923] ↔ 03 00 04 10 00 2a 81 65 8e 68 8e b9 3d

Deltas must be non-negative (posting lists are doc_id-sorted; the reference
silently mis-encodes negative deltas as 0x00 — we raise instead).

The vectorized kernels process whole posting lists (and concatenations of
many position lists) per call — no Python loop per integer.
"""

from __future__ import annotations

import numpy as np

# Values are Java ints in the reference (< 2**31) → at most 5 varbyte bytes.
_THRESHOLDS = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.int64)


def _deltas(values: np.ndarray, list_offsets: np.ndarray | None) -> np.ndarray:
    """Per-list delta coding: first element of each list is coded against 0."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    if list_offsets is not None:
        starts = np.asarray(list_offsets, dtype=np.int64)[:-1]
        starts = starts[starts < v.size]
        d[starts] = v[starts]
    if d.size and d.min() < 0:
        raise ValueError("varbyte input must be non-decreasing within each list")
    # 5-byte cap = 35 payload bits; larger deltas would silently truncate.
    if d.size and d.max() >= (1 << 35):
        raise ValueError("varbyte delta exceeds 5-byte (2^35) encoding range")
    return d


def encode_deltas(values: np.ndarray,
                  list_offsets: np.ndarray | None = None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Encode sorted ``values`` (one list, or many concatenated lists delimited
    by ``list_offsets`` — standard Arrow offsets of length n_lists+1).

    Returns ``(buf, byte_offsets)`` where ``buf`` is a uint8 array and
    ``byte_offsets`` maps each input *value* to the end of its encoded bytes
    (so list i occupies ``buf[value_byte_end[off[i]-1 or 0] : ...]``; use
    :func:`list_byte_offsets` for per-list ranges).
    """
    d = _deltas(values, list_offsets)
    n = d.size
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    # bytes per value: 1 + #thresholds exceeded  (exact, no float log)
    nbytes = 1 + (d[:, None] >= _THRESHOLDS[None, :]).sum(axis=1).astype(np.int64)
    ends = np.cumsum(nbytes)
    buf = np.zeros(int(ends[-1]), dtype=np.uint8)
    # k-th byte from the end of each value's encoding holds bits 7k..7k+6,
    # with the continuation bit on every byte but the last (k == 0).
    for k in range(5):
        mask = nbytes > k
        if not mask.any():
            break
        pos = ends[mask] - 1 - k
        group = (d[mask] >> (7 * k)) & 0x7F
        if k > 0:
            group |= 0x80
        buf[pos] = group.astype(np.uint8)
    return buf, np.concatenate(([0], ends))


def list_byte_offsets(value_byte_offsets: np.ndarray,
                      list_offsets: np.ndarray) -> np.ndarray:
    """Per-list byte offsets (length n_lists+1) from per-value byte offsets."""
    return value_byte_offsets[np.asarray(list_offsets, dtype=np.int64)]


def decode_deltas(buf: np.ndarray | bytes, start: int = 0,
                  length: int | None = None,
                  restarts: np.ndarray | None = None) -> np.ndarray:
    """Decode one delta+varbyte list from ``buf[start:start+length]``.

    ``restarts``: optional sorted value indices (first must be 0) where the
    delta chain resets (independently-coded posting blocks) — the running
    sum restarts at each, so a multi-block term region decodes in one call.

    Vectorized: no Python loop per byte. Returns int64 values (running sums).
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if length is None:
        length = b.size - start
    b = b[start:start + length]
    if b.size == 0:
        return np.empty(0, np.int64)
    terminal = (b & 0x80) == 0
    t = np.flatnonzero(terminal)            # terminal byte index per value
    if t.size == 0:
        raise ValueError("truncated varbyte stream")
    n = t[-1] + 1                            # ignore trailing partial value
    idx = np.arange(n, dtype=np.int64)
    group = np.searchsorted(t, idx, side="left")
    shift = 7 * (t[group] - idx)
    vals7 = (b[:n].astype(np.int64) & 0x7F) << shift
    starts = np.concatenate(([0], t[:-1] + 1))
    deltas = np.add.reduceat(vals7, starts)
    c = np.cumsum(deltas)
    if restarts is not None and len(restarts) > 1:
        r = np.asarray(restarts, dtype=np.int64)
        r = r[r < c.size]
        base = np.zeros(r.size, np.int64)
        base[1:] = c[r[1:] - 1]          # cumulative total before each block
        seg_len = np.diff(np.append(r, c.size))
        c = c - np.repeat(base, seg_len)
    return c


# --- naive codec (reference NaiveCompressor.java:11-30) --------------------
# Raw 4-byte big-endian ints, no delta — the reference's pluggable baseline
# codec.  Same (values, list_offsets) → (buf, value_byte_offsets) interface
# as encode_deltas so the segment writer can swap codecs (cfg.codec).

def encode_naive(values: np.ndarray,
                 list_offsets: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=np.int64)
    if v.size and (v.min() < 0 or v.max() >= 1 << 32):
        raise ValueError("naive codec encodes uint32 values")
    buf = v.astype(">u4").view(np.uint8)
    return buf, np.arange(0, 4 * (v.size + 1), 4, dtype=np.int64)


def decode_naive(buf: np.ndarray | bytes, start: int = 0,
                 length: int | None = None,
                 restarts: np.ndarray | None = None) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if length is None:
        length = b.size - start
    return np.ascontiguousarray(b[start:start + length]).view(">u4").astype(np.int64)


# --- delta + frame-of-reference bitpacking ---------------------------------
# Third codec (beyond the reference's two): per-group fixed-width packing of
# the SAME delta stream the varbyte codec produces.  Each list packs into
# groups of <= _BP_GROUP deltas; a group is [width:1B][count-1:1B]
# [first-delta:5B LE][payload: ceil((count-1)*width/8)B, little-endian bit
# order] and never spans a list boundary, so byte offsets at list boundaries
# are exact — the only offsets the segment writer consumes (skip-block ends,
# term starts, per-posting position lists).  The group-leading delta is the
# list-absolute base, kept out of the packed width.  Dense posting blocks
# (delta ~ a few bits) pack 2-4x smaller than varbyte's 1-byte floor; at
# 100 TB the postings bytes are the index's IO bill, so width matters more
# than encode CPU.

_BP_GROUP = 128


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Per-value bit length (0 for 0), vectorized."""
    out = np.zeros(x.size, np.int64)
    nz = x > 0
    out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 can round down at exact powers-of-two boundaries: repair
    bad = (x >> out) > 0
    while bad.any():
        out[bad] += 1
        bad = (x >> out) > 0
    return out


def encode_bitpack(values: np.ndarray,
                   list_offsets: np.ndarray | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Same interface/contract as :func:`encode_deltas`; value byte offsets
    are exact at every list boundary (groups never span lists) and
    monotone elsewhere (a mid-group value reports its group's end)."""
    d = _deltas(values, list_offsets)
    n = d.size
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    if list_offsets is None:
        list_offsets = np.array([0, n], dtype=np.int64)
    lo = np.asarray(list_offsets, dtype=np.int64)
    # group assignment: per list, runs of <= _BP_GROUP values
    list_of = np.searchsorted(lo, np.arange(n), side="right") - 1
    local = np.arange(n, dtype=np.int64) - lo[list_of]
    new_group = np.concatenate(
        ([True], (local[1:] % _BP_GROUP == 0) | (list_of[1:] != list_of[:-1])))
    gstart = np.flatnonzero(new_group)
    gcount = np.diff(np.append(gstart, n))
    gid = np.repeat(np.arange(gstart.size), gcount)
    # the group-leading delta is a LIST-ABSOLUTE value (or a block base) —
    # packing it would blow the whole group's width, so it goes into the
    # header as a 5-byte literal and only the followers are bit-packed
    follower = np.ones(n, bool)
    follower[gstart] = False
    wsrc = _bitlen(d)
    wsrc[gstart] = 0
    width = np.maximum.reduceat(wsrc, gstart)
    pay_bytes = ((gcount - 1) * width + 7) // 8
    hdr = 2 + 5                                   # width, count-1, first-delta
    gend = np.cumsum(hdr + pay_bytes)
    gbeg = gend - (hdr + pay_bytes)
    buf = np.zeros(int(gend[-1]), np.uint8)
    buf[gbeg] = width.astype(np.uint8)
    buf[gbeg + 1] = (gcount - 1).astype(np.uint8)
    first = d[gstart]
    for byte in range(5):
        buf[gbeg + 2 + byte] = ((first >> (8 * byte)) & 0xFF).astype(np.uint8)
    # scatter bits: follower j's bit k -> payload_start*8 + (rank-1)*width + k
    bitbase = (gbeg[gid] + hdr) * 8 \
        + (np.arange(n) - gstart[gid] - 1) * width[gid]
    bits = np.zeros(int(gend[-1]) * 8, np.uint8)
    for k in range(int(width.max(initial=0))):
        sel = follower & (width[gid] > k)
        if not sel.any():
            break
        bits[bitbase[sel] + k] = (d[sel] >> k) & 1
    packed = np.packbits(bits, bitorder="little")
    pay_mask = np.ones(buf.size, bool)
    for byte in range(hdr):
        pay_mask[gbeg + byte] = False
    buf[pay_mask] = packed[pay_mask]
    # per-value byte offsets: end of the containing group for the group's
    # last value; mid-group values inherit their group's end (monotone;
    # exact at list boundaries because groups never span lists)
    vbo = np.concatenate(([0], gend[gid]))
    return buf, vbo


def decode_bitpack(buf: np.ndarray | bytes, start: int = 0,
                   length: int | None = None,
                   restarts: np.ndarray | None = None) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    if length is None:
        length = b.size - start
    b = np.ascontiguousarray(b[start:start + length])
    if b.size == 0:
        return np.empty(0, np.int64)
    # sequential header walk — inherently serial (each group's size
    # depends on its own header) but bounded at values/128 iterations;
    # walking a bytes object is ~4x faster than np.uint8 scalar indexing
    raw = b.tobytes()
    pos, widths, counts, pstarts, firsts = 0, [], [], [], []
    size = len(raw)
    while pos < size:
        w = raw[pos]
        c = raw[pos + 1] + 1
        widths.append(w)
        counts.append(c)
        firsts.append(int.from_bytes(raw[pos + 2:pos + 7], "little"))
        pstarts.append(pos + 7)
        pos += 7 + ((c - 1) * w + 7) // 8
    width = np.asarray(widths, np.int64)
    gcount = np.asarray(counts, np.int64)
    pstart = np.asarray(pstarts, np.int64)
    n = int(gcount.sum())
    gstart = np.concatenate(([0], np.cumsum(gcount)[:-1]))
    gid = np.repeat(np.arange(width.size), gcount)
    bits = np.unpackbits(b, bitorder="little")
    follower = np.ones(n, bool)
    follower[gstart] = False
    bitbase = pstart[gid] * 8 + (np.arange(n) - gstart[gid] - 1) * width[gid]
    d = np.zeros(n, np.int64)
    d[gstart] = np.asarray(firsts, np.int64)
    for k in range(int(width.max(initial=0))):
        sel = follower & (width[gid] > k)
        if not sel.any():
            break
        d[sel] |= bits[bitbase[sel] + k].astype(np.int64) << k
    c = np.cumsum(d)
    if restarts is not None and len(restarts) > 1:
        r = np.asarray(restarts, dtype=np.int64)
        r = r[r < c.size]
        base = np.zeros(r.size, np.int64)
        base[1:] = c[r[1:] - 1]
        seg_len = np.diff(np.append(r, c.size))
        c = c - np.repeat(base, seg_len)
    return c


# --- raw frame-of-reference packing (no delta) ------------------------------
# For NON-monotone small-int streams (term frequencies): groups of <=
# _BP_GROUP values packed at the group's max bit width, layout
# [width:1B][count-1:1B][payload ceil(count*width/8)B LE-bit-order]; groups
# never span a list boundary so per-list byte offsets are exact.  tf is
# 1-3 for most postings -> ~2 bits/value instead of the raw section's 32.

def encode_rawpack(values: np.ndarray,
                   list_offsets: np.ndarray | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=np.int64)
    n = v.size
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    if v.min() < 0 or v.max() >= (1 << 40):
        raise ValueError("rawpack encodes non-negative values < 2^40")
    if list_offsets is None:
        list_offsets = np.array([0, n], dtype=np.int64)
    lo = np.asarray(list_offsets, dtype=np.int64)
    list_of = np.searchsorted(lo, np.arange(n), side="right") - 1
    local = np.arange(n, dtype=np.int64) - lo[list_of]
    new_group = np.concatenate(
        ([True], (local[1:] % _BP_GROUP == 0) | (list_of[1:] != list_of[:-1])))
    gstart = np.flatnonzero(new_group)
    gcount = np.diff(np.append(gstart, n))
    gid = np.repeat(np.arange(gstart.size), gcount)
    width = np.maximum.reduceat(_bitlen(v), gstart)
    pay_bytes = (gcount * width + 7) // 8
    gend = np.cumsum(2 + pay_bytes)
    gbeg = gend - (2 + pay_bytes)
    buf = np.zeros(int(gend[-1]), np.uint8)
    buf[gbeg] = width.astype(np.uint8)
    buf[gbeg + 1] = (gcount - 1).astype(np.uint8)
    bitbase = (gbeg[gid] + 2) * 8 + (np.arange(n) - gstart[gid]) * width[gid]
    bits = np.zeros(int(gend[-1]) * 8, np.uint8)
    for k in range(int(width.max(initial=0))):
        sel = width[gid] > k
        if not sel.any():
            break
        bits[bitbase[sel] + k] = (v[sel] >> k) & 1
    packed = np.packbits(bits, bitorder="little")
    pay_mask = np.ones(buf.size, bool)
    pay_mask[gbeg] = False
    pay_mask[gbeg + 1] = False
    buf[pay_mask] = packed[pay_mask]
    vbo = np.concatenate(([0], gend[gid]))
    return buf, vbo


def decode_rawpack(buf: np.ndarray | bytes, start: int = 0,
                   length: int | None = None) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    if length is None:
        length = b.size - start
    b = np.ascontiguousarray(b[start:start + length])
    if b.size == 0:
        return np.empty(0, np.int64)
    raw = b.tobytes()                  # bytes walk: see decode_bitpack
    pos, widths, counts, pstarts = 0, [], [], []
    size = len(raw)
    while pos < size:
        w = raw[pos]
        c = raw[pos + 1] + 1
        widths.append(w)
        counts.append(c)
        pstarts.append(pos + 2)
        pos += 2 + (c * w + 7) // 8
    width = np.asarray(widths, np.int64)
    gcount = np.asarray(counts, np.int64)
    pstart = np.asarray(pstarts, np.int64)
    n = int(gcount.sum())
    gstart = np.concatenate(([0], np.cumsum(gcount)[:-1]))
    gid = np.repeat(np.arange(width.size), gcount)
    bits = np.unpackbits(b, bitorder="little")
    bitbase = pstart[gid] * 8 + (np.arange(n) - gstart[gid]) * width[gid]
    v = np.zeros(n, np.int64)
    for k in range(int(width.max(initial=0))):
        sel = width[gid] > k
        if not sel.any():
            break
        v[sel] |= bits[bitbase[sel] + k].astype(np.int64) << k
    return v


# --- codec registry (reference Compressor interface, Compressor.java:6-27) --

CODECS = {
    "varbyte": (encode_deltas, decode_deltas),
    "naive": (encode_naive, decode_naive),
    "bitpack": (encode_bitpack, decode_bitpack),
}


def get_codec(name: str):
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; have {sorted(CODECS)}")


# --- reference-API wrappers (golden-vector parity) -------------------------

def encode(integers: list[int]) -> bytes:
    """Reference ``Compressor.encode`` signature (DeltaVarLenCompressor.java:16-36)."""
    buf, _ = encode_deltas(np.asarray(integers, dtype=np.int64))
    return buf.tobytes()


def decode(data: bytes, start: int = 0, length: int | None = None) -> list[int]:
    """Reference ``Compressor.decode`` (DeltaVarLenCompressor.java:39-61)."""
    if length is None:
        length = len(data) - start
    return decode_deltas(data, start, length).tolist()
