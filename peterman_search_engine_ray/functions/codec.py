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


# --- codec registry (reference Compressor interface, Compressor.java:6-27) --

CODECS = {
    "varbyte": (encode_deltas, decode_deltas),
    "naive": (encode_naive, decode_naive),
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
