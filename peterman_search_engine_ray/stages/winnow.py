"""Winnowing local document fingerprinting (Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003 — the MOSS algorithm).

Per document: hash every K-token shingle, slide a W-shingle window, and
select the minimum hash of each window (rightmost position on ties —
the paper's density-reducing tie rule).  The selected set is a
position-local fingerprint sketch: any shared run of ≥ W+K-1 tokens
between two documents is GUARANTEED to share at least one selected
fingerprint, at ~2/(W+1) the density of the full shingle set.  This
complements the whole-doc Horner fingerprint
(functions/textstats.py:82, `doc_fingerprint`) — that one changes if a
single byte changes; winnowed fingerprints survive partial overlap, so
they power copy/quote/boilerplate detection at crawl scale.

No reference counterpart (the reference has no dedup surface at all,
`InvertedIndexManager.java` deletion stub); hashes are md5-lower-64
mod 2⁶¹-1 so a DuckDB oracle (`md5_number_lower`) reproduces them
bit-exactly.

Scale shape: map-side the batch emits DISTINCT (fp, doc_id) pairs —
selected-fingerprint scale, ≈ 2/(W+1) of the shingle count; the only
exchange is keyed on fp (see `q_winnow_dups`), and per-fp counts are
block-local.  The window min/rightmost-argmin runs as ONE
sliding_window_view pass over the batch-concatenated hash array with
int64-max sentinel gaps (W-1 sentinels between docs make a cross-doc
window impossible: it would need to span W+1 positions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import md5_lower64_arr
from .dedup import _flat_raw_tokens

WINNOW_K = 3  # shingle width, tokens
WINNOW_W = 4  # window size, shingles
_MOD = 2305843009213693951  # 2^61 - 1
_SENTINEL = np.iinfo(np.int64).max


def _shingle_hashes(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, hash) for every K-token shingle in the batch, in
    document order.  Shingles are consecutive raw tokens joined by a
    single space (the dedup `shingle_set` convention), hashed md5-lower
    -64 mod 2⁶¹-1; each DISTINCT shingle string is hashed once
    (dictionary-encode first — md5 is the documented per-distinct-token
    Python cost shared with the sketch/bloom oracles)."""
    flat, d = _flat_raw_tokens(texts)
    n = len(flat)
    if n < WINNOW_K:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    parts = [flat.slice(i, n - WINNOW_K + 1) for i in range(WINNOW_K)]
    joined = pc.binary_join_element_wise(*parts, " ")
    within = d[: n - WINNOW_K + 1] == d[WINNOW_K - 1:]
    sh = joined.filter(pa.array(within))
    sdoc = d[: n - WINNOW_K + 1][within]
    if len(sh) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    enc = pc.dictionary_encode(sh)
    dict_h = (md5_lower64_arr(enc.dictionary.to_pylist()) % _MOD) \
        .astype(np.int64)
    h = dict_h[np.asarray(enc.indices)]
    return sdoc.astype(np.int64), h


def _select_positions(sdoc: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Indices (into the flat shingle arrays) selected by winnowing:
    rightmost window-min per W-window; docs with 1 ≤ n_shingles < W
    contribute the rightmost min of their single whole-doc window.
    Fully vectorized over the batch via the sentinel-padded
    sliding_window_view described in the module docstring."""
    n = h.size
    if n == 0:
        return np.empty(0, np.int64)
    # doc segmentation (sdoc is ascending by construction)
    starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
    counts = np.diff(np.r_[starts, n])
    inv = np.repeat(np.arange(starts.size), counts)  # doc ordinal per row
    selected: list[np.ndarray] = []

    short = counts < WINNOW_W
    if short.any():
        # rightmost argmin of each short doc's single window
        docmin = np.full(starts.size, _SENTINEL, np.int64)
        np.minimum.at(docmin, inv, h)
        cand = np.where(h == docmin[inv], np.arange(n), -1)
        rm = np.maximum.reduceat(cand, starts)
        selected.append(rm[short & (rm >= 0)])

    if (~short).any():
        keep = ~short[inv]
        idx_long = np.flatnonzero(keep)          # original flat indices
        h_long = h[idx_long]
        inv_long = inv[idx_long]
        lstarts = np.flatnonzero(
            np.r_[True, inv_long[1:] != inv_long[:-1]])
        lord = np.repeat(np.arange(lstarts.size),
                         np.diff(np.r_[lstarts, idx_long.size]))
        padpos = np.arange(idx_long.size) + (WINNOW_W - 1) * lord
        padded = np.full(idx_long.size
                         + (WINNOW_W - 1) * lstarts.size,
                         _SENTINEL, np.int64)
        padded[padpos] = h_long
        back = np.full(padded.size, -1, np.int64)
        back[padpos] = idx_long
        win = np.lib.stride_tricks.sliding_window_view(padded, WINNOW_W)
        valid = win.max(axis=1) != _SENTINEL
        ends = np.arange(WINNOW_W - 1, padded.size)[valid]
        j = win[valid, ::-1].argmin(axis=1)
        selected.append(back[ends - j])

    return np.unique(np.concatenate(selected)) if selected \
        else np.empty(0, np.int64)


def winnow_partials_batch(batch: pa.Table) -> pa.Table:
    """Map stage: DISTINCT (fp, doc_id) winnowed-fingerprint pairs for
    the batch's documents (each document lives wholly in one row, so
    per-batch distinct ⇒ globally distinct)."""
    empty = pa.table({"fp": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    doc_ids = batch["doc_id"].to_numpy()
    sdoc, h = _shingle_hashes(batch["text"].to_pylist())
    sel = _select_positions(sdoc, h)
    if sel.size == 0:
        return empty
    pair = np.unique(np.stack([h[sel], doc_ids[sdoc[sel]]], axis=1),
                     axis=0)
    return pa.table({"fp": pa.array(pair[:, 0]),
                     "doc_id": pa.array(pair[:, 1])})
