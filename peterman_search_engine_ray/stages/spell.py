"""Distributed spell correction ("did you mean") over the index vocabulary.

For a probe that matches nothing (a typo), the classic search-engine
fallback is the vocabulary term with the smallest edit distance, ties
broken by document frequency.  At web scale the vocabulary is 10⁸–10⁹
terms, so the scan must be distributed and the kernel vectorized:

* the vocabulary arrives as a hash-partitioned (term, df) Dataset (the
  same exchange the df/top-100 stats use — each term wholly in one
  block);
* the per-block kernel runs the Levenshtein DP **vectorized across the
  block's terms**: the char matrix comes straight from the Arrow string
  buffers (offsets + values, no per-term Python), and the DP sweeps
  query-position × term-position with every cell update an O(block)
  numpy op — ~|probe|·maxlen vector steps per block, no per-term loop;
* each block emits ONE candidate row per probe; the driver reduces
  blocks × probes rows — never the vocabulary.

Distances are computed over UTF-8 bytes (== characters for ASCII, which
the analyzer chain's vocabulary is; DuckDB ``levenshtein`` agrees on
that domain — pinned by a randomized test).

No counterpart in the reference engine (search-feature addition, like
snippets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_COLS = ("probe", "term", "df", "dist")


def _char_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow StringArray → (padded uint8 char matrix, byte lengths),
    built from the offsets/values buffers without per-term Python."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    # string uses int32 offsets; large_string (what Arrow promotes to when
    # a block's string data nears the 2 GiB offset limit — i.e. exactly
    # the web-scale vocabulary case) uses int64.  Reading int64 offsets as
    # int32 pairs would silently produce wrong distances.
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected (large_)string array, got {arr.type}")
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(off)
    width = int(lens.max()) if len(lens) else 0
    if len(data) == 0:        # every string empty: buffer has no bytes
        return np.zeros((len(lens), max(width, 1)), np.uint8), lens
    idx = off[:-1, None] + np.arange(max(width, 1))[None, :]
    valid = idx < off[1:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)], 0)
    return mat.astype(np.uint8), lens


def edit_distances(terms: pa.Array, probe: str) -> np.ndarray:
    """Levenshtein distance from every term to ``probe``, vectorized
    across terms (sequential only in the two string dimensions)."""
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int32)
    mat, lens = _char_matrix(terms)
    q = np.frombuffer(probe.encode(), dtype=np.uint8)
    L, m = mat.shape[1], len(q)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int32),
                           (n, L + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, L + 1):
            cost = (mat[:, j - 1] != q[i - 1]).astype(np.int32)
            cur[:, j] = np.minimum(np.minimum(prev[:, j], cur[:, j - 1]) + 1,
                                   prev[:, j - 1] + cost)
        prev = cur
    return prev[np.arange(n), lens]


def _block_best(probes: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"probe": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        terms_col = batch["term"].combine_chunks()
        terms_np = np.asarray(terms_col)
        df = batch["df"].to_numpy(zero_copy_only=False)
        rows = {c: [] for c in _COLS}
        for p in probes:
            d = edit_distances(terms_col, p)
            best = np.lexsort((terms_np, -df, d))[0]
            rows["probe"].append(p)
            rows["term"].append(terms_np[best])
            rows["df"].append(int(df[best]))
            rows["dist"].append(int(d[best]))
        return pa.table({"probe": pa.array(rows["probe"], pa.string()),
                         "term": pa.array(rows["term"], pa.string()),
                         "df": pa.array(rows["df"], pa.int64()),
                         "dist": pa.array(rows["dist"], pa.int64())})
    return fn


def spell_correct(term_df_ds: "ray.data.Dataset",
                  probes: list[str]) -> pd.DataFrame:
    """Best correction per probe: minimum (edit distance, −df, term).
    ``term_df_ds``: Dataset of exact global (term, df) rows (any
    partitioning — the reduction is associative).  Returns one row per
    probe: (probe, term, df, dist), sorted by probe."""
    cand = (term_df_ds.map_batches(_block_best(probes),
                                   batch_format="pyarrow")
            .to_pandas())
    if cand.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
            _COLS, (object, object, np.int64, np.int64))})
    cand = cand.sort_values(["probe", "dist", "df", "term"],
                            ascending=[True, True, False, True])
    return (cand.groupby("probe", sort=True).head(1)
            .reset_index(drop=True))
