"""Distributed Bloom-filter membership sketch (Bloom 1970).

The crawl-frontier primitive: "have we already fetched this URL?"
answered without touching the corpus.  Ray-Data-first shape:

* build = map-side bit-position partials over the key column (vectorized
  md5 double hashing, per-block DISTINCT), combined by a bounded union —
  the driver holds at most ``m`` bit positions (the filter itself),
  never the keys;
* probe = pure bit tests against the broadcast filter.

At 100 TB the bit space is hash-partitioned (``widx = bit // 64`` is the
natural key) and each partition ORs its own words — the sketch then
lives as a partitioned Dataset and probes route to one partition; the
driver-side union here is the single-filter special case (m is a
constant chosen for the false-positive budget, independent of corpus
size).

Oracle-exact by construction: the bit positions are
``(h % m + i·(((h >> 32) | 1) % m)) % m`` over the md5-lower-64 key hash
(``md5_number_lower`` in DuckDB computes the identical integer), so even
FALSE POSITIVES match the SQL oracle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.textstats import md5_lower64_arr

M_BITS_DEFAULT = 1 << 16
K_HASHES_DEFAULT = 4


def bit_positions(keys, m_bits: int = M_BITS_DEFAULT,
                  k: int = K_HASHES_DEFAULT) -> np.ndarray:
    """(n, k) uint64 bit positions via md5 double hashing — the classic
    Kirsch–Mitzenmacher construction, exact-parity with the SQL twin."""
    h = md5_lower64_arr(list(keys))
    m = np.uint64(m_bits)
    h1 = h % m
    h2 = ((h >> np.uint64(32)) | np.uint64(1)) % m
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m


def build_bloom(ds: "ray.data.Dataset", key_col: str,
                m_bits: int = M_BITS_DEFAULT,
                k: int = K_HASHES_DEFAULT) -> np.ndarray:
    """OR-merge map-side bit-position partials into one bool[m] filter.
    Each block emits its DISTINCT bit positions (≤ m rows, usually far
    fewer); the driver unions position sets — never sees a key."""
    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        if not keys:
            return pa.table({"bit": pa.array([], pa.int64())})
        bits = np.unique(bit_positions(keys, m_bits, k))
        return pa.table({"bit": pa.array(bits.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    filt = np.zeros(m_bits, bool)
    if len(parts):
        filt[parts["bit"].to_numpy(np.int64)] = True
    return filt


def probe_bloom(filt: np.ndarray, keys: list[str],
                k: int = K_HASHES_DEFAULT) -> np.ndarray:
    """int64[len(keys)] — 1 iff ALL k bits for the key are set."""
    bits = bit_positions(keys, filt.size, k)
    return filt[bits.astype(np.int64)].all(axis=1).astype(np.int64)


def exact_membership(ds: "ray.data.Dataset", key_col: str,
                     probes: list[str]) -> np.ndarray:
    """Ground truth beside the sketch: map-side isin partials against the
    broadcast probe list (probe-scale rows per block), driver OR."""
    probe_arr = pa.array(probes, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        hit = pc.is_in(probe_arr, value_set=batch[key_col].combine_chunks())
        return pa.table({
            "pid": pa.array(np.arange(len(probes), dtype=np.int64)),
            "hit": pa.array(np.asarray(hit).astype(np.int64))})

    parts = (ds.map_batches(partial, batch_format="pyarrow").to_pandas())
    out = np.zeros(len(probes), np.int64)
    if len(parts):
        agg = parts.groupby("pid")["hit"].max()
        out[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    return out
