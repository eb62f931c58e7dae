"""Deterministic sampling and exact distributed quantiles — the two
"describe / carve up the corpus" primitives a training-data pipeline
runs before and after every curation step.

* :func:`stratified_sample` — n rows per group, selected by the smallest
  md5-derived key of the row id.  Pseudo-random but fully deterministic
  and coordination-free: any worker can decide membership from the row
  alone, re-runs pick identical rows, and the exchange is bounded to
  O(groups × n) by the same partial-top-k trick as
  :func:`.join.topk_per_group` (which it reuses).  The key is the
  md5-lower-64 of the decimal id mod 2⁶¹−1 — the engine's established
  SQL-parity hash (DuckDB ``md5_number_lower``), so the driver oracle
  reproduces the exact sample.

* :func:`value_quantiles` — EXACT quantiles of a bounded-domain integer
  column (token counts, byte sizes, degree counts...) without a global
  sort: per-block (value, count) partials, one hash exchange keyed by
  value, per-block count sums, and an O(distinct-values) driver
  finish.  For domains like per-doc token counts, distinct ≪ corpus, so
  this replaces the all-to-all sort a naive percentile needs with an
  exchange of histogram rows.  Quantile definition matches DuckDB's
  ``quantile_disc``: sorted[max(0, ceil(q·n) − 1)].
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .join import topk_per_group
from .shuffle import hash_partition

_M61 = (1 << 61) - 1


def _sample_keys(ids: np.ndarray) -> np.ndarray:
    """md5-lower-64(decimal id) mod 2⁶¹−1 (== DuckDB
    ``md5_number_lower(CAST(id AS VARCHAR)) % 2305843009213693951``).
    Per-row hashlib is the documented cost of SQL parity (same contract
    as dedup._md5_batch)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[8:],
                        "little") % _M61 for i in ids),
        dtype=np.int64, count=len(ids))


def stratified_sample(ds: "ray.data.Dataset", group_col: str, id_col: str,
                      n: int, num_parts: int = 32) -> pd.DataFrame:
    """Deterministic sample of ``n`` rows per ``group_col`` value.
    Returns (group_col, id_col, rank) with rank 0-based in key order."""

    def add_key(batch: pa.Table) -> pa.Table:
        keys = _sample_keys(batch[id_col].to_numpy(zero_copy_only=False))
        # negated: topk_per_group keeps the LARGEST order_col values
        return batch.append_column("neg_skey", pa.array(-keys))

    out = topk_per_group(ds.map_batches(add_key, batch_format="pyarrow"),
                         group_col, "neg_skey", n, id_col,
                         num_parts=num_parts)
    return out.drop(columns=["neg_skey"])


def _hist_partial(col: str):
    def fn(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vals.astype(np.int64)),
                         "c": pa.array(cnts.astype(np.int64))})
    return fn


def _hist_sum_block(batch: pa.Table) -> pa.Table:
    v = batch["v"].to_numpy(zero_copy_only=False)
    c = batch["c"].to_numpy(zero_copy_only=False)
    if len(v) == 0:
        return batch
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    return pa.table({"v": pa.array(v[starts]),
                     "c": pa.array(np.add.reduceat(c, starts))})


def value_quantiles(ds: "ray.data.Dataset", col: str,
                    qs: tuple = (0.5, 0.9, 0.99),
                    num_parts: int = 8) -> pd.DataFrame:
    """Exact ``quantile_disc`` values of integer column ``col``.
    Returns one row with columns q<pct> (int64), e.g. q50, q90, q99."""
    hist = (hash_partition(
                ds.map_batches(_hist_partial(col), batch_format="pyarrow"),
                ["v"], num_parts)
            .map_batches(_hist_sum_block, batch_format="pyarrow")
            .to_pandas())
    hist = hist.sort_values("v").reset_index(drop=True)
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum().to_numpy()
    out = {}
    for q in qs:
        name = f"q{q * 100:g}".replace(".", "_")
        idx = max(0, int(np.ceil(q * n)) - 1)   # quantile_disc definition
        out[name] = np.int64(hist["v"].to_numpy()[np.searchsorted(
            cum, idx, side="right")]) if n else np.int64(0)
    return pd.DataFrame({k: pd.Series([v], dtype=np.int64)
                         for k, v in out.items()})
