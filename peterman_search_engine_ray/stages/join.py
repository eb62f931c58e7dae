"""Join and per-group-top-k operators.

* :func:`broadcast_join` — the scale-correct shape for a big⋈small join:
  the small side is put in the object store ONCE (``ray.put``) and every
  ``map_batches`` task does a vectorized local lookup — no all-to-all
  shuffle of the big side, no per-batch re-shipping of the small side
  (each worker process fetches the broadcast object once and plasma keeps
  it shared).  Use Ray Data's native ``Dataset.join`` only when BOTH sides
  are data-scale.
* :func:`topk_per_group` — bounded top-k per group key: map-side partial
  top-k inside each batch (only k rows per key per batch survive), one
  hash exchange of the partials, per-block final top-k.  Shuffle volume is
  O(keys × k × batches-touching-key), never O(rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .shuffle import hash_partition


def broadcast_join(big_ds: "ray.data.Dataset", small_df: pd.DataFrame,
                   on: str, columns: list[str] | None = None
                   ) -> "ray.data.Dataset":
    """Inner-join ``big_ds`` against the driver-side ``small_df`` on column
    ``on`` (small side broadcast once via ``ray.put``).  ``columns``
    restricts which small-side columns are appended."""
    cols = [c for c in (columns or small_df.columns) if c != on]
    lookup = small_df.set_index(on)[cols]
    ref = ray.put(lookup)

    def join_batch(batch: pa.Table) -> pa.Table:
        lk: pd.DataFrame = ray.get(ref)
        keys = batch[on].to_pandas()
        idx = lk.index.get_indexer(keys)
        hit = idx >= 0
        out = batch.filter(pa.array(hit))
        taken = lk.take(idx[hit])
        for c in cols:
            out = out.append_column(c, pa.array(taken[c].to_numpy()))
        return out

    return big_ds.map_batches(join_batch, batch_format="pyarrow")


def topk_per_group(ds: "ray.data.Dataset", group_col: str, order_col: str,
                   k: int, id_col: str, num_parts: int = 32) -> pd.DataFrame:
    """Top-k rows per group by ``order_col`` desc (ties broken by ascending
    ``id_col``).  Returns (group_col, id_col, order_col, rank) with rank
    0-based.  Partial top-k inside every batch bounds the exchange."""

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([group_col, id_col, order_col])
        df = batch.select([group_col, id_col, order_col]).to_pandas()
        df = df.sort_values([group_col, order_col, id_col],
                            ascending=[True, False, True])
        df = df.groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(batch: pa.Table) -> pa.Table:
        cols = {group_col: pa.array([], batch.schema.field(group_col).type),
                id_col: pa.array([], pa.int64()),
                order_col: pa.array([], batch.schema.field(order_col).type),
                "rank": pa.array([], pa.int64())}
        if batch.num_rows == 0:
            return pa.table(cols)
        df = batch.to_pandas()
        df = df.sort_values([group_col, order_col, id_col],
                            ascending=[True, False, True])
        df = df.groupby(group_col, sort=False).head(k).copy()
        df["rank"] = df.groupby(group_col, sort=False).cumcount()
        df["rank"] = df["rank"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (hash_partition(
                ds.map_batches(partial_topk, batch_format="pyarrow"),
                [group_col], num_parts)
           .map_batches(final_topk, batch_format="pyarrow")
           .to_pandas())
    return (out.sort_values([group_col, "rank"])
               .reset_index(drop=True))
