"""Event-stream operators: tumbling-window aggregation and sessionization.

The two streaming-window shapes a large-scale training-data pipeline needs
over an append-only event log, both expressed Ray-Data-first:

* :func:`windowed_counts` — tumbling windows are a plain derived key
  (``ts // window``), so the op is map-side partial aggregation + ONE hash
  exchange of the (key, partial) rows — never the raw events.  At 100 TB
  the shuffle volume is O(distinct (type, window)), not O(events).
* :func:`sessionize` — gap-based sessions need per-user ordered state, so
  the op hash-partitions by ``user_id`` (every user's events land wholly in
  one block) and runs a vectorized per-block sessionizer (sort + gap diff +
  boundary cumsum — numpy only, no per-row Python).  The partitioning
  assumption is the documented contract: one user's history fits one block
  (salt by time range if a user outgrows it).

Integer outputs only (counts, ids, epoch-microseconds) so the DuckDB
oracles compare exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .shuffle import hash_partition

_US_PER_HOUR = 3_600_000_000


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return pc.cast(batch[col], pa.int64()).to_numpy()


def windowed_counts(events_ds: "ray.data.Dataset",
                    window_us: int = _US_PER_HOUR,
                    num_parts: int = 32) -> pd.DataFrame:
    """Tumbling-window aggregate per (event_type, window): event count and
    min/max event_id.  Map-side partials (one row per key per batch) go
    through one hash exchange; a per-block combine finishes the reduction
    — the raw events never shuffle."""

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "win_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "min_id": pa.array([], pa.int64()),
                             "max_id": pa.array([], pa.int64())})
        win = (_ts_us(batch) // window_us) * window_us
        et = batch["event_type"].to_pandas()
        eid = batch["event_id"].to_numpy()
        df = pd.DataFrame({"event_type": et, "win_us": win, "event_id": eid})
        g = (df.groupby(["event_type", "win_us"], sort=False)["event_id"]
               .agg(n="count", min_id="min", max_id="max").reset_index())
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "win_us": pa.array(g["win_us"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "min_id": pa.array(g["min_id"].to_numpy().astype(np.int64)),
            "max_id": pa.array(g["max_id"].to_numpy().astype(np.int64))})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        g = (df.groupby(["event_type", "win_us"], sort=False)
               .agg(n=("n", "sum"), min_id=("min_id", "min"),
                    max_id=("max_id", "max")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (hash_partition(
                events_ds.select_columns(["event_id", "ts", "event_type"])
                         .map_batches(partials, batch_format="pyarrow"),
                ["event_type", "win_us"], num_parts)
           .map_batches(combine, batch_format="pyarrow")
           .to_pandas())
    for c in ("win_us", "n", "min_id", "max_id"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["event_type", "win_us"])
               .reset_index(drop=True))


def sessionize(events_ds: "ray.data.Dataset",
               gap_us: int = 30 * 60_000_000,
               num_parts: int = 32) -> pd.DataFrame:
    """Gap-based sessions per user: a new session starts at a user's first
    event or when the gap to the previous event exceeds ``gap_us``.
    Returns one row per session: (user_id, session_id, n_events, start_us,
    end_us), session_id 0-based per user in time order."""

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "session_id": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "start_us": pa.array([], pa.int64()),
                          "end_us": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        uid = batch["user_id"].to_numpy()
        tus = _ts_us(batch)
        eid = batch["event_id"].to_numpy()
        order = np.lexsort((eid, tus, uid))
        uid, tus = uid[order], tus[order]
        n = uid.size
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], tus[1:] - tus[:-1]))
        brk = new_user | (gap > gap_us)
        # session index within user: global break counter minus the user's
        # first break counter
        brk_cum = np.cumsum(brk)                     # 1-based at each row
        user_first = np.repeat(brk_cum[new_user], np.diff(
            np.append(np.flatnonzero(new_user), n)))
        sid = brk_cum - user_first
        s_start = np.flatnonzero(brk)
        s_end = np.append(s_start[1:], n)
        return pa.table({
            "user_id": pa.array(uid[s_start].astype(np.int64)),
            "session_id": pa.array(sid[s_start].astype(np.int64)),
            "n_events": pa.array((s_end - s_start).astype(np.int64)),
            "start_us": pa.array(tus[s_start].astype(np.int64)),
            "end_us": pa.array(tus[s_end - 1].astype(np.int64))})

    out = (hash_partition(
                events_ds.select_columns(["event_id", "ts", "user_id"]),
                ["user_id"], num_parts)
           .map_batches(per_block, batch_format="pyarrow")
           .to_pandas())
    return (out.sort_values(["user_id", "session_id"])
               .reset_index(drop=True))


def props_stats(events_ds: "ray.data.Dataset") -> pd.DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column per
    event (stdlib json per row — the inherent cost of schemaless payloads;
    swap in a SIMD JSON parser at scale) and aggregate the extracted
    integer field per event_type.  Map-side partials only cross the wire."""
    import json

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "sum_k": pa.array([], pa.int64()),
                             "min_k": pa.array([], pa.int64()),
                             "max_k": pa.array([], pa.int64())})
        ks = np.fromiter((int(json.loads(pr)["k"])
                          for pr in batch["props"].to_pylist()),
                         dtype=np.int64, count=batch.num_rows)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "k": ks})
        g = (df.groupby("event_type", sort=False)["k"]
               .agg(n="count", sum_k="sum", min_k="min", max_k="max")
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events_ds.select_columns(["event_type", "props"]).map_batches(
        partials, batch_format="pyarrow").to_pandas()
    out = (parts.groupby("event_type", sort=False)
           .agg(n=("n", "sum"), sum_k=("sum_k", "sum"),
                min_k=("min_k", "min"), max_k=("max_k", "max"))
           .reset_index())
    for c in ("n", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)
