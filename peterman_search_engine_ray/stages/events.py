"""Event-stream operators: tumbling-window aggregation and sessionization.

The two streaming-window shapes a large-scale training-data pipeline needs
over an append-only event log, both expressed Ray-Data-first:

* :func:`windowed_counts` — tumbling windows are a plain derived key
  (``ts // window``), so the op is map-side partial aggregation + ONE hash
  exchange of the (key, partial) rows — never the raw events.  At 100 TB
  the shuffle volume is O(distinct (type, window)), not O(events).
* :func:`sessionize` — gap-based sessions need per-user ordered state.
  The exchange key is ``(user_id, time slice)`` — the skew valve: a bot
  user whose history outgrows one block splits across slices, each slice
  sessionizes vectorized (sort + gap diff + boundary cumsum — numpy only),
  and a second session-rows-only exchange per user merges boundary
  sessions and renumbers.  No block ever needs more than one slice of one
  user's EVENTS; the per-user phase holds only session summaries.

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


def windowed_unique_users(events_ds: "ray.data.Dataset",
                          window_us: int = _US_PER_HOUR,
                          num_parts: int = 32) -> pd.DataFrame:
    """EXACT distinct users per tumbling window (the precise companion to
    the HLL sketch).  Map-side (window, user) pair dedupe bounds each
    batch's output to its distinct pairs; ONE hash exchange keyed by the
    pair routes every copy of a pair to one block, so a per-block unique
    is the global dedupe; per-block per-window counts (≤ windows rows per
    block) are summed on the driver — windows are result-scale, users and
    events never are."""

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"win_us": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        win = (_ts_us(batch) // window_us) * window_us
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([win, uid], axis=1), axis=0)
        return pa.table({"win_us": pa.array(uniq[:, 0]),
                         "user_id": pa.array(uniq[:, 1])})

    def count_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"win_us": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        key = np.stack([batch["win_us"].to_numpy(zero_copy_only=False),
                        batch["user_id"].to_numpy(zero_copy_only=False)],
                       axis=1)
        uniq = np.unique(key, axis=0)
        wins, counts = np.unique(uniq[:, 0], return_counts=True)
        return pa.table({"win_us": pa.array(wins),
                         "n_users": pa.array(counts.astype(np.int64))})

    out = (hash_partition(
                events_ds.select_columns(["ts", "user_id"])
                         .map_batches(pair_partial, batch_format="pyarrow"),
                ["win_us", "user_id"], num_parts)
           .map_batches(count_block, batch_format="pyarrow")
           .to_pandas())
    out = (out.groupby("win_us", sort=True)["n_users"].sum().reset_index())
    for c in ("win_us", "n_users"):
        out[c] = out[c].astype(np.int64)
    return out


def sessionize(events_ds: "ray.data.Dataset",
               gap_us: int = 30 * 60_000_000,
               num_parts: int = 32,
               salt_us: int = 24 * 3_600_000_000) -> pd.DataFrame:
    """Gap-based sessions per user: a new session starts at a user's first
    event or when the gap to the previous event exceeds ``gap_us``.
    Returns one row per session: (user_id, session_id, n_events, start_us,
    end_us), session_id 0-based per user in time order.

    Skew valve (the doc-range pattern from the index build): the exchange
    key is ``(user_id, ts // salt_us)`` — a pathological user (bot traffic)
    whose history outgrows one block is SPLIT across time slices, each
    slice sessionized independently with forced breaks at slice boundaries,
    then a second, session-rows-only exchange per user merges boundary
    sessions whose gap ≤ gap_us and renumbers.  Phase-2 state per block is
    O(sessions of its users), never O(events)."""

    def per_slice(batch: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "start_us": pa.array([], pa.int64()),
                          "end_us": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        uid = batch["user_id"].to_numpy()
        tus = _ts_us(batch)
        eid = batch["event_id"].to_numpy()
        slt = tus // salt_us
        order = np.lexsort((eid, tus, slt, uid))
        uid, tus, slt = uid[order], tus[order], slt[order]
        n = uid.size
        # a block may hold NON-adjacent slices of one user (slice 0 and 2
        # while slice 1 lives elsewhere), so sessions must break at every
        # slice boundary — the merge pass re-joins true adjacencies
        new_grp = np.concatenate(([True], (uid[1:] != uid[:-1])
                                  | (slt[1:] != slt[:-1])))
        gap = np.concatenate(([0], tus[1:] - tus[:-1]))
        brk = new_grp | (gap > gap_us)
        s_start = np.flatnonzero(brk)
        s_end = np.append(s_start[1:], n)
        return pa.table({
            "user_id": pa.array(uid[s_start].astype(np.int64)),
            "n_events": pa.array((s_end - s_start).astype(np.int64)),
            "start_us": pa.array(tus[s_start].astype(np.int64)),
            "end_us": pa.array(tus[s_end - 1].astype(np.int64))})

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "slt", pa.array(_ts_us(batch) // salt_us, pa.int64()))

    def merge_block(batch: pa.Table) -> pa.Table:
        """Per-user boundary merge over SESSION rows (all of one user's
        slice-sessions land in this block): consecutive disjoint sessions
        merge when the boundary gap ≤ gap_us; session_ids renumber 0-based
        per user in time order."""
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "session_id": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "start_us": pa.array([], pa.int64()),
                          "end_us": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        uid = batch["user_id"].to_numpy()
        start = batch["start_us"].to_numpy()
        end = batch["end_us"].to_numpy()
        nev = batch["n_events"].to_numpy()
        order = np.lexsort((start, uid))
        uid, start, end, nev = (uid[order], start[order], end[order],
                                nev[order])
        n = uid.size
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], start[1:] - end[:-1]))
        brk = new_user | (gap > gap_us)
        g0 = np.flatnonzero(brk)
        n_groups = g0.size
        m_uid = uid[g0]
        m_nev = np.add.reduceat(nev, g0)
        m_start = start[g0]
        m_end = np.maximum.reduceat(end, g0)
        gidx = np.arange(n_groups)
        new_user_g = np.concatenate(([True], m_uid[1:] != m_uid[:-1]))
        first = np.repeat(gidx[new_user_g], np.diff(
            np.append(np.flatnonzero(new_user_g), n_groups)))
        return pa.table({
            "user_id": pa.array(m_uid.astype(np.int64)),
            "session_id": pa.array((gidx - first).astype(np.int64)),
            "n_events": pa.array(m_nev.astype(np.int64)),
            "start_us": pa.array(m_start.astype(np.int64)),
            "end_us": pa.array(m_end.astype(np.int64))})

    slices = (hash_partition(
                  events_ds.select_columns(["event_id", "ts", "user_id"])
                           .map_batches(add_salt, batch_format="pyarrow"),
                  ["user_id", "slt"], num_parts)
              .map_batches(per_slice, batch_format="pyarrow"))
    out = (hash_partition(slices, ["user_id"], num_parts)
           .map_batches(merge_block, batch_format="pyarrow")
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


def funnel_counts(events_ds: "ray.data.Dataset",
                  steps: tuple[str, ...] = ("view", "click", "error"),
                  num_parts: int = 16) -> pd.DataFrame:
    """Ordered funnel analysis: how many users completed step i of the
    event-type sequence ``steps``, where step i counts only with an event
    STRICTLY AFTER the user's step-(i-1) completion time, chained
    greedily from each step's earliest valid occurrence (the min-ts
    recursion — the greedy-earliest chain is optimal, so this equals
    "user has any valid subsequence").

    ONE user-keyed exchange of the step events only (map-side filter to
    the funnel's event types first — at 100 TB the non-funnel events
    never move); per-block vectorized per-user chain; the driver sums
    O(steps × blocks) partial rows.  Output: (step, event_type, n_users).
    """
    step_of = {s: i for i, s in enumerate(steps)}

    def keep_steps(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array(list(steps), pa.string()))
        return batch.filter(m).select(["user_id", "ts", "event_type"])

    def chain_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"step": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        user = batch["user_id"].to_numpy().astype(np.int64)
        ts = _ts_us(batch)
        st = np.asarray([step_of[t] for t in
                         batch["event_type"].to_pylist()], np.int64)
        uid, inv = np.unique(user, return_inverse=True)
        n_u = uid.size
        prev = np.zeros(n_u, np.int64)          # completion ts of prev step
        alive = np.ones(n_u, bool)
        out_step, out_n = [], []
        for i in range(len(steps)):
            cur = np.full(n_u, np.iinfo(np.int64).max, np.int64)
            rows = np.flatnonzero(st == i)
            if rows.size:
                u = inv[rows]
                ok = alive[u] & (ts[rows] > prev[u]) if i else alive[u]
                np.minimum.at(cur, u[ok], ts[rows][ok])
            alive = alive & (cur != np.iinfo(np.int64).max)
            prev = cur
            out_step.append(i)
            out_n.append(int(alive.sum()))
        return pa.table({"step": pa.array(out_step, pa.int64()),
                         "n_users": pa.array(out_n, pa.int64())})

    partials = (hash_partition(
                    events_ds.map_batches(keep_steps,
                                          batch_format="pyarrow"),
                    ["user_id"], num_parts)
                .map_batches(chain_block, batch_format="pyarrow")
                .to_pandas())
    agg = (partials.groupby("step", sort=True)["n_users"].sum()
           if len(partials) else pd.Series(dtype=np.int64))
    return pd.DataFrame({
        "step": pd.Series(range(len(steps)), dtype=np.int64),
        "event_type": pd.Series(list(steps), dtype=object),
        "n_users": pd.Series([int(agg.get(i, 0)) for i in
                              range(len(steps))], dtype=np.int64)})


def sliding_counts(events_ds: "ray.data.Dataset",
                   window_us: int = _US_PER_HOUR,
                   hop_us: int = _US_PER_HOUR // 4,
                   num_parts: int = 32) -> pd.DataFrame:
    """Sliding (hopping) window counts per (event_type, window start):
    each event belongs to ``window_us / hop_us`` overlapping windows, so
    the map side EXPLODES the window key (a fixed small factor), then the
    exchange is the same partial-rows shape as :func:`windowed_counts` —
    still O(distinct (type, window)) rows, never the events."""
    if window_us % hop_us:
        raise ValueError("window_us must be a multiple of hop_us")
    fanout = window_us // hop_us

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "win_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ts = _ts_us(batch)
        last = (ts // hop_us) * hop_us        # latest window containing t
        starts = last[:, None] - np.arange(fanout, dtype=np.int64)[None, :] \
            * hop_us
        et = np.repeat(np.asarray(batch["event_type"].to_pylist(),
                                  dtype=object), fanout)
        df = pd.DataFrame({"event_type": et, "win_us": starts.ravel()})
        g = (df.groupby(["event_type", "win_us"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "win_us": pa.array(g["win_us"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64))})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        g = (df.groupby(["event_type", "win_us"], sort=False)["n"]
               .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (hash_partition(
                events_ds.select_columns(["ts", "event_type"])
                         .map_batches(partials, batch_format="pyarrow"),
                ["event_type", "win_us"], num_parts)
           .map_batches(combine, batch_format="pyarrow")
           .to_pandas())
    if not len(out):          # zero-row to_pandas() is columns-less
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "win_us": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    out["win_us"] = out["win_us"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["event_type", "win_us"])
               .reset_index(drop=True))


def coview_pairs(events_ds: "ray.data.Dataset", k: int = 20,
                 max_group: int = 500,
                 num_parts: int = 16) -> pd.DataFrame:
    """Item co-occurrence counts (the collaborative-filtering building
    block): top-k item pairs by the number of DISTINCT users who touched
    both, item = the ``props.k`` field.  Map-side (user, item) dedupe,
    one user-keyed exchange, the shared pair-emitter kernel per user
    group (capped + logged), one pair-keyed exchange of
    (a, b, partial-count) rows — users' raw events never pair-explode."""
    import json

    from .dedup import _sum_pairs_block, make_pair_emitter

    def user_items(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        users = batch["user_id"].to_numpy().astype(np.int64)
        items = np.fromiter((int(json.loads(pr)["k"])
                             for pr in batch["props"].to_pylist()),
                            dtype=np.int64, count=batch.num_rows)
        # the 32/32 pack is only sound inside these ranges — raise like
        # the codecs do rather than silently corrupt both fields
        if items.size and (int(items.min()) < 0
                           or int(items.max()) >= (1 << 32)
                           or int(users.max(initial=0)) >= (1 << 31)
                           or int(users.min(initial=0)) < 0):
            raise ValueError("coview pack needs 0 <= item < 2^32 and "
                             "0 <= user < 2^31")
        key = (users << 32) | items
        uniq = np.unique(key)
        return pa.table({"user_id": pa.array(uniq >> 32),
                         "doc_id": pa.array(uniq & 0xFFFFFFFF)})

    ui = (hash_partition(
              events_ds.select_columns(["user_id", "props"])
                       .map_batches(user_items, batch_format="pyarrow"),
              ["user_id"], num_parts)
          .map_batches(_dedup_user_items, batch_format="pyarrow"))
    partials = ui.map_batches(
        make_pair_emitter(["user_id"], max_group, label="coview",
                          count_col="inter_part"), batch_format="pyarrow")
    counts = (hash_partition(partials, ["a", "b"], num_parts)
              .map_batches(_sum_pairs_block, batch_format="pyarrow")
              .to_pandas())
    if counts.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("a", "b", "n")})
    counts = counts.rename(columns={"inter": "n"})
    for c in ("a", "b", "n"):
        counts[c] = counts[c].astype(np.int64)
    return (counts.sort_values(["n", "a", "b"],
                               ascending=[False, True, True])
            .head(k).reset_index(drop=True))


def _dedup_user_items(batch: pa.Table) -> pa.Table:
    """After the user-keyed exchange: global (user, item) dedupe is a
    per-block dedupe because each user lives wholly in one block."""
    if batch.num_rows == 0:
        return batch
    key = (batch["user_id"].to_numpy().astype(np.int64) << 32) \
        | batch["doc_id"].to_numpy().astype(np.int64)
    uniq = np.unique(key)
    return pa.table({"user_id": pa.array(uniq >> 32),
                     "doc_id": pa.array(uniq & 0xFFFFFFFF)})


def retention_cohorts(events_ds: "ray.data.Dataset",
                      day_us: int = 24 * _US_PER_HOUR,
                      num_parts: int = 16) -> pd.DataFrame:
    """Cohort retention: users grouped by first-activity day (cohort),
    counted per (cohort, day offset) of later activity.  Map-side
    (user, day) dedupe, ONE user-keyed exchange (a user's whole day set
    co-locates, so cohort = in-block min), per-block (cohort, offset)
    partial counts; the driver sums O(cohorts × offsets) rows."""

    def user_days(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64())})
        users = batch["user_id"].to_numpy().astype(np.int64)
        days = _ts_us(batch) // day_us
        if users.size and (int(users.min()) < 0
                           or int(users.max()) >= (1 << 43)
                           or int(days.min()) < 0
                           or int(days.max()) >= (1 << 20)):
            raise ValueError("retention pack needs 0 <= user < 2^43 and "
                             "0 <= ts-day < 2^20 (~year 4840)")
        key = (users << 20) | days
        uniq = np.unique(key)
        return pa.table({"user_id": pa.array(uniq >> 20),
                         "day": pa.array(uniq & ((1 << 20) - 1))})

    def cohort_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_day": pa.array([], pa.int64()),
                          "day_offset": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        user = batch["user_id"].to_numpy()
        day = batch["day"].to_numpy()
        # global (user, day) dedupe is per-block after the exchange
        key = (user << 20) | day
        uniq = np.unique(key)
        user, day = uniq >> 20, uniq & ((1 << 20) - 1)
        uid, inv = np.unique(user, return_inverse=True)
        cohort = np.full(uid.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, inv, day)
        pair = np.stack([cohort[inv], day - cohort[inv]], axis=1)
        up, counts = np.unique(pair, axis=0, return_counts=True)
        return pa.table({"cohort_day": pa.array(up[:, 0]),
                         "day_offset": pa.array(up[:, 1]),
                         "n_users": pa.array(counts.astype(np.int64))})

    parts = (hash_partition(
                 events_ds.select_columns(["ts", "user_id"])
                          .map_batches(user_days, batch_format="pyarrow"),
                 ["user_id"], num_parts)
             .map_batches(cohort_block, batch_format="pyarrow")
             .to_pandas())
    if not len(parts):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("cohort_day", "day_offset",
                                       "n_users")})
    out = (parts.groupby(["cohort_day", "day_offset"], sort=True)
           ["n_users"].sum().reset_index())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out
