"""Distributed duplicate-cluster resolution: connected components over a
near-dup pair list.

MinHash/SimHash banding plus exact verification produces near-dup PAIRS
(:mod:`.dedup`).  Turning pairs into disjoint duplicate CLUSTERS — so a
curation pass can keep exactly one representative per cluster — is a
connected-components problem: pairwise loser-marking under-merges chains
(``a~b, b~c`` never links ``a`` to ``c`` when the a–c pair itself fell
below threshold).

Algorithm: the alternating Large-Star / Small-Star technique for
connected components in MapReduce (Kiveris, Lattanzi, Mirrokni, Rastogi,
Vassilvitskii, *Connected Components in MapReduce and Beyond*, SoCC'14).
Each round is ONE hash exchange keyed by node plus a vectorized
per-block numpy kernel:

* **Large-Star(u)**: with ``m = min(N(u) ∪ {u})``, emit ``(v, m)`` for
  every neighbor ``v > u``.
* **Small-Star(u)**: with the same ``m``, emit ``(v, m)`` for every
  ``v ∈ N(u) ∪ {u}`` with ``v ≤ u``.

Alternating the two converges to a forest of stars, each rooted at its
component's minimum id, in O(log n) rounds for all practical graphs
(O(log² n) worst case per the paper).  Every emitted edge points
downward (``member > root``), so the fixpoint edge set IS the cluster
assignment.

Scale notes (the part that matters at 10¹² docs):

* edges only ever live in block-partitioned ``Dataset``s — the driver
  never holds a node-, edge-, or component-scale structure; per-round
  state on the driver is one O(1) fingerprint tuple.
* each round's exchange is ``hash_partition`` by node (the engine's
  standard multi-node object-store exchange); the per-block kernel is
  sort + ``minimum.reduceat`` — no per-node Python.
* rounds ``materialize()`` their (pair-scale, NOT corpus-scale) edge
  Dataset so iteration doesn't re-execute the whole lineage; this is
  the documented bounded-materialization exception (same contract as
  the pair frames in :mod:`.dedup`).

No counterpart in the reference (its dedup story ends at an empty
``deleteDocuments`` stub — ``InvertedIndex.java``); this is part of the
training-data curation suite layered on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .shuffle import hash_partition

_EMPTY_EDGES = pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
_EMPTY_ASSIGN = pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64())})


def _symmetrize(batch: pa.Table) -> pa.Table:
    """Canonical edges (a, b) → both directions (u, v) so every node sees
    its full neighborhood after the partition by u."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    return pa.table({"u": np.concatenate([a, b]),
                     "v": np.concatenate([b, a])})


def _dedup_sorted(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Sort (a, b) pairs and drop within-block duplicates (the partition
    key routes all copies of an edge into one block, so this is a full
    dedup for the same orientation)."""
    if len(a) == 0:
        return _EMPTY_EDGES
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=keep[1:])
    return pa.table({"a": a[keep], "b": b[keep]})


def _star_kernel(large: bool):
    """One star round over a block that holds every edge of its nodes
    (guaranteed by the hash partition on u)."""
    def fn(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return _EMPTY_EDGES
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        gmin = np.minimum(np.minimum.reduceat(v, starts), u[starts])
        m = np.repeat(gmin, counts)
        if large:
            mask = v > u
            out_a, out_b = v[mask], m[mask]
        else:
            mask = v < u
            out_a = np.concatenate([v[mask], u[starts]])
            out_b = np.concatenate([m[mask], gmin])
        keep = out_a != out_b          # drop self-loops (root rows)
        return _dedup_sorted(out_a[keep], out_b[keep])
    return fn


_FP_MULT_A = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 constants
_FP_MULT_B = np.uint64(0xBF58476D1CE4E5B9)


def _fp_block(batch: pa.Table) -> pa.Table:
    """Per-block partial of an order-insensitive edge-set fingerprint:
    (count, Σa, Σb, Σ mix(a,b)) with uint64 wraparound.  The driver sums
    block partials — O(blocks) rows, never the edges themselves."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (a * _FP_MULT_A) ^ (b * _FP_MULT_B)
    with np.errstate(over="ignore"):
        return pa.table({
            "cnt": pa.array([len(a)], pa.int64()),
            "sa": pa.array([int(np.sum(a, dtype=np.uint64))], pa.uint64()),
            "sb": pa.array([int(np.sum(b, dtype=np.uint64))], pa.uint64()),
            "sh": pa.array([int(np.sum(h, dtype=np.uint64))], pa.uint64())})


def _fingerprint(edges: "ray.data.Dataset") -> tuple:
    parts = edges.map_batches(_fp_block, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return (0, 0, 0, 0)
    mask = (1 << 64) - 1
    return (int(parts["cnt"].sum()),
            int(parts["sa"].astype(object).sum()) & mask,
            int(parts["sb"].astype(object).sum()) & mask,
            int(parts["sh"].astype(object).sum()) & mask)


def _assign_emit(batch: pa.Table) -> pa.Table:
    """Fixpoint star edges (member, root) → assignment rows for both the
    member and the root itself."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    return pa.table({"doc_id": np.concatenate([a, b]),
                     "cluster_id": np.concatenate([b, b])})


def _assign_min_block(batch: pa.Table) -> pa.Table:
    d = batch["doc_id"].to_numpy(zero_copy_only=False)
    c = batch["cluster_id"].to_numpy(zero_copy_only=False)
    if len(d) == 0:
        return _EMPTY_ASSIGN
    order = np.argsort(d, kind="stable")
    d, c = d[order], c[order]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    return pa.table({"doc_id": d[starts],
                     "cluster_id": np.minimum.reduceat(c, starts)})


def connected_components(pairs, num_parts: int = 16,
                         max_rounds: int = 64) -> "ray.data.Dataset":
    """Resolve near-dup pairs into duplicate clusters.

    ``pairs``: a ``Dataset`` with int64 columns (a, b), or the pandas
    frame the pair operators return (lifted into a Dataset — the input
    contract is distributed; the frame path exists for composition with
    :func:`..stages.dedup.minhash_lsh_pairs` & friends).

    Returns a ``Dataset`` of (doc_id, cluster_id): one row per node that
    appears in ≥1 pair, ``cluster_id`` = the minimum doc_id of its
    connected component.  Singletons (docs in no pair) are by definition
    their own cluster and are not emitted.  A curation pass keeps
    ``doc_id == cluster_id`` rows plus all singletons.
    """
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return ray.data.from_arrow(_EMPTY_ASSIGN)
        pairs = ray.data.from_pandas(
            pairs[["a", "b"]].astype(np.int64).reset_index(drop=True))
    edges = pairs.select_columns(["a", "b"]) \
        .map_batches(lambda t: t.filter(pa.compute.not_equal(t["a"], t["b"])),
                     batch_format="pyarrow")
    prev_fp, stable = None, 0
    for rnd in range(max_rounds):
        edges = (hash_partition(edges.map_batches(
                     _symmetrize, batch_format="pyarrow"),
                     ["u"], num_parts)
                 .map_batches(_star_kernel(large=(rnd % 2 == 0)),
                              batch_format="pyarrow")
                 .materialize())
        fp = _fingerprint(edges)
        # converged only when BOTH a large and a small round leave the
        # edge set unchanged (a single unchanged round can be a fixpoint
        # of one transform but not the other)
        stable = stable + 1 if fp == prev_fp else 0
        prev_fp = fp
        if stable >= 2 or fp[0] == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"(edge fingerprint still changing: {prev_fp})")
    assign = edges.map_batches(_assign_emit, batch_format="pyarrow")
    return (hash_partition(assign, ["doc_id"], num_parts)
            .map_batches(_assign_min_block, batch_format="pyarrow"))
