"""Node-sharded graph iteration: PageRank / LPA / HITS / BFS with NO
driver-side node-scale state and NO O(|V|) broadcast per iteration.

The `pagerank_ray` family (pagerank.py) does the exchange once and then
runs map-only iterations — but every iteration `ray.put`s the full
node-score vector and the driver folds node-scale partials.  That vector
is the one structure that does not shard at 10^10+ nodes (VERDICT r4
flag #1).  This module removes it:

* Nodes partition by ``node % R`` (dense doc_ids → perfectly balanced);
  shard ``j`` owns ``nodes_j`` (sorted), its out-degrees, and its score
  slice — each an O(|V|/R) object living in the OBJECT STORE, never on
  the driver.
* Edges partition by ``shard(to_col)`` into R blocks ALIGNED with the
  score shards: block ``j`` holds every edge whose destination lives in
  shard ``j``, pre-sorted by source shard with source-local indices
  resolved at build time — so one task per shard computes that shard's
  ENTIRE next score slice (no cross-task combine).
* An iteration is R Ray tasks; task ``j`` takes the score-shard refs its
  sources touch (plasma shared-memory reads, zero-copy on-node) and
  returns the new shard as a task output.  The driver only juggles
  2R object refs and per-level integer counts.
* Results leave as per-shard top-k partials (R×k rows on the driver) or,
  for metadata-scale graphs that need the full map (websearch's
  tfidf+PR join), an explicit full gather.

Reference semantics preserved exactly: IcsSearchEngine.java:62-103
(init 1.0, ``(1-d) + d·Σ PR/outdeg``, no normalization, no dangling
redistribution); the numpy twins in pagerank.py stay the conformance
oracles (tests assert identity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_MASK32 = np.int64((1 << 32) - 1)


def _guard32(a: np.ndarray, what: str) -> None:
    if a.size and (a.min() < 0 or a.max() >= (1 << 32)):
        raise ValueError(f"{what} must lie in [0, 2^32) for packed keys")


def _n_parts(num_parts: int | None) -> int:
    if num_parts:
        return int(num_parts)
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return min(16, max(4, cpus))


# --------------------------------------------------------------------------
# topology build: edge blocks by destination shard + per-shard node state
# --------------------------------------------------------------------------

@ray.remote
def _split_block(tbl: pa.Table, from_col: str, to_col: str, R: int,
                 undirected: bool):
    """Route one edge block: R edge sub-tables by shard(to) followed by
    R (node, from-degree) stat partials by shard(node) — 2R returns, so
    each downstream shard build fetches ONLY its own slices."""
    fr = tbl[from_col].to_numpy().astype(np.int64)
    to = tbl[to_col].to_numpy().astype(np.int64)
    if undirected:
        fr, to = np.concatenate([fr, to]), np.concatenate([to, fr])
    _guard32(fr, "node ids")
    _guard32(to, "node ids")
    out: list = []
    tsh = to % R
    order = np.argsort(tsh, kind="stable")
    fs, ts, tshs = fr[order], to[order], tsh[order]
    bounds = np.searchsorted(tshs, np.arange(R + 1))
    for j in range(R):
        sl = slice(bounds[j], bounds[j + 1])
        out.append((fs[sl], ts[sl]))
    fv, fc = np.unique(fr, return_counts=True)
    tv = np.unique(to)
    nodes = np.concatenate([fv, tv])
    degs = np.concatenate([fc.astype(np.int64), np.zeros(tv.size, np.int64)])
    nsh = nodes % R
    for j in range(R):
        m = nsh == j
        out.append((nodes[m], degs[m]))
    return tuple(out)


@ray.remote
def _build_shard(j: int, R: int, n_stat: int, teleport, *parts):
    """Assemble shard ``j``: sorted nodes, out-degrees, teleport
    indicator, and its edge block sorted by source shard.  Returns
    (core_state, nodes, touched_shards, w0) — the driver reads only
    ``touched_shards`` (a tiny int list)."""
    stat = parts[:n_stat]
    eparts = parts[n_stat:]
    nv = np.concatenate([s[0] for s in stat]) if stat else \
        np.empty(0, np.int64)
    dv = np.concatenate([s[1] for s in stat]) if stat else \
        np.empty(0, np.int64)
    nodes, inv = np.unique(nv, return_inverse=True)
    outdeg = np.zeros(nodes.size, np.int64)
    np.add.at(outdeg, inv, dv)
    fr = np.concatenate([e[0] for e in eparts]) if eparts else \
        np.empty(0, np.int64)
    to = np.concatenate([e[1] for e in eparts]) if eparts else \
        np.empty(0, np.int64)
    to_local = np.searchsorted(nodes, to)
    fsh = fr % R
    order = np.argsort(fsh, kind="stable")
    fr, to_local, fsh = fr[order], to_local[order], fsh[order]
    seg = np.searchsorted(fsh, np.arange(R + 1))
    touched = [int(i) for i in range(R) if seg[i + 1] > seg[i]]
    if teleport is None:
        ind = np.ones(nodes.size, np.float64)
    else:
        ind = np.isin(nodes, np.asarray(teleport, np.int64)
                      ).astype(np.float64)
    safe = np.where(outdeg > 0, outdeg, 1).astype(np.float64)
    core = {"nodes_n": nodes.size, "fr": fr, "to_local": to_local,
            "seg": seg, "touched": touched, "ind": ind, "safe": safe,
            "outdeg": outdeg}
    return core, nodes, touched, ind / safe


@ray.remote
def _index_sources(core: dict, *nodes_list):
    """Resolve every edge's source into its owning shard's LOCAL index —
    after this, an iteration task never needs any node-id array."""
    fr, seg = core.pop("fr"), core["seg"]
    fr_idx = np.empty(fr.size, np.int64)
    for pos, i in enumerate(core["touched"]):
        sl = slice(seg[i], seg[i + 1])
        fr_idx[sl] = np.searchsorted(nodes_list[pos], fr[sl])
    core["fr_idx"] = fr_idx
    return core


class ShardedTopology:
    """Per-shard graph state held entirely as object refs.

    ``states[j]`` / ``nodes[j]`` are ObjectRefs; ``touched[j]`` is the
    (tiny, driver-held) list of source shards whose score slices task
    ``j`` must read.  ``w0[j]`` is the PageRank-ready ``ind/outdeg``
    initial weight shard."""

    def __init__(self, edges_ds: "ray.data.Dataset", from_col: str,
                 to_col: str, R: int, teleport=None,
                 undirected: bool = False):
        self.R = R
        blocks = edges_ds.to_arrow_refs()
        splits = [_split_block.options(num_returns=2 * R).remote(
            b, from_col, to_col, R, undirected) for b in blocks]
        tele = None if teleport is None else \
            np.asarray(teleport, np.int64)
        builds = []
        for j in range(R):
            eparts = [s[j] for s in splits]
            stat = [s[R + j] for s in splits]
            builds.append(_build_shard.options(num_returns=4).remote(
                j, R, len(stat), tele, *stat, *eparts))
        self.nodes = [b[1] for b in builds]
        self.touched = ray.get([b[2] for b in builds])
        self.states = [
            _index_sources.remote(
                builds[j][0], *[self.nodes[i] for i in self.touched[j]])
            for j in range(R)]
        self.w0 = [b[3] for b in builds]


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------

@ray.remote
def _pr_step(core: dict, damping: float, *w_list):
    w = np.empty(core["fr_idx"].size, np.float64)
    seg = core["seg"]
    for pos, i in enumerate(core["touched"]):
        sl = slice(seg[i], seg[i + 1])
        w[sl] = w_list[pos][core["fr_idx"][sl]]
    incoming = np.bincount(core["to_local"], weights=w,
                           minlength=core["nodes_n"])
    new = (1 - damping) * core["ind"] + damping * incoming
    return new, new / core["safe"]


@ray.remote
def _topk_scores(nodes: np.ndarray, scores: np.ndarray, k: int,
                 round_dp: int | None):
    s = scores.round(round_dp) if round_dp is not None else scores
    order = np.lexsort((nodes, -s))[:k]
    return nodes[order], s[order]


def pagerank_sharded(edges_ds: "ray.data.Dataset",
                     num_iterations: int = 100, damping: float = 0.85,
                     num_parts: int | None = None, teleport_ids=None,
                     k: int | None = None, round_dp: int | None = 9,
                     stats: dict | None = None) -> pd.DataFrame:
    """Reference-semantics PageRank with sharded score state: each
    iteration is R tasks, each producing one O(|V|/R) score shard; the
    driver holds only object refs.  With ``k`` the result is the exact
    global top-k (per-shard top-k partials, R·k driver rows, scores
    rounded to ``round_dp`` BEFORE ranking — the oracle's ULP
    discipline); without ``k`` the full frame gathers (metadata-scale
    graphs only, e.g. websearch's tfidf+PR join).  Identical output to
    pagerank_numpy (tested)."""
    R = _n_parts(num_parts)
    topo = ShardedTopology(edges_ds, "src", "dst", R,
                           teleport=teleport_ids)
    w = topo.w0
    for _ in range(num_iterations):
        outs = [_pr_step.options(num_returns=2).remote(
            topo.states[j], damping, *[w[i] for i in topo.touched[j]])
            for j in range(R)]
        scores = [o[0] for o in outs]
        w = [o[1] for o in outs]
    if stats is not None:
        sizes = ray.get([_shard_size.remote(n) for n in topo.nodes])
        stats.update(n_shards=R, max_shard_nodes=max(sizes),
                     total_nodes=sum(sizes))
    if k is not None:
        parts = ray.get([_topk_scores.remote(topo.nodes[j], scores[j], k,
                                             round_dp)
                         for j in range(R)])
        n = np.concatenate([p[0] for p in parts])
        s = np.concatenate([p[1] for p in parts])
        if stats is not None:
            stats["driver_rows_gathered"] = int(n.size)
        order = np.lexsort((n, -s))[:k]
        return pd.DataFrame({"node": n[order].astype(np.int64),
                             "score": s[order]}).reset_index(drop=True)
    n = np.concatenate(ray.get(list(topo.nodes)))
    s = np.concatenate(ray.get(scores))
    out = pd.DataFrame({"node": n.astype(np.int64), "score": s})
    return out.sort_values(["score", "node"], ascending=[False, True]
                           ).reset_index(drop=True)


@ray.remote
def _shard_size(nodes: np.ndarray) -> int:
    return int(nodes.size)


# --------------------------------------------------------------------------
# LPA
# --------------------------------------------------------------------------

@ray.remote
def _lpa_step(core: dict, lab_self: np.ndarray, *lab_list):
    lab = np.empty(core["fr_idx"].size, np.int64)
    seg = core["seg"]
    for pos, i in enumerate(core["touched"]):
        sl = slice(seg[i], seg[i + 1])
        lab[sl] = lab_list[pos][core["fr_idx"][sl]]
    key = (core["to_local"].astype(np.int64) << np.int64(32)) | lab
    uk, cnt = np.unique(key, return_counts=True)
    kd, kl = uk >> np.int64(32), uk & _MASK32
    order = np.lexsort((kl, -cnt, kd))
    kd, kl = kd[order], kl[order]
    first = np.concatenate(([True], kd[1:] != kd[:-1])) if kd.size else \
        np.empty(0, bool)
    new = lab_self.copy()
    new[kd[first]] = kl[first]
    return new


@ray.remote
def _label_count_partials(labels: np.ndarray, R: int):
    v, c = np.unique(labels, return_counts=True)
    sh = v % R
    return tuple((v[sh == j], c[sh == j].astype(np.int64))
                 for j in range(R))


@ray.remote
def _combine_label_counts(k: int, *parts):
    v = np.concatenate([p[0] for p in parts])
    c = np.concatenate([p[1] for p in parts])
    lab, inv = np.unique(v, return_inverse=True)
    tot = np.zeros(lab.size, np.int64)
    np.add.at(tot, inv, c)
    order = np.lexsort((lab, -tot))[:k]
    return lab[order], tot[order]


def lpa_sharded(edges_ds: "ray.data.Dataset", rounds: int = 2,
                num_parts: int | None = None,
                community_k: int | None = None) -> pd.DataFrame:
    """Synchronous LPA (Raghavan'07, multi-edge-weighted argmax, tie →
    smallest label) with sharded label state.  Each round is R tasks;
    labels never visit the driver.  With ``community_k`` the result is
    the top-k communities by size via a label-keyed partial-count
    exchange (labels own their counts wholly per shard, so per-shard
    top-k partials merge exactly); otherwise the full (node, label)
    frame gathers.  Identical to lpa_numpy (tested)."""
    R = _n_parts(num_parts)
    topo = ShardedTopology(edges_ds, "src", "dst", R, undirected=True)
    labels = list(topo.nodes)          # every node starts as its own label
    for _ in range(rounds):
        labels = [_lpa_step.remote(
            topo.states[j], labels[j],
            *[labels[i] for i in topo.touched[j]]) for j in range(R)]
    if community_k is not None:
        parts = [_label_count_partials.options(num_returns=R).remote(
            labels[j], R) for j in range(R)]
        combined = ray.get([
            _combine_label_counts.remote(
                community_k, *[parts[i][j] for i in range(R)])
            for j in range(R)])
        v = np.concatenate([c[0] for c in combined])
        t = np.concatenate([c[1] for c in combined])
        order = np.lexsort((v, -t))[:community_k]
        return pd.DataFrame({"community": v[order].astype(np.int64),
                             "size": t[order].astype(np.int64)})
    n = np.concatenate(ray.get(list(topo.nodes)))
    lab = np.concatenate(ray.get(labels))
    order = np.argsort(n)
    return pd.DataFrame({"node": n[order].astype(np.int64),
                         "label": lab[order].astype(np.int64)})


# --------------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------------

@ray.remote
def _pull_int(core: dict, *w_list):
    w = np.empty(core["fr_idx"].size, np.int64)
    seg = core["seg"]
    for pos, i in enumerate(core["touched"]):
        sl = slice(seg[i], seg[i + 1])
        w[sl] = w_list[pos][core["fr_idx"][sl]]
    out = np.zeros(core["nodes_n"], np.int64)
    np.add.at(out, core["to_local"], w)      # exact int64, never float
    return out


@ray.remote
def _ones_like(nodes: np.ndarray) -> np.ndarray:
    return np.ones(nodes.size, np.int64)


@ray.remote
def _topk_hits(nodes, a, h, k: int):
    order = np.lexsort((nodes, -a))[:k]
    return nodes[order], a[order], h[order]


def hits_sharded(edges_ds: "ray.data.Dataset", iters: int = 2,
                 num_parts: int | None = None,
                 k: int | None = None) -> pd.DataFrame:
    """Unnormalized Kleinberg HITS with sharded hub/authority state:
    two aligned topologies (by dst for the authority pull, by src for
    the hub pull) share one node partitioning, each half-step is R
    integer-exact tasks.  With ``k``: top-k by (authority desc, node
    asc) via per-shard partials.  Identical to hits_numpy (tested)."""
    R = _n_parts(num_parts)
    fwd = ShardedTopology(edges_ds, "src", "dst", R)
    rev = ShardedTopology(edges_ds, "dst", "src", R)
    h = [_ones_like.remote(n) for n in fwd.nodes]
    a = [None] * R
    for _ in range(iters):
        a = [_pull_int.remote(fwd.states[j],
                              *[h[i] for i in fwd.touched[j]])
             for j in range(R)]
        h = [_pull_int.remote(rev.states[j],
                              *[a[i] for i in rev.touched[j]])
             for j in range(R)]
    if k is not None:
        parts = ray.get([_topk_hits.remote(fwd.nodes[j], a[j], h[j], k)
                         for j in range(R)])
        n = np.concatenate([p[0] for p in parts])
        av = np.concatenate([p[1] for p in parts])
        hv = np.concatenate([p[2] for p in parts])
        order = np.lexsort((n, -av))[:k]
        return pd.DataFrame({"node": n[order].astype(np.int64),
                             "authority": av[order].astype(np.int64),
                             "hub": hv[order].astype(np.int64)})
    n = np.concatenate(ray.get(list(fwd.nodes)))
    av = np.concatenate(ray.get(a))
    hv = np.concatenate(ray.get(h))
    order = np.argsort(n)
    return pd.DataFrame({"node": n[order].astype(np.int64),
                         "authority": av[order].astype(np.int64),
                         "hub": hv[order].astype(np.int64)})


# --------------------------------------------------------------------------
# BFS
# --------------------------------------------------------------------------

@ray.remote
def _bfs_init(nodes: np.ndarray, source: int):
    f = nodes == source
    return f, f.copy()


@ray.remote
def _bfs_expand(core: dict, frontier: np.ndarray, R: int):
    """Emit the out-neighbors of this src-shard's frontier as LOCAL
    indices into each destination shard (fr_idx is the dst index here:
    the topology is built with from=dst, to=src)."""
    mask = frontier[core["to_local"]]
    seg = core["seg"]
    out = [np.empty(0, np.int64)] * R
    for pos, i in enumerate(core["touched"]):
        sl = slice(seg[i], seg[i + 1])
        out[i] = np.unique(core["fr_idx"][sl][mask[sl]])
    return tuple(out)


@ray.remote
def _bfs_advance(visited: np.ndarray, *incoming):
    nf = np.zeros(visited.size, bool)
    for idx in incoming:
        nf[idx] = True
    nf &= ~visited
    return nf, visited | nf, int(nf.sum())


def bfs_sharded(edges_ds: "ray.data.Dataset", source: int,
                max_level: int = 3,
                num_parts: int | None = None) -> pd.DataFrame:
    """Directed BFS levels with sharded frontier/visited state: per
    level, R expand tasks (each over its src-shard's edges) route new
    ids as shard-local indices to R advance tasks; the driver reads one
    integer count per shard per level.  Same output as
    pagerank.bfs_levels_ray (tested)."""
    R = _n_parts(num_parts)
    # partition by shard(src): to=src (frontier lookups local),
    # from=dst (emissions pre-indexed into the dst's shard)
    topo = ShardedTopology(edges_ds, "dst", "src", R)
    init = [_bfs_init.options(num_returns=2).remote(topo.nodes[j], source)
            for j in range(R)]
    frontier = [i[0] for i in init]
    visited = [i[1] for i in init]
    rows = [{"level": 0, "n_nodes": 1}]
    for lvl in range(1, max_level + 1):
        emits = [_bfs_expand.options(num_returns=R).remote(
            topo.states[j], frontier[j], R) for j in range(R)]
        adv = [_bfs_advance.options(num_returns=3).remote(
            visited[j], *[emits[i][j] for i in range(R)])
            for j in range(R)]
        frontier = [a[0] for a in adv]
        visited = [a[1] for a in adv]
        n_new = sum(ray.get([a[2] for a in adv]))
        if n_new == 0:
            break
        rows.append({"level": lvl, "n_nodes": int(n_new)})
    out = pd.DataFrame(rows, columns=["level", "n_nodes"])
    return out.astype({"level": np.int64, "n_nodes": np.int64})
