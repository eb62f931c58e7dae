"""PageRank + combined web search (reference ``IcsSearchEngine``).

Reference semantics reproduced exactly (IcsSearchEngine.java:62-103,
Node.java:12-17): nodes are every id appearing in the edge list; initial
previous score 1.0; synchronous (Jacobi) iterations of

    PR(p) = (1 - d) + d * Σ_{q -> p} PR_prev(q) / outdeg(q),   d = 0.85

(no 1/N normalization, no dangling-mass redistribution — quirks kept).

Two implementations with identical output:

* :func:`pagerank_numpy` — driver-side CSR power iteration (the graph is
  metadata-scale relative to the corpus; this is the ST4 pattern).
* :func:`pagerank_ray` — per-iteration ``map_batches`` (edge → contribution,
  with the score vector broadcast via ``ray.put``) + ``groupby(dst).sum``;
  the shape that scales when the edge list outgrows one node.

At 10^10+ nodes even the broadcast score vector stops fitting; the
production path is ``graph_sharded.pagerank_sharded`` (node-sharded score
state, per-shard iteration tasks, no O(|V|) object anywhere) — the
functions here remain the conformance twins the sharded engine is tested
against.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def synth_edges(doc_ids: np.ndarray, hub_fraction: int = 7) -> pa.Table:
    """Deterministic synthetic link graph over doc_ids: two pseudo-random
    out-links per doc plus extra in-links to a hub (the 'wics' analog in the
    reference's PageRank tests) so top-by-PR is stable."""
    ids = np.sort(np.asarray(doc_ids, dtype=np.int64))
    n = ids.size
    idx = np.arange(n, dtype=np.int64)
    d1 = (idx * 7 + 3) % n
    d2 = (idx * 13 + 5) % n
    hub = (idx % hub_fraction == 1)
    src = np.concatenate([ids[idx], ids[idx], ids[idx[hub]]])
    dst = np.concatenate([ids[d1], ids[d2], np.full(hub.sum(), ids[0])])
    keep = src != dst
    return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})


def synth_edges_ds(docs_ds: "ray.data.Dataset", hub_fraction: int = 7
                   ) -> "ray.data.Dataset":
    """Distributed twin of :func:`synth_edges`: generates the identical
    edge list MAP-SIDE over the ``doc_id`` blocks — the corpus-wide id
    column never reaches the driver.  Requires DENSE doc_ids (the engine
    guarantee: ``read_webpages`` assigns dense ids from parquet footers),
    verified by an O(1) (count, min, max) aggregate; with dense ids the
    edge rule is pure per-id arithmetic (``idx = id - lo``,
    ``ids[x] = lo + x``), so generation is a zero-shuffle ``map_batches``.
    Raises loudly on non-dense ids rather than silently gathering them."""
    from ray.data.aggregate import Count, Max, Min
    ids = docs_ds.select_columns(["doc_id"])
    st = ids.aggregate(Count(), Min("doc_id"), Max("doc_id"))
    n, lo, hi = int(st["count()"]), int(st["min(doc_id)"]), \
        int(st["max(doc_id)"])
    if n == 0 or hi - lo + 1 != n:
        raise ValueError(
            f"synth_edges_ds requires dense doc_ids (got n={n}, "
            f"range [{lo},{hi}]); read_webpages-built corpora are dense")

    def edges(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].to_numpy().astype(np.int64)
        idx = i - lo
        d1 = lo + (idx * 7 + 3) % n
        d2 = lo + (idx * 13 + 5) % n
        hub = idx % hub_fraction == 1
        src = np.concatenate([i, i, i[hub]])
        dst = np.concatenate([d1, d2,
                              np.full(int(hub.sum()), lo, np.int64)])
        keep = src != dst
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    return ids.map_batches(edges, batch_format="pyarrow")


def _node_stats(edges_ds: "ray.data.Dataset"
                ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted node ids, out-degree per node) via map-side per-batch
    ``np.unique`` partials + one node-scale driver combine — no shuffle.
    Dst-only nodes appear with out-degree 0."""
    def partial(batch: pa.Table) -> pa.Table:
        sv, sc = np.unique(batch["src"].to_numpy(), return_counts=True)
        dv = np.unique(batch["dst"].to_numpy())
        return pa.table({
            "node": pa.array(np.concatenate([sv, dv]), pa.int64()),
            "deg": pa.array(np.concatenate(
                [sc.astype(np.int64), np.zeros(dv.size, np.int64)]))})
    p = edges_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(p) == 0:
        return np.array([], np.int64), np.array([], np.float64)
    nodes, inv = np.unique(p["node"].to_numpy(), return_inverse=True)
    outdeg = np.zeros(nodes.size, np.int64)
    np.add.at(outdeg, inv, p["deg"].to_numpy())
    return nodes, outdeg.astype(np.float64)


def _prep(edges: pd.DataFrame):
    nodes = np.unique(np.concatenate([edges["src"].to_numpy(),
                                      edges["dst"].to_numpy()]))
    pos = {int(v): i for i, v in enumerate(nodes)}
    src = edges["src"].map(pos).to_numpy()
    dst = edges["dst"].map(pos).to_numpy()
    outdeg = np.bincount(src, minlength=nodes.size).astype(np.float64)
    return nodes, src, dst, outdeg


def pagerank_numpy(edges: pd.DataFrame, num_iterations: int = 100,
                   damping: float = 0.85,
                   teleport_ids: np.ndarray | None = None) -> pd.DataFrame:
    """With ``teleport_ids`` this is PERSONALIZED PageRank: the teleport
    term (and the initial score) is the seed-set indicator instead of
    the all-ones vector — ``(1-d)·1[p∈S] + d·Σ``.  The default
    reproduces the reference global semantics bit-for-bit (the indicator
    is 1.0 everywhere and ``(1-d)·1.0`` is an exact float identity)."""
    nodes, src, dst, outdeg = _prep(edges)
    ind = np.ones(nodes.size) if teleport_ids is None else \
        np.isin(nodes, np.asarray(teleport_ids)).astype(np.float64)
    prev = ind.copy()
    for _ in range(num_iterations):
        contrib = prev[src] / outdeg[src]
        cur = (1 - damping) * ind + damping * np.bincount(
            dst, weights=contrib, minlength=nodes.size)
        prev = cur
    out = pd.DataFrame({"node": nodes, "score": prev})
    return out.sort_values(["score", "node"],
                           ascending=[False, True]).reset_index(drop=True)


def collapse_edges(edges_ds: "ray.data.Dataset", mod: int,
                   num_parts: int = 8) -> pd.DataFrame:
    """Distributed host-collapse of a page-level link graph: nodes map to
    ``node % mod`` (the corpus' url scheme puts page ``doc_id`` on host
    ``doc_id % 50``), collapsed self-loops drop, and parallel edges fold
    into an integer ``weight``.  Map-side partial (src, dst, count)
    aggregation bounds the exchange to O(hosts²) rows per block — the
    page-scale edge list never shuffles.  The returned weighted edge list
    is result-scale (≤ hosts²)."""
    from ..stages.shuffle import hash_partition

    def partial(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy() % mod
        d = batch["dst"].to_numpy() % mod
        keep = s != d
        s, d = s[keep], d[keep]
        key = s * mod + d
        vals, cnts = np.unique(key, return_counts=True)
        return pa.table({"src": pa.array(vals // mod, pa.int64()),
                         "dst": pa.array(vals % mod, pa.int64()),
                         "weight": pa.array(cnts.astype(np.int64))})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = (batch.to_pandas()
              .groupby(["src", "dst"], as_index=False)["weight"].sum())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (hash_partition(
               edges_ds.map_batches(partial, batch_format="pyarrow"),
               ["src", "dst"], num_parts)
           .map_batches(combine, batch_format="pyarrow")
           .to_pandas())
    for c in ("src", "dst", "weight"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def pagerank_weighted(edges: pd.DataFrame, num_iterations: int = 100,
                      damping: float = 0.85) -> pd.DataFrame:
    """:func:`pagerank_numpy` over a WEIGHTED edge list (the collapsed
    multigraph): out-degree is the weight sum and each contribution is
    weight-scaled — mathematically identical to expanding every weighted
    edge back into parallel edges (reference duplicate-edge counting)."""
    nodes = np.unique(np.concatenate([edges["src"].to_numpy(),
                                      edges["dst"].to_numpy()]))
    src = np.searchsorted(nodes, edges["src"].to_numpy())
    dst = np.searchsorted(nodes, edges["dst"].to_numpy())
    w = edges["weight"].to_numpy().astype(np.float64)
    outdeg = np.bincount(src, weights=w, minlength=nodes.size)
    safe = np.where(outdeg > 0, outdeg, 1.0)
    prev = np.ones(nodes.size)
    for _ in range(num_iterations):
        contrib = w * (prev[src] / safe[src])
        prev = (1 - damping) + damping * np.bincount(
            dst, weights=contrib, minlength=nodes.size)
    out = pd.DataFrame({"node": nodes, "score": prev})
    return out.sort_values(["score", "node"],
                           ascending=[False, True]).reset_index(drop=True)


def pagerank_ray(edges_ds: "ray.data.Dataset", num_iterations: int = 100,
                 damping: float = 0.85,
                 num_parts: int | None = None,
                 teleport_ids: np.ndarray | None = None) -> pd.DataFrame:
    """Distributed iteration with ONE shuffle total: edges hash-partition
    by ``dst`` once (every dst group wholly in one block) and materialize;
    each iteration is then a MAP-ONLY job — the weight vector broadcasts
    via ``ray.put``, each block bincounts its local dst in-flows, and the
    driver gathers ≤ |nodes| (dst, sum) rows.  The old shape shuffled per
    iteration (20 iterations = 20 ``groupby().sum`` exchanges); this does
    the exchange once and streams the rest.  Driver state is node-scale
    numpy arrays.  Output identical to pagerank_numpy (asserted in
    tests)."""
    from ..stages.shuffle import hash_partition
    nodes, outdeg = _node_stats(edges_ds)
    if nodes.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_parts = num_parts or min(16, max(4, cpus))
    parts = hash_partition(edges_ds, ["dst"], n_parts).materialize()
    nodes_ref = ray.put(nodes)                 # broadcast ONCE
    # personalization: teleport to the seed-set indicator (see
    # pagerank_numpy); the all-ones default is the global reference
    # semantics, bit-for-bit
    ind = np.ones(nodes.size, np.float64) if teleport_ids is None else \
        np.isin(nodes, np.asarray(teleport_ids)).astype(np.float64)
    prev = ind.copy()

    def contrib_fn(w_ref):
        def contrib(batch: pa.Table) -> pa.Table:
            ns = ray.get(nodes_ref)
            wv = ray.get(w_ref)
            si = np.searchsorted(ns, batch["src"].to_numpy())
            dv, inv = np.unique(batch["dst"].to_numpy(),
                                return_inverse=True)
            sums = np.bincount(inv, weights=wv[si], minlength=dv.size)
            return pa.table({"dst": pa.array(dv, pa.int64()),
                             "s": pa.array(sums, pa.float64())})
        return contrib

    safe_deg = np.where(outdeg > 0, outdeg, 1.0)
    for _ in range(num_iterations):
        w_ref = ray.put(prev / safe_deg)
        sums = (parts.map_batches(contrib_fn(w_ref),
                                  batch_format="pyarrow").to_pandas())
        incoming = np.zeros(nodes.size, np.float64)
        if len(sums):
            np.add.at(incoming,
                      np.searchsorted(nodes, sums["dst"].to_numpy()),
                      sums["s"].to_numpy())
        prev = (1 - damping) * ind + damping * incoming

    out = pd.DataFrame({"node": nodes, "score": prev})
    return out.sort_values(["score", "node"],
                           ascending=[False, True]).reset_index(drop=True)


def combined_search(reader, pr_scores: dict[int, float], keywords,
                    k: int = 10, pr_weight: float = 1.0
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Reference web search (IcsSearchEngine.java:139-163): full TF-IDF pass
    (topK=None) then combined = tfidf + w·pagerank, top-k."""
    doc_ids, tfidf = reader.tfidf_topk(keywords, None)
    if doc_ids.size == 0:
        return doc_ids, tfidf
    pr = np.array([pr_scores.get(int(d), 0.0) for d in doc_ids])
    combined = tfidf + pr_weight * pr
    order = np.lexsort((doc_ids, -combined))[:k]
    return doc_ids[order], combined[order]


def hits_numpy(edges: pd.DataFrame, iters: int = 2) -> pd.DataFrame:
    """Driver-side HITS twin of :func:`hits_ray` (tests assert identity).
    Unnormalized Kleinberg iterations: for a FIXED iteration count the
    per-step L2 normalization is a positive scalar, so skipping it
    preserves the ranking and keeps every score an exact int64."""
    src = edges["src"].to_numpy().astype(np.int64)
    dst = edges["dst"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si, di = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    h = np.ones(nodes.size, np.int64)
    a = np.zeros(nodes.size, np.int64)
    for _ in range(iters):
        a = np.zeros(nodes.size, np.int64)
        np.add.at(a, di, h[si])
        h = np.zeros(nodes.size, np.int64)
        np.add.at(h, si, a[di])
    return pd.DataFrame({"node": nodes, "authority": a, "hub": h})


def hits_ray(edges_ds: "ray.data.Dataset", iters: int = 2,
             num_parts: int | None = None) -> pd.DataFrame:
    """Distributed HITS (hubs & authorities) with the same
    partition-once shape as :func:`pagerank_ray`: edges hash-partition by
    ``dst`` and by ``src`` ONCE (one exchange each, materialized), then
    every half-step is a map-only job — the score vector broadcasts via
    ``ray.put``, each block accumulates its local to-node sums in exact
    int64 (``np.add.at``, never float bincount — web-scale authority sums
    exceed 2^53), and the driver gathers ≤ |nodes| rows.  Integer
    arithmetic throughout (see hits_numpy), so the SQL oracle is exact."""
    from ..stages.shuffle import hash_partition
    nodes, _ = _node_stats(edges_ds)
    if nodes.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "authority": pd.Series([], dtype=np.int64),
                             "hub": pd.Series([], dtype=np.int64)})
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_parts = num_parts or min(16, max(4, cpus))
    by = {"dst": hash_partition(edges_ds, ["dst"], n_parts).materialize(),
          "src": hash_partition(edges_ds, ["src"], n_parts).materialize()}
    nodes_ref = ray.put(nodes)

    def pull(from_col: str, to_col: str, w_ref):
        def fn(batch: pa.Table) -> pa.Table:
            ns, wv = ray.get(nodes_ref), ray.get(w_ref)
            fi = np.searchsorted(ns, batch[from_col].to_numpy())
            tv, inv = np.unique(batch[to_col].to_numpy(),
                                return_inverse=True)
            sums = np.zeros(tv.size, np.int64)
            np.add.at(sums, inv, wv[fi])
            return pa.table({to_col: pa.array(tv, pa.int64()),
                             "s": pa.array(sums, pa.int64())})
        return fn

    def half_step(from_col: str, to_col: str, w: np.ndarray) -> np.ndarray:
        sums = (by[to_col].map_batches(pull(from_col, to_col, ray.put(w)),
                                       batch_format="pyarrow")
                .to_pandas())
        out = np.zeros(nodes.size, np.int64)
        if len(sums):
            np.add.at(out, np.searchsorted(nodes, sums[to_col].to_numpy()),
                      sums["s"].to_numpy().astype(np.int64))
        return out

    h = np.ones(nodes.size, np.int64)
    a = np.zeros(nodes.size, np.int64)
    for _ in range(iters):
        a = half_step("src", "dst", h)      # authorities pull hub mass
        h = half_step("dst", "src", a)      # hubs pull authority mass
    return pd.DataFrame({"node": nodes, "authority": a, "hub": h})


def lpa_numpy(edges: pd.DataFrame, rounds: int = 2) -> pd.DataFrame:
    """Single-process synchronous label propagation (Raghavan'07) on the
    UNDIRECTED multigraph view: every node starts as its own label; each
    round every node adopts the most frequent neighbor label (multi-edges
    weighted, ties -> smallest label).  The distributed twin must match
    this exactly (asserted in tests)."""
    src = np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    dst = np.concatenate([edges["dst"].to_numpy(), edges["src"].to_numpy()])
    nodes = np.unique(dst)
    if nodes.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "label": pd.Series([], dtype=np.int64)})
    labels = nodes.copy()
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    for _ in range(rounds):
        lab = labels[si]
        li = np.searchsorted(nodes, lab)       # labels are node ids
        key = di * np.int64(nodes.size) + li
        uk, cnt = np.unique(key, return_counts=True)
        kd, kl = uk // nodes.size, uk % nodes.size
        # per dst: argmax count, tie -> smallest label
        order = np.lexsort((kl, -cnt, kd))
        kd, kl = kd[order], kl[order]
        first = np.concatenate(([True], kd[1:] != kd[:-1]))
        new = labels.copy()
        new[kd[first]] = nodes[kl[first]]
        labels = new
    return pd.DataFrame({"node": nodes, "label": labels})


def lpa_ray(edges_ds: "ray.data.Dataset", rounds: int = 2,
            num_parts: int | None = None) -> pd.DataFrame:
    """Distributed synchronous LPA with ONE shuffle total, the
    ``pagerank_ray`` shape: the undirected edge expansion hash-partitions
    by ``dst`` once (every dst group wholly in one block) and
    materializes; each round is then MAP-ONLY — the label vector
    broadcasts via ``ray.put``, every block computes its dst groups'
    exact weighted argmax locally (dst groups never split), and the
    driver gathers <= |nodes| (dst, label) rows.  Driver state is
    node-scale arrays, the accepted graph-serving bound (see
    pagerank_ray).  Output identical to lpa_numpy (tested)."""
    from ..stages.shuffle import hash_partition

    def und(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy()
        d = batch["dst"].to_numpy()
        return pa.table({"src": pa.array(np.concatenate([s, d]), pa.int64()),
                         "dst": pa.array(np.concatenate([d, s]), pa.int64())})

    ed = edges_ds.map_batches(und, batch_format="pyarrow")
    nodes, _ = _node_stats(ed)
    if nodes.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "label": pd.Series([], dtype=np.int64)})
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_parts = num_parts or min(16, max(4, cpus))
    parts = hash_partition(ed, ["dst"], n_parts).materialize()
    nodes_ref = ray.put(nodes)
    labels = nodes.copy()

    def step(lab_ref):
        def fn(batch: pa.Table) -> pa.Table:
            ns, lv = ray.get(nodes_ref), ray.get(lab_ref)
            si = np.searchsorted(ns, batch["src"].to_numpy())
            di = np.searchsorted(ns, batch["dst"].to_numpy())
            li = np.searchsorted(ns, lv[si])   # labels are node ids
            key = di * np.int64(ns.size) + li
            uk, cnt = np.unique(key, return_counts=True)
            kd, kl = uk // ns.size, uk % ns.size
            order = np.lexsort((kl, -cnt, kd))
            kd, kl = kd[order], kl[order]
            first = np.concatenate(([True], kd[1:] != kd[:-1]))
            return pa.table({
                "node": pa.array(ns[kd[first]], pa.int64()),
                "label": pa.array(ns[kl[first]], pa.int64())})
        return fn

    for _ in range(rounds):
        new = (parts.map_batches(step(ray.put(labels)),
                                 batch_format="pyarrow").to_pandas())
        nxt = labels.copy()
        if len(new):
            nxt[np.searchsorted(nodes, new["node"].to_numpy())] = \
                new["label"].to_numpy()
        labels = nxt
    return pd.DataFrame({"node": nodes, "label": labels})


def _pack32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a << 32) | b int64 keys, with the pack-range guard every packed
    key in this repo carries: ids outside [0, 2^32) would bleed into the
    neighbour field and silently corrupt counts — raise instead."""
    if a.size and (min(a.min(), b.min()) < 0
                   or max(a.max(), b.max()) >= (1 << 32)):
        raise ValueError("node ids must lie in [0, 2^32) for packed "
                         "edge keys; repartition/remap ids first")
    return (a << np.int64(32)) | b


def _unpack32(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return key >> np.int64(32), key & np.int64((1 << 32) - 1)


def _canon_und(edges: pd.DataFrame) -> np.ndarray:
    """Distinct undirected edges as packed (lo << 32) | hi keys."""
    s = edges["src"].to_numpy(np.int64)
    d = edges["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    return np.unique(_pack32(lo, hi))


def triangle_count_numpy(edges: pd.DataFrame) -> pd.DataFrame:
    """Exact global triangle + wedge counts of the undirected simple
    graph (dupes/direction collapsed) — the semantics the distributed
    twin must match."""
    key = _canon_und(edges)
    lo, hi = _unpack32(key)
    nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    deg = np.bincount(inv, minlength=nodes.size)
    li, hi_i = inv[:lo.size], inv[lo.size:]
    # orient each edge from the lower (deg, node) endpoint
    rank = np.lexsort((nodes, deg))
    rpos = np.empty(nodes.size, np.int64)
    rpos[rank] = np.arange(nodes.size)
    a = np.where(rpos[li] < rpos[hi_i], li, hi_i)
    b = np.where(rpos[li] < rpos[hi_i], hi_i, li)
    # adjacency by oriented source
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    starts = np.searchsorted(a, np.arange(nodes.size))
    ends = np.searchsorted(a, np.arange(nodes.size), side="right")
    eset = set(zip(a.tolist(), b.tolist()))
    tri = 0
    wedges = 0
    for u in range(nodes.size):
        nb = b[starts[u]:ends[u]]
        k = nb.size
        wedges += k * (k - 1) // 2
        for x in range(k):
            for y in range(x + 1, k):
                p, q = int(nb[x]), int(nb[y])
                if rpos[p] > rpos[q]:
                    p, q = q, p
                if (p, q) in eset:
                    tri += 1
    return pd.DataFrame({"triangles": pd.Series([tri], dtype=np.int64),
                         "wedges": pd.Series([wedges], dtype=np.int64)})


def triangle_count_ray(edges_ds: "ray.data.Dataset",
                       num_parts: int | None = None) -> pd.DataFrame:
    """Exact distributed triangle count (node-iterator with degree
    ordering, Schank'07 / Cohen's MapReduce formulation): orient every
    edge from its lower-(degree, id) endpoint so each node's out-degree
    is O(sqrt(m)); wedges (pairs of out-neighbors) are emitted from the
    src-partitioned adjacency (one keyed exchange; Σ outdeg² = O(m^1.5)
    total wedge volume, the standard bound) and meet the oriented edge
    set in a SECOND keyed exchange on the wedge endpoints — a wedge that
    coincides with an edge is a triangle.  Driver state: the node-scale
    degree/rank vectors (broadcast once, the accepted graph-serving
    bound) and the final integer sums."""
    from ..stages.shuffle import hash_partition

    def _key_table(key: np.ndarray) -> pa.Table:
        lo, hi = _unpack32(key)
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy().astype(np.int64)
        d = batch["dst"].to_numpy().astype(np.int64)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        return _key_table(np.unique(_pack32(lo, hi)))

    def dedupe(batch: pa.Table) -> pa.Table:
        return _key_table(np.unique(_pack32(batch["lo"].to_numpy(),
                                            batch["hi"].to_numpy())))

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_parts = num_parts or min(16, max(4, cpus))
    ed = (hash_partition(
              edges_ds.map_batches(canon, batch_format="pyarrow"),
              ["lo", "hi"], n_parts)
          .map_batches(dedupe, batch_format="pyarrow")).materialize()

    # node-scale degree vector: map partials + driver combine
    def degp(batch: pa.Table) -> pa.Table:
        v, c = np.unique(np.concatenate([batch["lo"].to_numpy(),
                                         batch["hi"].to_numpy()]),
                         return_counts=True)
        return pa.table({"node": pa.array(v, pa.int64()),
                         "deg": pa.array(c.astype(np.int64))})

    p = ed.map_batches(degp, batch_format="pyarrow").to_pandas()
    if not len(p):
        return pd.DataFrame({"triangles": pd.Series([0], dtype=np.int64),
                             "wedges": pd.Series([0], dtype=np.int64)})
    nodes, inv = np.unique(p["node"].to_numpy(), return_inverse=True)
    deg = np.zeros(nodes.size, np.int64)
    np.add.at(deg, inv, p["deg"].to_numpy())
    wedges_all = int((deg * (deg - 1) // 2).sum())   # Σ C(deg,2), exact
    rank = np.lexsort((nodes, deg))
    rpos = np.empty(nodes.size, np.int64)
    rpos[rank] = np.arange(nodes.size)
    nodes_ref, rpos_ref = ray.put(nodes), ray.put(rpos)

    def orient(batch: pa.Table) -> pa.Table:
        ns, rp = ray.get(nodes_ref), ray.get(rpos_ref)
        lo = batch["lo"].to_numpy()
        hi = batch["hi"].to_numpy()
        rl = rp[np.searchsorted(ns, lo)]
        rh = rp[np.searchsorted(ns, hi)]
        a = np.where(rl < rh, lo, hi)
        b = np.where(rl < rh, hi, lo)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    oriented = (hash_partition(
                    ed.map_batches(orient, batch_format="pyarrow"),
                    ["a"], n_parts)).materialize()

    def wedges_of(batch: pa.Table) -> pa.Table:
        ns, rp = ray.get(nodes_ref), ray.get(rpos_ref)
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        outs = []
        starts = np.concatenate(([0], np.flatnonzero(a[1:] != a[:-1]) + 1,
                                 [a.size]))
        for i in range(starts.size - 1):
            nb = b[starts[i]:starts[i + 1]]
            if nb.size < 2:
                continue
            x, y = np.triu_indices(nb.size, k=1)
            p_, q_ = nb[x], nb[y]
            rpp = rp[np.searchsorted(ns, p_)]
            rqq = rp[np.searchsorted(ns, q_)]
            wa = np.where(rpp < rqq, p_, q_)
            wb = np.where(rpp < rqq, q_, p_)
            outs.append(np.stack([wa, wb], axis=1))
        if not outs:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        w = np.concatenate(outs)
        return pa.table({"a": pa.array(w[:, 0], pa.int64()),
                         "b": pa.array(w[:, 1], pa.int64()),
                         "t": pa.array(np.zeros(len(w), np.int64))})

    wedges = oriented.map_batches(wedges_of, batch_format="pyarrow")
    tagged_edges = oriented.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"],
                            "t": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")

    def count_tris(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        t = batch["t"].to_numpy()
        key = _pack32(a, b)     # ids already guarded at canon time
        ekeys = np.unique(key[t == 1])
        wkeys = key[t == 0]
        tri = int(np.isin(wkeys, ekeys).sum())
        return pa.table({"tri": pa.array([tri], pa.int64()),
                         "wed": pa.array([int((t == 0).sum())], pa.int64())})

    parts = (hash_partition(wedges.union(tagged_edges), ["a", "b"], n_parts)
             .map_batches(count_tris, batch_format="pyarrow").to_pandas())
    out = pd.DataFrame({
        "triangles": pd.Series([int(parts["tri"].sum())], dtype=np.int64),
        "wedges": pd.Series([int(parts["wed"].sum())], dtype=np.int64)})
    out.attrs["wedges_all"] = wedges_all   # Σ C(deg,2) for clustering coeff
    return out


def bfs_levels_ray(edges_ds: "ray.data.Dataset", source: int,
                   max_level: int = 3,
                   num_parts: int | None = None) -> pd.DataFrame:
    """Directed BFS from ``source``: (level, n_nodes) for levels
    0..max_level.  Partition-once traversal: edges hash-partition by
    ``src`` a single time; each round broadcasts the frontier id array
    via ``ray.put`` and every block emits the out-neighbors of its local
    frontier edges — one map-only job per level, no per-round shuffle.
    Driver state is the visited id array (node-scale, the accepted
    graph-serving bound)."""
    from ..stages.shuffle import hash_partition
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    n_parts = num_parts or min(16, max(4, cpus))
    parts = hash_partition(edges_ds, ["src"], n_parts).materialize()

    visited = np.array([source], dtype=np.int64)
    frontier = visited.copy()
    rows = [{"level": 0, "n_nodes": 1}]
    for lvl in range(1, max_level + 1):
        fref = ray.put(frontier)

        def step(batch: pa.Table) -> pa.Table:
            f = ray.get(fref)
            m = np.isin(batch["src"].to_numpy(), f)
            return pa.table({"dst": pa.array(
                np.unique(batch["dst"].to_numpy()[m]), pa.int64())})

        nxt = parts.map_batches(step, batch_format="pyarrow").to_pandas()
        cand = (np.unique(nxt["dst"].to_numpy(np.int64))
                if len(nxt) else np.empty(0, np.int64))
        frontier = cand[~np.isin(cand, visited)]
        if frontier.size == 0:
            break
        visited = np.union1d(visited, frontier)
        rows.append({"level": lvl, "n_nodes": int(frontier.size)})
    out = pd.DataFrame(rows, columns=["level", "n_nodes"])
    return out.astype({"level": np.int64, "n_nodes": np.int64})
