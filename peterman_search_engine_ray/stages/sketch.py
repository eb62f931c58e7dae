"""Mergeable heavy-hitters summaries: bounded-memory top-k frequent terms.

The 100 TB problem: "top-k most frequent tokens" with an exact
term→count table needs a vocabulary-scale exchange (10⁸–10⁹ rows).  The
Misra–Gries summary (as a mergeable summary, Agarwal et al., *Mergeable
Summaries*, PODS'12) bounds EVERY moving part to ``m`` rows:

1. **map** — each block computes exact in-block counts (a block is
   bounded), then MG-compresses them to ``m`` counters by subtracting
   the (m+1)-th largest count and dropping non-positives.  The dropped
   mass per block is the block's undercount bound.
2. **merge** — the driver sums counter rows per term (≤ m·blocks rows,
   itself compressible in a tree at larger scale) and accumulates
   ``D = Σ block bounds``: any term absent from the merged summary has
   true count ≤ D, and every kept count undercounts by ≤ D.
3. **verify** — the candidate terms broadcast once (``ray.put``, m-scale)
   and one map-side pass counts them EXACTLY; the final top-k is
   provably the true top-k whenever the k-th exact candidate count
   exceeds D (checked — the function refuses to return an unproven
   answer rather than silently approximating).

Cf. PAPERS.md "Top-K Frequent Term Queries on Streaming Data"
(ICDE'19) for the problem setting; the reference engine has no
streaming-sketch surface (this is a training-data-suite addition, like
the HLL sketch in stages/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import _flat_raw_tokens


def mg_compress(terms: np.ndarray, counts: np.ndarray, m: int
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra–Gries compression of an exact count table to ≤ m counters:
    subtract the (m+1)-th largest count, keep positives.  Returns
    (terms, decremented counts, dropped-mass bound)."""
    if terms.size <= m:
        return terms, counts, 0
    kth = np.partition(counts, counts.size - (m + 1))[counts.size - (m + 1)]
    dec = counts - kth
    keep = dec > 0
    return terms[keep], dec[keep], int(kth)


def _mg_block(m: int):
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "bound": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        flat, _ = _flat_raw_tokens(batch["text"].to_pylist())
        if len(flat) == 0:
            return empty
        import pyarrow.compute as pc
        enc = pc.dictionary_encode(flat)
        counts = np.bincount(np.asarray(enc.indices),
                             minlength=len(enc.dictionary)).astype(np.int64)
        terms = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False),
                           dtype=object)
        t, c, b = mg_compress(terms, counts, m)
        bound = np.zeros(t.size, np.int64)
        if t.size:
            bound[0] = b
        elif b:                      # pathological: everything dropped
            return pa.table({"term": pa.array([""], pa.string()),
                             "c": pa.array([0], pa.int64()),
                             "bound": pa.array([b], pa.int64())})
        return pa.table({"term": pa.array(t, pa.string()),
                         "c": pa.array(c), "bound": pa.array(bound)})
    return fn


def top_terms_exact(docs: "ray.data.Dataset", k: int = 20, m: int = 4096
                    ) -> pd.DataFrame:
    """PROVABLY exact top-k frequent raw tokens through the MG sketch +
    one exact verification pass (see module docstring).  Raises if the
    sketch cannot prove exactness (k-th candidate count ≤ the merged
    undercount bound D) — enlarge ``m`` in that case."""
    summ = docs.map_batches(_mg_block(m), batch_format="pyarrow").to_pandas()
    if not len(summ):
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    D = int(summ["bound"].sum())
    merged = (summ[summ["term"] != ""].groupby("term", sort=False)["c"]
              .sum().sort_values(ascending=False))
    n_cand = max(k * 4, k + 8)
    cand = np.asarray(merged.head(n_cand).index, dtype=object)
    # a term outside the summary has true count <= D; a term cut at the
    # candidate boundary has true count <= its merged count + D <= the
    # boundary's merged count + D — exactness must clear BOTH
    miss_bound = D if len(merged) <= n_cand \
        else D + int(merged.iloc[n_cand - 1])
    cand_ref = ray.put(set(cand.tolist()))

    def exact_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        flat, _ = _flat_raw_tokens(batch["text"].to_pylist())
        cs = ray.get(cand_ref)
        enc = pc.dictionary_encode(flat)
        counts = np.bincount(np.asarray(enc.indices),
                             minlength=len(enc.dictionary))
        terms = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False),
                           dtype=object)
        keep = np.fromiter((t in cs for t in terms), bool, count=terms.size)
        return pa.table({"term": pa.array(terms[keep], pa.string()),
                         "n": pa.array(counts[keep].astype(np.int64))})

    exact = (docs.map_batches(exact_counts, batch_format="pyarrow")
             .to_pandas())
    agg = (exact.groupby("term", sort=False)["n"].sum().reset_index()
           .sort_values(["n", "term"], ascending=[False, True])
           .reset_index(drop=True))
    out = agg.head(k).reset_index(drop=True)
    # proven exact iff (a) the summary was lossless (nothing ever dropped:
    # it IS the full count table), or (b) the k-th exact candidate count
    # strictly exceeds every possible missed term's count
    lossless = D == 0 and len(merged) <= n_cand
    proven = lossless or (len(out) >= k
                          and int(out["n"].iloc[k - 1]) > miss_bound)
    if not proven:
        kth = int(out["n"].iloc[k - 1]) if len(out) >= k else 0
        raise ValueError(
            f"MG sketch cannot prove top-{k} exact: k-th candidate count "
            f"{kth} (of {len(out)} candidates) <= miss bound {miss_bound}; "
            f"increase m (currently {m})")
    out["n"] = out["n"].astype(np.int64)
    return out


# -- Count-Min sketch (Cormode–Muthukrishnan 2005) ------------------------

CMS_DEPTH, CMS_WIDTH = 4, 512


def cms_cells(terms, tfs: np.ndarray, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> pa.Table:
    """Occurrence-weighted Count-Min cell partials for one block of
    (term, tf) rows: the bloom double-hash positions per depth row,
    exact int64 scatter-add — ≤ depth·width rows out per block."""
    from .bloom import bit_positions
    pos = bit_positions(terms, m_bits=width, k=depth)   # (n, depth)
    rows, cells, cnts = [], [], []
    for i in range(depth):
        uk, inv = np.unique(pos[:, i].astype(np.int64), return_inverse=True)
        c = np.zeros(len(uk), np.int64)
        np.add.at(c, inv, tfs)
        rows.append(np.full(len(uk), i, np.int64))
        cells.append(uk)
        cnts.append(c)
    return pa.table({"row": pa.array(np.concatenate(rows)),
                     "cell": pa.array(np.concatenate(cells)),
                     "cnt": pa.array(np.concatenate(cnts))})


def cms_build(term_tf_ds: "ray.data.Dataset", depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, width) int64 sketch from a (term, tf) Dataset — map-side
    cell partials, constant (depth·width) driver combine.  Mergeable by
    construction: sketches of shards ADD."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"row": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return cms_cells(batch["term"].to_pylist(),
                         batch["tf"].to_numpy(), depth, width)

    parts = (term_tf_ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas())
    M = np.zeros((depth, width), np.int64)
    if len(parts):
        np.add.at(M, (parts["row"].to_numpy(np.int64),
                      parts["cell"].to_numpy(np.int64)),
                  parts["cnt"].to_numpy(np.int64))
    return M


def cms_query(M: np.ndarray, terms: list[str]) -> np.ndarray:
    """Point-frequency estimates: min over depth rows — never an
    undercount, overcounts bounded by e·N/width w.h.p."""
    from .bloom import bit_positions
    pos = bit_positions(terms, m_bits=M.shape[1], k=M.shape[0])
    return M[np.arange(M.shape[0])[None, :],
             pos.astype(np.int64)].min(axis=1).astype(np.int64)
