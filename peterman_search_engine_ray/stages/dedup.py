"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the part that matters at 100 TB):

* **exact**: content hash inside ``map_batches`` then ONE
  ``groupby(hash).min(doc_id)`` — partial aggregation happens inside Ray's
  sort-based aggregate; no full-row shuffle (only hash+doc_id leave the map
  stage).
* **n-gram Jaccard** is the *exact* verifier, quadratic in per-shingle group
  size — fine for tests/oracles, wrong tool at 100 TB (a "the quick brown"
  shingle shared by 10^8 docs would explode); at scale use **MinHash+LSH**:
  per-doc signatures in ``map_batches`` (vectorized universal hashing),
  explode to (band, band_hash) keys, one groupby emits candidate pairs whose
  expected count is tuned by (bands, rows) — then exact-verify only the
  candidates.
* **SimHash** blocks by 16-bit sub-fingerprints (pigeonhole: hamming ≤ 3 →
  some block equal) — 4 small groupbys instead of any pairwise work.
* All pair emitters cap per-group fan-out (``max_group``) and LOG what was
  dropped — silent truncation is worse than a visible cap.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from ..functions.textstats import raw_tokens

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _md5_batch(batch: pa.Table) -> pa.Table:
    hs = [hashlib.md5((t or "").encode()).hexdigest()
          for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "h": pa.array(hs, pa.string())})


def exact_dedup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep the smallest doc_id per identical text (md5).  Returns a
    one-column (doc_id) Dataset of survivors."""
    return (ds.map_batches(_md5_batch, batch_format="pyarrow")
              .groupby("h")
              .aggregate(Min("doc_id", alias_name="doc_id"))
              .select_columns(["doc_id"]))


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def shingle_set(text: str, k: int) -> set[str]:
    toks = raw_tokens(text)
    if len(toks) < k:
        return set(toks) if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _shingle_explode(k: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids, shingles = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for s in shingle_set(t or "", k):
                ids.append(d)
                shingles.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "s": pa.array(shingles, pa.string())})
    return fn


def ngram_jaccard_pairs(ds: "ray.data.Dataset", k: int = 2,
                        tau_num: int = 3, tau_den: int = 10,
                        max_group: int = 1000) -> pd.DataFrame:
    """Exact Jaccard near-dup pairs: jaccard(a,b) ≥ tau_num/tau_den, computed
    with pure-integer arithmetic (``inter·den ≥ num·union``) so a SQL oracle
    agrees bit-for-bit.  Returns a driver-side DataFrame (a, b) — pair sets
    are result-scale, not data-scale."""
    sh = ds.map_batches(_shingle_explode(k), batch_format="pyarrow")

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].unique())
        if docs.size > max_group:
            # visible cap: a shingle shared by this many docs is stop-shingle
            # noise for exact mode; MinHash-LSH is the scale path.
            print(f"[ngram_jaccard] dropping shingle group of {docs.size} docs")
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        a, b = zip(*combinations(docs.tolist(), 2)) if docs.size > 1 else ((), ())
        return pd.DataFrame({"a": pd.Series(a, dtype=np.int64),
                             "b": pd.Series(b, dtype=np.int64)})

    pair_counts = (sh.groupby("s")
                     .map_groups(pairs_of_group, batch_format="pandas")
                     .groupby(["a", "b"])
                     .aggregate(Count(alias_name="inter"))
                     .to_pandas())
    if pair_counts.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    sizes = (sh.groupby("doc_id").aggregate(Count(alias_name="n"))
               .to_pandas().set_index("doc_id")["n"])
    na = sizes.reindex(pair_counts["a"]).to_numpy()
    nb = sizes.reindex(pair_counts["b"]).to_numpy()
    inter = pair_counts["inter"].to_numpy()
    union = na + nb - inter
    keep = inter * tau_den >= tau_num * union
    out = pair_counts.loc[keep, ["a", "b"]].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-batch minhash signatures: vectorized universal hashing
    h_i(x) = (a_i·x + b_i) mod p over 64-bit shingle hashes."""

    def __init__(self, num_perm: int = 64, k: int = 2, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = list(shingle_set(text, self.k))
        if not sh:
            return np.full(self.num_perm, _MERSENNE, dtype=np.int64)
        x = (pd.util.hash_array(np.array(sh, dtype=object))
             % np.uint64(_MERSENNE)).astype(np.int64)
        # (num_perm, n_shingles) universal hashes via python-int modmul to
        # avoid 64-bit overflow: use object? No — split multiply mod 2^61-1
        prod = (self.a[:, None].astype(object) * x[None, :]) % _MERSENNE
        sig = ((prod + self.b[:, None]) % _MERSENNE).min(axis=1)
        return sig.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.int64())),
        })


def minhash_lsh_pairs(ds: "ray.data.Dataset", num_perm: int = 64,
                      bands: int = 16, k: int = 2, tau: float = 0.5,
                      max_group: int = 200) -> pd.DataFrame:
    """MinHash signatures → LSH banding → candidate pairs → exact-Jaccard
    verification.  Returns (a, b, jaccard) for pairs with jaccard ≥ tau."""
    rows_per_band = num_perm // bands
    sig_ds = ds.map_batches(MinHasher, fn_constructor_kwargs={
        "num_perm": num_perm, "k": k}, batch_format="pyarrow",
        concurrency=(1, 8))

    def band_explode(batch: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for d, sig in zip(batch["doc_id"].to_pylist(),
                          batch["sig"].to_pylist()):
            s = np.asarray(sig).reshape(bands, rows_per_band)
            for bi in range(bands):
                ids.append(d)
                band_ids.append(bi)
                # int tuple hash is deterministic across processes
                band_hashes.append(hash(tuple(s[bi].tolist())))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(band_ids, pa.int32()),
                         "bh": pa.array(band_hashes, pa.int64())})

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].unique())
        if docs.size < 2 or docs.size > max_group:
            if docs.size > max_group:
                print(f"[minhash_lsh] dropping bucket of {docs.size} docs")
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        a, b = zip(*combinations(docs.tolist(), 2))
        return pd.DataFrame({"a": pd.Series(a, dtype=np.int64),
                             "b": pd.Series(b, dtype=np.int64)})

    cand = (sig_ds.map_batches(band_explode, batch_format="pyarrow")
                  .groupby(["band", "bh"])
                  .map_groups(pairs_of_bucket, batch_format="pandas")
                  .to_pandas())
    if cand.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "jaccard": pd.Series([], dtype=np.float64)})
    cand = cand.drop_duplicates().astype(np.int64)
    # exact verification on the (small) candidate set
    need = set(cand["a"].tolist()) | set(cand["b"].tolist())
    texts = {}
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d in need:
                texts[d] = t or ""
    sets = {d: shingle_set(t, k) for d, t in texts.items()}
    jac = np.array([
        len(sets[a] & sets[b]) / max(1, len(sets[a] | sets[b]))
        for a, b in zip(cand["a"], cand["b"])])
    out = cand.loc[jac >= tau].copy()
    out["jaccard"] = jac[jac >= tau]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over tf-weighted token hashes."""

    def __init__(self):
        self.bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def simhash(self, text: str) -> int:
        toks = raw_tokens(text)
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks, dtype=object),
                                 return_counts=True)
        hs = pd.util.hash_array(uniq)
        bits = ((hs[:, None] & self.bit_cols[None, :]) != 0)
        votes = (counts[:, None] * np.where(bits, 1, -1)).sum(axis=0)
        return int(((votes > 0) * self.bit_cols).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.simhash(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(np.array(out, dtype=np.uint64).astype(np.int64)),
        })


def simhash_pairs(ds: "ray.data.Dataset", max_dist: int = 3,
                  max_group: int = 500) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_dist via 16-bit-block
    pigeonhole blocking (4 groupbys, no pairwise scan)."""
    sh = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))

    def block_explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy()
        blk_ids, blks, docs, full = [], [], [], []
        for b in range(4):
            sub = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            blk_ids.extend([b] * len(ids))
            blks.extend(sub.tolist())
            docs.extend(ids.tolist())
            full.extend(h.astype(np.int64).tolist())
        return pa.table({"block": pa.array(blk_ids, pa.int32()),
                         "sub": pa.array(blks, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "simhash": pa.array(full, pa.int64())})

    def pairs_of_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > max_group:
            if len(g) > max_group:
                print(f"[simhash] dropping block of {len(g)} docs")
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("a", "b", "ha", "hb")})
        recs = list(zip(g["doc_id"], g["simhash"]))
        rows = [(a, b, ha, hb) for (a, ha), (b, hb) in combinations(recs, 2)]
        a, b, ha, hb = zip(*rows)
        return pd.DataFrame({"a": a, "b": b, "ha": ha, "hb": hb})

    cand = (sh.map_batches(block_explode, batch_format="pyarrow")
              .groupby(["block", "sub"])
              .map_groups(pairs_of_block, batch_format="pandas")
              .to_pandas())
    if cand.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    cand = cand.drop_duplicates(["a", "b"])
    x = cand["ha"].to_numpy().astype(np.uint64) ^ cand["hb"].to_numpy().astype(np.uint64)
    dist = np.array([bin(v).count("1") for v in x])
    out = cand.loc[dist <= max_dist, ["a", "b"]].astype(np.int64)
    out["dist"] = dist[dist <= max_dist]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(emb_ds: "ray.data.Dataset", tau: float = 0.9,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> pd.DataFrame:
    """Pairs with cosine ≥ tau.  The full embedding matrix is broadcast once
    (``ray.put``) and each batch computes a (batch × all) cosine block — no
    shuffle join; at 10^12-scale swap the broadcast side for LSH buckets
    (see similarity.LshAnnIndex)."""
    import ray as _ray
    all_tbl = emb_ds.select_columns([id_col, emb_col]).to_pandas()
    ids = all_tbl[id_col].to_numpy()
    M = np.stack(all_tbl[emb_col].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    ref = _ray.put((ids, M))

    def block(batch: pa.Table) -> pa.Table:
        bids = batch[id_col].to_numpy()
        B = np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
        aids, Mn = _ray.get(ref)
        cos = B @ Mn.T
        ii, jj = np.nonzero(cos >= tau)
        a = bids[ii]
        b = aids[jj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    out = (emb_ds.select_columns([id_col, emb_col])
                 .map_batches(block, batch_format="pyarrow")
                 .to_pandas())
    return out.sort_values(["a", "b"]).reset_index(drop=True)
