"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the part that matters at 100 TB):

* **exact**: content hash inside ``map_batches`` then ONE keyed
  repartition of (hash, doc_id) rows + a vectorized per-block min — no
  global sort, and only hash+doc_id ever leave the map stage.
* **n-gram Jaccard** is the *exact* verifier, quadratic in per-shingle group
  size — fine for tests/oracles, wrong tool at 100 TB (a "the quick brown"
  shingle shared by 10^8 docs would explode); at scale use **MinHash+LSH**:
  per-doc signatures in ``map_batches`` (vectorized int64 universal
  hashing), explode to (band, band_hash) keys, hash-partition + vectorized
  per-block pair emission, then exact-verify ONLY the candidates —
  distributed, via a broadcast candidate id-set + map-side filter.
* **SimHash** blocks by 16-bit sub-fingerprints (pigeonhole: hamming ≤ 3 →
  some block equal) — 4 bounded blocking keys instead of any pairwise work.
* **Embedding near-dup**: exact mode is a block-nested-loop join over the
  Dataset's own block refs (no driver materialization, no full-matrix
  broadcast — the O(B²) matmul is inherent to exact all-pairs at low τ);
  the high-τ scale path is banded hyperplane LSH + candidate-only verify.
* Every pair emitter runs as hash-partition → vectorized per-block numpy
  (``make_pair_emitter``) — Ray's per-group ``map_groups`` costs ~50 ms of
  Python/pandas overhead per group and millions of tiny groups made that
  the bottleneck.  The only driver-side frames are result- or
  candidate-scale.
* All pair emitters cap per-group fan-out (``max_group``) and LOG what was
  dropped — silent truncation is worse than a visible cap.
"""

from __future__ import annotations

import hashlib


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textstats import md5_lower64_arr, raw_tokens
from .shuffle import hash_partition as _hash_partition

_MERSENNE = (1 << 61) - 1

# raw_tokens' separator set as an RE2 split pattern (textstats._TOKEN_RE
# findall ≡ split-on-separator-runs + drop empties; conformance-tested for
# the analysis twin in stages/tokenize.py)
_SEP_PATTERN = "[ \t\n\r,.;?!]+"


def _flat_raw_tokens(texts: list) -> tuple[pa.Array, np.ndarray]:
    """Batch-vectorized ``raw_tokens``: one Arrow regex split over the whole
    batch → (flat token array, doc index per token)."""
    arr = pa.array([("" if t is None else t).lower() for t in texts],
                   pa.string())
    toks = pc.split_pattern_regex(arr, _SEP_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    didx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    keepnp = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep), didx[keepnp]


def _batch_shingle_hashes(texts: list, k: int) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """(doc_idx, shingle_hash) for every doc in the batch, replicating
    ``shingle_set`` semantics (k-grams joined by " "; a doc with 0 <
    n_tokens < k contributes its individual tokens) — duplicates are NOT
    removed (min over a multiset equals min over its set, so minhash
    signatures are unchanged).  Hashes are the same
    ``pd.util.hash_array % (2³¹-1)`` the per-doc path used."""
    flat, d = _flat_raw_tokens(texts)
    n = len(flat)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cnt = np.bincount(d, minlength=len(texts))
    parts_s, parts_d = [], []
    if n >= k:
        m = n - k + 1
        valid = d[:m] == d[k - 1:]          # all k tokens in the same doc
        if valid.any():
            cols = [flat.slice(j, m) for j in range(k)]
            grams = (pc.binary_join_element_wise(*cols, " ") if k > 1
                     else cols[0])
            vmask = pa.array(valid)
            parts_s.append(grams.filter(vmask))
            parts_d.append(d[:m][valid])
    short = (cnt[d] < k) if k > 1 else np.zeros(n, bool)
    if short.any():
        parts_s.append(flat.filter(pa.array(short)))
        parts_d.append(d[short])
    if not parts_s:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    strings = np.concatenate([np.asarray(p.to_numpy(zero_copy_only=False),
                                         dtype=object) for p in parts_s])
    gdoc = np.concatenate(parts_d).astype(np.int64)
    x = (pd.util.hash_array(strings)
         % np.uint64(_MERSENNE31)).astype(np.int64)
    return gdoc, x


def make_pair_emitter(key_cols: list[str], max_group: int,
                      carry: str | None = None, label: str = "pairs",
                      count_col: str | None = None, pair_filter=None):
    """Batch fn for a hash-partitioned (complete-group) block: for every
    group of rows sharing ``key_cols``, emit all doc_id pairs (a < b), all
    numpy — the per-group Python is index arithmetic only.

    ``carry``: also emit that column's values as ca/cb per pair.
    ``count_col``: pre-combine identical pairs within the block and emit
    their multiplicity (map-side partial aggregation for the global
    pair-count groupby).
    ``pair_filter``: ObjectRef to a SORTED packed ``(a << 32) | b`` int64
    array — only those pairs survive the block (map-side restriction to a
    known candidate set; on a replicated corpus this cuts the pair
    exchange from all-pairs-per-hot-shingle scale to candidate scale)."""

    def fn(batch: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            if carry:
                cols["ca"] = pa.array([], pa.int64())
                cols["cb"] = pa.array([], pa.int64())
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)

        if batch.num_rows == 0:
            return empty()
        df = batch.select(
            list(key_cols) + ["doc_id"] + ([carry] if carry else [])
        ).to_pandas()
        if len(key_cols) == 1:
            codes, _ = pd.factorize(df[key_cols[0]], sort=False)
        else:
            codes, _ = pd.factorize(
                pd.MultiIndex.from_frame(df[list(key_cols)]), sort=False)
        order = np.argsort(codes, kind="stable")
        docs = df["doc_id"].to_numpy()[order]
        cv = df[carry].to_numpy()[order] if carry else None
        cs = codes[order]
        bounds = np.flatnonzero(np.diff(cs)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [cs.size]))
        A, B, CA, CB = [], [], [], []
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            g = e0 - s0
            if g < 2:
                continue
            if g > max_group:
                # visible cap: pathological hot group (stop-shingle noise)
                print(f"[{label}] dropping group of {g} docs")
                continue
            d = docs[s0:e0]
            o = np.argsort(d, kind="stable")
            d = d[o]
            ii, jj = np.triu_indices(g, k=1)
            A.append(d[ii])
            B.append(d[jj])
            if carry:
                c = cv[s0:e0][o]
                CA.append(c[ii])
                CB.append(c[jj])
        if not A:
            return empty()
        a = np.concatenate(A).astype(np.int64)
        b = np.concatenate(B).astype(np.int64)
        if pair_filter is not None:
            filt = ray.get(pair_filter)
            key = (a << 32) | b
            idx = np.searchsorted(filt, key)
            ok = idx < filt.size
            ok &= filt[np.minimum(idx, filt.size - 1)] == key
            a, b = a[ok], b[ok]
            if carry:
                CA = [np.concatenate(CA).astype(np.int64)[ok]]
                CB = [np.concatenate(CB).astype(np.int64)[ok]]
            if a.size == 0:
                return empty()
        if count_col:
            key = np.stack([a, b], axis=1)
            uniq, counts = np.unique(key, axis=0, return_counts=True)
            return pa.table({"a": pa.array(uniq[:, 0]),
                             "b": pa.array(uniq[:, 1]),
                             count_col: pa.array(counts.astype(np.int64))})
        cols = {"a": pa.array(a), "b": pa.array(b)}
        if carry:
            cols["ca"] = pa.array(np.concatenate(CA).astype(np.int64))
            cols["cb"] = pa.array(np.concatenate(CB).astype(np.int64))
        return pa.table(cols)

    return fn


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _md5_batch(batch: pa.Table) -> pa.Table:
    hs = [hashlib.md5((t or "").encode()).hexdigest()
          for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "h": pa.array(hs, pa.string())})


def _min_per_hash_block(batch: pa.Table) -> pa.Table:
    """Per-block min(doc_id) per hash — after the keyed repartition every
    hash lives wholly in one block, so this IS the global winner set."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    df = batch.to_pandas()
    return pa.table({"doc_id": pa.array(
        df.groupby("h", sort=False)["doc_id"].min()
          .to_numpy().astype(np.int64))})


def exact_dedup(ds: "ray.data.Dataset",
                num_parts: int = 32) -> "ray.data.Dataset":
    """Keep the smallest doc_id per identical text (md5).  Returns a
    one-column (doc_id) Dataset of survivors.  Only (hash, doc_id) rows
    shuffle — one keyed repartition, no global sort."""
    return (_hash_partition(
                ds.map_batches(_md5_batch, batch_format="pyarrow"),
                ["h"], num_parts)
            .map_batches(_min_per_hash_block, batch_format="pyarrow"))


def _losers_per_hash_block(batch: pa.Table) -> pa.Table:
    """Per-block non-min doc_ids per hash (the exact-dup LOSERS) — after
    the keyed repartition every hash lives wholly in one block.  Losers are
    RESULT-scale (only actual duplicates), unlike the corpus-scale winner
    set, so they can broadcast."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    df = batch.to_pandas()
    m = df["doc_id"] != df.groupby("h", sort=False)["doc_id"].transform("min")
    return pa.table({"doc_id": pa.array(
        df.loc[m, "doc_id"].to_numpy().astype(np.int64))})


def exact_dedup_losers(ds: "ray.data.Dataset",
                       num_parts: int = 32) -> "ray.data.Dataset":
    """Doc_ids that are NOT the smallest of their identical-text group —
    the complement of :func:`exact_dedup`, emitted directly so downstream
    anti-filters broadcast a result-scale set instead of the corpus."""
    return (_hash_partition(
                ds.map_batches(_md5_batch, batch_format="pyarrow"),
                ["h"], num_parts)
            .map_batches(_losers_per_hash_block, batch_format="pyarrow"))


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


def _sum_pairs_block(batch: pa.Table) -> pa.Table:
    """Per-block (a,b)-pair count combine — after a hash repartition on
    (a,b) each pair lives wholly in one block, so this IS the global sum."""
    if batch.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "inter": pa.array([], pa.int64())})
    a = batch["a"].to_numpy()
    b = batch["b"].to_numpy()
    c = batch["inter_part"].to_numpy()
    key = np.stack([a, b], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    sums = np.bincount(inv, weights=c).astype(np.int64)
    return pa.table({"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1]),
                     "inter": pa.array(sums)})


def _doc_shingle_counts(k: int, need_ref=None):
    """Map-side per-doc shingle-set sizes — no shuffle needed (each doc is
    one input row).  ``need_ref``: optional broadcast id array; only those
    docs' sizes are emitted (keeps the driver frame candidate-scale)."""
    def fn(batch: pa.Table) -> pa.Table:
        if need_ref is not None:
            import ray as _ray
            keep = np.isin(batch["doc_id"].to_numpy(), _ray.get(need_ref))
            batch = batch.filter(pa.array(keep))
        ids = batch["doc_id"].to_numpy()
        ns = np.fromiter((len(shingle_set(t or "", k))
                          for t in batch["text"].to_pylist()),
                         dtype=np.int64, count=len(ids))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n": pa.array(ns)})
    return fn


def ngram_jaccard_pairs(ds: "ray.data.Dataset", k: int = 2,
                        tau_num: int = 3, tau_den: int = 10,
                        max_group: int = 1000,
                        num_parts: int = 32,
                        pair_filter=None) -> pd.DataFrame:
    """Exact Jaccard near-dup pairs: jaccard(a,b) ≥ tau_num/tau_den, computed
    with pure-integer arithmetic (``inter·den ≥ num·union``) so a SQL oracle
    agrees bit-for-bit.  Returns a driver-side DataFrame (a, b) — pair sets
    are result-scale, not data-scale.

    Shuffle plan: TWO hash repartitions (by shingle, then by pair) with
    vectorized per-block combine — Ray 2.49's hash-*aggregate* operator is
    ~15× slower than its hash-shuffle operator for many small groups, so the
    combine runs as plain numpy inside ``map_batches`` instead of
    ``groupby().aggregate``."""
    sh = ds.map_batches(_shingle_explode(k), batch_format="pyarrow")
    partials = (_hash_partition(sh, ["s"], num_parts)
                .map_batches(make_pair_emitter(
                    ["s"], max_group, label="ngram_jaccard",
                    count_col="inter_part", pair_filter=pair_filter),
                    batch_format="pyarrow"))
    pair_counts = (_hash_partition(partials, ["a", "b"], num_parts)
                   .map_batches(_sum_pairs_block, batch_format="pyarrow")
                   .to_pandas())
    if pair_counts.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    # sizes only for docs that appear in some candidate pair — the driver
    # frame stays candidate-scale even when the corpus is not
    import ray as _ray
    need_ids = np.unique(pair_counts[["a", "b"]].to_numpy())
    sizes = (ds.map_batches(_doc_shingle_counts(k, _ray.put(need_ids)),
                            batch_format="pyarrow")
               .to_pandas().set_index("doc_id")["n"])
    na = sizes.reindex(pair_counts["a"]).to_numpy()
    nb = sizes.reindex(pair_counts["b"]).to_numpy()
    inter = pair_counts["inter"].to_numpy()
    union = na + nb - inter
    keep = inter * tau_den >= tau_num * union
    out = pair_counts.loc[keep, ["a", "b"]].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def ngram_containment_pairs(ds: "ray.data.Dataset", k: int = 2,
                            tau_num: int = 8, tau_den: int = 10,
                            max_group: int = 1000,
                            num_parts: int = 32) -> pd.DataFrame:
    """ASYMMETRIC containment detection (quote/boilerplate inclusion,
    Broder'97's containment coefficient): pairs where
    ``|A∩B| / |A| ≥ tau`` — doc ``inner``'s shingle set lies (mostly)
    inside doc ``container``'s.  Jaccard misses these when the container is
    much larger (a page quoting a tweet has tiny Jaccard but containment
    1).  Same two keyed exchanges as :func:`ngram_jaccard_pairs` (the
    pair set is shared work at scale); the predicate is pure-integer
    (``inter·den ≥ num·|contained|``), evaluated in BOTH directions, so
    the SQL oracle agrees bit-for-bit.  Returns (contained, container)
    rows."""
    sh = ds.map_batches(_shingle_explode(k), batch_format="pyarrow")
    partials = (_hash_partition(sh, ["s"], num_parts)
                .map_batches(make_pair_emitter(
                    ["s"], max_group, label="ngram_containment",
                    count_col="inter_part"),
                    batch_format="pyarrow"))
    pair_counts = (_hash_partition(partials, ["a", "b"], num_parts)
                   .map_batches(_sum_pairs_block, batch_format="pyarrow")
                   .to_pandas())
    empty = pd.DataFrame({"contained": pd.Series([], dtype=np.int64),
                          "container": pd.Series([], dtype=np.int64)})
    if pair_counts.empty:
        return empty
    import ray as _ray
    need_ids = np.unique(pair_counts[["a", "b"]].to_numpy())
    sizes = (ds.map_batches(_doc_shingle_counts(k, _ray.put(need_ids)),
                            batch_format="pyarrow")
               .to_pandas().set_index("doc_id")["n"])
    na = sizes.reindex(pair_counts["a"]).to_numpy()
    nb = sizes.reindex(pair_counts["b"]).to_numpy()
    inter = pair_counts["inter"].to_numpy()
    a = pair_counts["a"].to_numpy()
    b = pair_counts["b"].to_numpy()
    ab = inter * tau_den >= tau_num * na        # a contained in b
    ba = inter * tau_den >= tau_num * nb        # b contained in a
    out = pd.DataFrame({
        "contained": np.concatenate([a[ab], b[ba]]),
        "container": np.concatenate([b[ab], a[ba]])}).astype(np.int64)
    if out.empty:
        return empty
    return out.sort_values(["contained", "container"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1


class MinHasher:
    """Per-batch minhash signatures: vectorized universal hashing
    h_i(x) = (a_i·x + b_i) mod p over shingle hashes.

    p = 2³¹-1 keeps every product a·x < 2⁶² so the whole (num_perm ×
    n_shingles) hash matrix is pure int64 numpy — no Python-object bigint
    modmul (the 2⁶¹-1 variant needed object dtype and was ~100× slower)."""

    def __init__(self, num_perm: int = 64, k: int = 2, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE31, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE31, size=num_perm, dtype=np.int64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = list(shingle_set(text, self.k))
        if not sh:
            return np.full(self.num_perm, _MERSENNE31, dtype=np.int64)
        x = (pd.util.hash_array(np.array(sh, dtype=object))
             % np.uint64(_MERSENNE31)).astype(np.int64)
        prod = (self.a[:, None] * x[None, :]) % _MERSENNE31
        sig = ((prod + self.b[:, None]) % _MERSENNE31).min(axis=1)
        return sig.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized signatures: ONE regex split + ONE hash + ONE
        (num_perm × n_shingles) modmul for the whole batch, then per-doc
        column minima via ``np.minimum.reduceat`` — bit-identical to the
        per-doc :meth:`signature` (tested), with no per-doc Python."""
        n_docs = batch.num_rows
        gdoc, x = _batch_shingle_hashes(batch["text"].to_pylist(), self.k)
        sig = np.full((n_docs, self.num_perm), _MERSENNE31, dtype=np.int64)
        if x.size:
            order = np.argsort(gdoc, kind="stable")
            gdoc, x = gdoc[order], x[order]
            starts = np.flatnonzero(
                np.concatenate(([True], gdoc[1:] != gdoc[:-1])))
            # modmul once per UNIQUE shingle hash (Zipfian text repeats
            # shingles across docs), then a cheap column gather
            xu, inv = np.unique(x, return_inverse=True)
            Hu = ((self.a[:, None] * xu[None, :]) % _MERSENNE31
                  + self.b[:, None]) % _MERSENNE31
            sig[gdoc[starts]] = np.minimum.reduceat(
                Hu[:, inv], starts, axis=1).T
        offsets = np.arange(n_docs + 1, dtype=np.int32) * self.num_perm
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(sig.ravel(), pa.int64())),
        })


def minhash_lsh_pairs(ds: "ray.data.Dataset", num_perm: int = 64,
                      bands: int = 32, k: int = 2, tau_num: int = 1,
                      tau_den: int = 2, max_group: int = 200,
                      num_parts: int = 32,
                      verify_max_group: int = 4000) -> pd.DataFrame:
    """MinHash signatures → LSH banding → candidate pairs → exact-Jaccard
    verification, all distributed.

    Verification never moves the corpus to the driver: the candidate doc-id
    set (result-scale) is broadcast via ``ray.put``, a map-side filter keeps
    only candidate docs, and :func:`ngram_jaccard_pairs` computes exact
    Jaccard on that small subset.  Output = pairs with
    ``jaccard ≥ tau_num/tau_den`` (pure-integer compare, so the SQL oracle —
    the same all-pairs exact-Jaccard query as ``ngram_jaccard`` — agrees
    bit-for-bit whenever banding recall covers every true pair; bands=32 of
    2 rows ⇒ miss probability (1-J²)³² < 1e-4 at J=0.5).

    Returns (a, b) int64 columns."""
    rows_per_band = num_perm // bands
    sig_ds = ds.map_batches(MinHasher, fn_constructor_kwargs={
        "num_perm": num_perm, "k": k}, batch_format="pyarrow",
        concurrency=(1, 8))

    def band_explode(batch: pa.Table) -> pa.Table:
        """One FNV-1a fold over the (docs × bands × rows) signature tensor
        — rows_per_band iterations of uint64 ops, no per-doc Python.
        Equal band rows hash equal (what banding needs); any accidental
        collision only adds a candidate the exact verify pass rejects."""
        n_docs = batch.num_rows
        if n_docs == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "bh": pa.array([], pa.int64())})
        sig_col = batch["sig"].combine_chunks()
        S = np.asarray(sig_col.flatten()).reshape(
            n_docs, bands, rows_per_band).astype(np.uint64)
        h = np.full((n_docs, bands), 0xcbf29ce484222325, np.uint64)
        for j in range(rows_per_band):
            h = (h ^ S[:, :, j]) * np.uint64(0x100000001b3)
        return pa.table({
            "doc_id": pa.array(np.repeat(batch["doc_id"].to_numpy(), bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32),
                                     n_docs)),
            "bh": pa.array(h.ravel().astype(np.int64))})

    bands_ds = sig_ds.map_batches(band_explode, batch_format="pyarrow")
    cand = (_hash_partition(bands_ds, ["band", "bh"], num_parts)
            .map_batches(make_pair_emitter(["band", "bh"], max_group,
                                           label="minhash_lsh"),
                         batch_format="pyarrow")
            .to_pandas())
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    if cand.empty:
        return empty
    cand = cand.drop_duplicates().astype(np.int64)
    # exact verification, distributed: broadcast the candidate doc-id set
    # (result-scale), map-side filter the corpus down to candidate docs,
    # and run the exact shingle-group Jaccard over that subset only.
    need = np.unique(cand[["a", "b"]].to_numpy())
    need_ref = ray.put(need)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        ids = ray.get(need_ref)
        return batch.filter(pa.array(np.isin(batch["doc_id"].to_numpy(), ids)))

    sub = ds.map_batches(keep_candidates, batch_format="pyarrow")
    # The verify pass needs a much higher group cap than banding: a capped
    # shingle group LOSES true pairs (at 5k docs the banding cap silently
    # dropped all 256).  verify_max_group bounds the quadratic blow-up on
    # pathological duplicate-heavy corpora (run exact_dedup first for
    # those — curate_corpus does); drops are loudly logged by the emitter.
    verify_cap = max(int(verify_max_group), max_group)
    # restrict the verify's pair emission to the BANDING candidates,
    # map-side: without it a hot shingle among candidate docs re-emits
    # all-pairs (C(cap,2) per shingle — measured 34M partial rows / 28 s
    # of pair exchange on the 160×-replicated bench corpus; candidate
    # pairs are 379k).  This is also the honest LSH semantics: the output
    # is banding ∩ exact, not exact-over-candidate-docs.
    pair_ref = None
    if int(need.max(initial=0)) < (1 << 31):
        packed = np.unique((cand["a"].to_numpy() << 32)
                           | cand["b"].to_numpy())
        pair_ref = ray.put(packed)
    out = ngram_jaccard_pairs(sub, k=k, tau_num=tau_num, tau_den=tau_den,
                              max_group=verify_cap, pair_filter=pair_ref)
    return out[["a", "b"]].reset_index(drop=True) if len(out) else empty


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over tf-weighted token hashes.

    Token hashes are md5-lower-64 (``md5_number_lower`` in DuckDB), so a SQL
    oracle can recompute every simhash bit-identically and verify emitted
    pairs with ``bit_count(xor(ha, hb)) <= max_dist``."""

    def __init__(self):
        self.bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def simhash(self, text: str) -> int:
        toks = raw_tokens(text)
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks, dtype=object),
                                 return_counts=True)
        hs = md5_lower64_arr(uniq)
        bits = ((hs[:, None] & self.bit_cols[None, :]) != 0)
        votes = (counts[:, None] * np.where(bits, 1, -1)).sum(axis=0)
        return int(((votes > 0) * self.bit_cols).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized: ONE regex split, md5 once per batch-unique
        token (dictionary-encoded), per-(doc, token) counts via np.unique
        over packed keys, bit votes via one reduceat — identical simhashes
        to the per-doc :meth:`simhash` (tested)."""
        n_docs = batch.num_rows
        sim = np.zeros(n_docs, np.uint64)
        flat, d = _flat_raw_tokens(batch["text"].to_pylist())
        if len(flat):
            denc = pc.dictionary_encode(flat)
            codes = np.asarray(denc.indices).astype(np.int64)
            uniq_tokens = denc.dictionary.to_pylist()
            hs = md5_lower64_arr(uniq_tokens)          # one md5 per unique
            # per-(doc, token) multiplicities: docs and codes both < 2^31
            key = (d.astype(np.int64) << 32) | codes
            uk, cnts = np.unique(key, return_counts=True)
            ud = (uk >> 32).astype(np.int64)
            uc = (uk & 0xFFFFFFFF).astype(np.int64)
            bits = (hs[uc][:, None] & self.bit_cols[None, :]) != 0
            contrib = np.where(bits, cnts[:, None], -cnts[:, None])
            starts = np.flatnonzero(
                np.concatenate(([True], ud[1:] != ud[:-1])))
            votes = np.add.reduceat(contrib, starts, axis=0)
            sim[ud[starts]] = ((votes > 0) * self.bit_cols[None, :]).sum(
                axis=1, dtype=np.uint64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(sim.astype(np.int64)),
        })


def simhash_pairs(ds: "ray.data.Dataset", max_dist: int = 3,
                  max_group: int = 500,
                  num_parts: int = 32) -> pd.DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_dist via 16-bit-block
    pigeonhole blocking (4 groupbys, no pairwise scan)."""
    sh = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 8))

    def block_explode(batch: pa.Table) -> pa.Table:
        """np.repeat/np.tile block fan-out — no .tolist() loops."""
        h = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy()
        n = ids.size
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[:, None]
        sub = ((h[None, :] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "block": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
            "sub": pa.array(sub.ravel()),
            "doc_id": pa.array(np.tile(ids.astype(np.int64), 4)),
            "simhash": pa.array(np.tile(h.astype(np.int64), 4))})

    blocks_ds = sh.map_batches(block_explode, batch_format="pyarrow")
    cand = (_hash_partition(blocks_ds, ["block", "sub"], num_parts)
            .map_batches(make_pair_emitter(["block", "sub"], max_group,
                                           carry="simhash", label="simhash"),
                         batch_format="pyarrow")
            .to_pandas().rename(columns={"ca": "ha", "cb": "hb"}))
    if cand.empty:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    cand = cand.drop_duplicates(["a", "b"])
    x = cand["ha"].to_numpy().astype(np.uint64) ^ cand["hb"].to_numpy().astype(np.uint64)
    # vectorized popcount: 8 bytes viewed separately, LUT-free via unpackbits
    dist = np.unpackbits(np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    out = cand.loc[dist <= max_dist, ["a", "b"]].astype(np.int64)
    out["dist"] = dist[dist <= max_dist]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _block_to_mat(tbl: pa.Table, id_col: str, emb_col: str):
    ids = tbl[id_col].to_numpy().astype(np.int64)
    M = np.stack(tbl[emb_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    return ids, M


def embedding_neardup_pairs(emb_ds: "ray.data.Dataset", tau: float = 0.9,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> pd.DataFrame:
    """EXACT pairs with cosine ≥ tau, as a block-nested-loop join over the
    Dataset's own blocks: the driver holds only block ObjectRefs and the
    result pairs — no ``to_pandas()`` of the table, no full-matrix
    broadcast.  O(B²) tasks of one (block × block) matmul each; that
    quadratic is inherent to exact all-pairs at low tau — for the high-tau
    regime use :func:`embedding_neardup_lsh_pairs`, which blocks with
    banded hyperplane LSH first."""
    import ray as _ray

    @_ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pd.DataFrame:
        aid, A = _block_to_mat(ta, id_col, emb_col)
        bid, B = _block_to_mat(tb, id_col, emb_col)
        cos = A @ B.T
        ii, jj = np.nonzero(cos >= tau)
        a, b = aid[ii], bid[jj]
        if same:
            keep = a < b            # each in-block pair appears twice
            a, b = a[keep], b[keep]
        else:
            # each cross-block pair appears exactly once — canonicalize
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": a, "b": b})

    refs = emb_ds.select_columns([id_col, emb_col]).to_arrow_refs()
    futures = [block_pair.remote(refs[i], refs[j], i == j)
               for i in range(len(refs)) for j in range(i, len(refs))]
    outs = [o for o in _ray.get(futures) if len(o)]
    if not outs:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    out = pd.concat(outs, ignore_index=True).astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_neardup_lsh_pairs(emb_ds: "ray.data.Dataset", tau: float = 0.9,
                                r: int = 8, L: int = 16, seed: int = 13,
                                id_col: str = "vec_id",
                                emb_col: str = "embedding",
                                max_group: int = 1000,
                                num_parts: int = 32) -> pd.DataFrame:
    """High-tau near-dup pairs via banded hyperplane LSH: L tables of r
    hyperplane bits each; a pair is a candidate if it collides in ANY
    table (recall 1-(1-p^r)^L with p = 1-θ/π — at tau=0.9, r=8, L=16 the
    miss probability is < 1e-4).  Candidates come from the same
    hash-partition + vectorized pair emitter as MinHash; exact cosine then
    verifies only the candidate pairs (candidate-scale work)."""
    import ray as _ray
    rng = np.random.RandomState(seed)
    dim = len((emb_ds.take(1))[0][emb_col])
    planes = rng.normal(size=(L * r, dim))
    planes_ref = _ray.put(planes)
    weights = (1 << np.arange(r, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        ids, M = _block_to_mat(batch, id_col, emb_col)
        bits = (M @ _ray.get(planes_ref).T) > 0       # (n, L*r)
        buckets = bits.reshape(len(ids), L, r) @ weights
        t_idx = np.tile(np.arange(L, dtype=np.int64), len(ids))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, L)),
            "t": pa.array(t_idx),
            "bucket": pa.array(buckets.reshape(-1).astype(np.int64))})

    rows = emb_ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow")
    cand = (_hash_partition(rows, ["t", "bucket"], num_parts)
            .map_batches(make_pair_emitter(["t", "bucket"], max_group,
                                           label="emb_lsh"),
                         batch_format="pyarrow")
            .to_pandas())
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    if cand.empty:
        return empty
    cand = cand.drop_duplicates().astype(np.int64)
    # exact verify: gather only the candidate docs' vectors (candidate-scale)
    need = np.unique(cand[["a", "b"]].to_numpy())
    need_ref = _ray.put(need)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(
            np.isin(batch[id_col].to_numpy(), _ray.get(need_ref))))

    sub = (emb_ds.select_columns([id_col, emb_col])
                 .map_batches(keep, batch_format="pyarrow").to_pandas())
    ids = sub[id_col].to_numpy().astype(np.int64)
    M = np.stack(sub[emb_col].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    pos = {int(v): i for i, v in enumerate(ids)}
    ai = np.array([pos[int(x)] for x in cand["a"]])
    bi = np.array([pos[int(x)] for x in cand["b"]])
    cos = np.einsum("ij,ij->i", M[ai], M[bi])
    out = cand.loc[cos >= tau, ["a", "b"]]
    return (out.sort_values(["a", "b"]).reset_index(drop=True)
            if len(out) else empty)


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (vocabulary-size estimation at 100 TB:
# exact distinct term counting needs a full dedup shuffle; an HLL register
# bank is 2^p bytes per task and merges with an elementwise max)
# ---------------------------------------------------------------------------

class HllSketch:
    """Vectorized HyperLogLog over md5-lower-64 hashes.

    ``add_batch`` folds a token array into the 2^p register bank (numpy
    scatter-max); banks from different tasks ``merge`` by elementwise max,
    so the whole reduction is a tree of tiny fixed-size arrays — the
    map_batches → reduce shape with O(2^p) shuffle volume per task."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.reg = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, via float exponent
        # (values within 2^11 of 2^64 round UP in float64 -> clip at 0)
        lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        rank = (np.clip(lz, 0, 62) + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert other.p == self.p
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = np.sum(np.power(2.0, -self.reg.astype(np.float64)))
        e = alpha * m * m / s
        zeros = int((self.reg == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)          # linear counting regime
        return float(e)


def hll_distinct_terms(ds: "ray.data.Dataset", p: int = 12) -> float:
    """Approximate distinct-token count over (doc_id, text): one HLL bank
    per batch (map-side), elementwise-max reduced on the driver — O(2^p)
    bytes cross the wire per task regardless of corpus size."""

    def bank(batch: pa.Table) -> pa.Table:
        sk = HllSketch(p)
        toks: set[str] = set()
        for t in batch["text"].to_pylist():
            toks.update(raw_tokens(t or ""))
        if toks:
            sk.add_hashes(md5_lower64_arr(sorted(toks)))
        return pa.table({"reg": pa.array([sk.reg.tobytes()], pa.binary())})

    banks = ds.map_batches(bank, batch_format="pyarrow").to_pandas()
    total = HllSketch(p)
    for b in banks["reg"]:
        other = HllSketch(p)
        other.reg = np.frombuffer(b, dtype=np.uint8).copy()
        total.merge(other)
    return total.estimate()


# --- inter-document duplicated n-gram fraction ------------------------------

def _strict_gram_hashes(texts: list, k: int, compute_pos: bool = True
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STRICT k-grams over a batch (docs shorter than k tokens emit
    nothing — unlike shingle_set's short-doc fallback, so the SQL mirror
    is a plain generate_series window): returns (md5-lower-64 hash,
    doc index within batch, 1-based gram position within doc) — one
    entry per k-gram OCCURRENCE.  Shared by dup_ngram_stats and
    dup_spans; one md5 per batch-unique gram."""
    z = np.empty(0, np.int64)
    flat, d = _flat_raw_tokens(texts)
    n = len(flat)
    if n < k:
        return np.empty(0, np.uint64), z, z
    w = n - k + 1
    valid = d[:w] == d[k - 1:]
    if not valid.any():
        return np.empty(0, np.uint64), z, z
    cols = [flat.slice(j, w) for j in range(k)]
    grams = (pc.binary_join_element_wise(*cols, " ") if k > 1
             else cols[0]).filter(pa.array(valid))
    gd = d[:w][valid]
    strs = np.asarray(grams.to_numpy(zero_copy_only=False), dtype=object)
    uniq, inv = np.unique(strs, return_inverse=True)
    h = md5_lower64_arr(uniq)[inv]            # one md5 per UNIQUE gram
    if not compute_pos:                       # dup_ngram_stats discards it
        return h, gd.astype(np.int64), z
    starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
    first = np.zeros(len(texts), np.int64)
    first[d[starts]] = starts
    pos = np.arange(w, dtype=np.int64)[valid] - first[gd] + 1
    return h, gd.astype(np.int64), pos


def _gram_occ(k: int):
    """(doc_id, text) batch → one row per DISTINCT (doc, k-gram):
    (h, doc_id, m = multiplicity)."""
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "m": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        h, gd, _ = _strict_gram_hashes(batch["text"].to_pylist(), k,
                                       compute_pos=False)
        if h.size == 0:
            return empty
        doc = batch["doc_id"].to_numpy().astype(np.int64)[gd]
        # multiplicity per (doc, h): sort once, run-length collapse
        order = np.lexsort((h, doc))
        doc, h = doc[order], h[order]
        new = np.concatenate(([True], (doc[1:] != doc[:-1])
                              | (h[1:] != h[:-1])))
        starts = np.flatnonzero(new)
        m = np.diff(np.append(starts, doc.size))
        return pa.table({"h": pa.array(h[starts], pa.uint64()),
                         "doc_id": pa.array(doc[starts]),
                         "m": pa.array(m.astype(np.int64))})
    return fn


def _mark_dup_block(batch: pa.Table) -> pa.Table:
    """After the gram-keyed exchange every gram lives wholly in one block:
    rows-per-h IS the gram's distinct-doc count, so each row can be
    tagged dup/unique in place — no join, no second pass."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_dup": pa.array([], pa.int64())})
    h = batch["h"].to_numpy()
    m = batch["m"].to_numpy().astype(np.int64)
    doc = batch["doc_id"].to_numpy()
    order = np.argsort(h, kind="stable")
    hs = h[order]
    starts = np.concatenate(([0], np.flatnonzero(hs[1:] != hs[:-1]) + 1))
    ndocs = np.diff(np.append(starts, hs.size))
    dup = np.repeat(ndocs > 1, ndocs)          # aligned with `order`
    dup_m = np.zeros(m.size, np.int64)
    dup_m[order] = np.where(dup, m[order], 0)
    # partial per-doc sums (final doc-keyed exchange completes them)
    uid, inv = np.unique(doc, return_inverse=True)
    return pa.table({
        "doc_id": pa.array(uid.astype(np.int64)),
        "n_grams": pa.array(np.bincount(inv, weights=m).astype(np.int64)),
        "n_dup": pa.array(np.bincount(inv, weights=dup_m).astype(np.int64))})


def _sum_doc_block(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    uid, inv = np.unique(batch["doc_id"].to_numpy(), return_inverse=True)
    return pa.table({
        "doc_id": pa.array(uid.astype(np.int64)),
        "n_grams": pa.array(np.bincount(
            inv, weights=batch["n_grams"].to_numpy()).astype(np.int64)),
        "n_dup": pa.array(np.bincount(
            inv, weights=batch["n_dup"].to_numpy()).astype(np.int64))})


def dup_ngram_stats(ds: "ray.data.Dataset", k: int = 3,
                    num_parts: int = 16) -> "ray.data.Dataset":
    """Per-doc inter-document duplicated k-gram stats (the RefinedWeb /
    Gopher boilerplate signal): ``n_grams`` = the doc's k-gram
    occurrences, ``n_dup`` = occurrences whose k-gram appears in more
    than one distinct document.  Exactly TWO keyed exchanges of
    (hash, doc, count) rows — gram-keyed (where rows-per-gram is the
    distinct-doc count, so dup-tagging is free), then doc-keyed for the
    final integer sums.  Nothing corpus-scale touches the driver; the
    result is doc-scale and ships as a Dataset."""
    from .shuffle import hash_partition
    occ = ds.map_batches(_gram_occ(k), batch_format="pyarrow")
    partials = (hash_partition(occ, ["h"], num_parts)
                .map_batches(_mark_dup_block, batch_format="pyarrow"))
    return (hash_partition(partials, ["doc_id"], num_parts)
            .map_batches(_sum_doc_block, batch_format="pyarrow"))


# --- duplicated-substring spans ---------------------------------------------

def _gram_pos(k: int):
    """(doc_id, text) batch → one row per k-gram OCCURRENCE:
    (h, doc_id, g) with ``g`` the 1-based token position of the gram's
    first token (the coordinate a span edit consumes)."""
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "g": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        h, gd, pos = _strict_gram_hashes(batch["text"].to_pylist(), k)
        if h.size == 0:
            return empty
        return pa.table({"h": pa.array(h, pa.uint64()),
                         "doc_id": pa.array(
                             batch["doc_id"].to_numpy().astype(np.int64)[gd]),
                         "g": pa.array(pos)})
    return fn


def _emit_dup_rows(batch: pa.Table) -> pa.Table:
    """Gram-keyed block → only the occurrences whose gram appears in >1
    DISTINCT doc survive (result-scale: the duplicated positions)."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "g": pa.array([], pa.int64())})
    h = batch["h"].to_numpy()
    doc = batch["doc_id"].to_numpy()
    # distinct-doc count per h: collapse (h, doc) then count per h
    order = np.lexsort((doc, h))
    hs, ds_ = h[order], doc[order]
    new_pair = np.concatenate(([True], (hs[1:] != hs[:-1])
                               | (ds_[1:] != ds_[:-1])))
    ph, = (hs[new_pair],)
    hstart = np.concatenate(([0], np.flatnonzero(ph[1:] != ph[:-1]) + 1))
    ndocs = np.diff(np.append(hstart, ph.size))
    h_uniq = ph[hstart]
    dup_h = h_uniq[ndocs > 1]
    keep = np.isin(h, dup_h)
    return pa.table({"doc_id": pa.array(doc[keep].astype(np.int64)),
                     "g": pa.array(batch["g"].to_numpy()[keep]
                                   .astype(np.int64))})


def _spans_block(min_grams: int):
    """Doc-keyed block of duplicated positions → maximal consecutive-g
    runs per doc: (doc_id, start, end, n_grams), runs >= min_grams."""
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "start": pa.array([], pa.int64()),
                          "end": pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        doc = batch["doc_id"].to_numpy()
        g = batch["g"].to_numpy()
        order = np.lexsort((g, doc))
        doc, g = doc[order], g[order]
        # dedupe multiplicity (same gram position emitted once per extra
        # in-doc occurrence of a duplicated gram)
        first = np.concatenate(([True], (doc[1:] != doc[:-1])
                                | (g[1:] != g[:-1])))
        doc, g = doc[first], g[first]
        run_start = np.concatenate(([True], (doc[1:] != doc[:-1])
                                    | (g[1:] != g[:-1] + 1)))
        rs = np.flatnonzero(run_start)
        n = np.diff(np.append(rs, doc.size))
        keep = n >= min_grams
        return pa.table({
            "doc_id": pa.array(doc[rs[keep]].astype(np.int64)),
            "start": pa.array(g[rs[keep]].astype(np.int64)),
            "end": pa.array((g[rs[keep]] + n[keep] - 1).astype(np.int64)),
            "n_grams": pa.array(n[keep].astype(np.int64))})
    return fn


def dup_spans(ds: "ray.data.Dataset", k: int = 3, min_grams: int = 2,
              num_parts: int = 16) -> "ray.data.Dataset":
    """Duplicated-substring spans (the span-cut variant of exact substring
    dedup, Lee et al. 2022 'Deduplicating Training Data Makes Language
    Models Better'): per doc, the maximal runs of CONSECUTIVE k-gram
    positions whose k-gram occurs in more than one distinct document —
    the spans a curation pass cuts instead of dropping whole docs.

    Two keyed exchanges: gram-keyed (distinct-doc count per gram is free
    in-block; only DUPLICATED positions — result-scale — survive it),
    then doc-keyed run-length islands.  All-integer output
    (doc_id, start, end, n_grams) in 1-based token coordinates."""
    from .shuffle import hash_partition
    occ = ds.map_batches(_gram_pos(k), batch_format="pyarrow")
    dups = (hash_partition(occ, ["h"], num_parts)
            .map_batches(_emit_dup_rows, batch_format="pyarrow"))
    return (hash_partition(dups, ["doc_id"], num_parts)
            .map_batches(_spans_block(min_grams), batch_format="pyarrow"))
