"""Sharded query serving: one searcher actor per doc range, driver merges.

The single-process :class:`~.query.IndexReader` opens every segment.  At
cluster scale the layout shards naturally by DOC RANGE: a shard = all term
partitions of one doc range, so each actor can score its documents fully
(classic document-partitioned serving).  Global BM25 statistics (N, avgdl,
per-term global df) are computed once per query on the driver from the
shards' term directories and broadcast with the query, so shard-local
scores are exactly the global scores; the driver merges per-shard top-k
(k·S candidates — the reference's K1 bounded-heap merge pattern,
InvertedIndexManager.java:571-668, lifted to actors).

Rank-identity with the single-reader path is tested.
"""

from __future__ import annotations

import os

import numpy as np

import ray

from .query import IndexReader


@ray.remote
class ShardSearcher:
    """Owns one doc range: scores only segments seg-{tp}-{dr} for its dr."""

    def __init__(self, index_dir: str, dr: int,
                 global_n: int | None = None,
                 global_avgdl: float | None = None):
        self.reader = IndexReader(index_dir)
        self.dr = dr
        # restrict the reader's view to this shard's doc range
        for tp in list(self.reader._by_tp):
            drs = [d for d in self.reader._by_tp[tp] if d == dr]
            if drs:
                self.reader._by_tp[tp] = drs
            else:
                del self.reader._by_tp[tp]
        # federation: this index is one member of a multi-index fleet, so
        # its own manifest stats are partial — inject the fleet-global
        # (N, avgdl) so every local score is exactly the global score
        if global_n is not None:
            self.reader.n_docs = int(global_n)
        if global_avgdl is not None:
            self.reader.avgdl = float(global_avgdl)

    def term_df(self, terms: list[str]) -> dict[str, int]:
        """Shard-local df per term (the A4 partial aggregate)."""
        return {t: self.reader.doc_freq(t) for t in terms}

    def boolean_local(self, mode: str, keywords: list[str],
                      **kw) -> list[int]:
        """Doc-partitioned boolean/phrase/proximity: each shard's matches
        are final — membership (including NOT-exclusion and parsed boolean
        expressions) is decided per document, entirely within the shard
        that owns it — so the driver just concatenates."""
        r = self.reader
        fn = {"and": r.search_and, "or": r.search_or,
              "phrase": r.search_phrase,
              "keyword": lambda ks: r.search_keyword(ks[0]),
              "not": lambda ks: r.search_not(ks, kw.get("exclude", [])),
              "near": lambda ks: r.search_near(ks,
                                               window=kw.get("window", 3)),
              "bool": lambda ks: r.search_boolean(ks[0])}[mode]
        return fn(keywords).tolist()

    def tfidf_local_topk(self, keywords: list[str], k: int,
                         global_n: int, gdf: dict[str, int]
                         ) -> tuple[list[int], list[float]]:
        """Shard-local TF-IDF top-k under GLOBAL (N, df) statistics."""
        import math
        r = self.reader
        toks = r.analyze_query(keywords)
        qtf: dict[str, float] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        docs_l, dot_l, len_l = [], [], []
        for t, q in qtf.items():
            df = gdf.get(t, 0)
            if df == 0:
                continue
            idf = math.log10(global_n / df)
            doc_ids, tf, _ = r.postings(t)
            if doc_ids.size == 0:
                continue
            tfidf = tf.astype(np.float64) * idf
            docs_l.append(doc_ids)
            dot_l.append(tfidf * (q * idf))
            len_l.append(tfidf * tfidf)
        if not docs_l:
            return [], []
        uniq, dot, veclen = r._accumulate2(docs_l, dot_l, len_l)
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(veclen > 0, dot / np.sqrt(veclen), 0.0)
        d, s = r._topk(uniq, scores, k)
        return d.tolist(), s.tolist()

    def bm25_local_topk(self, terms_weights: list[tuple[str, float, int]],
                        k: int, theta0: float = float("-inf")
                        ) -> tuple[list[int], list[float]]:
        """Local top-k given GLOBAL (term, qtf, global_df) weights.

        Same adaptive dispatch as the single-reader ``bm25_topk_auto``:
        when every query term is common (df > 5% of N) pruning cannot skip
        anything and only adds bookkeeping — use the dense accumulator;
        otherwise the block-max pruned path (query._bm25_pruned_terms)
        skips term-list suffixes and posting blocks that cannot reach the
        current θ.  ``theta0`` seeds θ with a score floor another shard
        already established (the pilot wave in ShardedIndex.bm25_topk);
        an explicit floor forces the pruned path (that is its point).
        Both paths are rank-identical (tested)."""
        tw = list(terms_weights)
        min_df = min((df for _, _, df in tw), default=0)
        if not np.isfinite(theta0) and \
                min_df > 0.05 * max(self.reader.n_docs, 1):
            return self.bm25_local_topk_dense(tw, k)
        d, s = self.reader._bm25_pruned_terms(tw, k, theta0)
        return d.tolist(), s.tolist()

    def bm25f_local_topk(self, terms_weights, k: int, lead_len: int = 8,
                         lead_weight: int = 2
                         ) -> tuple[list[int], list[float]]:
        """Shard-local BM25F top-k under GLOBAL df — doc partitioning
        makes lead-tf (a per-doc positional fact) shard-local, so the
        scatter/merge is exactly the bm25 shape."""
        r = self.reader
        docs_l, contribs_l = [], []
        for t, qtf, gdf in terms_weights:
            doc_ids, c = r._bm25f_term(t, gdf, lead_len, lead_weight)
            if doc_ids.size == 0:
                continue
            docs_l.append(doc_ids)
            contribs_l.append(c if qtf == 1.0 else qtf * c)
        if not docs_l:
            return [], []
        uniq, scores = r._accumulate(docs_l, contribs_l)
        d, s = r._topk(uniq, scores, k)
        return d.tolist(), s.tolist()

    def bm25_local_topk_dense(self, terms_weights, k: int
                              ) -> tuple[list[int], list[float]]:
        """Unpruned exact accumulator — kept as the pruning test witness."""
        r = self.reader
        docs_l, contribs_l = [], []
        for t, qtf, gdf in terms_weights:
            doc_ids, tf, dl = r.postings(t)
            if doc_ids.size == 0:
                continue
            c = r._bm25_contrib(r._bm25_idf(gdf), tf, dl)
            docs_l.append(doc_ids)
            contribs_l.append(c if qtf == 1.0 else qtf * c)
        if not docs_l:
            return [], []
        uniq, scores = r._accumulate(docs_l, contribs_l)
        d, s = r._topk(uniq, scores, k)
        return d.tolist(), s.tolist()


class ShardedIndex:
    """Driver-side handle: spawns one ShardSearcher per doc range and
    answers global BM25 top-k by scatter/merge."""

    def __init__(self, index_dir: str):
        # a lightweight local reader only for manifest + analyzer
        self._meta = IndexReader(index_dir)
        drs = sorted({dr for v in self._meta._by_tp.values() for dr in v})
        self.shards = [ShardSearcher.remote(index_dir, dr) for dr in drs]
        self._init_gdf_cache([self._meta.index_dir])

    # -- per-term global-df cache --------------------------------------
    # every query previously paid a term_df round-trip to ALL shards;
    # hot terms now hit a driver-side LRU, invalidated whenever any
    # member manifest changes (extend/compact/merge rewrite it
    # atomically, so size+mtime_ns is the fingerprint)
    _GDF_CACHE_MAX = 65536

    def _init_gdf_cache(self, dirs: list[str]) -> None:
        self._gdf_dirs = list(dirs)
        self._gdf_cache: dict[str, int] = {}
        self._gdf_token = self._gdf_fp()

    def _gdf_fp(self):
        out = []
        for d in self._gdf_dirs:
            try:
                st = os.stat(os.path.join(d, "manifest.json"))
                out.append((d, st.st_size, st.st_mtime_ns))
            except FileNotFoundError:
                out.append((d, 0, 0))
        return tuple(out)

    def _global_df(self, uniq_terms: list[str]) -> dict[str, int]:
        fp = self._gdf_fp()
        if fp != self._gdf_token:
            self._gdf_cache.clear()
            self._gdf_token = fp
        missing = [t for t in uniq_terms if t not in self._gdf_cache]
        if missing:
            partials = ray.get([s.term_df.remote(missing)
                                for s in self.shards])
            for t in missing:
                if len(self._gdf_cache) >= self._GDF_CACHE_MAX:
                    self._gdf_cache.pop(next(iter(self._gdf_cache)))
                self._gdf_cache[t] = sum(int(p[t]) for p in partials)
        return {t: self._gdf_cache[t] for t in uniq_terms}

    def bm25_topk(self, keywords, k: int = 10, pilot: bool = False
                  ) -> tuple[np.ndarray, np.ndarray]:
        """Global BM25 top-k: per-shard block-max-pruned local top-k under
        global statistics, merged on the driver.

        ``pilot=True`` runs one shard first and seeds every other shard's
        θ with its k-th score — the remaining shards then skip all work
        that cannot beat an already-known floor.  That trades one extra
        round-trip of latency for less total CPU, so it pays under
        throughput-bound load (many concurrent queries sharing the pool);
        the default single wave minimizes individual-query latency on an
        idle cluster.  Both schedules are rank-identical (tested)."""
        m = self._meta
        toks = m.analyze_query(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniq_terms = sorted(set(toks))
        # global df = sum of shard-local dfs (A4 partial + final
        # combine), LRU-cached per term across queries
        gdf = self._global_df(uniq_terms)
        tw = [(t, float(toks.count(t)), gdf[t]) for t in uniq_terms if gdf[t]]
        if not tw:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if pilot and len(self.shards) > 1:
            d0, s0 = ray.get(self.shards[0].bm25_local_topk.remote(tw, k))
            theta0 = float(s0[k - 1]) if len(s0) >= k else float("-inf")
            outs = [(d0, s0)] + ray.get(
                [s.bm25_local_topk.remote(tw, k, theta0)
                 for s in self.shards[1:]])
        else:
            outs = ray.get([s.bm25_local_topk.remote(tw, k)
                            for s in self.shards])
        docs = np.concatenate([np.asarray(d, np.int64) for d, _ in outs]) \
            if outs else np.empty(0, np.int64)
        scores = np.concatenate([np.asarray(s, np.float64) for _, s in outs]) \
            if outs else np.empty(0, np.float64)
        return m._topk(docs, scores, k)

    def bm25f_topk(self, keywords, k: int = 10, lead_len: int = 8,
                   lead_weight: int = 2) -> tuple[np.ndarray, np.ndarray]:
        """Global BM25F top-k: same scatter/merge as bm25_topk — lead-tf
        is a per-doc positional fact, so each doc-partitioned shard
        computes it locally under the fleet-global df."""
        m = self._meta
        toks = m.analyze_query(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniq_terms = sorted(set(toks))
        gdf = self._global_df(uniq_terms)
        tw = [(t, float(toks.count(t)), gdf[t]) for t in uniq_terms
              if gdf[t]]
        if not tw:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        outs = ray.get([s.bm25f_local_topk.remote(tw, k, lead_len,
                                                  lead_weight)
                        for s in self.shards])
        docs = np.concatenate([np.asarray(d, np.int64) for d, _ in outs]) \
            if outs else np.empty(0, np.int64)
        scores = np.concatenate([np.asarray(s, np.float64)
                                 for _, s in outs]) \
            if outs else np.empty(0, np.float64)
        return m._topk(docs, scores, k)

    def search(self, mode: str, keywords, k: int = 10, **kw):
        """Boolean/phrase/proximity/parsed-boolean: set union of
        shard-final matches (kwargs: exclude= for "not", window= for
        "near"; "bool" takes [expression_string])."""
        outs = ray.get([s.boolean_local.remote(mode, list(keywords), **kw)
                        for s in self.shards])
        return np.sort(np.concatenate(
            [np.asarray(o, np.int64) for o in outs])) \
            if outs else np.empty(0, np.int64)

    def tfidf_topk(self, keywords, k: int = 10
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Global-statistics TF-IDF top-k, scatter/merge like bm25_topk."""
        m = self._meta
        toks = m.analyze_query(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniq_terms = sorted(set(toks))
        gdf = self._global_df(uniq_terms)
        outs = ray.get([s.tfidf_local_topk.remote(list(keywords), k,
                                                  m.n_docs, gdf)
                        for s in self.shards])
        docs = np.concatenate([np.asarray(d, np.int64) for d, _ in outs]) \
            if outs else np.empty(0, np.int64)
        scores = np.concatenate([np.asarray(s, np.float64)
                                 for _, s in outs]) \
            if outs else np.empty(0, np.float64)
        return m._topk(docs, scores, k)

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class FederatedIndex(ShardedIndex):
    """Query several INDEPENDENTLY BUILT indexes as one logical index —
    no merge, no shared files: one searcher actor per (index, doc range),
    with fleet-global statistics injected so every shard-local score is
    exactly the global score (N and avgdl from the manifest sums; per-term
    global df from the usual shard partial combine).  Doc_id sets must be
    disjoint across member indexes (same contract as ``merge_indexes``).

    This is the serving story for rolling crawls: the moment a new
    crawl's index finishes building it joins the fleet — queries see the
    union corpus with rank-identical BM25/TF-IDF (tested against a single
    full build) without waiting for a merge.
    """

    def __init__(self, index_dirs: list[str]):
        from ..state import manifest as _mf
        import os as _os
        if not index_dirs:
            raise ValueError("FederatedIndex needs at least one index")
        self._meta = IndexReader(index_dirs[0])
        n_docs, total_len = 0, 0
        members = []
        for d in index_dirs:
            m = _mf.read_json(_os.path.join(d, "manifest.json"))
            if not m:
                raise FileNotFoundError(f"no manifest.json under {d}")
            if m["cfg"] != self._meta.manifest["cfg"]:
                raise ValueError(f"federation cfg mismatch: {d}")
            n_docs += int(m["n_docs"])
            total_len += int(m["total_len"])
            members.append((d, sorted({int(s["dr"])
                                       for s in m["segments"]})))
        avgdl = (total_len / n_docs) if n_docs else 1.0
        # the driver-side meta reader only analyzes queries and merges
        # top-k, but keep its stats global for consistency
        self._meta.n_docs = n_docs
        self._meta.avgdl = avgdl
        self.shards = [ShardSearcher.remote(d, dr, global_n=n_docs,
                                            global_avgdl=avgdl)
                       for d, drs in members for dr in drs]
        self._init_gdf_cache(index_dirs)
