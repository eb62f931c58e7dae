"""Brute-force full-scan oracle — the correctness yardstick.

Pattern from the reference's ``FullScanSearcher`` (FullScanSearcher.java:18-46):
analyze every document with the SAME frozen analyzer chain and compute the
query answer naively.  Used in tests to assert rank-identity of the indexed
engine (tie-break: descending score, ascending doc_id — identical to
IndexReader._topk).

Driver-side only, small corpora; intentionally simple, no Ray.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..functions.analysis import get_analyzer


class FullScanOracle:
    def __init__(self, docs: pd.DataFrame, analyzer: str = "porter",
                 k1: float = 1.2, b: float = 0.75):
        """docs: DataFrame with doc_id, text."""
        self.analyzer = get_analyzer(analyzer)
        self.k1, self.b = k1, b
        self.doc_ids = docs["doc_id"].to_numpy()
        self.tokens = [self.analyzer(t or "") for t in docs["text"]]
        self.doc_len = np.array([len(t) for t in self.tokens])
        self.n_docs = len(self.doc_ids)
        self.avgdl = self.doc_len.sum() / self.n_docs if self.n_docs else 1.0
        self.tf_maps = [self._count(toks) for toks in self.tokens]

    @staticmethod
    def _count(toks):
        m: dict[str, int] = {}
        for t in toks:
            m[t] = m.get(t, 0) + 1
        return m

    def _q(self, keywords) -> list[str]:
        if isinstance(keywords, str):
            keywords = [keywords]
        return self.analyzer(" ".join(keywords))

    def doc_freq(self, term: str) -> int:
        return sum(1 for m in self.tf_maps if term in m)

    def search_and(self, keywords) -> np.ndarray:
        toks = []
        for kw in (keywords if isinstance(keywords, list) else [keywords]):
            t = self._q(kw)
            if not t:
                return np.empty(0, np.int64)
            toks.extend(t)
        hits = [self.doc_ids[i] for i, m in enumerate(self.tf_maps)
                if all(t in m for t in toks)]
        return np.sort(np.asarray(hits, dtype=np.int64))

    def search_or(self, keywords) -> np.ndarray:
        toks = []
        for kw in (keywords if isinstance(keywords, list) else [keywords]):
            toks.extend(self._q(kw))
        hits = [self.doc_ids[i] for i, m in enumerate(self.tf_maps)
                if any(t in m for t in toks)]
        return np.sort(np.asarray(hits, dtype=np.int64))

    def search_not(self, include, exclude) -> np.ndarray:
        inc = set(self.search_and(include).tolist())
        exc = set(self.search_or(exclude).tolist())
        return np.asarray(sorted(inc - exc), dtype=np.int64)

    def search_zone(self, keyword, zone_len: int = 5) -> np.ndarray:
        """Naive zone search: every analyzed query token occurs within the
        first ``zone_len`` positions of the analyzed stream."""
        toks = set(self._q(keyword))
        if not toks:
            return np.empty(0, np.int64)
        hits = [self.doc_ids[i] for i, stream in enumerate(self.tokens)
                if toks <= set(stream[:zone_len])]
        return np.sort(np.asarray(hits, dtype=np.int64))

    def search_near(self, keywords, window: int = 3,
                    ordered: bool = False) -> np.ndarray:
        """Naive proximity: every consecutive query-term pair co-occurs
        within `window` positions of the analyzed stream (either order,
        or strictly left-before-right when ordered)."""
        toks = self._q(keywords)
        if not toks:
            return np.empty(0, np.int64)

        def pair_ok(pa, pb):
            if ordered:
                return any(1 <= y - x <= window for x in pa for y in pb)
            return any(abs(x - y) <= window for x in pa for y in pb)

        out = []
        for i, stream in enumerate(self.tokens):
            pos = {t: [p for p, s in enumerate(stream) if s == t]
                   for t in set(toks)}
            if not all(pos[t] for t in toks):
                continue
            if all(pair_ok(pos[a], pos[b])
                   for a, b in zip(toks, toks[1:])):
                out.append(self.doc_ids[i])
        return np.sort(np.asarray(out, dtype=np.int64))

    def search_phrase(self, phrase) -> np.ndarray:
        toks = self._q(phrase)
        if not toks:
            return np.empty(0, np.int64)
        out = []
        for i, stream in enumerate(self.tokens):
            n = len(toks)
            if any(stream[p:p + n] == toks
                   for p in range(0, len(stream) - n + 1)):
                out.append(self.doc_ids[i])
        return np.sort(np.asarray(out, dtype=np.int64))

    def _topk(self, doc_ids, scores, k):
        order = np.lexsort((doc_ids, -scores))
        if k is not None:
            order = order[:k]
        return doc_ids[order], scores[order]

    def bm25_topk(self, keywords, k=10):
        toks = self._q(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qtf: dict[str, float] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        docs, scores = [], []
        for i, m in enumerate(self.tf_maps):
            s = 0.0
            hit = False
            for t, q in qtf.items():
                tf = m.get(t)
                if not tf:
                    continue
                df = self.doc_freq(t)
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                norm = self.k1 * (1 - self.b + self.b * self.doc_len[i] / self.avgdl)
                s += q * idf * tf * (self.k1 + 1) / (tf + norm)
                hit = True
            if hit:
                docs.append(self.doc_ids[i])
                scores.append(s)
        return self._topk(np.asarray(docs, np.int64),
                          np.asarray(scores, np.float64), k)

    def bm25f_topk(self, keywords, k=10, lead_len=8, lead_weight=2):
        """Naive BM25F twin of IndexReader.bm25f_topk: weighted tf counts
        lead-field occurrences (position < lead_len) lead_weight times."""
        toks = self._q(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qtf: dict[str, float] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        docs, scores = [], []
        for i, stream in enumerate(self.tokens):
            s = 0.0
            hit = False
            for t, q in qtf.items():
                tf = self.tf_maps[i].get(t)
                if not tf:
                    continue
                ltf = sum(1 for w in stream[:lead_len] if w == t)
                wtf = tf + (lead_weight - 1) * ltf
                df = self.doc_freq(t)
                idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                norm = self.k1 * (1 - self.b
                                  + self.b * self.doc_len[i] / self.avgdl)
                s += q * idf * wtf * (self.k1 + 1) / (wtf + norm)
                hit = True
            if hit:
                docs.append(self.doc_ids[i])
                scores.append(s)
        return self._topk(np.asarray(docs, np.int64),
                          np.asarray(scores, np.float64), k)

    def tfidf_topk(self, keywords, k=None):
        """Reference-quirk TF-IDF: idf=log10(N/df), query-terms-only vector
        length (InvertedIndexManager.java:543-668)."""
        toks = self._q(keywords)
        if not toks:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        qtf: dict[str, float] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0.0) + 1.0
        idf = {t: (math.log10(self.n_docs / self.doc_freq(t))
                   if self.doc_freq(t) else None) for t in qtf}
        docs, scores = [], []
        for i, m in enumerate(self.tf_maps):
            dot = veclen = 0.0
            hit = False
            for t, q in qtf.items():
                tf = m.get(t)
                if not tf or idf[t] is None:
                    continue
                w = tf * idf[t]
                dot += w * (q * idf[t])
                veclen += w * w
                hit = True
            if hit:
                docs.append(self.doc_ids[i])
                scores.append(dot / math.sqrt(veclen) if veclen > 0 else 0.0)
        return self._topk(np.asarray(docs, np.int64),
                          np.asarray(scores, np.float64), k)
