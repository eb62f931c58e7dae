"""Trained character-trigram language identification (Cavnar & Trenkle,
*N-Gram-Based Text Categorization*, 1994 — the TextCat recipe): per-language
profiles of the top-K most frequent raw char trigrams, trained distributed
on the corpus's labeled rows, then map-side classification by profile
overlap.  Complements the stopword-heuristic ``lang_id`` with the
model-trained path a real pipeline uses.

Vectorization: a doc's trigrams are one utf-32 decode + a packed-codepoint
window — ``key = (c0 << 42) | (c1 << 21) | c2`` (codepoints < 2^21), so
counting is ``np.unique`` over int64 keys, no per-trigram Python.  For
3-char strings packed-codepoint order equals UTF-8 lexicographic order, so
integer tie-breaks match the SQL oracle's ``ORDER BY n DESC, t``.

Distributed shape: map-side (lang, key) partial counts → ONE keyed
exchange → per-block sum + partial top-K per lang → the driver merges
O(langs × K × blocks) rows into profiles (langs × K ints — tiny),
broadcasts them once, and classification + confusion partials are pure
map-side.  Nothing vocabulary- or corpus-scale touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .shuffle import hash_partition


def _tri_keys(text: str) -> np.ndarray:
    """Packed int64 keys of every char trigram (codepoint semantics —
    matches SQL ``substr`` on VARCHAR)."""
    if not text or len(text) < 3:
        return np.empty(0, np.int64)
    c = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.int64)
    return (c[:-2] << 42) | (c[1:-1] << 21) | c[2:]


def _key_to_str(key: int) -> str:
    return "".join(chr(int(x)) for x in
                   ((key >> 42) & 0x1FFFFF, (key >> 21) & 0x1FFFFF,
                    key & 0x1FFFFF))


def _count_block(batch: pa.Table) -> pa.Table:
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if batch.num_rows == 0:
        return empty
    langs_out, keys_out, ns_out = [], [], []
    df = pd.DataFrame({"lang": batch["lang"].to_pylist(),
                       "text": batch["text"].to_pylist()})
    for lang, grp in df.groupby("lang", sort=False):
        ks = [_tri_keys(t or "") for t in grp["text"]]
        allk = np.concatenate(ks) if ks else np.empty(0, np.int64)
        if allk.size == 0:
            continue
        uniq, cnt = np.unique(allk, return_counts=True)
        langs_out.append(np.full(uniq.size, lang, dtype=object))
        keys_out.append(uniq)
        ns_out.append(cnt.astype(np.int64))
    if not keys_out:
        return empty
    return pa.table({"lang": pa.array(np.concatenate(langs_out),
                                      pa.string()),
                     "key": pa.array(np.concatenate(keys_out)),
                     "n": pa.array(np.concatenate(ns_out))})


def _topk_block(k: int):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        g = (df.groupby(["lang", "key"], sort=False)["n"].sum()
             .reset_index()
             .sort_values(["lang", "n", "key"],
                          ascending=[True, False, True]))
        return pa.Table.from_pandas(g.groupby("lang", sort=False).head(k),
                                    preserve_index=False)
    return fn


def train_profiles(docs: "ray.data.Dataset", k: int = 50,
                   num_parts: int = 16) -> dict[str, np.ndarray]:
    """lang → SORTED int64 array of its top-k trigram keys (count desc,
    key asc selection — the Cavnar-Trenkle profile)."""
    cand = (hash_partition(
                docs.select_columns(["lang", "text"])
                    .map_batches(_count_block, batch_format="pyarrow"),
                ["lang", "key"], num_parts)
            .map_batches(_topk_block(k), batch_format="pyarrow")
            .to_pandas())
    if not len(cand):
        return {}
    out: dict[str, np.ndarray] = {}
    merged = (cand.groupby(["lang", "key"], sort=False)["n"].sum()
              .reset_index()
              .sort_values(["lang", "n", "key"],
                           ascending=[True, False, True]))
    for lang, grp in merged.groupby("lang", sort=True):
        out[str(lang)] = np.sort(grp["key"].to_numpy()[:k].astype(np.int64))
    return out


def langid_confusion(docs: "ray.data.Dataset", k: int = 50,
                     num_parts: int = 16) -> pd.DataFrame:
    """Train profiles on the labeled corpus, classify every doc by
    distinct-trigram ∩ profile overlap (ties → lexicographically smallest
    language), return the integer confusion matrix
    (lang, lang_pred, n).  Docs with zero overlap to every profile (or
    < 3 chars) are excluded — mirrored by the SQL oracle's inner join."""
    profiles = train_profiles(docs, k, num_parts)
    if not profiles:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "lang_pred": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    langs = sorted(profiles)
    pref = ray.put({lg: profiles[lg] for lg in langs})

    def classify(batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "lang_pred": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        prof = ray.get(pref)
        pairs: dict[tuple, int] = {}
        for lang, text in zip(batch["lang"].to_pylist(),
                              batch["text"].to_pylist()):
            keys = np.unique(_tri_keys(text or ""))
            if keys.size == 0:
                continue
            best_lang, best_s = None, 0
            for lg in langs:                       # ties → smallest lang
                p = prof[lg]
                i = np.searchsorted(p, keys)
                ok = i < p.size
                s = int((p[np.minimum(i, p.size - 1)][ok]
                         == keys[ok]).sum())
                if s > best_s:
                    best_lang, best_s = lg, s
            if best_lang is None:
                continue
            pairs[(lang, best_lang)] = pairs.get((lang, best_lang), 0) + 1
        if not pairs:
            return empty
        ks = sorted(pairs)
        return pa.table({
            "lang": pa.array([a for a, _ in ks], pa.string()),
            "lang_pred": pa.array([b for _, b in ks], pa.string()),
            "n": pa.array([pairs[x] for x in ks], pa.int64())})

    parts = (docs.select_columns(["lang", "text"])
             .map_batches(classify, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "lang_pred": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    out = (parts.groupby(["lang", "lang_pred"], sort=True)["n"].sum()
           .reset_index())
    out["n"] = out["n"].astype(np.int64)
    return out
