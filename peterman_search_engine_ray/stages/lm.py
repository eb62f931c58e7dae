"""Bigram language-model quality scoring (the CCNet recipe: score each
document by an n-gram LM trained on the corpus itself; low mean log-prob =
boilerplate/gibberish, the classic pre-training quality signal).

Reference scope: the reference engine has no LM scorer — this is part of
the training-data operator suite (SURVEY.md addition table), built from the
engine's own exchange primitives.

Distributed shape (nothing vocabulary-scale ever sits on the driver):

1. ``bigram_rows`` — map-side explode of each doc's raw token stream into
   (doc_id, i, w1, bigram) rows, order index ``i`` preserved.
2. model counts — per-block partial counts, ONE keyed exchange each for
   the bigram table (c2) and the unigram table (c1): both stay Datasets.
3. scoring — the bigram stream hash-JOINS the two count Datasets (Ray
   Data native joins; at web scale this is the honest plan — CCNet-style
   top-K model pruning + broadcast is the latency alternative, but the
   join needs no driver state at all), then ONE doc-keyed exchange and a
   per-block ordered left-fold emits each doc's mean log-prob.

Float discipline: the per-bigram term is ``log((c2+1)/(c1+V))`` with both
operands exact int64 → the division is one correctly-rounded IEEE op, and
``log`` is evaluated through libm (``math.log``) on the UNIQUE count pairs
only — bit-identical to DuckDB's ``ln`` so the SQL oracle reproduces the
doubles exactly.  Per-doc accumulation is a LEFT FOLD in token order,
mirrored by ``list_reduce(list(t ORDER BY i), ...)`` in SQL.  (np.log /
np.sum would be faster but SIMD/pairwise evaluation breaks bit-parity;
the fold is per-doc-bounded and vectorizes with add.reduceat if a
production run prefers speed over oracle identity.)
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _flat_raw_tokens
from .shuffle import hash_partition

_EMPTY_BIGRAMS = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "i": pa.array([], pa.int64()),
    "w1": pa.array([], pa.string()),
    "bigram": pa.array([], pa.string())})


def bigram_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) batch → (doc_id, i, w1, bigram) rows, one per
    adjacent in-document token pair, ``i`` = 1-based bigram position."""
    if batch.num_rows == 0:
        return _EMPTY_BIGRAMS
    flat, d = _flat_raw_tokens(batch["text"].to_pylist())
    if len(flat) < 2:
        return _EMPTY_BIGRAMS
    same_doc = d[:-1] == d[1:]
    pairs = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    # position of each token within its doc (doc starts reset the count)
    starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, len(d))))
    keep = pa.array(same_doc)
    doc_ids = batch["doc_id"].to_numpy()[d[:-1][same_doc]]
    return pa.table({
        "doc_id": pa.array(doc_ids.astype(np.int64)),
        "i": pa.array(pos[:-1][same_doc] + 1),
        "w1": flat.slice(0, len(flat) - 1).filter(keep),
        "bigram": pairs.filter(keep)})


def _count_partials(col: str):
    """Map-side partial counts of a string column → (col, n) rows."""
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({col: pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        enc = batch[col].combine_chunks()
        enc = pc.dictionary_encode(enc) if not pa.types.is_dictionary(
            enc.type) else enc
        counts = np.bincount(np.asarray(enc.indices),
                             minlength=len(enc.dictionary))
        return pa.table({col: enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})
    return fn


def _sum_block(col: str):
    """After the keyed exchange each key lives wholly in one block: the
    per-block sum of partials is the global count."""
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        enc = pc.dictionary_encode(batch[col].combine_chunks())
        counts = np.bincount(np.asarray(enc.indices),
                             weights=batch["n"].to_numpy(),
                             minlength=len(enc.dictionary))
        return pa.table({col: enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})
    return fn


def _count_ds(rows: "ray.data.Dataset", col: str,
              n_parts: int = 16) -> "ray.data.Dataset":
    return (hash_partition(
                rows.map_batches(_count_partials(col),
                                 batch_format="pyarrow"),
                [col], n_parts)
            .map_batches(_sum_block(col), batch_format="pyarrow"))


def _unique_log_ratio(c2: np.ndarray, c1: np.ndarray, V: int) -> np.ndarray:
    """log((c2+1)/(c1+V)) through libm on the UNIQUE (c2, c1) pairs —
    bit-identical to DuckDB ``ln`` (both call the C library log)."""
    c2 = c2.astype(np.int64)
    c1 = c1.astype(np.int64)
    if c2.size and (int(c1.max()) < (1 << 32) and int(c2.max()) < (1 << 31)):
        key = (c2 << 32) | c1
        uniq, inv = np.unique(key, return_inverse=True)
        uc2 = (uniq >> 32).astype(np.int64)
        uc1 = (uniq & 0xFFFFFFFF).astype(np.int64)
    else:
        # web-scale counts can exceed the 32/32 pack (a hot unigram at
        # 10^12 tokens): fall back to 2-column unique, same semantics
        pair = np.stack([c2, c1], axis=1)
        upair, inv = np.unique(pair, axis=0, return_inverse=True)
        uc2, uc1 = upair[:, 0], upair[:, 1]
    vals = np.fromiter(
        (math.log((c + 1.0) / float(d + V)) for c, d in zip(uc2, uc1)),
        np.float64, count=uc2.size)
    return vals[inv]


def lm_quality(docs: "ray.data.Dataset", n_parts: int | None = None):
    """Per-doc mean bigram log-prob: returns a pandas frame
    (doc_id, n_bigrams, lm_score) for docs with >= 1 bigram."""
    if n_parts is None:
        # two chained 16-way hash joins deadlock a tiny cluster (each join
        # reserves its own aggregator actors); size the exchange to the
        # cluster the way hash_partition sizes its aggregator pool
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_parts = max(2, min(16, cpus))
    bigrams = docs.map_batches(bigram_rows, batch_format="pyarrow")
    c2 = _count_ds(bigrams, "bigram", n_parts).rename_columns(
        {"n": "c2"})
    unis = docs.map_batches(
        lambda b: pa.table({"w": _flat_raw_tokens(
            b["text"].to_pylist())[0]}) if b.num_rows else
        pa.table({"w": pa.array([], pa.string())}),
        batch_format="pyarrow")
    c1 = _count_ds(unis, "w", n_parts).rename_columns({"n": "c1"})
    V = int(c1.count())        # vocab SIZE — a scalar, never the vocab

    joined = (bigrams.join(c2, "inner", n_parts, on=("bigram",))
              .join(c1.rename_columns({"w": "w1"}), "inner", n_parts,
                    on=("w1",)))

    def fold_block(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_bigrams": pa.array([], pa.int64()),
                          "lm_score": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        d = batch["doc_id"].to_numpy()
        order = np.lexsort((batch["i"].to_numpy(), d))
        d = d[order]
        t = _unique_log_ratio(batch["c2"].to_numpy()[order],
                              batch["c1"].to_numpy()[order], V)
        starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
        ends = np.append(starts[1:], d.size)
        scores = np.empty(starts.size, np.float64)
        tl = t.tolist()
        for j, (s, e) in enumerate(zip(starts, ends)):
            acc = 0.0                        # 0.0 + x == x: left fold
            for v in tl[s:e]:
                acc += v
            scores[j] = acc / (e - s)
        return pa.table({
            "doc_id": pa.array(d[starts].astype(np.int64)),
            "n_bigrams": pa.array((ends - starts).astype(np.int64)),
            "lm_score": pa.array(scores)})

    out = (hash_partition(joined, ["doc_id"], n_parts)
           .map_batches(fold_block, batch_format="pyarrow")
           .to_pandas())
    if not len(out):
        import pandas as pd
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_bigrams": pd.Series([], dtype=np.int64),
                             "lm_score": pd.Series([], dtype=np.float64)})
    return out.sort_values("doc_id").reset_index(drop=True)
