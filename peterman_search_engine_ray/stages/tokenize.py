"""Extraction + tokenization stage → forward index, and the posting explode.

Ray-Data mapping of the reference's ``addDocument`` loop
(``InvertedIndexManager.java:169-203``): instead of a per-document in-memory
Guava table, an actor-pool ``map_batches`` stage emits one forward-index row
per document:

    (doc_id:int64, url:string, doc_len:int32,
     terms:list<string>, tfs:list<int32>, positions:list<list<int32>>)

``terms`` are sorted within each doc; ``positions`` are indices into the
*analyzer output* token stream (stopwords removed before position
assignment — reference semantics, see SURVEY.md M8).  ``doc_len`` is the
total token count (the BM25 ``dl``).

The forward index is the engine's document store (replacing the reference's
per-segment MapDB files, ``storage/MapdbDocStore.java``) *and* the
checkpointed intermediate the wide shuffle reads from.

:class:`ExtractTokenize` is a callable class → Ray actor pool: the analyzer
(with its stem memo cache) is built once per actor in ``__init__``, reused
per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analysis import get_analyzer
from ..functions.extract import extract_text


# Process-global analyzer cache: the Porter chain's only state is its stem
# memo dict, which we WANT shared across batches within a worker process.
# This lets the tokenize stage run as stateless Ray tasks (no actor-pool
# spin-up on the critical path) while still amortizing the memo; stages with
# genuinely expensive state (word-break dicts, models) stay actor pools.
_ANALYZERS: dict[str, object] = {}


def _cached_analyzer(name: str):
    a = _ANALYZERS.get(name)
    if a is None:
        a = get_analyzer(name)
        _ANALYZERS[name] = a
    return a


class ExtractTokenize:
    """html→text→tokens in one fused pass (project early: html is dropped
    immediately; the fat binary column never crosses another stage boundary).

    Usable as an actor-pool class OR, via :func:`make_extract_tokenize`, as a
    plain task function (preferred for the cheap Porter chain).
    """

    def __init__(self, analyzer: str = "porter", positional: bool = True,
                 from_html: bool = True):
        self.analyzer = _cached_analyzer(analyzer)
        self.positional = positional
        self.from_html = from_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = batch["doc_id"].to_numpy()
        urls = (batch["url"] if "url" in batch.column_names
                else pa.array([""] * n, pa.string()))
        if self.from_html and "html" in batch.column_names:
            texts = [extract_text(h) for h in batch["html"].to_pylist()]
        else:
            texts = batch["text"].to_pylist()

        analyze = self.analyzer
        positional = self.positional

        # Flat accumulation + ListArray.from_arrays: building nested
        # pa.array(list-of-lists) was ~60% of this stage's CPU.
        flat_terms: list[str] = []
        flat_tfs: list[int] = []
        term_offsets = np.zeros(n + 1, dtype=np.int32)
        flat_pos: list[int] = []
        pos_inner_off: list[int] = [0]
        doc_lens = np.zeros(n, dtype=np.int32)

        for i, text in enumerate(texts):
            toks = analyze(text or "")
            doc_lens[i] = len(toks)
            pos_map: dict[str, list[int]] = {}
            for p, t in enumerate(toks):
                lst = pos_map.get(t)
                if lst is None:
                    pos_map[t] = [p]
                else:
                    lst.append(p)
            terms = sorted(pos_map)
            flat_terms.extend(terms)
            term_offsets[i + 1] = term_offsets[i] + len(terms)
            if positional:
                for t in terms:
                    pl = pos_map[t]
                    flat_tfs.append(len(pl))
                    flat_pos.extend(pl)
                    pos_inner_off.append(len(flat_pos))
            else:
                flat_tfs.extend(len(pos_map[t]) for t in terms)

        off = pa.array(term_offsets, pa.int32())
        cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "url": urls,
            "doc_len": pa.array(doc_lens, pa.int32()),
            "terms": pa.ListArray.from_arrays(off, pa.array(flat_terms,
                                                            pa.string())),
            "tfs": pa.ListArray.from_arrays(
                off, pa.array(np.asarray(flat_tfs, dtype=np.int32))),
        }
        if positional:
            inner = pa.ListArray.from_arrays(
                pa.array(np.asarray(pos_inner_off, dtype=np.int32)),
                pa.array(np.asarray(flat_pos, dtype=np.int32)))
            cols["positions"] = pa.ListArray.from_arrays(off, inner)
        return pa.table(cols)


def make_extract_tokenize(analyzer: str = "porter", positional: bool = True,
                          from_html: bool = True):
    """Stateless-task variant: returns a plain fn for ``map_batches`` (tasks
    reuse warm worker processes; the analyzer + stem memo live in a
    process-global cache, so there is no per-task setup cost)."""

    def fn(batch: pa.Table) -> pa.Table:
        return ExtractTokenize(analyzer, positional, from_html)(batch)

    return fn


# ---------------------------------------------------------------------------
# Posting explode: forward index rows → one row per (term, doc) posting,
# with the partition key for the wide shuffle.
# ---------------------------------------------------------------------------

def stable_term_hash(terms: np.ndarray) -> np.ndarray:
    """Deterministic cross-process 64-bit hash of term strings (vectorized
    siphash via pandas with its fixed default key)."""
    return pd.util.hash_array(np.asarray(terms, dtype=object),
                              categorize=True)


def make_explode(num_term_partitions: int, doc_range_bits: int,
                 positional: bool):
    """Returns a map_batches fn: forward rows → exploded posting rows
    (part:int64, term, doc_id, tf, dl, positions).

    ``part = term_partition + P * doc_range`` — ONE partitioning key reused
    for the whole build; doc-range splitting is the skew valve (a hot term's
    postings land in several bounded groups whose doc_id ranges are disjoint
    and ordered, so segments concat at query time without merging).
    """

    def explode(batch: pa.Table) -> pa.Table:
        t = batch.combine_chunks()
        terms_list = t.column("terms")
        if isinstance(terms_list, pa.ChunkedArray):
            terms_list = terms_list.combine_chunks()
        parent = pc.list_parent_indices(terms_list)
        flat_terms = pc.list_flatten(terms_list)
        doc_id = pc.take(t.column("doc_id"), parent)
        dl = pc.take(t.column("doc_len"), parent)
        tf = pc.list_flatten(t.column("tfs"))

        th = stable_term_hash(flat_terms.to_numpy(zero_copy_only=False))
        tp = (th % np.uint64(num_term_partitions)).astype(np.int64)
        dr = doc_id.to_numpy() >> doc_range_bits
        part = tp + num_term_partitions * dr

        cols = {
            "part": pa.array(part, pa.int64()),
            "term": flat_terms,
            "doc_id": doc_id,
            "tf": tf,
            "dl": dl,
        }
        if positional:
            cols["positions"] = pc.list_flatten(t.column("positions"))
        return pa.table(cols)

    return explode
