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


# Separator runs for the punctuation tokenizer — RE2 syntax, identical
# semantics to analysis._TOKEN_RE's findall (split on runs, drop empties);
# RE2/Python-re agreement on this class is conformance-tested.
_SEP_PATTERN = "[ \t\n\r,.;?!]+"


def _vector_tokenize(texts: list, stem: bool, cache: dict,
                     positional: bool):
    """Vectorized punctuation-analyzer batch: RE2 split + Arrow stopword
    filter + dictionary-encoded stemming (Porter runs once per UNIQUE
    batch token, memoized across batches) + numpy group arithmetic for
    per-(doc, term) tf and positions.  Returns the same flat structure the
    per-doc loop built; the only per-token Python left is the unique-token
    stem loop."""
    from ..functions.analysis import STOP_WORDS, porter_stem
    n_docs = len(texts)
    arr = pa.array([("" if t is None else t).lower() for t in texts],
                   pa.string())
    toks = pc.split_pattern_regex(arr, _SEP_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    didx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.and_(pc.not_equal(flat, ""),
                   pc.invert(pc.is_in(flat,
                                      value_set=_stop_value_set())))
    keepnp = keep.to_numpy(zero_copy_only=False)
    flat_f = flat.filter(keep)
    d = didx[keepnp]
    n = d.size
    doc_lens = np.zeros(n_docs, dtype=np.int32)
    if n == 0:
        return (doc_lens, np.zeros(n_docs + 1, np.int32), [],
                np.empty(0, np.int32), np.empty(0, np.int32),
                np.zeros(1, np.int32))
    denc = pc.dictionary_encode(flat_f)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = np.asarray(denc.indices)
    dict_strings = denc.dictionary.to_pylist()
    if stem:
        stemmed = []
        for t in dict_strings:
            s = cache.get(t)
            if s is None:
                s = porter_stem(t)
                cache[t] = s
            stemmed.append(s)
        if len(cache) > 2_000_000:
            cache.clear()
    else:
        stemmed = dict_strings
    stemmed_arr = np.asarray(stemmed, dtype=object)
    uniq_sorted = np.unique(stemmed_arr)
    rank_of_code = np.searchsorted(uniq_sorted, stemmed_arr)
    term_rank = rank_of_code[codes]
    # post-filter position per token within its doc (analyzer-output stream)
    doc_starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    doc_counts = np.diff(np.append(doc_starts, n)).astype(np.int64)
    pos = np.arange(n, dtype=np.int64) - np.repeat(doc_starts, doc_counts)
    doc_lens[d[doc_starts]] = doc_counts.astype(np.int32)
    # group by (doc, term-rank); positions stay ascending within each group
    order = np.lexsort((pos, term_rank, d))
    d2, r2, p2 = d[order], term_rank[order], pos[order]
    gb = np.concatenate(([True], (d2[1:] != d2[:-1]) | (r2[1:] != r2[:-1])))
    gstart = np.flatnonzero(gb)
    gcount = np.diff(np.append(gstart, n)).astype(np.int64)
    gdoc = d2[gstart]
    flat_terms = uniq_sorted[r2[gstart]].tolist()
    term_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.bincount(gdoc, minlength=n_docs), out=term_offsets[1:])
    pos_inner_off = np.zeros(gcount.size + 1, dtype=np.int64)
    np.cumsum(gcount, out=pos_inner_off[1:])
    return (doc_lens, term_offsets.astype(np.int32), flat_terms,
            gcount.astype(np.int32), p2.astype(np.int32),
            pos_inner_off.astype(np.int32))


_STOP_SET_ARR = None


def _stop_value_set():
    global _STOP_SET_ARR
    if _STOP_SET_ARR is None:
        from ..functions.analysis import STOP_WORDS
        _STOP_SET_ARR = pa.array(sorted(STOP_WORDS), pa.string())
    return _STOP_SET_ARR


class ExtractTokenize:
    """html→text→tokens in one fused pass (project early: html is dropped
    immediately; the fat binary column never crosses another stage boundary).

    Usable as an actor-pool class OR, via :func:`make_extract_tokenize`, as a
    plain task function (preferred for the cheap Porter chain).

    The frozen punctuation analyzers (porter/nostem) take a fully
    vectorized Arrow/numpy path; other analyzers use the per-doc loop.
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
            # NOTE: measured (round 3) — an RE2 whole-batch extraction
            # (replace_substring_regex/extract_regex chain) is NOT faster
            # than this per-row loop at ~500 B/page: the (?s)<body>.*?
            # capture kernel alone costs more than all six Python regex
            # passes, which exploit literal prefixes.  Keep the loop.
            texts = [extract_text(h) for h in batch["html"].to_pylist()]
        else:
            texts = batch["text"].to_pylist()

        if getattr(self.analyzer, "kind", None) in ("porter", "nostem"):
            (doc_lens, term_offsets, flat_terms, flat_tfs, flat_pos,
             pos_inner_off) = _vector_tokenize(
                texts, self.analyzer._stem, self.analyzer._cache,
                self.positional)
            off = pa.array(term_offsets, pa.int32())
            cols = {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": urls,
                "doc_len": pa.array(doc_lens, pa.int32()),
                "terms": pa.ListArray.from_arrays(
                    off, pa.array(flat_terms, pa.string())),
                "tfs": pa.ListArray.from_arrays(off, pa.array(flat_tfs)),
            }
            if self.positional:
                inner = pa.ListArray.from_arrays(
                    pa.array(pos_inner_off), pa.array(flat_pos))
                cols["positions"] = pa.ListArray.from_arrays(off, inner)
            _carry_doc_meta(batch, cols)
            return pa.table(cols)

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
        _carry_doc_meta(batch, cols)
        return pa.table(cols)


def _carry_doc_meta(batch: pa.Table, cols: dict) -> None:
    """Carry per-doc metadata (the input_hint's ``warc_ts``/``lang``) into
    the forward index when the corpus provides it — the doc store doubles
    as the metadata store (reference MapdbDocStore stores doc attributes),
    so crawl-time / language filters resolve via the point-get partitions
    instead of a corpus rescan."""
    for c in ("warc_ts", "lang"):
        if c in batch.column_names:
            cols[c] = batch[c]


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
