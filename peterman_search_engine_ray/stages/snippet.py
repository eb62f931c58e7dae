"""Search-result snippet generation, reconstructed from the positional
index alone.

The reference engine surfaces matches as (url, title) rows
(``IcsSearchEngine.java`` result loop); the standard next step for a web
search result page — and for building query-focused training examples at
corpus scale — is a token window around the match.  The positional
forward index already contains everything needed: each forward row stores
the doc's distinct ``terms`` and, per term, its post-filter token
``positions``, so scattering terms back onto their positions reconstructs
the analyzed token stream without ever re-reading or re-tokenizing the
raw text.

Scale shape: the matched doc-id set (result-scale) is broadcast via
``ray.put``; only the forward-store partitions whose doc RANGE contains a
match are opened (the same ``r=<doc_id >> bits>/`` pruning as
``IndexReader.get_docs``); the window kernel is flat Arrow-offset numpy —
no per-token Python.  Output is a Dataset of (doc_id, snippet), one row
per matching document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                   "snippet": pa.array([], pa.string())})


def _snippet_kernel(term: str, width: int, ids_ref):
    def fn(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        keep = np.isin(batch["doc_id"].to_numpy(), ids)
        t = batch.filter(pa.array(keep))
        n = t.num_rows
        if n == 0:
            return _EMPTY
        doc_id = t["doc_id"].to_numpy()
        terms_col = t["terms"].combine_chunks()
        pos_col = t["positions"].combine_chunks()

        term_counts = pc.list_value_length(terms_col).to_numpy()
        flat_terms = np.asarray(pc.list_flatten(terms_col))
        termrows = pc.list_flatten(pos_col)            # list<int32> per (doc,term)
        inner_len = pc.list_value_length(termrows).to_numpy()
        flat_pos = np.asarray(pc.list_flatten(termrows))

        doc_of_termrow = np.repeat(np.arange(n), term_counts)
        termrow_of_pos = np.repeat(np.arange(len(inner_len)), inner_len)
        doc_of_pos = doc_of_termrow[termrow_of_pos]

        # first occurrence of the query term per doc (every kept doc
        # matched the term, so exactly one term-row per doc hits)
        inner_start = np.r_[0, np.cumsum(inner_len)[:-1]]
        hit = flat_terms == term
        p0 = np.empty(n, dtype=np.int64)
        p0[doc_of_termrow[hit]] = flat_pos[inner_start[hit]]

        lo = np.maximum(p0 - width, 0)
        hi = p0 + width + 1
        sel = (flat_pos >= lo[doc_of_pos]) & (flat_pos < hi[doc_of_pos])
        d_sel, p_sel = doc_of_pos[sel], flat_pos[sel]
        w_sel = flat_terms[termrow_of_pos[sel]]
        order = np.lexsort((p_sel, d_sel))
        counts = np.bincount(d_sel, minlength=n)
        offsets = pa.array(np.r_[0, np.cumsum(counts)], pa.int32())
        words = pa.ListArray.from_arrays(
            offsets, pa.array(w_sel[order], pa.string()))
        return pa.table({"doc_id": pa.array(doc_id, pa.int64()),
                         "snippet": pc.binary_join(words, " ")})
    return fn


def keyword_snippets(reader, keyword: str,
                     width: int = 3) -> "ray.data.Dataset":
    """Token-window snippets (±``width`` analyzed tokens around the FIRST
    occurrence) for every document matching ``keyword``.

    ``reader``: an ``IndexReader`` over a positional index; the keyword
    goes through the index's own analyzer chain first, exactly like
    ``search_keyword``.
    """
    toks = reader.analyze_query(keyword)
    if not toks:
        return ray.data.from_arrow(_EMPTY)
    term = toks[0]
    ids = np.asarray(reader.search_keyword(keyword), dtype=np.int64)
    if len(ids) == 0:
        return ray.data.from_arrow(_EMPTY)
    files = reader.forward_files(ids)
    ds = ray.data.read_parquet(
        files, columns=["doc_id", "terms", "positions"])
    return ds.map_batches(_snippet_kernel(term, width, ray.put(ids)),
                          batch_format="pyarrow")
