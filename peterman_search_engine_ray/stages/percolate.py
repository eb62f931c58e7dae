"""Percolation: match a document STREAM against STORED queries (the
reverse of search — Elasticsearch's percolator / alerting surface: "tell
me when a crawled page matches my saved query").

Shape: stored queries are registration-scale (thousands), documents are
the stream — so the queries broadcast once via ``ray.put`` and matching
is pure map-side over each batch's flat token stream; no exchange at
all, O(batch tokens × query terms) vectorized membership per batch.
(At millions of stored queries the production form indexes the QUERIES
— a term→query inverted index, which this engine can build with its own
``build_index`` — and percolates by lookup; the broadcast form is the
right shape for the alerting tier's usual 10³–10⁴ saved searches.)

Supported stored-query modes: ``and`` (all terms present) and ``phrase``
(consecutive tokens, post-filter stream — same semantics as
``IndexReader.search_phrase``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _match_block(queries_ref, analyzer_name: str):
    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        from ..functions.analysis import get_analyzer
        analyzer = get_analyzer(analyzer_name)
        queries = ray.get(queries_ref)
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        n_docs = len(texts)
        toks = [analyzer(t or "") for t in texts]
        flat = pa.array([w for ts in toks for w in ts], pa.string())
        d = np.repeat(np.arange(n_docs), [len(ts) for ts in toks])
        out_q, out_d = [], []
        for qid, mode, terms in queries:
            if not terms:
                continue
            if mode == "and":
                ok = np.ones(n_docs, bool)
                for t in terms:
                    has = np.zeros(n_docs, bool)
                    m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
                    has[d[m]] = True
                    ok &= has
                hit = np.flatnonzero(ok)
            elif mode == "phrase":
                # consecutive-run check over the flat stream: position i
                # starts the phrase iff every term j matches at i+j within
                # the same doc
                L = len(flat)
                run = np.ones(max(L - len(terms) + 1, 0), bool)
                if run.size:
                    for j, t in enumerate(terms):
                        m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
                        run &= m[j:j + run.size]
                    run &= d[:run.size] == d[len(terms) - 1:]
                hit = np.unique(d[:run.size][run]) if run.size else \
                    np.empty(0, np.int64)
            else:
                raise ValueError(f"unknown stored-query mode {mode!r}")
            out_q.append(np.full(hit.size, qid, np.int64))
            out_d.append(doc_ids[hit])
        if not out_q:
            return empty
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d))})
    return fn


def percolate(docs: "ray.data.Dataset",
              stored: list[tuple[int, str, list[str]]],
              analyzer: str = "nostem") -> "ray.data.Dataset":
    """Match every doc against the stored queries; returns a Dataset of
    (query_id, doc_id) match rows.  ``stored``: [(query_id, mode,
    raw terms)] — terms are analyzed here with the same chain the index
    would use, so registration and matching can't drift."""
    from ..functions.analysis import get_analyzer
    a = get_analyzer(analyzer)
    # analyze PER KEYWORD — a space-joined string derails word-break
    # analyzers (whose dictionaries have no space token); same fix as
    # IndexReader.analyze_query (query.py)
    analyzed = [(int(qid), mode,
                 [tok for term in terms for tok in a(term)])
                for qid, mode, terms in stored]
    qref = ray.put(analyzed)
    return docs.map_batches(_match_block(qref, analyzer),
                            batch_format="pyarrow")
