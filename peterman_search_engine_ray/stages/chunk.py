"""Document chunking: token-bounded sliding windows over the corpus — the
transform every LLM pre-training pipeline runs between curation and
tokenizer packing.

Ray-Data-first shape: pure ``map_batches`` fan-out (one input doc row →
``1 + ceil(max(n-L,0)/stride)`` chunk rows), no shuffle, no state — the op
scales linearly and composes with the curation output (read the
range-partitioned survivors, chunk, write).  The kernel is fully
vectorized: ONE Arrow regex split for the batch, chunk gather indices from
np.repeat/arange arithmetic, and the chunk texts re-joined with ONE
``pc.binary_join`` over a ListArray — no per-doc Python.

Chunk grammar (mirrored exactly by the SQL oracle in entry_queries):
tokens = raw_tokens(text) (lowercase, punctuation-separator split, empties
dropped); chunk j covers tokens [j·stride, min(j·stride+L, n)); docs with
zero tokens emit no chunks; every doc with n > 0 emits the j = 0 chunk and
the last chunk always reaches the final token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _flat_raw_tokens


def make_chunker(chunk_tokens: int = 64, stride: int = 48):
    """Returns the ``map_batches`` fn: (doc_id, text) → (doc_id, chunk_id,
    n_tokens, chunk) rows."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError("need 0 < stride <= chunk_tokens")
    L, S = chunk_tokens, stride

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        flat, d = _flat_raw_tokens(batch["text"].to_pylist())
        if len(flat) == 0:
            return empty
        doc_ids = batch["doc_id"].to_numpy()
        n_per_doc = np.bincount(d, minlength=batch.num_rows).astype(np.int64)
        docs = np.flatnonzero(n_per_doc)              # docs with tokens
        n = n_per_doc[docs]
        tok_off = np.zeros(batch.num_rows + 1, np.int64)
        np.cumsum(n_per_doc, out=tok_off[1:])
        n_chunks = 1 + (np.maximum(n - L, 0) + S - 1) // S
        # one row per chunk: owning doc (positional), chunk ordinal
        c_doc = np.repeat(docs, n_chunks)
        chunk_id = np.arange(c_doc.size) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks)
        c_start = chunk_id * S
        c_len = np.minimum(c_start + L, n_per_doc[c_doc]) - c_start
        # gather indices for every chunk's tokens, then ONE list join
        g_off = np.zeros(c_doc.size + 1, np.int64)
        np.cumsum(c_len, out=g_off[1:])
        gather = (np.repeat(tok_off[c_doc] + c_start, c_len)
                  + np.arange(int(g_off[-1]), dtype=np.int64)
                  - np.repeat(g_off[:-1], c_len))
        toks = flat.take(pa.array(gather))
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(g_off.astype(np.int32)), toks),
            " ")
        return pa.table({
            "doc_id": pa.array(doc_ids[c_doc].astype(np.int64)),
            "chunk_id": pa.array(chunk_id.astype(np.int64)),
            "n_tokens": pa.array(c_len.astype(np.int64)),
            "chunk": chunks,
        })

    return fn


def chunk_documents(docs_ds: "ray.data.Dataset", chunk_tokens: int = 64,
                    stride: int = 48) -> "ray.data.Dataset":
    """(doc_id, text) Dataset → (doc_id, chunk_id, n_tokens, chunk) Dataset."""
    return docs_ds.map_batches(make_chunker(chunk_tokens, stride),
                               batch_format="pyarrow")


def chunk_exact_dedup(chunks_ds: "ray.data.Dataset",
                      num_parts: int = 32) -> "ray.data.Dataset":
    """Chunk-level (paragraph-level) exact dedup — the sub-document
    variant of ``dedup.exact_dedup``, run between chunking and packing so
    boilerplate repeated ACROSS documents (headers, footers, templates)
    is dropped even when no two whole documents match.

    Winner per distinct chunk text = the lexicographically smallest
    (doc_id, chunk_id).  Map-side md5 (the engine's SQL-parity hash),
    one keyed exchange of (hash, doc_id, chunk_id) rows — never the
    chunk text — and a vectorized per-block first-of-group pick, which
    is the global winner because the partition key routes every copy of
    a hash into one block."""
    import hashlib

    def md5_rows(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch["chunk"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "doc_id": batch["doc_id"],
                         "chunk_id": batch["chunk_id"]})

    def winner_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64())})
        h = np.asarray(batch["h"])
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        c = batch["chunk_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, d, h))
        h, d, c = h[order], d[order], c[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        return pa.table({"doc_id": pa.array(d[starts]),
                         "chunk_id": pa.array(c[starts])})

    from .shuffle import hash_partition
    return (hash_partition(
                chunks_ds.map_batches(md5_rows, batch_format="pyarrow"),
                ["h"], num_parts)
            .map_batches(winner_block, batch_format="pyarrow"))
