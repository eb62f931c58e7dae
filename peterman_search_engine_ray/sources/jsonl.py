"""JSONL web-page source: the same Common-Crawl-style schema as
``corpus.read_webpages`` (``url, text, lang, …`` — no doc_id) arriving
as newline-delimited JSON shards instead of parquet.

Dense doc_ids need per-file row offsets, and JSONL has no footer to read
them from — so a first DISTRIBUTED pass counts rows per file (one
integer per file comes back; driver state is file-scale, the natural
crawl-shard unit), the driver prefix-sums offsets, and the load pass
assigns ``offset + ordinal`` exactly like the parquet reader.  Two
streaming passes over the shards, no corpus-scale driver state.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _list_files(input_path: str, suffix: str) -> list[str]:
    if os.path.isdir(input_path):
        files = sorted(os.path.join(input_path, f)
                       for f in os.listdir(input_path) if f.endswith(suffix))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no {suffix} files under {input_path!r}")
    return files


def read_webpages_jsonl(input_path: str, suffix: str = ".jsonl"
                        ) -> "ray.data.Dataset":
    """(doc_id, …schema columns…) Dataset over JSONL shards with stable
    dense doc_ids (per-file offset + row ordinal)."""
    from pyarrow import json as pj

    files = _list_files(input_path, suffix)
    paths = ray.data.from_arrow(
        pa.table({"path": pa.array(files, pa.string())}))

    def _rows(p: str) -> int:
        # a zero-byte shard is a normal empty crawl partition, but
        # pyarrow.json raises ArrowInvalid("Empty JSON file") on it
        return 0 if os.path.getsize(p) == 0 else pj.read_json(p).num_rows

    def count(batch: pa.Table) -> pa.Table:
        ns = [_rows(p) for p in batch["path"].to_pylist()]
        return pa.table({"path": batch["path"],
                         "n": pa.array(ns, pa.int64())})

    counts = (paths.repartition(len(files))
              .map_batches(count, batch_format="pyarrow").to_pandas())
    counts = counts.set_index("path")["n"].to_dict()
    offsets, cum = {}, 0
    for f in files:                      # deterministic sorted order
        offsets[f] = cum
        cum += int(counts[f])

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["path"].to_pylist():
            if os.path.getsize(p) == 0:
                continue
            t = pj.read_json(p)
            if "doc_id" not in t.column_names:
                ids = pa.array(
                    np.arange(t.num_rows, dtype=np.int64) + offsets[p])
                t = t.add_column(0, "doc_id", ids)
            out.append(t)
        if not out:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.concat_tables(out)

    return (paths.repartition(len(files))
            .map_batches(load, batch_format="pyarrow"))
