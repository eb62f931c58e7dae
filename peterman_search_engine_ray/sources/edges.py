"""Edge-list sources (reference S6: ``id-graph.tsv`` whitespace-split
``(source, target)`` int pairs, IcsSearchEngine.java:66-86)."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def read_edge_list(path: str) -> "ray.data.Dataset":
    """Whitespace-separated two-column int edge file → Dataset(src, dst)."""

    def parse(batch: dict) -> pa.Table:
        src, dst = [], []
        for line in batch["text"]:
            parts = line.split()
            if len(parts) >= 2:
                src.append(int(parts[0]))
                dst.append(int(parts[1]))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return ray.data.read_text(path).map_batches(parse, batch_format="numpy")
