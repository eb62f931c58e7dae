"""Directory-of-text-files document source — the reference's native
ingestion shape (one document per ``.txt`` file in a ``webpages/``
directory; cf. the reference's DocumentStore loading and the 80-file
conformance corpus its Team tests read, SURVEY.md S5).

Doc-id assignment mirrors ``corpus.read_webpages``: numeric file stems
become their own ids (the reference names files ``0.txt, 1.txt, …`` and
uses the stem as the document key); otherwise dense ordinals in sorted
filename order.  File listing is driver-side name-scale metadata; file
CONTENTS are read inside map tasks, many files per task.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data


def read_text_dir(path: str, suffix: str = ".txt",
                  encoding: str = "utf-8") -> "ray.data.Dataset":
    """(doc_id, text) Dataset over a directory of text documents."""
    files = sorted(f for f in os.listdir(path) if f.endswith(suffix))
    if not files:
        raise FileNotFoundError(f"no {suffix} files under {path!r}")
    stems = [f[: -len(suffix)] for f in files]
    if all(s.isdigit() for s in stems):
        ids = [int(s) for s in stems]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate numeric doc ids under {path!r}")
    else:
        ids = list(range(len(files)))

    def load(batch: pa.Table) -> pa.Table:
        texts = []
        for f in batch["file"].to_pylist():
            with open(os.path.join(path, f), encoding=encoding) as fh:
                texts.append(fh.read())
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    n_blocks = min(len(files), 64)
    return (ray.data.from_arrow(pa.table({
                "file": pa.array(files, pa.string()),
                "doc_id": pa.array(ids, pa.int64())}))
            .repartition(n_blocks)
            .map_batches(load, batch_format="pyarrow"))
