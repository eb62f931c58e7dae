"""No-Ray memory-bandwidth probe: run the vectorized tokenize kernel in K
independent processes (same per-process work) and report per-process wall
time inflation vs K=1.

This isolates the single-box hardware term in the scaling measurements:
Ray, shuffle and scheduling are absent, every process computes the same
batches over its own private copy of the data — any per-process slowdown
at higher K is the shared memory bus / allocator, which a real multi-node
cluster (one bus per node) does not share.

Usage: python tools/bus_probe.py [K ...]   (default 1 2 4 8 16 32)
Prints one JSON line: {"K": {...per-process seconds...}, "inflation": {...}}
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(q):
    import pyarrow.parquet as pq
    from peterman_search_engine_ray.stages.tokenize import ExtractTokenize
    t = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                      columns=["doc_id", "text"])
    tok = ExtractTokenize("porter", positional=True, from_html=False)
    tok(t.slice(0, 500))                      # warm stem memo
    t0 = time.perf_counter()
    for _ in range(10):                       # ~50k docs per process
        tok(t)
    q.put(time.perf_counter() - t0)


def _work_full(q):
    """The whole per-task build chain, no Ray: page synthesis → extraction
    → tokenize → explode → lz4 IPC spill (tmpfs) + parquet checkpoint."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.stages.tokenize import (ExtractTokenize,
                                                            make_explode)
    import numpy as np
    t = pq.read_table("/root/testdata/sf0.1/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    tok = ExtractTokenize("porter", positional=True, from_html=True)
    explode = make_explode(128, 18, True)
    n_groups = 128
    d = f"/dev/shm/busprobe-{os.getpid()}"
    os.makedirs(d, exist_ok=True)
    opts = pa.ipc.IpcWriteOptions(compression="lz4")
    t0 = time.perf_counter()
    for _ in range(4):                        # ~20k docs per process
        w = _wrap_batch(t)
        f = tok(w)
        pq.write_table(f, os.path.join(d, f"{uuid.uuid4().hex[:8]}.parquet"))
        ex = explode(f).combine_chunks()
        # mirror build.py's scatter exactly: group sort + per-group streams
        part = ex["part"].to_numpy()
        group = part % n_groups
        order = np.argsort(group, kind="stable")
        ex = ex.take(order)
        group = group[order]
        starts = np.flatnonzero(
            np.concatenate(([True], group[1:] != group[:-1])))
        ends = np.append(starts[1:], group.size)
        uid = uuid.uuid4().hex[:8]
        for s, e in zip(starts, ends):
            path = os.path.join(d, f"g{int(group[s])}-{uid}.arrow")
            with pa.OSFile(path, "wb") as fh, \
                    pa.ipc.new_stream(fh, ex.schema, options=opts) as wr:
                wr.write_table(ex.slice(s, e - s))
    dt = time.perf_counter() - t0
    import shutil
    shutil.rmtree(d, ignore_errors=True)
    q.put(dt)


def run(k: int, fn=_work) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=fn, args=(q,)) for _ in range(k)]
    for p in procs:
        p.start()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(times) / len(times)            # mean per-process seconds


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fn = _work_full if "--full" in sys.argv else _work
    ks = [int(x) for x in args] or [1, 2, 4, 8, 16, 32]
    per = {k: round(run(k, fn), 3) for k in ks}
    base = per[min(ks)]
    print(json.dumps({
        "kernel": "full-chain" if fn is _work_full else "tokenize",
        "per_process_sec": per,
        "inflation_vs_min": {k: round(v / base, 3) for k, v in per.items()},
    }))


if __name__ == "__main__":
    main()
