"""Index build pipeline: corpus → forward index → term-partitioned segments.

Ray-Data-native redesign of the reference's single-threaded LSM build
(``InvertedIndexManager.java`` addDocument → flush → mergeAllSegments):

* The reference buffers 1000 docs and flushes doc-partitioned segments that
  must later be pairwise-merged (``merge``/``fillTheMap``,
  InvertedIndexManager.java:845-953).  Here ONE ``groupby(part)`` shuffle
  over exploded postings produces fully-merged, term-partitioned segments in
  a single pass — no merge phase exists because the shuffle *is* the merge.
* Segments are keyed ``(term_partition, doc_range)``: a term's postings live
  in exactly one term partition, split across bounded doc ranges (the skew
  valve — a "the"-scale hot term becomes several bounded groups whose
  doc_id ranges are disjoint and ordered, so query-time concat needs no
  k-way merge).
* Posting lists are delta+varbyte (byte-identical codec to the reference's
  ``DeltaVarLenCompressor``), laid out in blocks of ``cfg.block_size``
  entries; every block is independently decodable and carries a skip pointer
  (last doc_id + byte end) and block-max metadata (max tf, min dl) for
  block-max WAND/MaxScore pruning — the north rule's additions over the
  reference's wholesale decode (SegmentInDiskManager.java:281-325).
* Every segment write is atomic (temp + rename, generalizing the
  reference's ``deleteAndRename`` protocol) and carries a lineage manifest;
  a resumed build skips segments whose manifest validates.

Nothing here calls ``ray.init()``.
"""

from __future__ import annotations

import os
from dataclasses import asdict
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import IndexConfig
from ..functions import codec
from ..stages.tokenize import ExtractTokenize, make_explode
from ..state import manifest as mf


def _make_tokenize_sidewrite(analyzer: str, positional: bool, out_dir: str):
    """Tokenize fn that also writes its forward-index parquet fragment —
    the durability checkpoint rides inside the streaming pass instead of
    costing a separate consume + re-read."""

    def fn(batch: pa.Table) -> pa.Table:
        t = ExtractTokenize(analyzer, positional)(batch)
        import uuid
        pq.write_table(t, os.path.join(out_dir,
                                       f"fwd-{uuid.uuid4().hex[:12]}.parquet"))
        return t

    return fn

# Section names in each segment's .bin blob, in layout order.
_SECTIONS = ("postings", "tf", "dl", "block_last", "block_end",
             "block_max_tf", "block_min_dl", "pos", "pos_offsets")


LAYOUT_VERSION = 2  # bump on any on-disk format change to invalidate resumes


def _cfg_key(cfg: IndexConfig) -> dict:
    d = asdict(cfg)
    # only the fields that change on-disk layout / semantics
    out = {k: d[k] for k in ("num_term_partitions", "doc_range_bits",
                             "block_size", "positional", "analyzer", "codec")}
    out["layout"] = LAYOUT_VERSION
    return out


def encode_segment(index_dir: str, cfg: IndexConfig,
                   group: pa.Table) -> pa.Table:
    """Encode one (term_partition, doc_range) group into an immutable segment.

    Runs as a Ray task (one per part, via the scatter shuffle or
    ``groupby("part").map_groups``).  All encoding is vectorized: one
    ``encode_deltas`` call covers every posting block of every term in the
    segment; block/term metadata come from ``reduceat``.
    """
    part = int(group["part"][0].as_py())
    tp = part % cfg.num_term_partitions
    dr = part // cfg.num_term_partitions
    seg = f"seg-{tp}-{dr}"
    seg_bin = os.path.join(index_dir, "segments", f"{seg}.bin")
    seg_dir = os.path.join(index_dir, "segments", f"{seg}.dir.parquet")
    seg_meta = os.path.join(index_dir, "segments", f"{seg}.meta.json")

    g = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    g = g.combine_chunks()
    n = g.num_rows
    terms = np.asarray(g["term"].to_pylist(), dtype=object)
    doc_ids = g["doc_id"].to_numpy()
    tf = g["tf"].to_numpy().astype(np.uint32)
    dl = g["dl"].to_numpy().astype(np.uint32)

    fingerprint = {
        "n": n,
        "sum_doc": int(doc_ids.sum()),
        "sum_tf": int(tf.sum(dtype=np.int64)),
        "cfg": _cfg_key(cfg),
    }
    stats_row = partial(_manifest_row, part=part, tp=tp, dr=dr, seg=seg)

    if mf.manifest_valid(seg_meta, fingerprint):
        m = mf.read_json(seg_meta)
        return stats_row(n_terms=m["n_terms"], n_postings=n, resumed=True)

    # --- term and block boundaries ------------------------------------
    starts = np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1])))
    counts = np.diff(np.append(starts, n))
    n_terms = starts.size
    term_start_of = np.repeat(starts, counts)
    local = np.arange(n, dtype=np.int64) - term_start_of
    block_starts = np.flatnonzero(local % cfg.block_size == 0)
    block_ends = np.append(block_starts[1:], n)

    # --- posting bytes: every block independently coded (cfg.codec) ---
    enc, _ = codec.get_codec(cfg.codec)
    post_buf, vbo = enc(doc_ids, np.append(block_starts, n))
    block_end_byte = vbo[block_ends]
    term_post_start = vbo[starts]
    term_post_end = vbo[np.append(starts[1:], n)]

    # --- block metadata (skip pointers + block-max) --------------------
    if n:
        block_last = doc_ids[block_ends - 1]
        block_max_tf = np.maximum.reduceat(tf, block_starts).astype(np.uint32)
        block_min_dl = np.minimum.reduceat(dl, block_starts).astype(np.uint32)
    else:
        block_last = np.empty(0, np.int64)
        block_max_tf = np.empty(0, np.uint32)
        block_min_dl = np.empty(0, np.uint32)
    blocks_per_term = (counts + cfg.block_size - 1) // cfg.block_size
    term_block_start = np.concatenate(([0], np.cumsum(blocks_per_term)))

    # --- positions ------------------------------------------------------
    # Per-posting byte offsets are stored RELATIVE to their term's position
    # region as uint32 (4 B/posting instead of 8 — the raw-offset array was
    # the single largest section of the segment; lossless while any one
    # term's positions stay under 4 GiB, asserted below).
    if cfg.positional and "positions" in g.column_names:
        pos_col = g["positions"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pos_values = pos_col.values.to_numpy()
        pos_list_off = np.asarray(pos_col.offsets)
        pos_buf, pos_vbo = enc(pos_values, pos_list_off)
        pos_abs = codec.list_byte_offsets(pos_vbo, pos_list_off)  # n+1 abs
        term_pos_start = pos_abs[starts]
        term_pos_end = pos_abs[np.append(starts[1:], n)]
        rel = pos_abs[:n] - np.repeat(term_pos_start, counts)
        assert rel.max(initial=0) < (1 << 32), "term position region > 4GiB"
        pos_offsets = rel.astype(np.uint32)
    else:
        pos_buf = np.empty(0, np.uint8)
        pos_offsets = np.zeros(n, np.uint32)
        term_pos_start = np.zeros(n_terms, np.int64) if n else np.empty(0, np.int64)
        term_pos_end = term_pos_start

    # --- term-level aggregates -----------------------------------------
    df = counts.astype(np.int64)
    cf = np.add.reduceat(tf.astype(np.int64), starts) if n else np.empty(0, np.int64)
    t_max_tf = np.maximum.reduceat(tf, starts).astype(np.int32) if n else np.empty(0, np.int32)
    t_min_dl = np.minimum.reduceat(dl, starts).astype(np.int32) if n else np.empty(0, np.int32)

    # --- blob assembly --------------------------------------------------
    sections = {
        "postings": post_buf,
        "tf": tf,
        "dl": dl,
        "block_last": block_last.astype(np.int64),
        "block_end": block_end_byte.astype(np.int64),
        "block_max_tf": block_max_tf,
        "block_min_dl": block_min_dl,
        "pos": pos_buf,
        "pos_offsets": pos_offsets,
    }
    offsets = {}
    cursor = 0
    parts = []
    for name in _SECTIONS:
        raw = sections[name].tobytes()
        offsets[name] = [cursor, cursor + len(raw)]
        cursor += len(raw)
        parts.append(raw)
    mf.atomic_write_bytes(seg_bin, b"".join(parts))

    directory = pa.table({
        "term": pa.array(terms[starts].tolist(), pa.string()),
        "df": pa.array(df),
        "cf": pa.array(cf),
        "slot_start": pa.array(starts.astype(np.int64)),
        "slot_end": pa.array(np.append(starts[1:], n).astype(np.int64)),
        "post_start": pa.array(term_post_start.astype(np.int64)),
        "post_end": pa.array(term_post_end.astype(np.int64)),
        "block_start": pa.array(term_block_start[:-1].astype(np.int64)),
        "block_end_idx": pa.array(term_block_start[1:].astype(np.int64)),
        "max_tf": pa.array(t_max_tf, pa.int32()),
        "min_dl": pa.array(t_min_dl, pa.int32()),
        "pos_start": pa.array(term_pos_start.astype(np.int64)),
        "pos_end": pa.array(term_pos_end.astype(np.int64)),
    })
    tmp = seg_dir + ".tmp"
    pq.write_table(directory, tmp)
    os.replace(tmp, seg_dir)

    mf.write_manifest(seg_meta, fingerprint,
                      [f"{seg}.bin", f"{seg}.dir.parquet"],
                      extra={"n_terms": int(n_terms), "n_postings": int(n),
                             "sections": offsets, "part": part,
                             "tp": tp, "dr": dr})
    return stats_row(n_terms=int(n_terms), n_postings=n, resumed=False)


def _manifest_row(*, part, tp, dr, seg, n_terms, n_postings, resumed):
    return pa.table({
        "part": pa.array([part], pa.int64()),
        "tp": pa.array([tp], pa.int64()),
        "dr": pa.array([dr], pa.int64()),
        "segment": pa.array([seg], pa.string()),
        "n_terms": pa.array([n_terms], pa.int64()),
        "n_postings": pa.array([n_postings], pa.int64()),
        "resumed": pa.array([resumed], pa.bool_()),
    })


def build_index(corpus: "ray.data.Dataset", index_dir: str,
                cfg: IndexConfig | None = None, *,
                resume: bool = True) -> dict:
    """Run the full build; returns the global manifest dict.

    corpus: Dataset with (doc_id, html|text[, url, lang]).
    Stages: extract+tokenize (actor pool) → forward-index parquet (checkpoint)
    → doc-stats streaming aggregate → explode → groupby(part) shuffle →
    vectorized per-segment encode (atomic write + lineage manifest).
    """
    import time as _time
    cfg = cfg or IndexConfig()
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)
    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()
    fwd_dir = os.path.join(index_dir, "forward")
    fwd_meta = os.path.join(index_dir, "forward.manifest.json")
    manifest_path = os.path.join(index_dir, "manifest.json")

    # ---- stage 1+2+3a: ONE streaming pass ----------------------------
    # corpus → tokenize (each task side-writes its forward-index parquet
    # fragment: the checkpoint costs no extra barrier) → scatter (each task
    # splits its exploded batch by `part` and appends per-part Arrow
    # fragments, computing doc stats inline).  A file-scatter hash shuffle
    # instead of a sort: we need grouping, not order — pure map side, no
    # barrier, no global sort.  Fragments land on the store partitioned by
    # key, which is also the multi-node story.
    fwd_fp = {"cfg": _cfg_key(cfg)}
    fwd_m = mf.read_json(fwd_meta)
    resume_fwd = (resume and fwd_m and fwd_m.get("fingerprint") == fwd_fp
                  and os.path.isdir(fwd_dir))
    import shutil as _shutil
    fwd_tmp = fwd_dir + ".tmp"
    if resume_fwd:
        tok = ray.data.read_parquet(fwd_dir,
                                    override_num_blocks=max(2 * ncpu, 8))
    else:
        _shutil.rmtree(fwd_tmp, ignore_errors=True)
        os.makedirs(fwd_tmp, exist_ok=True)
        tok = corpus.map_batches(
            _make_tokenize_sidewrite(cfg.analyzer, cfg.positional, fwd_tmp),
            batch_format="pyarrow",
            # batch_size=None → whole-block batches: slicing blocks into
            # fixed batches forces cross-block coalescing that serializes
            # the fused map chain (measured 6x slower); block size is
            # bounded upstream (corpus blocks + target_max_block_size).
        )

    # scatter data is transient shuffle state (never part of the durable
    # index): prefer tmpfs so the exchange doesn't contend with the
    # checkpoint writes for disk bandwidth; on a cluster this would be the
    # shuffle service / object store.
    if os.environ.get("PETERMAN_SCATTER_TMPFS", "1") == "1" and os.path.isdir("/dev/shm"):
        scatter_dir = os.path.join(
            "/dev/shm", f"peterman_scatter_{os.path.basename(os.path.normpath(index_dir))}")
    else:
        scatter_dir = os.path.join(index_dir, "scatter")
    _shutil.rmtree(scatter_dir, ignore_errors=True)
    explode_fn = make_explode(cfg.num_term_partitions, cfg.doc_range_bits,
                              cfg.positional)

    def scatter(batch: pa.Table) -> pa.Table:
        # ONE spill file per task, each part's rows as an independent IPC
        # stream at a recorded byte range — file count stays O(tasks), not
        # O(tasks × parts) (a per-part-file layout melts the filesystem at
        # thousands of parts).
        n_docs_b = batch.num_rows
        total_len_b = int(pc.sum(batch["doc_len"]).as_py() or 0)
        ex = explode_fn(batch).combine_chunks()
        part = ex["part"].to_numpy()
        order = np.argsort(part, kind="stable")
        ex = ex.take(order)
        part = part[order]
        starts = np.flatnonzero(np.concatenate(([True], part[1:] != part[:-1])))
        ends = np.append(starts[1:], part.size)
        import uuid
        os.makedirs(scatter_dir, exist_ok=True)
        path = os.path.join(scatter_dir, f"frag-{uuid.uuid4().hex[:12]}.arrow")
        out_parts, out_rows, out_off, out_len = [], [], [], []
        opts = pa.ipc.IpcWriteOptions(compression="lz4" if os.environ.get("PETERMAN_SCATTER_LZ4", "1") == "1" else None)
        with pa.OSFile(path, "wb") as f:
            for s, e in zip(starts, ends):
                off = f.tell()
                with pa.ipc.new_stream(f, ex.schema, options=opts) as w:
                    w.write_table(ex.slice(s, e - s))
                out_parts.append(int(part[s]))
                out_rows.append(int(e - s))
                out_off.append(off)
                out_len.append(f.tell() - off)
        if not out_parts:           # batch of empty docs still counts for N
            out_parts, out_rows, out_off, out_len = [-1], [0], [0], [0]
        n = len(out_parts)
        nd = [n_docs_b] + [0] * (n - 1)
        tl = [total_len_b] + [0] * (n - 1)
        return pa.table({"part": pa.array(out_parts, pa.int64()),
                         "rows": pa.array(out_rows, pa.int64()),
                         "path": pa.array([path] * n, pa.string()),
                         "off": pa.array(out_off, pa.int64()),
                         "len": pa.array(out_len, pa.int64()),
                         "n_docs": pa.array(nd, pa.int64()),
                         "total_len": pa.array(tl, pa.int64())})

    frag_stats = tok.map_batches(scatter, batch_format="pyarrow").to_pandas()
    if frag_stats.empty:                       # zero-row corpus
        import pandas as _pd
        frag_stats = _pd.DataFrame({c: _pd.Series(dtype="int64") for c in
                                    ("part", "rows", "off", "len",
                                     "n_docs", "total_len")}
                                   | {"path": _pd.Series(dtype="object")})
    n_docs = int(frag_stats["n_docs"].sum())
    total_len = int(frag_stats["total_len"].sum())
    avgdl = (total_len / n_docs) if n_docs else 0.0
    # largest parts first: the biggest (hot-term) partitions start in the
    # first wave instead of straggling at the tail
    part_sizes = (frag_stats.loc[frag_stats["part"] >= 0]
                  .groupby("part")["rows"].sum().sort_values(ascending=False))
    parts = part_sizes.index.tolist()
    if not resume_fwd:
        _shutil.rmtree(fwd_dir, ignore_errors=True)
        os.replace(fwd_tmp, fwd_dir)
        mf.atomic_write_json(fwd_meta, {"fingerprint": fwd_fp})
    timings["tokenize_scatter"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    import json as _json
    frag_index = {
        int(p): _json.dumps([[str(a), int(b), int(c)] for a, b, c in
                             zip(g["path"], g["off"], g["len"])])
        for p, g in frag_stats.loc[frag_stats["part"] >= 0].groupby("part")
    }

    def encode_from_frags(batch: pa.Table) -> pa.Table:
        import json
        out = []
        for p, frags in zip(batch["part"].to_pylist(),
                            batch["frags"].to_pylist()):
            tbls = []
            for path, off, ln in json.loads(frags):
                with pa.memory_map(path) as f:
                    buf = f.read_buffer()
                tbls.append(pa.ipc.open_stream(
                    pa.BufferReader(buf.slice(off, ln))).read_all())
            out.append(encode_segment(index_dir, cfg, pa.concat_tables(tbls)))
        return pa.concat_tables(out)

    if parts:
        seg_stats = (ray.data.from_items(
                        [{"part": int(p), "frags": frag_index[int(p)]}
                         for p in parts])
                     .repartition(len(parts))
                     .map_batches(encode_from_frags, batch_format="pyarrow")
                     .to_pandas())
    else:
        import pandas as _pd
        seg_stats = _pd.DataFrame({c: _pd.Series(dtype=t) for c, t in [
            ("part", "int64"), ("tp", "int64"), ("dr", "int64"),
            ("segment", "object"), ("n_terms", "int64"),
            ("n_postings", "int64"), ("resumed", "bool")]})
    _shutil.rmtree(scatter_dir, ignore_errors=True)
    timings["shuffle_encode"] = round(_time.perf_counter() - _t0, 3)

    manifest = {
        "timings": timings,
        "cfg": _cfg_key(cfg),
        "bm25": {"k1": cfg.k1, "b": cfg.b},
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": avgdl,
        "segments": seg_stats.drop(columns=["resumed"]).to_dict("records"),
        "n_resumed_segments": int(seg_stats["resumed"].sum()),
    }
    mf.atomic_write_json(manifest_path, manifest)
    return manifest
