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


def _make_tokenize_sidewrite(analyzer: str, positional: bool, out_dir: str,
                             range_bits: int, prefix: str = "fwd"):
    """Tokenize fn that also writes its forward-index parquet fragments —
    the durability checkpoint rides inside the streaming pass instead of
    costing a separate consume + re-read.

    Fragments are partitioned by doc range (``r=<doc_id >> range_bits>/``
    subdirs — the same ranges the segments use), so point lookups
    (IndexReader.get_docs) and incremental extension read only the matching
    range partitions instead of scanning the whole forward dataset
    (reference point-get: MapdbDocStore.java:106-131)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = ExtractTokenize(analyzer, positional)(batch)
        import uuid
        uid = uuid.uuid4().hex[:12]
        rng = t["doc_id"].to_numpy() >> range_bits
        order = np.argsort(rng, kind="stable")
        ts = t.take(order)
        rs = rng[order]
        starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
        ends = np.append(starts[1:], rs.size)
        for s, e in zip(starts, ends):
            d = os.path.join(out_dir, f"r={int(rs[s])}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(ts.slice(s, e - s),
                           os.path.join(d, f"{prefix}-{uid}.parquet"))
        return t

    return fn

# Section names in each segment's .bin blob, in layout order.
_SECTIONS = ("postings", "tf", "dl_by_doc", "block_last", "block_end",
             "block_max_tf", "block_min_dl", "pos", "pos_offsets")


LAYOUT_VERSION = 5  # bump on any on-disk format change to invalidate resumes
# v4: forward store carries the input_hint's per-doc metadata (warc_ts, lang)
# v5: dl normalized to a per-segment doc table (doc_lo-indexed) instead of
#     4 repeated bytes per posting — doc lengths are per-DOC facts and the
#     doc ids are dense, so the table is range-span-sized; postings()
#     gathers dl by doc offset (O(1) random access preserved).  tf is
#     frame-of-reference bit-packed per term (codec.encode_rawpack —
#     ~2 bits/posting instead of 32; directory carries tf byte ranges);
#     the reader's per-term postings cache amortizes the unpack.


def _cfg_key(cfg: IndexConfig) -> dict:
    d = asdict(cfg)
    # only the fields that change on-disk layout / semantics
    out = {k: d[k] for k in ("num_term_partitions", "doc_range_bits",
                             "block_size", "positional", "analyzer", "codec",
                             "pos_codec")}
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

    # Sort by (term, doc_id) WITHOUT materializing the term strings per
    # posting row: dictionary-encode the term column (one string per
    # distinct term, not per posting), rank the small dictionary with
    # Arrow's C++ string sort, then integer-lexsort the posting rows by
    # (term rank, doc_id).  3× faster than sort_by + to_pylist at bench
    # scale, and the only string work left is O(n_terms).
    gc = group.combine_chunks()
    n = gc.num_rows
    term_arr = gc["term"].combine_chunks() if n else pa.array([], pa.string())
    denc = pc.dictionary_encode(term_arr)
    dictionary = denc.dictionary if n else pa.array([], pa.string())
    dict_order = pc.sort_indices(dictionary).to_numpy().astype(np.int64)
    rank_of = np.empty(dict_order.size, np.int64)
    rank_of[dict_order] = np.arange(dict_order.size)
    term_rank = rank_of[denc.indices.to_numpy()] if n else np.empty(0, np.int64)
    order = np.lexsort((gc["doc_id"].to_numpy(), term_rank))
    keep_cols = [c for c in gc.column_names if c not in ("term", "part")]
    g = gc.select(keep_cols).take(pa.array(order)).combine_chunks()
    term_rank = term_rank[order]
    sorted_terms = dictionary.take(pa.array(dict_order))  # directory column
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
    starts = np.flatnonzero(
        np.concatenate(([True], term_rank[1:] != term_rank[:-1])))
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
        penc, _ = codec.get_codec(cfg.pos_codec)
        pos_buf, pos_vbo = penc(pos_values, pos_list_off)
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
    # dl is a per-DOC fact repeated across every term's postings; store it
    # once per doc in a dense range-span table (doc ids are dense by
    # construction) — 4 bytes per doc instead of 4 per posting.
    if n:
        doc_lo = int(doc_ids.min())
        dl_by_doc = np.zeros(int(doc_ids.max()) - doc_lo + 1, np.uint32)
        dl_by_doc[doc_ids - doc_lo] = dl
    else:
        doc_lo = 0
        dl_by_doc = np.empty(0, np.uint32)
    tf_buf, tf_vbo = codec.encode_rawpack(tf, np.append(starts, n))
    term_tf_start = tf_vbo[starts]
    term_tf_end = tf_vbo[np.append(starts[1:], n)]
    sections = {
        "postings": post_buf,
        "tf": tf_buf,
        "dl_by_doc": dl_by_doc,
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
        "term": sorted_terms.combine_chunks()
        if isinstance(sorted_terms, pa.ChunkedArray) else sorted_terms,
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
        "tf_start": pa.array(term_tf_start.astype(np.int64)),
        "tf_end": pa.array(term_tf_end.astype(np.int64)),
    })
    tmp = seg_dir + ".tmp"
    pq.write_table(directory, tmp)
    os.replace(tmp, seg_dir)

    mf.write_manifest(seg_meta, fingerprint,
                      [f"{seg}.bin", f"{seg}.dir.parquet"],
                      extra={"n_terms": int(n_terms), "n_postings": int(n),
                             "sections": offsets, "part": part,
                             "tp": tp, "dr": dr, "doc_lo": doc_lo})
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


def encode_parts_block(index_dir: str, cfg: IndexConfig,
                       batch: pa.Table) -> pa.Table:
    """Encode every (term_partition, doc_range) part present in a
    hash-partitioned block (each part lives wholly in one block)."""
    if batch.num_rows == 0:
        return _manifest_row(part=-1, tp=-1, dr=-1, seg="", n_terms=0,
                             n_postings=0, resumed=False).slice(0, 0)
    part = batch["part"].to_numpy()
    order = np.argsort(part, kind="stable")
    b = batch.take(order)
    part = part[order]
    starts = np.flatnonzero(np.concatenate(([True], part[1:] != part[:-1])))
    ends = np.append(starts[1:], part.size)
    out = [encode_segment(index_dir, cfg, b.slice(s, e - s))
           for s, e in zip(starts, ends)]
    return pa.concat_tables(out)


def build_index(corpus: "ray.data.Dataset", index_dir: str,
                cfg: IndexConfig | None = None, *,
                resume: bool = True, input_token=None,
                shuffle: str | None = None) -> dict:
    """Run the full build; returns the global manifest dict.

    corpus: Dataset with (doc_id, html|text[, url, lang]).
    Stages: extract+tokenize (warm-process tasks) → forward-index parquet
    (checkpoint, side-written inside the pass) → explode →
    hash-shuffle-by-part exchange → vectorized per-segment encode (atomic
    write + lineage manifest) → doc stats from the checkpoint's pruned
    ``doc_len`` column.

    input_token: caller-supplied identity of the input corpus (e.g.
    ``mf.input_fingerprint`` of the source files).  Folded into the
    forward-index resume fingerprint so rebuilding into the same dir after
    the corpus changed invalidates the checkpoint instead of silently
    serving stale docs.

    shuffle: exchange mode (``PETERMAN_SHUFFLE`` env, default
    ``"scatter"``); both modes are multi-node-correct and hold no
    per-part state on the driver:

    * ``"scatter"`` (default) — classic map-side file shuffle: tasks
      spill per-part-group lz4 Arrow IPC streams under ``scatter_dir``
      and encode tasks discover theirs by directory listing.
      scatter_dir defaults to shared storage under ``index_dir`` (every
      node can read it on a real cluster); ``PETERMAN_SCATTER_TMPFS=1``
      is a single-node opt-in that moves the exchange to /dev/shm
      (memory bandwidth instead of disk — what bench.py uses).
    * ``"objstore"`` — per-group lz4 Arrow-IPC blobs move through Ray
      Data's hash-shuffle operator (object store exchange, spillable);
      no filesystem assumption at all, ~1.5-2× slower single-node than
      the tmpfs scatter (aggregator-actor overhead).
    """
    import time as _time
    cfg = cfg or IndexConfig()
    shuffle = shuffle or os.environ.get("PETERMAN_SHUFFLE", "scatter")
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
    # fragment: the checkpoint costs no extra barrier) → explode →
    # hash exchange → encode.
    fwd_fp = {"cfg": _cfg_key(cfg), "input": input_token}
    fwd_m = mf.read_json(fwd_meta)
    resume_fwd = (resume and fwd_m and fwd_m.get("fingerprint") == fwd_fp
                  and os.path.isdir(fwd_dir))
    import shutil as _shutil
    fwd_tmp = fwd_dir + ".tmp"
    if resume_fwd:
        # explicit live-file list: a dir-wide read would double-count a
        # range whose compaction crashed between publish and unlink
        tok = ray.data.read_parquet(mf.live_forward_files(fwd_dir),
                                    override_num_blocks=max(2 * ncpu, 8))
    else:
        _shutil.rmtree(fwd_tmp, ignore_errors=True)
        os.makedirs(fwd_tmp, exist_ok=True)
        tok = corpus.map_batches(
            _make_tokenize_sidewrite(cfg.analyzer, cfg.positional, fwd_tmp,
                                     cfg.doc_range_bits),
            batch_format="pyarrow",
            # batch_size=None → whole-block batches: slicing blocks into
            # fixed batches forces cross-block coalescing that serializes
            # the fused map chain (measured 6x slower); block size is
            # bounded upstream (corpus blocks + target_max_block_size).
        )

    from ..stages.shuffle import hash_partition
    explode_fn = make_explode(cfg.num_term_partitions, cfg.doc_range_bits,
                              cfg.positional)
    # FIXED group count (not CPU-derived): the scatter stage writes one IPC
    # stream per (task, group) and encode runs one task per group, so the
    # plan must be identical across parallelism levels for scaling runs to
    # compare the same job (and for resume to match).
    n_blocks = int(os.environ.get("PETERMAN_ENC_GROUPS", "0")) or 128
    enc_fn = partial(encode_parts_block, index_dir, cfg)

    if shuffle == "objstore":
        # Object-store exchange with PRE-SERIALIZED payloads: each task
        # splits its exploded batch by part group and emits one row per
        # group — (group, lz4 Arrow-IPC blob) — and the hash shuffle moves
        # those few compressed-binary rows through the (spillable) object
        # store; encode tasks decode the blobs of their group.  Multi-node
        # by construction (no stage opens any path), no driver state, and
        # ~4× cheaper than shuffling the raw posting rows: the string term
        # column re-serializes poorly through the row exchange, while the
        # lz4 stream moves as one buffer.
        def scatter_blobs(batch: pa.Table) -> pa.Table:
            opts = pa.ipc.IpcWriteOptions(
                compression="lz4"
                if os.environ.get("PETERMAN_OBJSTORE_LZ4", "1") == "1"
                else None)
            n_docs_b = batch.num_rows
            total_len_b = int(pc.sum(batch["doc_len"]).as_py() or 0)
            ex = explode_fn(batch).combine_chunks()
            part = ex["part"].to_numpy()
            group = part % n_blocks
            order = np.argsort(group, kind="stable")
            ex = ex.take(order)
            group = group[order]
            starts = np.flatnonzero(
                np.concatenate(([True], group[1:] != group[:-1])))
            ends = np.append(starts[1:], group.size)
            gids, blobs = [], []
            for s, e in zip(starts, ends):
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, ex.schema, options=opts) as w:
                    w.write_table(ex.slice(s, e - s))
                gids.append(int(group[s]))
                blobs.append(sink.getvalue().to_pybytes())
            # the corpus stats ride the SAME exchange as one group=-1 row
            # per batch (8+8 LE bytes) — no separate doc-stats data pass
            gids.append(-1)
            blobs.append(n_docs_b.to_bytes(8, "little")
                         + total_len_b.to_bytes(8, "little"))
            return pa.table({"group": pa.array(gids, pa.int64()),
                             "blob": pa.array(blobs, pa.binary())})

        def encode_blobs(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _manifest_row(part=-1, tp=-1, dr=-1, seg="",
                                     n_terms=0, n_postings=0,
                                     resumed=False).slice(0, 0)
            g = batch["group"].to_numpy()
            if (g == -1).any():
                stat_rows = batch.filter(pa.array(g == -1))
                nd = tl = 0
                for b in stat_rows["blob"].to_pylist():
                    nd += int.from_bytes(b[:8], "little")
                    tl += int.from_bytes(b[8:], "little")
                # stats travel in the manifest frame as a part=-2 row
                out = [_manifest_row(part=-2, tp=-1, dr=-1, seg="",
                                     n_terms=nd, n_postings=tl,
                                     resumed=False)]
                batch = batch.filter(pa.array(g != -1))
            else:
                out = []
            if batch.num_rows:
                tbls = [pa.ipc.open_stream(pa.BufferReader(b)).read_all()
                        for b in batch["blob"].to_pylist()]
                out.append(encode_parts_block(index_dir, cfg,
                                              pa.concat_tables(tbls)))
            if not out:
                return _manifest_row(part=-1, tp=-1, dr=-1, seg="",
                                     n_terms=0, n_postings=0,
                                     resumed=False).slice(0, 0)
            return pa.concat_tables(out)

        blobs = tok.map_batches(scatter_blobs, batch_format="pyarrow")
        # default exchange is sort-based groupby (task-only): the hash
        # exchange's aggregator-actor spin-up was the measured fixed cost
        # that kept objstore ~2x behind scatter (round-3 bench); measured
        # here at 200k docs: hash 5.8 s, sortgroup 2.6 s vs scatter 2.05 s
        # -> 1.25x, and the stats rows riding the exchange removed the
        # separate doc-stats pass.  PETERMAN_OBJSTORE_EXCHANGE=hash|<int>
        # keeps the hash path for experiments.
        ex_mode = os.environ.get("PETERMAN_OBJSTORE_EXCHANGE", "sortgroup")
        if ex_mode == "sortgroup":
            seg_stats = (blobs.groupby("group")
                         .map_groups(encode_blobs, batch_format="pyarrow")
                         .to_pandas())
        else:
            n_parts = n_blocks if ex_mode == "hash" else int(ex_mode)
            seg_stats = (hash_partition(blobs, ["group"], n_parts)
                         .map_batches(encode_blobs, batch_format="pyarrow")
                         .to_pandas())
        scatter_dir = None
    elif shuffle == "scatter":
        # File-exchange variant (classic map-side shuffle): each task
        # splits its exploded batch by part GROUP (part % n_blocks) and
        # appends one lz4 Arrow-IPC stream per group it touches; encode
        # task g discovers its input by LISTING scatter_dir/g<g>/ — no
        # fragment metadata exists anywhere, driver or exchange (the
        # round-1 driver frag index was O(tasks × parts)).  File count is
        # O(tasks × groups), groups = 2×cluster cores — the standard
        # external-shuffle layout.
        # scatter_dir must be reachable by every node: defaults to shared
        # storage under index_dir; tmpfs (PETERMAN_SCATTER_TMPFS=1) is a
        # single-node opt-in for memory-bandwidth exchange.
        if (os.environ.get("PETERMAN_SCATTER_TMPFS", "0") == "1"
                and os.path.isdir("/dev/shm")):
            scatter_dir = os.path.join(
                "/dev/shm",
                f"peterman_scatter_{os.path.basename(os.path.normpath(index_dir))}")
        else:
            scatter_dir = os.path.join(index_dir, "scatter")
        _shutil.rmtree(scatter_dir, ignore_errors=True)
        for g in range(n_blocks):
            os.makedirs(os.path.join(scatter_dir, f"g{g}"), exist_ok=True)

        def scatter(batch: pa.Table) -> pa.Table:
            n_docs_b = batch.num_rows
            total_len_b = int(pc.sum(batch["doc_len"]).as_py() or 0)
            ex = explode_fn(batch).combine_chunks()
            part = ex["part"].to_numpy()
            group = part % n_blocks
            order = np.argsort(group, kind="stable")
            ex = ex.take(order)
            group = group[order]
            starts = np.flatnonzero(
                np.concatenate(([True], group[1:] != group[:-1])))
            ends = np.append(starts[1:], group.size)
            import uuid
            opts = pa.ipc.IpcWriteOptions(
                compression="lz4"
                if os.environ.get("PETERMAN_SCATTER_LZ4", "1") == "1"
                else None)
            uid = uuid.uuid4().hex[:12]
            for s, e in zip(starts, ends):
                path = os.path.join(scatter_dir, f"g{int(group[s])}",
                                    f"frag-{uid}.arrow")
                with pa.OSFile(path, "wb") as f, \
                        pa.ipc.new_stream(f, ex.schema, options=opts) as w:
                    w.write_table(ex.slice(s, e - s))
            # one tiny stats row per batch — O(batches) driver state
            return pa.table({"n_docs": pa.array([n_docs_b], pa.int64()),
                             "total_len": pa.array([total_len_b], pa.int64())})

        stats = tok.map_batches(scatter, batch_format="pyarrow").to_pandas()
        n_docs = int(stats["n_docs"].sum()) if len(stats) else 0
        total_len = int(stats["total_len"].sum()) if len(stats) else 0
        timings["tokenize_scatter"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()

        def encode_group(batch: pa.Table) -> pa.Table:
            out = []
            for g in batch["group"].to_pylist():
                gd = os.path.join(scatter_dir, f"g{g}")
                tbls = []
                for fname in sorted(os.listdir(gd)) if os.path.isdir(gd) else []:
                    with pa.OSFile(os.path.join(gd, fname), "rb") as f:
                        tbls.append(pa.ipc.open_stream(f).read_all())
                if tbls:
                    out.append(encode_parts_block(
                        index_dir, cfg, pa.concat_tables(tbls)))
            if not out:
                return _manifest_row(part=-1, tp=-1, dr=-1, seg="",
                                     n_terms=0, n_postings=0,
                                     resumed=False).slice(0, 0)
            return pa.concat_tables(out)

        # largest group dirs first: biggest partitions start in the first
        # wave instead of straggling at the tail
        def _gsize(g: int) -> int:
            gd = os.path.join(scatter_dir, f"g{g}")
            return sum(os.path.getsize(os.path.join(gd, f))
                       for f in os.listdir(gd)) if os.path.isdir(gd) else 0
        groups = sorted(range(n_blocks), key=_gsize, reverse=True)
        seg_stats = (ray.data.from_items([{"group": g} for g in groups])
                     .repartition(n_blocks)
                     .map_batches(encode_group, batch_format="pyarrow")
                     .to_pandas())
    else:
        raise ValueError(f"unknown shuffle mode {shuffle!r}")

    if seg_stats.empty:                        # zero-row corpus
        import pandas as _pd
        seg_stats = _pd.DataFrame({c: _pd.Series(dtype=t) for c, t in [
            ("part", "int64"), ("tp", "int64"), ("dr", "int64"),
            ("segment", "object"), ("n_terms", "int64"),
            ("n_postings", "int64"), ("resumed", "bool")]})
    if scatter_dir:
        _shutil.rmtree(scatter_dir, ignore_errors=True)
    if not resume_fwd:
        _shutil.rmtree(fwd_dir, ignore_errors=True)
        os.replace(fwd_tmp, fwd_dir)
        mf.atomic_write_json(fwd_meta, {"fingerprint": fwd_fp})
    timings["shuffle_encode"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    if shuffle == "objstore":
        # ---- doc stats rode the exchange as group=-1 rows and came back
        # as part=-2 manifest rows — no separate data pass
        srows = seg_stats[seg_stats["part"] == -2]
        n_docs = int(srows["n_terms"].sum()) if len(srows) else 0
        total_len = int(srows["n_postings"].sum()) if len(srows) else 0
        seg_stats = seg_stats[seg_stats["part"] != -2].reset_index(drop=True)
    avgdl = (total_len / n_docs) if n_docs else 0.0

    manifest = {
        "timings": timings,
        # per-stage throughput (north rule: per-stage metrics per run)
        "stage_throughput_docs_per_sec": {
            k: round(n_docs / v, 1) for k, v in timings.items() if v > 0},
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


def extend_index(corpus_new: "ray.data.Dataset", index_dir: str,
                 cfg: IndexConfig | None = None) -> dict:
    """Append new documents to an existing index WITHOUT rebuilding
    untouched segments — the realistic 100 TB operation (daily crawl
    increments; reference merge semantics InvertedIndexManager.java:845-953,
    Team12MergeTest.java:38-70).

    New doc_ids must be disjoint from the existing corpus's.  Only the
    (term_partition, doc_range) parts that receive new postings are
    re-encoded; a part whose doc range already holds old documents is
    rebuilt from old+new rows — the old rows come from the forward store's
    matching ``r=<range>`` partitions (partition-pruned read, never a full
    scan), re-exploded through the same path the build used, so the
    resulting segment is byte-identical to what ``build_index(A ∪ B)``
    writes.  Global BM25 stats (n_docs, avgdl) are recomputed from the
    forward store's pruned doc_len column.

    Not crash-resumable mid-extension: re-run ``build_index`` with
    ``resume=True`` to reconverge after a failure.
    """
    import time as _time
    import uuid as _uuid
    cfg = cfg or IndexConfig()
    index_dir = mf.resolve_alias(index_dir)   # aliases accepted everywhere
    manifest_path = os.path.join(index_dir, "manifest.json")
    m = mf.read_json(manifest_path)
    if not m:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    if m["cfg"] != _cfg_key(cfg):
        raise ValueError("extend_index cfg does not match the existing index")
    import ray as _ray
    from ..stages.shuffle import hash_partition
    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()
    fwd_dir = os.path.join(index_dir, "forward")
    gen = f"ext{_uuid.uuid4().hex[:8]}"
    P = cfg.num_term_partitions
    explode_fn = make_explode(P, cfg.doc_range_bits, cfg.positional)
    n_blocks = int(os.environ.get("PETERMAN_ENC_GROUPS", "0")) or 128

    tok = corpus_new.map_batches(
        _make_tokenize_sidewrite(cfg.analyzer, cfg.positional, fwd_dir,
                                 cfg.doc_range_bits, prefix=gen),
        batch_format="pyarrow")
    ex = tok.map_batches(explode_fn, batch_format="pyarrow")

    def encode_ext(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _manifest_row(part=-1, tp=-1, dr=-1, seg="", n_terms=0,
                                 n_postings=0, resumed=False).slice(0, 0)
        part = batch["part"].to_numpy()
        order = np.argsort(part, kind="stable")
        b = batch.take(order)
        part = part[order]
        starts = np.flatnonzero(np.concatenate(([True],
                                                part[1:] != part[:-1])))
        ends = np.append(starts[1:], part.size)
        out = []
        old_range_cache: dict[int, pa.Table | None] = {}
        for s, e in zip(starts, ends):
            p = int(part[s])
            dr = p // P
            old = old_range_cache.get(dr, False)
            if old is False:
                d = os.path.join(fwd_dir, f"r={dr}")
                olds = []
                if os.path.isdir(d):
                    for fname in mf.live_fragments(d):
                        # this generation's fragments are the NEW docs —
                        # everything else is the pre-existing corpus
                        if not fname.startswith(f"{gen}-"):
                            olds.append(pq.read_table(os.path.join(d, fname)))
                old = (explode_fn(pa.concat_tables(olds))
                       if olds else None)
                old_range_cache[dr] = old
            group = b.slice(s, e - s)
            if old is not None:
                keep = pc.equal(old["part"], p)
                old_rows = old.filter(keep)
                if old_rows.num_rows:
                    group = pa.concat_tables(
                        [old_rows, group.select(old_rows.column_names)])
            out.append(encode_segment(index_dir, cfg, group))
        return pa.concat_tables(out)

    seg_stats = (hash_partition(ex, ["part"], n_blocks)
                 .map_batches(encode_ext, batch_format="pyarrow")
                 .to_pandas())
    timings["extend_encode"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    def _dl_stats(bt: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([bt.num_rows], pa.int64()),
            "s": pa.array([int(pc.sum(bt["doc_len"]).as_py() or 0)],
                          pa.int64())})
    agg = (ray.data.read_parquet(mf.live_forward_files(fwd_dir),
                                 columns=["doc_len"])
           .map_batches(_dl_stats, batch_format="pyarrow").to_pandas())
    n_docs = int(agg["n"].sum())
    total_len = int(agg["s"].sum())
    timings["doc_stats"] = round(_time.perf_counter() - _t0, 3)

    # the forward checkpoint no longer corresponds to any single build
    # input — stamp it with this extension's generation so a later
    # build_index(resume=True) of the ORIGINAL corpus can't reuse it
    mf.atomic_write_json(os.path.join(index_dir, "forward.manifest.json"),
                         {"fingerprint": {"cfg": _cfg_key(cfg),
                                          "input": f"extended-{gen}"}})

    by_part = {int(r["part"]): r for r in m["segments"]}
    if len(seg_stats):
        for r in seg_stats.drop(columns=["resumed"]).to_dict("records"):
            if r["part"] >= 0:
                by_part[int(r["part"])] = r
    m.update({
        "timings": {**m.get("timings", {}), **timings},
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "segments": [by_part[k] for k in sorted(by_part)],
        "n_resumed_segments": 0,
    })
    mf.atomic_write_json(manifest_path, m)
    return m


def _fwd_doc_stats(fwd_dir: str) -> tuple[int, int]:
    """(n_docs, total_len) from the checkpoint's pruned doc_len column."""
    files = mf.live_forward_files(fwd_dir)
    if not files:
        return 0, 0

    def _dl(bt: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([bt.num_rows], pa.int64()),
            "s": pa.array([int(pc.sum(bt["doc_len"]).as_py() or 0)],
                          pa.int64())})
    agg = (ray.data.read_parquet(files, columns=["doc_len"])
           .map_batches(_dl, batch_format="pyarrow").to_pandas())
    return int(agg["n"].sum()), int(agg["s"].sum())


def compact_index(index_dir: str, cfg: IndexConfig | None = None) -> dict:
    """Physically remove tombstoned documents.

    Deletes are tombstone manifests applied at read time (reference
    deleteDocuments is an unimplemented stub; we exceed it) — compaction
    makes them physical: ONLY the doc ranges containing tombstones are
    rebuilt (their forward partitions rewritten without the deleted rows,
    their segments re-encoded from those rows); every other range's files
    are never read or written.  The result is byte-identical to building
    the surviving corpus from scratch (tested), and the tombstone manifest
    is cleared.
    """
    cfg = cfg or IndexConfig()
    index_dir = mf.resolve_alias(index_dir)   # aliases accepted everywhere
    manifest_path = os.path.join(index_dir, "manifest.json")
    m = mf.read_json(manifest_path)
    if not m:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    if m["cfg"] != _cfg_key(cfg):
        raise ValueError("compact_index cfg does not match the existing index")
    tomb_path = os.path.join(index_dir, "tombstones.json")
    tombs = np.asarray(mf.read_json(tomb_path) or [], dtype=np.int64)
    if tombs.size == 0:
        return m
    import shutil as _shutil
    fwd_dir = os.path.join(index_dir, "forward")
    P = cfg.num_term_partitions
    bits = cfg.doc_range_bits
    explode_fn = make_explode(P, bits, cfg.positional)
    affected = sorted({int(d) for d in (tombs >> bits)})
    tomb_ref = ray.put(tombs)
    seg_root = os.path.join(index_dir, "segments")
    old_parts_by_dr: dict[int, list[int]] = {}
    for r in m["segments"]:
        old_parts_by_dr.setdefault(int(r["dr"]), []).append(int(r["part"]))

    def compact_range(batch: pa.Table) -> pa.Table:
        rows = []
        for dr in batch["dr"].to_pylist():
            rdir = os.path.join(fwd_dir, f"r={dr}")
            frags = [os.path.join(rdir, f) for f in mf.live_fragments(rdir)]
            tbl = (pa.concat_tables([pq.read_table(f) for f in frags])
                   if frags else None)
            dead = ray.get(tomb_ref)
            if tbl is not None:
                keep = ~np.isin(tbl["doc_id"].to_numpy(), dead)
                tbl = tbl.filter(pa.array(keep))
            # rewrite the forward partition (single compacted fragment)
            import uuid
            _shutil.rmtree(rdir, ignore_errors=True)
            if tbl is not None and tbl.num_rows:
                os.makedirs(rdir, exist_ok=True)
                pq.write_table(tbl, os.path.join(
                    rdir, f"fwd-{uuid.uuid4().hex[:12]}.parquet"))
            # re-encode this range's segments from the surviving rows
            present: set[int] = set()
            if tbl is not None and tbl.num_rows:
                ex = explode_fn(tbl).combine_chunks()
                if ex.num_rows:
                    stats = encode_parts_block(index_dir, cfg, ex)
                    rows.append(stats)
                    present = {int(p) for p in stats["part"].to_pylist()}
            # parts that existed before but have no surviving postings
            for part in old_parts_by_dr.get(int(dr), []):
                if part in present:
                    continue
                tp = part % P
                for suffix in (".bin", ".dir.parquet", ".meta.json"):
                    p = os.path.join(seg_root, f"seg-{tp}-{dr}{suffix}")
                    if os.path.exists(p):
                        os.remove(p)
                rows.append(_manifest_row(part=-part - 1, tp=tp, dr=int(dr),
                                          seg="", n_terms=0, n_postings=0,
                                          resumed=False))
        if not rows:
            return _manifest_row(part=-1, tp=-1, dr=-1, seg="", n_terms=0,
                                 n_postings=0, resumed=False).slice(0, 0)
        return pa.concat_tables(rows)

    seg_stats = (ray.data.from_items([{"dr": dr} for dr in affected])
                 .repartition(len(affected))
                 .map_batches(compact_range, batch_format="pyarrow")
                 .to_pandas())

    by_part = {int(r["part"]): r for r in m["segments"]}
    # drop every old row of the affected ranges, then re-add survivors
    for dr in affected:
        for part in old_parts_by_dr.get(dr, []):
            by_part.pop(part, None)
    if len(seg_stats):
        for r in seg_stats.drop(columns=["resumed"]).to_dict("records"):
            if r["part"] >= 0:
                by_part[int(r["part"])] = r
    n_docs, total_len = _fwd_doc_stats(fwd_dir)
    m.update({
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "segments": [by_part[k] for k in sorted(by_part)],
        "n_resumed_segments": 0,
    })
    mf.atomic_write_json(manifest_path, m)
    mf.atomic_write_json(tomb_path, [])
    return m


def auto_compact(index_dir: str, cfg: IndexConfig | None = None,
                 max_fragments: int = 8) -> dict:
    """LSM roll-up policy for an incremental-ingest chain (reference
    threshold semantics: InvertedIndexManager.java:42,260-262 auto-merges
    at DEFAULT_MERGE_THRESHOLD=8 segments).

    In this layout the inverted segments never fragment — ``extend_index``
    re-encodes every touched (term_partition, doc_range) part in place —
    so the artifact a crawl chain fragments is the FORWARD doc store:
    each ingest generation side-writes new parquet fragments into the
    ``r=<range>/`` partitions it touches, and point-gets / later extends
    list-and-read every fragment in a range.  This policy rewrites any
    range partition holding ≥ ``max_fragments`` LIVE fragment files into
    one doc_id-sorted fragment — one Ray task per affected range,
    worker-side IO only, untouched ranges never read.

    Crash-safe at every instant (readers use ``mf.live_fragments``):
    the rollup task publishes a ``cmp-X.srcs.json`` sidecar naming the
    fragments it supersedes BEFORE the ``cmp-X.parquet`` lands, so a
    crash leaves either (sources live, cmp absent → sidecar inert) or
    (cmp + sidecar + sources → sources excluded) — never a duplicated
    doc; a later run sweeps the leftover dead files.  Re-running is
    idempotent.

    Returns {"ranges_compacted", "fragments_before", "fragments_after"}.
    """
    import uuid as _uuid

    import ray as _ray
    cfg = cfg or IndexConfig()
    fwd_dir = os.path.join(index_dir, "forward")
    affected: list[tuple[str, list[str]]] = []
    total_before = total_after = 0
    if os.path.isdir(fwd_dir):
        for rname in sorted(os.listdir(fwd_dir)):
            d = os.path.join(fwd_dir, rname)
            if not (rname.startswith("r=") and os.path.isdir(d)):
                continue
            frags = mf.live_fragments(d)
            # sweep a crashed rollup's leftovers: superseded-but-present
            # fragments (invisible to readers), inert sidecars (no cmp
            # parquet ever landed), and fully-applied sidecars (every
            # listed source already gone)
            live = set(frags)
            names = sorted(os.listdir(d))
            for f in names:
                if f.endswith(".parquet") and f not in live:
                    os.unlink(os.path.join(d, f))
            for f in names:
                if not f.endswith(".srcs.json"):
                    continue
                cmp_p = os.path.join(d, f[:-10] + ".parquet")
                srcs = mf.read_json(os.path.join(d, f)) or []
                if not os.path.exists(cmp_p) or not any(
                        os.path.exists(os.path.join(d, s)) for s in srcs):
                    os.unlink(os.path.join(d, f))
            total_before += len(frags)
            if len(frags) >= max_fragments:
                affected.append((d, frags))
            else:
                total_after += len(frags)

    @_ray.remote
    def rollup(d: str, frags: list[str]) -> int:
        t = pa.concat_tables([pq.read_table(os.path.join(d, f))
                              for f in frags])
        order = np.argsort(t["doc_id"].to_numpy(), kind="stable")
        merged = t.take(order)
        name = f"cmp-{_uuid.uuid4().hex[:12]}"
        # 1. sidecar first (atomic): inert until the cmp parquet exists
        mf.atomic_write_json(os.path.join(d, f"{name}.srcs.json"), frags)
        # 2. merged parquet via tmp + atomic publish — from this instant
        #    readers exclude the superseded sources
        tmp = os.path.join(d, f".{name}.tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(d, f"{name}.parquet"))
        # 3. drop the (now-invisible) sources, sidecar last
        for f in frags:
            os.unlink(os.path.join(d, f))
        os.unlink(os.path.join(d, f"{name}.srcs.json"))
        return merged.num_rows

    if affected:
        _ray.get([rollup.remote(d, frags) for d, frags in affected])
    total_after += len(affected)
    return {"ranges_compacted": len(affected),
            "fragments_before": total_before,
            "fragments_after": total_after}


def ingest(corpus_new: "ray.data.Dataset", index_dir: str,
           cfg: IndexConfig | None = None,
           merge_threshold: int = 8) -> dict:
    """One step of the continuously-crawling deployment loop:
    ``extend_index`` the new documents, then apply the LSM roll-up
    policy (:func:`auto_compact`) so fragment counts stay bounded no
    matter how long the ingest chain runs — the policy the reference
    hard-wires into addDocument (merge at 8 segments), expressed over
    this engine's mechanisms."""
    m = extend_index(corpus_new, index_dir, cfg)
    stats = auto_compact(index_dir, cfg, max_fragments=merge_threshold)
    m["auto_compact"] = stats
    return m


def merge_indexes(index_a: str, index_b: str, out_dir: str,
                  cfg: IndexConfig | None = None) -> dict:
    """Merge two independently built indexes into a new one — the
    distributed analog of the reference's segment merge
    (InvertedIndexManager.java:845-953 merges segment pairs of one index;
    here two whole indexes merge in one streaming pass).

    Requires identical configs and disjoint doc_id sets.  Doc ranges held
    by only ONE input are adopted by straight file copy — segments are
    immutable, so nothing is decoded or re-encoded for them; ranges where
    BOTH inputs hold documents are re-encoded from the two forward
    partitions (partition-pruned reads, the same path ``extend_index``
    uses).  The output is byte-identical to ``build_index`` over the union
    corpus (tested), so merged indexes are indistinguishable from
    single-build indexes to every reader.

    Scale shape: one Ray task per doc range (copy or re-encode), driver
    state O(segments) manifest rows — at web scale this is how per-shard
    or per-crawl indexes built independently roll up into one serving
    index without touching the raw corpus again.
    """
    import shutil as _shutil
    cfg = cfg or IndexConfig()
    index_a = mf.resolve_alias(index_a)       # aliases accepted everywhere
    index_b = mf.resolve_alias(index_b)
    ma = mf.read_json(os.path.join(index_a, "manifest.json"))
    mb = mf.read_json(os.path.join(index_b, "manifest.json"))
    if not ma or not mb:
        raise FileNotFoundError("both inputs need an index manifest")
    if ma["cfg"] != _cfg_key(cfg) or mb["cfg"] != _cfg_key(cfg):
        raise ValueError("merge_indexes: configs do not match")
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    fwd_out = os.path.join(out_dir, "forward")
    P = cfg.num_term_partitions
    explode_fn = make_explode(P, cfg.doc_range_bits, cfg.positional)

    def _ranges(d: str) -> set[int]:
        fd = os.path.join(d, "forward")
        return ({int(n.split("=", 1)[1]) for n in os.listdir(fd)
                 if n.startswith("r=")} if os.path.isdir(fd) else set())

    ra, rb = _ranges(index_a), _ranges(index_b)

    def merge_range(batch: pa.Table) -> pa.Table:
        rows = []
        for dr in batch["dr"].to_pylist():
            dr = int(dr)
            srcs = [d for d, rs in ((index_a, ra), (index_b, rb))
                    if dr in rs]
            rdir_out = os.path.join(fwd_out, f"r={dr}")
            os.makedirs(rdir_out, exist_ok=True)
            for si, src in enumerate(srcs):
                rdir = os.path.join(src, "forward", f"r={dr}")
                for fname in mf.live_fragments(rdir):
                    _shutil.copy2(os.path.join(rdir, fname),
                                  os.path.join(rdir_out,
                                               f"m{si}-{fname}"))
            if len(srcs) == 1:
                # exclusive range: adopt the immutable segment files as-is
                seg_src = os.path.join(srcs[0], "segments")
                for tp in range(P):
                    for suffix in (".bin", ".dir.parquet", ".meta.json"):
                        p = os.path.join(seg_src, f"seg-{tp}-{dr}{suffix}")
                        if os.path.exists(p):
                            _shutil.copy2(p, os.path.join(
                                out_dir, "segments", os.path.basename(p)))
                continue
            # shared range: rebuild its segments from old+old forward rows
            frags = []
            for src in srcs:
                rdir = os.path.join(src, "forward", f"r={dr}")
                frags += [pq.read_table(os.path.join(rdir, f))
                          for f in mf.live_fragments(rdir)]
            tbl = pa.concat_tables(frags)
            ids = tbl["doc_id"].to_numpy()
            if np.unique(ids).size != ids.size:
                raise ValueError(
                    f"merge_indexes: doc_id overlap in doc range {dr}")
            ex = explode_fn(tbl).combine_chunks()
            if ex.num_rows:
                rows.append(encode_parts_block(out_dir, cfg, ex))
        if not rows:
            return _manifest_row(part=-1, tp=-1, dr=-1, seg="", n_terms=0,
                                 n_postings=0, resumed=False).slice(0, 0)
        return pa.concat_tables(rows)

    all_dr = sorted(ra | rb)
    shared = ra & rb
    if all_dr:
        seg_stats = (ray.data.from_items([{"dr": dr} for dr in all_dr])
                     .repartition(len(all_dr))
                     .map_batches(merge_range, batch_format="pyarrow")
                     .to_pandas())
    else:
        seg_stats = None

    # manifest: adopted rows come from the source manifests, shared-range
    # rows from the re-encode stats
    segments = [r for src_m, excl in ((ma, ra - shared), (mb, rb - shared))
                for r in src_m["segments"] if int(r["dr"]) in excl]
    if seg_stats is not None and len(seg_stats):
        segments += [r for r in seg_stats.drop(columns=["resumed"])
                     .to_dict("records") if r["part"] >= 0]
    segments.sort(key=lambda r: int(r["part"]))
    n_docs, total_len = _fwd_doc_stats(fwd_out)
    if n_docs != int(ma["n_docs"]) + int(mb["n_docs"]):
        raise ValueError("merge_indexes: doc_id overlap across inputs")
    tombs = sorted(set(mf.read_json(os.path.join(index_a,
                                                 "tombstones.json")) or [])
                   | set(mf.read_json(os.path.join(index_b,
                                                   "tombstones.json")) or []))
    manifest = {
        "cfg": _cfg_key(cfg),
        "bm25": {"k1": cfg.k1, "b": cfg.b},
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "segments": segments,
        "n_resumed_segments": 0,
        "merged_from": [os.path.abspath(index_a), os.path.abspath(index_b)],
    }
    mf.atomic_write_json(os.path.join(out_dir, "manifest.json"), manifest)
    # a later build_index(out_dir, resume=True) must not mistake the merged
    # forward store for its own checkpoint — fingerprint it as merged
    mf.atomic_write_json(os.path.join(out_dir, "forward.manifest.json"),
                         {"fingerprint": {"cfg": _cfg_key(cfg),
                                          "input": ["merged",
                                                    manifest["merged_from"]]}})
    if tombs:
        mf.atomic_write_json(os.path.join(out_dir, "tombstones.json"), tombs)
    return manifest
