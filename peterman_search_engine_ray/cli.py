"""Command-line entry points — the operational surface of the engine.

    python -m peterman_search_engine_ray.cli build --input DIR_OR_PARQUET \
        --index /tmp/idx [--analyzer porter] [--partitions 64] [--no-positions]
    python -m peterman_search_engine_ray.cli query --index /tmp/idx \
        [--mode bm25|bm25_pruned|tfidf|and|or|phrase] [-k 10] TERMS...
    python -m peterman_search_engine_ray.cli compact --index /tmp/idx
    python -m peterman_search_engine_ray.cli stats --index /tmp/idx
    python -m peterman_search_engine_ray.cli delete --index /tmp/idx DOC_ID...

The CLI owns its Ray session (guarded init; the library never calls
ray.init).  --input accepts a parquet file/dir with either the web-page
schema (url, warc_ts, html, text, lang[, doc_id]) or the documents schema
(doc_id, text[, lang]) — the latter is wrapped into synthetic pages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    ray = _ray_init(args.num_cpus)
    import ray.data as rd
    from .config import IndexConfig
    from .corpus import _wrap_batch
    from .pipelines.build import build_index

    ds = rd.read_parquet(args.input)
    cols = set(ds.schema().names)
    if "html" in cols:
        if "doc_id" not in cols:
            # the Common-Crawl input_hint schema carries no doc_id —
            # assign stable dense ids from parquet-footer offsets
            from .corpus import read_webpages
            ds = read_webpages(args.input)
    else:
        if not {"doc_id", "text"} <= cols:
            print("input needs (url, warc_ts, html, text, lang) or "
                  "(doc_id, text)", file=sys.stderr)
            return 2
        ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    cfg = IndexConfig(num_term_partitions=args.partitions,
                      doc_range_bits=args.doc_range_bits,
                      positional=not args.no_positions,
                      analyzer=args.analyzer)
    from .state import manifest as mf
    token = sorted(mf.input_fingerprint(
        [args.input] if os.path.isfile(args.input) else
        [os.path.join(args.input, f) for f in sorted(os.listdir(args.input))
         if f.endswith(".parquet")]).items())
    manifest = build_index(ds, args.index, cfg, resume=not args.no_resume,
                           input_token=token)
    print(json.dumps({k: manifest[k] for k in
                      ("n_docs", "avgdl", "timings", "n_resumed_segments")}
                     | {"n_segments": len(manifest["segments"])}))
    ray.shutdown()
    return 0


def cmd_extend(args) -> int:
    ray = _ray_init(args.num_cpus)
    import ray.data as rd
    from .config import IndexConfig
    from .corpus import _wrap_batch
    from .pipelines.build import extend_index

    ds = rd.read_parquet(args.input)
    if "html" not in set(ds.schema().names):
        ds = ds.map_batches(_wrap_batch, batch_format="pyarrow")
    cfg = IndexConfig(num_term_partitions=args.partitions,
                      doc_range_bits=args.doc_range_bits,
                      positional=not args.no_positions,
                      analyzer=args.analyzer)
    manifest = extend_index(ds, args.index, cfg)
    print(json.dumps({k: manifest[k] for k in ("n_docs", "avgdl", "timings")}
                     | {"n_segments": len(manifest["segments"])}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    ray = _ray_init(args.num_cpus)
    from .config import IndexConfig
    from .pipelines.build import compact_index
    cfg = IndexConfig(num_term_partitions=args.partitions,
                      doc_range_bits=args.doc_range_bits,
                      positional=not args.no_positions,
                      analyzer=args.analyzer)
    manifest = compact_index(args.index, cfg)
    print(json.dumps({"n_docs": manifest["n_docs"],
                      "n_segments": len(manifest["segments"])}))
    ray.shutdown()
    return 0


def cmd_merge(args) -> int:
    """Roll two independently built indexes up into one (left-fold over
    --index-a/--index-b; chain invocations to merge more shards)."""
    ray = _ray_init(args.num_cpus)
    from .config import IndexConfig
    from .pipelines.build import merge_indexes
    cfg = IndexConfig(num_term_partitions=args.partitions,
                      doc_range_bits=args.doc_range_bits,
                      positional=not args.no_positions,
                      analyzer=args.analyzer)
    manifest = merge_indexes(args.index_a, args.index_b, args.out, cfg)
    print(json.dumps({"n_docs": manifest["n_docs"],
                      "n_segments": len(manifest["segments"])}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    from .pipelines.query import IndexReader
    r = IndexReader(args.index)
    terms = args.terms
    mode = args.mode
    if mode in ("and", "or", "phrase", "keyword", "not", "near", "bool"):
        d = {"and": r.search_and, "or": r.search_or,
             "phrase": r.search_phrase,
             "keyword": lambda t: r.search_keyword(t[0]),
             "not": lambda t: r.search_not(t, args.exclude or []),
             "near": lambda t: r.search_near(t, window=args.window),
             "bool": lambda t: r.search_boolean(" ".join(t))}[mode](terms)
        print(json.dumps({"doc_ids": d.tolist()[:args.k] if args.k else d.tolist(),
                          "total": int(d.size)}))
        return 0
    fn = {"bm25": r.bm25_topk, "bm25_pruned": r.bm25_topk_pruned,
          "bm25_auto": r.bm25_topk_auto, "tfidf": r.tfidf_topk,
          "bm25f": r.bm25f_topk}[mode]
    d, s = fn(terms, args.k)
    docs = r.get_docs(d) if d.size else None
    urls = (docs.set_index("doc_id")["url"].to_dict() if docs is not None
            else {})
    print(json.dumps({"results": [
        {"rank": i, "doc_id": int(di), "score": float(si),
         "url": urls.get(int(di), "")}
        for i, (di, si) in enumerate(zip(d, s))]}))
    return 0


def cmd_stats(args) -> int:
    from .pipelines.query import IndexReader
    r = IndexReader(args.index)
    m = r.manifest
    print(json.dumps({
        "n_docs": m["n_docs"], "avgdl": m["avgdl"],
        "n_segments": len(m["segments"]),
        "n_postings": sum(s["n_postings"] for s in m["segments"]),
        "cfg": m["cfg"], "n_tombstones": int(r._tombstones().size),
    }))
    return 0


def cmd_alias(args) -> int:
    from .state import manifest as mf
    mf.set_alias(args.alias, args.index)
    print(json.dumps({"alias": args.alias,
                      "index_dir": mf.resolve_alias(args.alias)}))
    return 0


def cmd_delete(args) -> int:
    from .pipelines.query import IndexReader
    r = IndexReader(args.index)
    total = r.delete_documents([int(x) for x in args.doc_ids])
    print(json.dumps({"n_tombstones": total}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="peterman_search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--analyzer", default="porter",
                   choices=["porter", "nostem", "naive"])
    b.add_argument("--partitions", type=int, default=64)
    b.add_argument("--doc-range-bits", type=int, default=20)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    e = sub.add_parser("extend")
    e.add_argument("--input", required=True)
    e.add_argument("--index", required=True)
    e.add_argument("--analyzer", default="porter",
                   choices=["porter", "nostem", "naive"])
    e.add_argument("--partitions", type=int, default=64)
    e.add_argument("--doc-range-bits", type=int, default=20)
    e.add_argument("--no-positions", action="store_true")
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_extend)

    cp = sub.add_parser("compact")
    cp.add_argument("--index", required=True)
    cp.add_argument("--analyzer", default="porter",
                    choices=["porter", "nostem", "naive"])
    cp.add_argument("--partitions", type=int, default=64)
    cp.add_argument("--doc-range-bits", type=int, default=20)
    cp.add_argument("--no-positions", action="store_true")
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    mg = sub.add_parser("merge")
    mg.add_argument("--index-a", required=True)
    mg.add_argument("--index-b", required=True)
    mg.add_argument("--out", required=True)
    mg.add_argument("--analyzer", default="porter",
                    choices=["porter", "nostem", "naive"])
    mg.add_argument("--partitions", type=int, default=64)
    mg.add_argument("--doc-range-bits", type=int, default=20)
    mg.add_argument("--no-positions", action="store_true")
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--mode", default="bm25_auto",
                   choices=["bm25", "bm25_pruned", "bm25_auto", "bm25f",
                            "tfidf", "and", "or", "phrase", "keyword",
                            "not", "near", "bool"])
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--exclude", nargs="*", default=None,
                   help="excluded keywords for --mode not")
    q.add_argument("--window", type=int, default=3,
                   help="position window for --mode near")
    q.add_argument("terms", nargs="+")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("stats")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=cmd_stats)

    al = sub.add_parser("alias", help="atomically point an alias file at "
                        "an index dir (blue/green reindex switch); every "
                        "--index flag accepts the alias file afterwards")
    al.add_argument("--alias", required=True)
    al.add_argument("--index", required=True)
    al.set_defaults(fn=cmd_alias)

    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("doc_ids", nargs="+")
    d.set_defaults(fn=cmd_delete)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
