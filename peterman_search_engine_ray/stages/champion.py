"""Champion lists (tiered index, Manning IR §7.1.3): per term, the m
docs with the highest tf, precomputed as a bucketed parquet artifact so
a query reads ONLY its terms' buckets — the classic first tier of
impact-ordered serving at web scale, where evaluating full postings for
common terms is the latency bill.

Construction is one keyed exchange: (term, doc_id, tf) rows
hash-partition by term bucket (every term wholly in one block), each
block takes its terms' top-m by (tf desc, doc_id asc), and the output
writes hive-partitioned by bucket (the kgram.py artifact pattern —
manifest-last, idempotent per input fingerprint).  Probe cost is the
query terms' champion rows, never the vocabulary or the postings.

No reference analog (the reference evaluates full postings,
``InvertedIndexManager.java:571-668``); this is the tier a user adds in
front of it.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..state import manifest as mf
from .kgram import gram_bucket

CHAMP_M = 8
NUM_BUCKETS = 16
_LAYOUT = "champ-v1"


def _bucketed(num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        terms = batch["term"].combine_chunks()
        import pyarrow.compute as pc
        uniq = pc.unique(terms)
        bmap = {t: gram_bucket(t, num_buckets) for t in uniq.to_pylist()}
        idx = pc.index_in(terms, uniq).to_numpy(zero_copy_only=False)
        bv = np.array([bmap[t] for t in uniq.to_pylist()], np.int64)
        return pa.table({"term": terms, "doc_id": batch["doc_id"],
                         "tf": batch["tf"],
                         "b": pa.array(bv[idx], pa.int64())})
    return fn


def _topm_block(m: int):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["term", "tf", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("term", sort=False).head(m)
        return pa.Table.from_pandas(df, preserve_index=False)
    return fn


def build_champions(exploded_ds: "ray.data.Dataset", out_dir: str,
                    fingerprint: dict, m: int = CHAMP_M,
                    num_buckets: int = NUM_BUCKETS) -> str:
    """(term, doc_id, tf) Dataset → ``out_dir/b=<bucket>/`` champion
    parquet.  Exact: the keyed exchange puts every term wholly in one
    block, so the per-block head-m IS the global top-m."""
    from .shuffle import hash_partition
    mpath = os.path.join(out_dir, "MANIFEST.json")
    fp = dict(fingerprint)
    fp["__layout__"] = f"{_LAYOUT}-m{m}"
    if mf.manifest_valid(mpath, fp):
        return out_dir
    import shutil
    d = os.path.join(out_dir, "data")
    shutil.rmtree(d, ignore_errors=True)
    (hash_partition(
        exploded_ds.select_columns(["term", "doc_id", "tf"])
        .map_batches(_bucketed(num_buckets), batch_format="pyarrow"),
        ["b"], num_buckets)
     .map_batches(_topm_block(m), batch_format="pyarrow")
     .write_parquet(d, partition_cols=["b"]))
    mf.write_manifest(mpath, fp, [])
    return out_dir


def champion_rows(champ_dir: str, terms: list[str],
                  num_buckets: int = NUM_BUCKETS,
                  stats: dict | None = None) -> pd.DataFrame:
    """Champion (term, doc_id, tf) rows for the query terms: reads ONLY
    their buckets (partition pruning) with a term IN-filter (row-group
    pruning) — ≤ m·|terms| result rows."""
    import pyarrow.dataset as pads
    need = sorted(set(terms))
    buckets = sorted({gram_bucket(t, num_buckets) for t in need})
    paths = [os.path.join(champ_dir, "data", f"b={b}") for b in buckets]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        if stats is not None:
            stats.update(buckets_read=0, rows_read=0)
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "doc_id": pd.Series(dtype=np.int64),
                             "tf": pd.Series(dtype=np.int64)})
    dset = pads.dataset([pads.dataset(p, format="parquet")
                         for p in paths])
    t = dset.to_table(columns=["term", "doc_id", "tf"],
                      filter=pads.field("term").isin(need))
    if stats is not None:
        stats.update(buckets_read=len(paths), rows_read=t.num_rows)
    return t.to_pandas()


def champion_topk(champ_dir: str, terms: list[str], k: int = 10,
                  num_buckets: int = NUM_BUCKETS,
                  stats: dict | None = None) -> pd.DataFrame:
    """Tier-1 retrieval: union of the query terms' champion lists scored
    by Σ tf (a doc outside a term's champion list contributes 0 for that
    term — the standard champion approximation, deterministic and
    integer-exact), top-k by (score desc, doc_id asc)."""
    rows = champion_rows(champ_dir, terms, num_buckets, stats)
    if rows.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.int64)})
    agg = rows.groupby("doc_id", as_index=False)["tf"].sum()
    agg = agg.rename(columns={"tf": "score"})
    agg = agg.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(k)
    return agg.astype({"doc_id": np.int64,
                       "score": np.int64}).reset_index(drop=True)
