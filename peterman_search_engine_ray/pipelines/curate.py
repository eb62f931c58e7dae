"""End-to-end training-corpus curation: quality filter → exact dedup →
near-dup removal → resumable partitioned parquet output.

The composite pipeline a 100 TB pre-training corpus actually runs, built
from the engine's own operators:

1. **quality** — map-side integer heuristics (functions/textstats):
   ≥10 tokens, stopword ratio ≤ 0.6, type/token ratio ≥ 0.5.
2. **exact dedup** — md5 → keep the smallest doc_id per identical text
   (stages/dedup.exact_dedup).
3. **near-dup removal** — MinHash-LSH candidates + exact-Jaccard verify
   (stages/dedup.minhash_lsh_pairs); a doc is removed when it is the
   LARGER id of any verified pair ("keep first" — deterministic and
   SQL-expressible, no connected-components pass).
4. **write** — survivors stream to parquet PARTITIONED by doc range
   (``r=<doc_id >> range_bits>/``) under a manifest fingerprint: a re-run
   whose input+config fingerprint validates skips the write wholesale
   (resumable output; downstream consumers read per-range partitions).

Loser sets are result-scale; they broadcast via ``ray.put`` and the final
filter is map-side — the corpus itself never collects on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.textstats import text_stats_batch
from ..state import manifest as mf
from ..stages.dedup import exact_dedup, minhash_lsh_pairs


def curate_corpus(docs_ds: "ray.data.Dataset", out_dir: str | None = None,
                  *, tau_num: int = 1, tau_den: int = 2,
                  range_bits: int = 12, input_token=None,
                  near_pairs: pd.DataFrame | None = None) -> pd.DataFrame:
    """Run the full curation over (doc_id, text); returns the surviving
    doc_ids (sorted DataFrame).  If ``out_dir`` is given, survivors are
    also written as range-partitioned parquet with a resume manifest."""
    # 1. quality survivors (map-side; ids only leave the stage)
    def quality_ids(batch: pa.Table) -> pa.Table:
        st = text_stats_batch(batch)
        n_tok = st["n_tokens"].to_numpy()
        n_stop = st["n_stop"].to_numpy()
        n_types = st["n_types"].to_numpy()
        m = (n_tok >= 10) & (n_stop * 10 <= n_tok * 6) & \
            (n_types * 2 >= n_tok)
        return pa.table({"doc_id": st["doc_id"].filter(pa.array(m))})

    qdf = (docs_ds.map_batches(quality_ids, batch_format="pyarrow")
           .to_pandas())
    quality = set(qdf["doc_id"].tolist()) if "doc_id" in qdf else set()

    # 2. exact-dup losers = all docs minus per-hash winners
    wdf = exact_dedup(docs_ds).to_pandas()
    winners = set(wdf["doc_id"].tolist()) if "doc_id" in wdf else set()

    # 3. near-dup losers: larger id of every verified pair
    pairs = (near_pairs if near_pairs is not None else
             minhash_lsh_pairs(docs_ds, tau_num=tau_num, tau_den=tau_den))
    near_losers = set(pairs["b"].tolist())

    keep = np.array(sorted((quality & winners) - near_losers),
                    dtype=np.int64)

    if out_dir is not None:
        fp = {"survivors": int(keep.sum()), "n": int(keep.size),
              "range_bits": range_bits, "tau": [tau_num, tau_den],
              "input": input_token}
        # manifest lives BESIDE the data dir so parquet readers of
        # out_dir never trip on a stray json
        meta = os.path.normpath(out_dir) + ".manifest.json"
        if not mf.manifest_valid(meta, fp):
            keep_ref = ray.put(keep)

            def keep_filter(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy()
                m = np.isin(ids, ray.get(keep_ref))
                out = batch.filter(pa.array(m))
                r = pa.array(out["doc_id"].to_numpy() >> range_bits,
                             pa.int64())
                return out.append_column("r", r)

            (docs_ds.map_batches(keep_filter, batch_format="pyarrow")
                    .write_parquet(out_dir, partition_cols=["r"]))
            mf.write_manifest(meta, fp, [])
    return pd.DataFrame({"doc_id": pd.Series(keep, dtype=np.int64)})
