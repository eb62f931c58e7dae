"""End-to-end training-corpus curation: quality filter → exact dedup →
near-dup removal → resumable partitioned parquet output.

The composite pipeline a 100 TB pre-training corpus actually runs, built
from the engine's own operators:

1. **quality** — map-side integer heuristics (functions/textstats):
   ≥10 tokens, stopword ratio ≤ 0.6, type/token ratio ≥ 0.5.  A per-row
   predicate — applied inside the survivor filter, never collected.
2. **exact dedup** — md5 → keep the smallest doc_id per identical text.
   The stage emits the LOSERS (stages/dedup.exact_dedup_losers): only
   actual duplicates, a result-scale set, where the winner set is the
   corpus itself.
3. **near-dup removal** — MinHash-LSH candidates + exact-Jaccard verify
   (stages/dedup.minhash_lsh_pairs); a doc is removed when it is the
   LARGER id of any verified pair ("keep first" — deterministic and
   SQL-expressible, no connected-components pass).
4. **write** — survivors stream to parquet PARTITIONED by doc range
   (``r=<doc_id >> range_bits>/``) under a manifest fingerprint: a re-run
   whose input+config fingerprint validates skips the write wholesale
   (resumable output; downstream consumers read per-range partitions).

Driver state is LOSER-scale only: the exact-dup and near-dup loser ids
broadcast once via ``ray.put`` and every filter is map-side (quality
predicate AND NOT-a-loser).  The corpus never collects on the driver —
the only corpus-wide frame is the returned survivor-id result itself
(at scale, consume the partitioned ``out_dir`` instead of the frame).
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
from ..stages.dedup import exact_dedup_losers, minhash_lsh_pairs


def curate_corpus(docs_ds: "ray.data.Dataset", out_dir: str | None = None,
                  *, tau_num: int = 1, tau_den: int = 2,
                  range_bits: int = 12, input_token=None,
                  near_pairs: pd.DataFrame | None = None) -> pd.DataFrame:
    """Run the full curation over (doc_id, text); returns the surviving
    doc_ids (sorted DataFrame).  If ``out_dir`` is given, survivors are
    also written as range-partitioned parquet with a resume manifest."""
    # loser sets — RESULT-scale (duplicates only), safe to broadcast
    edf = exact_dedup_losers(docs_ds).to_pandas()
    exact_losers = (edf["doc_id"].to_numpy().astype(np.int64)
                    if "doc_id" in edf and len(edf)
                    else np.empty(0, np.int64))
    pairs = (near_pairs if near_pairs is not None else
             minhash_lsh_pairs(docs_ds, tau_num=tau_num, tau_den=tau_den))
    near_losers = (pairs["b"].to_numpy().astype(np.int64) if len(pairs)
                   else np.empty(0, np.int64))
    losers = np.unique(np.concatenate([exact_losers, near_losers]))
    losers_ref = ray.put(losers)

    def survive(batch: pa.Table) -> pa.Table:
        """Map-side survivor filter: quality predicate ∧ not-a-loser."""
        st = text_stats_batch(batch)
        n_tok = st["n_tokens"].to_numpy()
        n_stop = st["n_stop"].to_numpy()
        n_types = st["n_types"].to_numpy()
        m = (n_tok >= 10) & (n_stop * 10 <= n_tok * 6) & \
            (n_types * 2 >= n_tok)
        m &= ~np.isin(batch["doc_id"].to_numpy(), ray.get(losers_ref))
        return batch.filter(pa.array(m))

    def ids_only(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id"])

    if out_dir is not None:
        fp = {"losers": int(losers.sum()), "n_losers": int(losers.size),
              "range_bits": range_bits, "tau": [tau_num, tau_den],
              "input": input_token}
        # manifest lives BESIDE the data dir so parquet readers of
        # out_dir never trip on a stray json
        meta = os.path.normpath(out_dir) + ".manifest.json"
        if not mf.manifest_valid(meta, fp):
            import shutil
            shutil.rmtree(out_dir, ignore_errors=True)  # stale partials

            def with_range(batch: pa.Table) -> pa.Table:
                out = survive(batch)
                r = pa.array(out["doc_id"].to_numpy() >> range_bits,
                             pa.int64())
                return out.append_column("r", r)

            (docs_ds.map_batches(with_range, batch_format="pyarrow")
                    .write_parquet(out_dir, partition_cols=["r"]))
            mf.write_manifest(meta, fp, [])
        # the result ids come from the written partitions (column-pruned
        # read) — the resume path never re-filters the corpus
        ids = (ray.data.read_parquet(out_dir, columns=["doc_id"])
               .to_pandas()["doc_id"].to_numpy()
               if os.path.isdir(out_dir) else np.empty(0, np.int64))
    else:
        idf = (docs_ds.map_batches(survive, batch_format="pyarrow")
               .map_batches(ids_only, batch_format="pyarrow")
               .to_pandas())
        ids = (idf["doc_id"].to_numpy() if "doc_id" in idf and len(idf)
               else np.empty(0, np.int64))
    keep = np.sort(np.asarray(ids, dtype=np.int64))
    return pd.DataFrame({"doc_id": pd.Series(keep, dtype=np.int64)})
