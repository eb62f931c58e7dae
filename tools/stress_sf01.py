"""10×-scale stress pass: run the heavier driver queries at sf0.1 (5,000
docs / 100,000 events) and report wall time + row counts.

Correctness is gated at sf0.01; this catches scale-dependent silent-loss
bugs the small tables cannot (it found the MinHash verify-cap bug that
dropped all 256 true pairs at 5k docs).

Usage: python tools/stress_sf01.py [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["windowed_counts", "sessionize", "props_stats",
           "embedding_neardup", "ann_cosine_top20", "simhash_pairs",
           "minhash_pairs", "dedup_clusters", "dedup_exact",
           "orders_by_nation",
           "top_docs_per_source", "fingerprints", "curate_corpus",
           "snippets", "stratified_sample", "doc_len_quantiles",
           "spell_correct", "related_terms", "more_like_this",
           "prefix_search", "windowed_unique_users", "chunk_dedup",
           "top_bigrams", "anchor_counts", "curated_search",
           "commonness", "contamination", "facet_search", "batch_bm25",
           "merged_search", "delete_compact_search", "proximity_search",
           "autocomplete", "pii_redact", "repetition_stats",
           "infix_search", "regex_search", "zone_search",
           "time_range_search", "bm25_page2", "filtered_bm25",
           "lang_routed_search", "url_latest", "upsert_search",
           "host_pagerank", "hybrid_search", "fuzzy_search", "pmi_pairs",
           "keywords_per_doc", "crawl_delta", "source_dup_stats",
           "sequence_pack", "lang_confusion", "lm_quality", "dup_ngrams",
           "dup_spans", "topic_clusters", "heavy_hitters", "bm25f_top10",
           "percolate", "collapsed_search", "term_vectors", "funnel",
           "sliding_counts", "coview_pairs", "retention", "trending_terms",
           "hits_top20", "filter_chain", "langid_trained", "knn_graph",
           "batch_ann", "cocitation_top", "bibcoupling_top",
           "dsir_weights", "mixture_weights", "novelty_scores"]


def main():
    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e
    qs = e.queries()
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    failed = 0
    for name in names:
        t0 = time.time()
        try:
            out = qs[name](sf)
            n = len(out.to_pandas() if hasattr(out, "to_pandas") else out)
            print(f"{name}: {round(time.time() - t0, 1)}s rows={n}")
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {ex}")
            failed += 1
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
