"""Engine configuration.

The reference engine exposes tunable static thresholds
(DEFAULT_FLUSH_THRESHOLD=1000, DEFAULT_MERGE_THRESHOLD=8, PAGE_SIZE=4096;
reference InvertedIndexManager.java:34,42, PageFileChannel.java:41).
Here the equivalent knobs are partition counts, posting-block size and
batch sizes, carried in one dataclass so tests can shrink them.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class IndexConfig:
    # --- partitioning (the scale knobs) -------------------------------
    # Number of term partitions: every posting for a term lives in
    # segments of exactly one term partition (hash(term) % num_term_partitions).
    num_term_partitions: int = 8
    # Documents are range-bucketed by doc_id >> doc_range_bits; each
    # (term_partition, doc_range) pair is one immutable segment — the
    # Ray-native analogue of the reference's 1000-doc LSM segments
    # (InvertedIndexManager.java:199-202).  Bounds the size of any one
    # shuffle group, which is how hot/skewed terms are kept from
    # materializing one giant group: a term's postings are split across
    # doc ranges (sorted, disjoint → concat at query time, no merge).
    doc_range_bits: int = 62  # default: one doc range (small corpora)

    # --- posting layout ----------------------------------------------
    # Entries per posting block; each block gets a skip pointer
    # (last doc_id + byte offset) and a block-max tf/doc-len pair for
    # block-max WAND pruning.  128 is the standard block size in the
    # block-max WAND literature (Ding & Suel, SIGIR 2011).
    block_size: int = 128
    positional: bool = True  # store per-(term,doc) position lists
    # posting codec: "varbyte" (delta+varbyte, reference
    # DeltaVarLenCompressor), "naive" (raw 4-byte BE, NaiveCompressor), or
    # "bitpack" (delta + frame-of-reference bitpacking; 2-4x smaller than
    # varbyte on dense posting blocks) — the reference's pluggable
    # Compressor interface (Compressor.java:6-27).  bitpack is the default:
    # measured at sf0.1/32cpu it builds no slower than varbyte and shrinks
    # the postings section 2-4x — at 100 TB the postings bytes are the
    # index's IO bill (BASELINE.md has the comparison table)
    codec: str = "bitpack"
    # position-stream codec, independently chosen: per-posting position
    # lists average a few values, where bitpack's per-group header loses to
    # varbyte's 1-byte floor — so "bitpack" postings pair with "varbyte"
    # positions by default
    pos_codec: str = "varbyte"

    # --- analysis -----------------------------------------------------
    analyzer: str = "porter"  # "porter" (tokenize+stem) | "nostem" | "naive"

    # --- BM25 ---------------------------------------------------------
    k1: float = 1.2
    b: float = 0.75

    # --- execution ----------------------------------------------------
    # Hot map stages run with batch_size=None (whole-block batches): explicit
    # batch sizes force cross-block coalescing that breaks operator fusion.
    # Block sizes are bounded by the reader + DataContext.target_max_block_size.
    query_concurrency: int = 4           # searcher actor pool size

    # --- layout on disk ----------------------------------------------
    # index_dir/
    #   manifest.json                  (global stats: N, avgdl, config)
    #   forward/part-*.parquet         (doc_id, url, doc_len, terms, tfs, positions)
    #   segments/seg-{tp}-{dr}.bin     (posting + position blobs)
    #   segments/seg-{tp}-{dr}.dir.parquet   (term directory)
    #   segments/seg-{tp}-{dr}.manifest.json (per-partition lineage)
    def term_partition(self, term_hash: int) -> int:
        return term_hash % self.num_term_partitions


DEFAULT_CONFIG = IndexConfig()
