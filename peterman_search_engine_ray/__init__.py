"""peterman_search_engine_ray — a Ray-Data-native full-text indexing and
query engine with the capabilities of YuehWu1994/Peterman-Search-Engine.

Built from scratch on `ray.data.Dataset` pipelines: zero-copy Arrow
`map_batches` for extraction/tokenization, a term-partitioned groupby
shuffle for posting-list construction (delta+varbyte compressed, with
skip pointers and block-max metadata), and an actor pool serving BM25
top-k with block-max WAND pruning.

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"
