"""Driver contract for the Ray-Data search engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()`` — flagship pipeline on sf0.001: documents → synthesized web
  pages → html extraction → tokenize (Porter chain) → term-partitioned
  segment build (groupby shuffle, block-max posting layout) → BM25 top-10
  via the on-disk index, joined back to doc metadata.
* ``queries()`` — one callable per operator from SURVEY.md §2 (and the
  training-data additions: dedup, ANN, text stats, multimodal plumbing).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (identical column names; integer thresholds; float-safe rank margins).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    import numpy as np
    import pandas as pd
    from peterman_search_engine_ray.pipelines.entry_queries import get_reader

    reader = get_reader(SF_SMOKE, "porter")
    rows = []
    for q in (["data", "stream"], ["slow", "query"], ["spark"]):
        doc_ids, scores = reader.bm25_topk_pruned(q, 10)
        docs = reader.get_docs(doc_ids).set_index("doc_id")
        for rank, (d, s) in enumerate(zip(doc_ids.tolist(), scores.tolist())):
            rows.append({
                "query": " ".join(q), "rank": rank, "doc_id": d,
                "score": s, "url": str(docs.loc[d, "url"]),
                "doc_len": int(docs.loc[d, "doc_len"]),
            })
    return pd.DataFrame(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    from peterman_search_engine_ray.pipelines import entry_queries
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    from peterman_search_engine_ray.pipelines import entry_queries
    return entry_queries.oracle_sql()
