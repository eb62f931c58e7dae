"""Introspection hooks, tombstone deletions, edge-list source — the
reference's flush-semantics / deletion / graph-read test patterns
(Team18FlushTest, InvertedIndexDeletionTest, IcsSearchEngine S6)."""

import numpy as np
import pytest

from peterman_search_engine_ray.config import IndexConfig
from peterman_search_engine_ray.corpus import synth_rows, synth_webpages
from peterman_search_engine_ray.functions.analysis import get_analyzer


@pytest.fixture()
def small_index(ray_session, tmp_path):
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_partitions=2, doc_range_bits=62,
                      block_size=4, positional=True)
    build_index(synth_webpages(10), idx, cfg)
    return IndexReader(idx)


def test_dump_segment_matches_analysis(small_index):
    r = small_index
    a = get_analyzer("porter")
    texts = synth_rows(10).to_pandas().set_index("doc_id")["text"]
    merged: dict = {}
    for tp in range(2):
        seg = r.dump_segment(tp, 0)
        for term, posting in seg.items():
            assert term not in merged  # term lives in exactly one partition
            merged[term] = posting
    # reconstruct expected positional postings from the analyzer
    for doc_id, text in texts.items():
        toks = a(text)
        for p, t in enumerate(toks):
            assert p in merged[t][doc_id], (t, doc_id, p)
    assert r.num_segments() == 2


def test_tombstone_deletion(small_index):
    r = small_index
    before = r.search_keyword("peterman")          # hot term: every doc
    assert before.size == 10
    r.delete_documents([3, 7])
    after = r.search_keyword("peterman")
    assert after.tolist() == [d for d in before.tolist() if d not in (3, 7)]
    d, s = r.bm25_topk(["peterman"], None)
    assert 3 not in d and 7 not in d
    assert r.search_phrase(["grape", "honeydew"]).tolist() == [
        x for x in [0, 2, 4, 6, 8] if x not in (3, 7)]
    # delete is persistent: a fresh reader sees it
    from peterman_search_engine_ray.pipelines.query import IndexReader
    r2 = IndexReader(r.index_dir)
    assert 3 not in r2.search_keyword("peterman")


def test_edge_list_source(ray_session, tmp_path):
    from peterman_search_engine_ray.sources.edges import read_edge_list
    p = tmp_path / "id-graph.tsv"
    p.write_text("1 2\n2 3\n3\t1\n")
    out = read_edge_list(str(p)).to_pandas().sort_values(["src", "dst"])
    assert out["src"].tolist() == [1, 2, 3]
    assert out["dst"].tolist() == [2, 3, 1]


def test_sharded_serving_rank_identity(ray_session, tmp_path):
    """Doc-range-sharded actors + driver merge == single-reader BM25."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.pipelines.serve import ShardedIndex
    idx = str(tmp_path / "sharded")
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,  # 4 doc ranges
                      block_size=8, positional=True)
    build_index(synth_webpages(60), idx, cfg)
    single = IndexReader(idx)
    sharded = ShardedIndex(idx)
    assert len(sharded.shards) == 4
    try:
        for q in [["grape"], ["grape", "honeydew"], ["peterman", "unique7"],
                  ["apple", "banana", "cherry"], ["nosuch"]]:
            for k in (1, 5, 20):
                d1, s1 = single.bm25_topk(q, k)
                d2, s2 = sharded.bm25_topk(q, k)
                assert d1.tolist() == d2.tolist(), (q, k)
                np.testing.assert_allclose(s1, s2, rtol=1e-12)
                # pilot wave (θ floor from shard 0) must be rank-identical
                d3, s3 = sharded.bm25_topk(q, k, pilot=True)
                assert d1.tolist() == d3.tolist(), (q, k, "pilot")
                np.testing.assert_allclose(s1, s3, rtol=1e-12)
                # per-shard pruned ≡ per-shard dense witness
                import ray as _ray
                tw = [(t, 1.0, single.doc_freq(t)) for t in q
                      if single.doc_freq(t)]
                if tw:
                    for sh in sharded.shards:
                        dp, sp = _ray.get(sh.bm25_local_topk.remote(tw, k))
                        dd, sd = _ray.get(
                            sh.bm25_local_topk_dense.remote(tw, k))
                        assert dp == dd, (q, k)
                        np.testing.assert_allclose(sp, sd, rtol=1e-12)
                t1, v1 = single.tfidf_topk(q, k)
                t2, v2 = sharded.tfidf_topk(q, k)
                assert t1.tolist() == t2.tolist(), (q, k)
                np.testing.assert_allclose(v1, v2, rtol=1e-12)
                # BM25F: lead-tf is shard-local, df global
                f1, w1 = single.bm25f_topk(q, k, lead_len=5, lead_weight=3)
                f2, w2 = sharded.bm25f_topk(q, k, lead_len=5, lead_weight=3)
                assert f1.tolist() == f2.tolist(), (q, k, "bm25f")
                np.testing.assert_allclose(w1, w2, rtol=1e-12)
            for mode, fn in (("and", single.search_and),
                             ("or", single.search_or),
                             ("phrase", single.search_phrase)):
                assert sharded.search(mode, q).tolist() ==                     sorted(fn(q).tolist()), (mode, q)
        # NOT / proximity / parsed-boolean are shard-local-exact too
        assert sharded.search("not", ["grape"],
                              exclude=["cherry"]).tolist() == \
            single.search_not(["grape"], ["cherry"]).tolist()
        assert sharded.search("near", ["grape", "honeydew"],
                              window=2).tolist() == \
            single.search_near(["grape", "honeydew"], window=2).tolist()
        expr = '("grape honeydew" OR apple) AND NOT unique0'
        assert sharded.search("bool", [expr]).tolist() == \
            single.search_boolean(expr).tolist()
        # gdf LRU: repeat queries hit the cache (no term_df round-trip),
        # and a manifest rewrite (extend/compact fingerprint) clears it
        assert sharded._gdf_cache.get("grape") == single.doc_freq("grape")
        import ray as _ray
        calls_before = len(sharded._gdf_cache)
        sharded.bm25_topk(["grape"], 5)       # cached — no new entries
        assert len(sharded._gdf_cache) == calls_before
        import os as _os
        mp = _os.path.join(idx, "manifest.json")
        _os.utime(mp, ns=(_os.stat(mp).st_atime_ns,
                          _os.stat(mp).st_mtime_ns + 1))
        sharded.bm25_topk(["grape"], 5)
        assert list(sharded._gdf_cache) == ["grape"]   # cleared + refilled
        assert sharded._gdf_cache["grape"] == single.doc_freq("grape")
    finally:
        sharded.shutdown()


def test_federated_serving_rank_identity(ray_session, tmp_path):
    """Two INDEPENDENTLY built indexes served as one FederatedIndex must
    be rank-identical (scores too) to a single build over the union —
    global N/avgdl from manifest sums, global df from shard partials."""
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.pipelines.serve import FederatedIndex
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    a_dir, b_dir = str(tmp_path / "fa"), str(tmp_path / "fb")
    full_dir = str(tmp_path / "ffull")
    build_index(rd.from_arrow(_wrap_batch(all_rows.slice(0, 32))), a_dir,
                cfg, input_token="A")
    build_index(rd.from_arrow(_wrap_batch(all_rows.slice(32, 28))), b_dir,
                cfg, input_token="B")
    build_index(rd.from_arrow(_wrap_batch(all_rows)), full_dir, cfg)
    single = IndexReader(full_dir)
    fed = FederatedIndex([a_dir, b_dir])
    try:
        assert fed._meta.n_docs == 60
        assert abs(fed._meta.avgdl - single.avgdl) < 1e-12
        for q in [["grape"], ["grape", "honeydew"], ["peterman", "unique7"],
                  ["apple", "banana", "cherry"], ["nosuch"]]:
            for k in (1, 5, 20):
                d1, s1 = single.bm25_topk(q, k)
                d2, s2 = fed.bm25_topk(q, k)
                assert d1.tolist() == d2.tolist(), (q, k)
                np.testing.assert_allclose(s1, s2, rtol=1e-12)
                t1, v1 = single.tfidf_topk(q, k)
                t2, v2 = fed.tfidf_topk(q, k)
                assert t1.tolist() == t2.tolist(), (q, k)
                np.testing.assert_allclose(v1, v2, rtol=1e-12)
            assert fed.search("or", q).tolist() == \
                sorted(single.search_or(q).tolist())
        assert fed.search("bool", ['grape AND NOT cherry']).tolist() == \
            single.search_boolean('grape AND NOT cherry').tolist()
        # config mismatch across members is rejected
        bad_dir = str(tmp_path / "fbad")
        build_index(rd.from_arrow(_wrap_batch(all_rows.slice(0, 8))),
                    bad_dir, IndexConfig(num_term_partitions=2,
                                         doc_range_bits=4, block_size=8,
                                         positional=True))
        with pytest.raises(ValueError, match="cfg mismatch"):
            FederatedIndex([a_dir, bad_dir])
    finally:
        fed.shutdown()


def test_hot_term_skew_bounded_by_doc_ranges(ray_session, tmp_path):
    """The north rule's skew valve: a term present in EVERY doc ends up
    split across doc-range segments whose size is bounded by the range
    width, and query-time concat reassembles the full sorted posting."""
    import pyarrow as pa
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    n = 200
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"hot hot hot filler{i}" for i in range(n)]),
        "lang": pa.array(["en"] * n),
    })
    idx = str(tmp_path / "skew")
    cfg = IndexConfig(num_term_partitions=2, doc_range_bits=5,  # 32-doc ranges
                      block_size=8, positional=True)
    build_index(rd.from_arrow(_wrap_batch(tbl)), idx, cfg)
    r = IndexReader(idx)
    segs = r.manifest["segments"]
    assert len({s["dr"] for s in segs}) == (n + 31) // 32  # 7 doc ranges
    # no segment holds more postings than one range can contain (2 terms/doc)
    assert max(s["n_postings"] for s in segs) <= 32 * 2
    docs, tf, dl = r.postings("hot")
    assert docs.tolist() == list(range(n))          # sorted, complete
    assert (tf == 3).all()
    d, s = r.bm25_topk_pruned(["hot", "filler7"], 5)
    assert d[0] == 7                                 # rare term dominates


def test_query_executor_all_modes(ray_session, tmp_path):
    """Actor-pool executor: every mode produces the same answers as the
    direct reader calls."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import (IndexReader,
                                                            QueryExecutor)
    idx = str(tmp_path / "qe")
    build_index(synth_webpages(30), idx,
                IndexConfig(num_term_partitions=2, doc_range_bits=62,
                            block_size=8, positional=True))
    r = IndexReader(idx)
    modes = ["keyword", "and", "or", "phrase", "bm25", "bm25_pruned",
             "bm25_auto", "tfidf"]
    qds = rd.from_items([{"query_id": i, "query": "grape honeydew", "k": 5,
                          "mode": m} for i, m in enumerate(modes)])
    out = (qds.map_batches(QueryExecutor,
                           fn_constructor_kwargs={"index_dir": idx},
                           batch_format="pyarrow", concurrency=1)
           .to_pandas().set_index("query_id"))
    assert out.loc[0, "doc_ids"].tolist() == r.postings("grape")[0].tolist()
    assert out.loc[1, "doc_ids"].tolist() == \
        r.search_and(["grape", "honeydew"]).tolist()
    assert out.loc[3, "doc_ids"].tolist() == \
        r.search_phrase(["grape", "honeydew"]).tolist()
    b = r.bm25_topk(["grape", "honeydew"], 5)[0].tolist()
    for qid in (4, 5, 6):
        assert out.loc[qid, "doc_ids"].tolist() == b, qid
    assert out.loc[7, "doc_ids"].tolist() == \
        r.tfidf_topk(["grape", "honeydew"], 5)[0].tolist()
