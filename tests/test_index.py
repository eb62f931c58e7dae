"""End-to-end index build + query vs the brute-force oracle (FullScanSearcher
pattern): rank-identity for BM25/TF-IDF, set equality for boolean/phrase,
resume-from-checkpoint, introspection (flush-semantics analog)."""

import os
import shutil

import numpy as np
import pytest

from peterman_search_engine_ray.config import IndexConfig
from peterman_search_engine_ray.corpus import synth_rows, synth_webpages
from peterman_search_engine_ray.pipelines.oracle import FullScanOracle

N_DOCS = 60


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    idx = str(tmp_path_factory.mktemp("idx"))
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,  # 16-doc ranges
                      block_size=8, positional=True)
    corpus = synth_webpages(N_DOCS)
    manifest = build_index(corpus, idx, cfg)
    oracle = FullScanOracle(synth_rows(N_DOCS).to_pandas())
    return IndexReader(idx), oracle, manifest, idx, cfg


def test_manifest_stats(built):
    reader, oracle, manifest, _, cfg = built
    assert manifest["n_docs"] == N_DOCS
    assert manifest["total_len"] == int(oracle.doc_len.sum())
    assert abs(manifest["avgdl"] - oracle.avgdl) < 1e-9
    # doc ranges of 16 docs → 4 ranges; several term partitions per range
    assert len(manifest["segments"]) > 4


def test_doc_freq_matches_oracle(built):
    reader, oracle, *_ = built
    for term in ["peterman", "appl", "grape", "honeydew", "unique0", "nosuch"]:
        assert reader.doc_freq(term) == oracle.doc_freq(term), term


def test_postings_sorted_and_complete(built):
    reader, oracle, *_ = built
    docs, tf, dl = reader.postings("peterman")  # hot term: every doc
    assert docs.tolist() == list(range(N_DOCS))
    assert (tf >= 1).all()
    assert dl.tolist() == oracle.doc_len.tolist()


def test_keyword_and_or(built):
    reader, oracle, *_ = built
    for q in [["grape"], ["grape", "honeydew"], ["apple", "banana"],
              ["unique3"], ["nosuchword"], ["unique1", "unique2"]]:
        assert reader.search_and(q).tolist() == oracle.search_and(q).tolist(), q
        assert reader.search_or(q).tolist() == oracle.search_or(q).tolist(), q
    # stopword-only keyword → empty AND (reference semantics)
    assert reader.search_and(["the"]).size == 0
    assert reader.search_keyword("grape").tolist() == \
        oracle.search_and(["grape"]).tolist()


def test_phrase(built):
    reader, oracle, *_ = built
    hits = reader.search_phrase(["grape", "honeydew"]).tolist()
    assert hits == oracle.search_phrase(["grape", "honeydew"]).tolist()
    assert hits  # positive case exists (even docs)
    # negative case: odd docs have grape ... honeydew non-adjacent
    assert not (set(range(1, N_DOCS, 2)) & set(hits))
    # cross-stopword: "so it was" -> analyzer drops stopwords; positions are
    # post-filter so "grape honeydew" split by a stopword would still match —
    # that matches reference positional semantics (positions over output stream)


def test_not_search(built):
    reader, oracle, *_ = built
    for inc, exc in [(["grape"], ["cherry"]),
                     (["peterman"], ["apple"]),
                     (["grape", "honeydew"], ["unique0", "unique2"]),
                     (["nosuch"], ["grape"]),
                     (["grape"], ["nosuch"])]:
        assert reader.search_not(inc, exc).tolist() == \
            oracle.search_not(inc, exc).tolist(), (inc, exc)


def test_proximity_search(built):
    reader, oracle, *_ = built
    for q, w in [(["grape", "honeydew"], 1),   # even docs only (adjacent)
                 (["grape", "honeydew"], 2),   # odd docs too (grape _ honeydew)
                 (["grape", "honeydew"], 50),  # == AND set
                 (["peterman", "unique0"], 3),
                 (["apple", "nosuch"], 3)]:
        got = reader.search_near(q, window=w).tolist()
        assert got == oracle.search_near(q, window=w).tolist(), (q, w)
    # ordered ("A before B within w") vs the oracle; window=1 ordered is
    # exactly the two-term phrase
    for q, w in [(["grape", "honeydew"], 1), (["grape", "honeydew"], 2),
                 (["honeydew", "grape"], 2), (["peterman", "unique0"], 9)]:
        assert reader.search_near(q, window=w, ordered=True).tolist() == \
            oracle.search_near(q, window=w, ordered=True).tolist(), (q, w)
    assert reader.search_near(["grape", "honeydew"], 1,
                              ordered=True).tolist() == \
        reader.search_phrase(["grape", "honeydew"]).tolist()
    # widening the window is monotone: w1 ⊆ w2 ⊆ AND set; window=2 catches
    # every odd doc's grape-cherry-honeydew (distance 2)
    w1 = set(reader.search_near(["grape", "honeydew"], window=1).tolist())
    w2 = set(reader.search_near(["grape", "honeydew"], window=2).tolist())
    assert w1 and w1 <= w2
    assert set(range(1, N_DOCS, 2)) <= w2
    assert w2 <= set(reader.search_and(["grape", "honeydew"]).tolist())
    # large window degenerates to the boolean AND set
    assert reader.search_near(["grape", "honeydew"], window=10**6).tolist() \
        == reader.search_and(["grape", "honeydew"]).tolist()
    # slow path agrees with the vectorized path
    assert reader._search_near_slow_pair(
        "grape", "honeydew", reader.search_and(["grape", "honeydew"]),
        1).tolist() == reader.search_near(["grape", "honeydew"], 1).tolist()


def test_zone_search(built):
    reader, oracle, *_ = built
    # 'peterman' is the first post-filter token of every doc ('The' drops)
    assert reader.search_zone("peterman", 1).tolist() == list(range(N_DOCS))
    for kw, z in [("peterman", 1), ("unique0", 2), ("grape", 4),
                  ("apple", 6), ("honeydew", 12), ("nosuch", 3),
                  ("the", 5)]:  # stopword-only query → empty
        assert reader.search_zone(kw, z).tolist() == \
            oracle.search_zone(kw, z).tolist(), (kw, z)
    # widening the zone is monotone up to the full keyword set
    z2 = set(reader.search_zone("grape", 2).tolist())
    z8 = set(reader.search_zone("grape", 8).tolist())
    assert z2 <= z8 <= set(reader.search_keyword("grape").tolist())
    assert reader.search_zone("grape", 10**6).tolist() == \
        reader.search_keyword("grape").tolist()
    with pytest.raises(ValueError):
        reader.search_zone("grape", 0)


def test_bm25_search_after_and_restrict(built):
    reader, oracle, *_ = built
    q = ["grape", "apple"]
    full_docs, full_scores = reader.bm25_topk(q, k=None)
    # chained search_after pages reproduce the full ranking in 4-doc pages
    got_docs, got_scores, cursor = [], [], None
    while True:
        d, s = reader.bm25_search_after(q, k=4, after=cursor)
        if d.size == 0:
            break
        got_docs.extend(d.tolist())
        got_scores.extend(s.tolist())
        cursor = (float(s[-1]), int(d[-1]))
    assert got_docs == full_docs.tolist()
    assert got_scores == full_scores.tolist()
    # restrict: ranking over a boolean filter set == filtering the full
    # ranking (scores unchanged — corpus-global stats)
    filt = reader.search_not(["grape"], ["unique0", "unique2"])
    rd, rs = reader.bm25_topk(q, k=5, restrict=filt)
    fset = set(filt.tolist())
    want = [(d, s) for d, s in zip(full_docs.tolist(), full_scores.tolist())
            if d in fset][:5]
    assert list(zip(rd.tolist(), rs.tolist())) == want
    # empty restrict → empty result
    import numpy as _np
    d0, s0 = reader.bm25_topk(q, k=5, restrict=_np.empty(0, _np.int64))
    assert d0.size == 0 and s0.size == 0


def test_forward_store_carries_doc_metadata(built):
    reader, *_ = built
    from peterman_search_engine_ray.corpus import WARC_EPOCH_US
    import numpy as _np
    ids = _np.array([0, 3, N_DOCS - 1], dtype=_np.int64)
    rows = reader.get_docs(ids, columns=["doc_id", "url", "warc_ts", "lang"])
    assert rows["doc_id"].tolist() == ids.tolist()
    ts = rows["warc_ts"].to_numpy().astype(
        "datetime64[us]").astype(_np.int64)
    assert ts.tolist() == [WARC_EPOCH_US + int(i) * 1_000_000 for i in ids]
    assert rows["lang"].tolist() == ["en"] * len(ids)


def test_boolean_query_language(built):
    reader, oracle, *_ = built
    import numpy as _np

    def ids(a):
        return a.tolist()

    # parenthesized OR-of-AND with phrase and NOT, vs primitive composition
    got = reader.search_boolean('("grape honeydew" OR apple) AND NOT unique0')
    want = _np.setdiff1d(
        _np.union1d(reader.search_phrase(["grape", "honeydew"]),
                    reader.search_keyword("apple")),
        reader.search_keyword("unique0"))
    assert ids(got) == ids(want)
    # plain AND / OR round-trip through the parser
    assert ids(reader.search_boolean("grape AND honeydew")) == \
        ids(reader.search_and(["grape", "honeydew"]))
    assert ids(reader.search_boolean("apple OR banana")) == \
        ids(reader.search_or(["apple", "banana"]))
    # NOT NOT cancels; nested parens
    assert ids(reader.search_boolean("grape AND NOT NOT honeydew")) == \
        ids(reader.search_and(["grape", "honeydew"]))
    assert ids(reader.search_boolean("((grape))")) == \
        ids(reader.search_keyword("grape"))
    # pure-negative queries have no universe (Lucene semantics)
    for bad in ("NOT grape", "apple OR NOT grape"):
        with pytest.raises(ValueError, match="universe"):
            reader.search_boolean(bad)
    # malformed queries raise
    for bad in ("(grape", "grape AND", "AND grape", "grape)"):
        with pytest.raises(ValueError):
            reader.search_boolean(bad)


def test_boolean_query_randomized(built):
    """Random ASTs rendered to query strings must evaluate identically to
    direct primitive-set evaluation of the same AST."""
    reader, *_ = built
    rng = np.random.RandomState(13)
    terms = ["grape", "honeydew", "apple", "banana", "cherry",
             "peterman", "unique3", "nosuchword"]

    def gen(depth):
        r = rng.rand()
        if depth >= 3 or r < 0.35:
            t = terms[rng.randint(len(terms))]
            return ("term", t)
        if r < 0.45:
            return ("phrase", "grape honeydew")
        kids = [gen(depth + 1) for _ in range(rng.randint(2, 4))]
        if r < 0.75:
            # AND, possibly with one negated child (keep one positive)
            if rng.rand() < 0.5 and len(kids) > 1:
                kids[-1] = ("not", kids[-1])
            return ("and", kids)
        return ("or", kids)

    def render(n):
        k = n[0]
        if k == "term":
            return n[1]
        if k == "phrase":
            return f'"{n[1]}"'
        if k == "not":
            return "NOT " + render(n[1])
        op = " AND " if k == "and" else " OR "
        return "(" + op.join(render(c) for c in n[1]) + ")"

    def ev(n):
        k = n[0]
        if k == "term":
            return reader.search_and([n[1]])
        if k == "phrase":
            return reader.search_phrase([n[1]])
        if k == "or":
            return np.unique(np.concatenate([ev(c) for c in n[1]])) \
                if n[1] else np.empty(0, np.int64)
        pos = [c for c in n[1] if c[0] != "not"]
        neg = [c[1] for c in n[1] if c[0] == "not"]
        from functools import reduce as _red
        res = _red(lambda a, b: np.intersect1d(a, b, assume_unique=True),
                   [ev(p) for p in pos])
        for c in neg:
            res = np.setdiff1d(res, ev(c), assume_unique=True)
        return res

    n_checked = 0
    for _ in range(60):
        ast = gen(0)
        if ast[0] in ("term", "phrase"):
            continue
        got = reader.search_boolean(render(ast))
        assert got.tolist() == ev(ast).tolist(), render(ast)
        n_checked += 1
    assert n_checked >= 30


def test_bm25_rank_identity(built):
    reader, oracle, *_ = built
    for q in [["grape"], ["grape", "honeydew"], ["apple", "banana", "cherry"],
              ["peterman"], ["unique5", "grape"], ["apple", "apple"]]:
        for k in (1, 3, 10, None):
            d_e, s_e = reader.bm25_topk(q, k)
            d_o, s_o = oracle.bm25_topk(q, k)
            assert d_e.tolist() == d_o.tolist(), (q, k)
            np.testing.assert_allclose(s_e, s_o, rtol=1e-12)


def test_bm25_pruned_identical_to_exact(built):
    reader, *_ = built
    for q in [["grape"], ["grape", "honeydew"], ["apple", "banana", "cherry"],
              ["peterman", "unique7"], ["fig", "kiwi", "mango", "lemon"]]:
        for k in (1, 5, 20):
            d_e, s_e = reader.bm25_topk(q, k)
            d_p, s_p = reader.bm25_topk_pruned(q, k)
            assert d_e.tolist() == d_p.tolist(), (q, k)
            np.testing.assert_allclose(s_e, s_p, rtol=1e-12)


def test_tfidf_reference_quirks(built):
    reader, oracle, *_ = built
    for q in [["grape"], ["grape", "honeydew", "grape"], ["apple", "unique0"]]:
        for k in (3, None):
            d_e, s_e = reader.tfidf_topk(q, k)
            d_o, s_o = oracle.tfidf_topk(q, k)
            assert d_e.tolist() == d_o.tolist(), (q, k)
            np.testing.assert_allclose(s_e, s_o, rtol=1e-12)


def test_empty_queries(built):
    reader, *_ = built
    assert reader.bm25_topk([], 5)[0].size == 0
    assert reader.bm25_topk(["the", "and"], 5)[0].size == 0  # stopword-only
    assert reader.search_or([])[0:0].size == 0
    assert reader.search_phrase(["zzz", "qqq"]).size == 0


def test_resume_skips_segments(built, ray_session):
    from peterman_search_engine_ray.pipelines.build import build_index
    reader, oracle, manifest, idx, cfg = built
    m2 = build_index(synth_webpages(N_DOCS), idx, cfg)
    assert m2["n_resumed_segments"] == len(m2["segments"])
    assert m2["n_docs"] == manifest["n_docs"]


def test_rebuild_after_corruption(built, ray_session):
    """Deleting one segment's blob invalidates only that segment."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    reader, oracle, manifest, idx, cfg = built
    victim = manifest["segments"][0]["segment"]
    os.remove(os.path.join(idx, "segments", f"{victim}.bin"))
    m3 = build_index(synth_webpages(N_DOCS), idx, cfg)
    assert m3["n_resumed_segments"] == len(m3["segments"]) - 1
    r = IndexReader(idx)
    assert r.search_and(["grape"]).tolist() == oracle.search_and(["grape"]).tolist()


def test_get_docs(built):
    reader, *_ = built
    df = reader.get_docs(np.array([0, 5, 7]))
    assert sorted(df["doc_id"]) == [0, 5, 7]
    assert df["url"].str.contains("example").all()


def test_naive_codec_index_identical(ray_session, tmp_path):
    """cfg.codec='naive' (reference NaiveCompressor) produces rank-identical
    results to the varbyte layout."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    idx = str(tmp_path / "naive_idx")
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4, block_size=8,
                      positional=True, codec="naive")
    build_index(synth_webpages(N_DOCS), idx, cfg)
    r = IndexReader(idx)
    oracle = FullScanOracle(synth_rows(N_DOCS).to_pandas())
    assert r.search_and(["grape", "honeydew"]).tolist() == \
        oracle.search_and(["grape", "honeydew"]).tolist()
    d, s = r.bm25_topk(["apple", "banana"], 10)
    d_o, s_o = oracle.bm25_topk(["apple", "banana"], 10)
    assert d.tolist() == d_o.tolist()
    np.testing.assert_allclose(s, s_o, rtol=1e-12)
    assert r.search_phrase(["grape", "honeydew"]).tolist() == \
        oracle.search_phrase(["grape", "honeydew"]).tolist()


def test_bitpack_codec_index_identical(ray_session, tmp_path):
    """cfg.codec='bitpack' (delta + frame-of-reference bitpacking — the
    third codec, beyond the reference's two) produces rank-identical
    results to the varbyte layout, including positional queries."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    idx = str(tmp_path / "bitpack_idx")
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4, block_size=8,
                      positional=True, codec="bitpack")
    build_index(synth_webpages(N_DOCS), idx, cfg)
    r = IndexReader(idx)
    oracle = FullScanOracle(synth_rows(N_DOCS).to_pandas())
    assert r.search_and(["grape", "honeydew"]).tolist() == \
        oracle.search_and(["grape", "honeydew"]).tolist()
    d, s = r.bm25_topk(["apple", "banana"], 10)
    d_o, s_o = oracle.bm25_topk(["apple", "banana"], 10)
    assert d.tolist() == d_o.tolist()
    np.testing.assert_allclose(s, s_o, rtol=1e-12)
    assert r.search_phrase(["grape", "honeydew"]).tolist() == \
        oracle.search_phrase(["grape", "honeydew"]).tolist()
    assert r.search_near(["grape", "honeydew"], window=2).tolist() == \
        oracle.search_near(["grape", "honeydew"], window=2).tolist()
    assert r.search_zone("peterman", 1).tolist() == list(range(N_DOCS))


def test_shuffle_modes_identical_and_multinode_safe(built, ray_session,
                                                    tmp_path_factory):
    """Both exchange modes must (a) produce rank-identical query results and
    (b) never rely on node-local paths by default: objstore moves data only
    through the Ray object store, and scatter's default spill dir lives
    under index_dir (shared storage on a real cluster), not /dev/shm."""
    import os
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    reader, oracle, *_ , cfg = built
    corpus_words = ["peterman", "grape"]

    assert os.environ.get("PETERMAN_SCATTER_TMPFS", "0") != "1", \
        "tests must run with the multi-node-safe default exchange"
    results = {}
    for mode in ("scatter", "objstore"):
        idx = str(tmp_path_factory.mktemp(f"idx_{mode}"))
        build_index(synth_webpages(N_DOCS), idx, cfg, shuffle=mode)
        # default scatter dir is under index_dir, never node-local tmpfs
        assert not os.path.isdir(
            f"/dev/shm/peterman_scatter_{os.path.basename(idx)}")
        r = IndexReader(idx)
        d, s = r.bm25_topk_auto(corpus_words, 10)
        results[mode] = (d.tolist(), [round(x, 9) for x in s.tolist()])
        assert r.search_phrase(["unique1", "peterman"]).size >= 0
    assert results["scatter"] == results["objstore"]


def test_forward_resume_invalidated_by_input_change(ray_session,
                                                    tmp_path_factory):
    """Rebuilding into the same index dir after the corpus changed must NOT
    reuse the stale forward checkpoint (input_token is folded into the
    resume fingerprint)."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    idx = str(tmp_path_factory.mktemp("idx_fp"))
    cfg = IndexConfig(num_term_partitions=2, doc_range_bits=6,
                      block_size=8, positional=True)
    build_index(synth_webpages(20), idx, cfg, input_token="corpus-v1")
    assert IndexReader(idx).manifest["n_docs"] == 20
    # same dir, changed corpus + changed token → fully rebuilt
    build_index(synth_webpages(40), idx, cfg, input_token="corpus-v2")
    assert IndexReader(idx).manifest["n_docs"] == 40


def test_get_docs_prunes_to_matching_ranges(built, tmp_path_factory):
    """get_docs must open only the forward partitions whose doc range
    contains a requested id — deleting every other range partition must not
    affect (or be noticed by) the lookup."""
    import shutil
    from peterman_search_engine_ray.pipelines.query import IndexReader
    reader, oracle, manifest, idx, cfg = built
    # copy the index so we can destroy partitions without hurting `built`
    idx2 = str(tmp_path_factory.mktemp("idx_prune"))
    shutil.rmtree(idx2)
    shutil.copytree(idx, idx2)
    r = IndexReader(idx2)
    target = 3                      # doc range r=0 with 16-doc ranges
    want = r.get_docs(np.array([target]))
    assert list(want["doc_id"]) == [target]
    fwd = os.path.join(idx2, "forward")
    kept = f"r={target >> cfg.doc_range_bits}"
    removed = 0
    for d in os.listdir(fwd):
        if d.startswith("r=") and d != kept:
            shutil.rmtree(os.path.join(fwd, d))
            removed += 1
    assert removed >= 1             # N_DOCS=60 / 16-doc ranges -> 4 parts
    again = IndexReader(idx2).get_docs(np.array([target]))
    assert again.equals(want)       # pruned lookup never touched the rest


def test_extend_equals_full_build(ray_session, tmp_path_factory):
    """build(A) then extend(B) must produce byte-identical segments and
    identical query results to build(A ∪ B) — including a doc range shared
    between old and new docs (re-encoded from old forward rows + new)."""
    import filecmp
    import pyarrow as pa
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            extend_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd

    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    A = rd.from_arrow(_wrap_batch(all_rows.slice(0, 40)))
    B = rd.from_arrow(_wrap_batch(all_rows.slice(40, 20)))   # 40..47 share
    AB = rd.from_arrow(_wrap_batch(all_rows))                # range 2 with A

    full_dir = str(tmp_path_factory.mktemp("idx_full"))
    inc_dir = str(tmp_path_factory.mktemp("idx_inc"))
    m_full = build_index(AB, full_dir, cfg)
    build_index(A, inc_dir, cfg, input_token="A")
    m_inc = extend_index(B, inc_dir, cfg)

    assert m_inc["n_docs"] == m_full["n_docs"] == 60
    assert abs(m_inc["avgdl"] - m_full["avgdl"]) < 1e-12
    segs_full = {(r["tp"], r["dr"]): r["n_postings"]
                 for r in m_full["segments"]}
    segs_inc = {(r["tp"], r["dr"]): r["n_postings"]
                for r in m_inc["segments"]}
    assert segs_full == segs_inc
    # byte-identical segment blobs
    import os as _os
    for fn in sorted(_os.listdir(_os.path.join(full_dir, "segments"))):
        if fn.endswith(".bin"):
            assert filecmp.cmp(_os.path.join(full_dir, "segments", fn),
                               _os.path.join(inc_dir, "segments", fn),
                               shallow=False), fn
    # identical ranked results (scores too)
    rf, ri = IndexReader(full_dir), IndexReader(inc_dir)
    for q in (["peterman"], ["grape", "honeydew"], ["apple", "banana"]):
        df_, sf_ = rf.bm25_topk_auto(q, 10)
        di_, si_ = ri.bm25_topk_auto(q, 10)
        assert df_.tolist() == di_.tolist()
        assert sf_.tolist() == si_.tolist()
    assert (rf.search_phrase(["grape", "honeydew"]).tolist()
            == ri.search_phrase(["grape", "honeydew"]).tolist())


def test_merge_indexes_equals_full_build(ray_session, tmp_path_factory):
    """merge(build(A), build(B)) must equal build(A ∪ B) byte-for-byte:
    exclusive doc ranges are adopted by file copy, the range shared
    between A and B is re-encoded from both forward partitions."""
    import filecmp
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            merge_indexes)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd

    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    A = rd.from_arrow(_wrap_batch(all_rows.slice(0, 40)))   # ranges 0,1,2
    B = rd.from_arrow(_wrap_batch(all_rows.slice(40, 20)))  # ranges 2,3
    AB = rd.from_arrow(_wrap_batch(all_rows))

    full_dir = str(tmp_path_factory.mktemp("idx_full"))
    a_dir = str(tmp_path_factory.mktemp("idx_a"))
    b_dir = str(tmp_path_factory.mktemp("idx_b"))
    m_dir = str(tmp_path_factory.mktemp("idx_m"))
    m_full = build_index(AB, full_dir, cfg)
    build_index(A, a_dir, cfg, input_token="A")
    build_index(B, b_dir, cfg, input_token="B")
    m_merged = merge_indexes(a_dir, b_dir, m_dir, cfg)

    assert m_merged["n_docs"] == m_full["n_docs"] == 60
    assert abs(m_merged["avgdl"] - m_full["avgdl"]) < 1e-12
    assert {(r["tp"], r["dr"]): r["n_postings"]
            for r in m_full["segments"]} == \
           {(r["tp"], r["dr"]): r["n_postings"]
            for r in m_merged["segments"]}
    full_segs = sorted(f for f in os.listdir(os.path.join(full_dir,
                                                          "segments")))
    merged_segs = sorted(f for f in os.listdir(os.path.join(m_dir,
                                                            "segments")))
    assert full_segs == merged_segs
    for fn in full_segs:
        if fn.endswith(".bin") or fn.endswith(".dir.parquet"):
            assert filecmp.cmp(os.path.join(full_dir, "segments", fn),
                               os.path.join(m_dir, "segments", fn),
                               shallow=False), fn
    rf, rm = IndexReader(full_dir), IndexReader(m_dir)
    for q in (["peterman"], ["grape", "honeydew"], ["apple", "banana"]):
        df_, sf_ = rf.bm25_topk_auto(q, 10)
        dm_, sm_ = rm.bm25_topk_auto(q, 10)
        assert df_.tolist() == dm_.tolist()
        assert sf_.tolist() == sm_.tolist()
    assert (rf.search_phrase(["grape", "honeydew"]).tolist()
            == rm.search_phrase(["grape", "honeydew"]).tolist())
    # forward store stays point-lookup-able (doc-range pruned)
    got = rm.get_docs(np.array([5, 44]))
    assert sorted(got["doc_id"]) == [5, 44]
    # crash-safe by rerun: all artifact names are deterministic and the
    # manifest is written last, so re-merging into the same out_dir (as a
    # restart after a mid-merge failure would) reconverges byte-identically
    m_again = merge_indexes(a_dir, b_dir, m_dir, cfg)
    assert m_again["n_docs"] == 60
    for fn in full_segs:
        if fn.endswith(".bin"):
            assert filecmp.cmp(os.path.join(full_dir, "segments", fn),
                               os.path.join(m_dir, "segments", fn),
                               shallow=False), fn
    assert IndexReader(m_dir).search_and(["grape", "honeydew"]).tolist() \
        == rf.search_and(["grape", "honeydew"]).tolist()
    # tombstones survive the merge: delete a doc in each input, re-merge,
    # and the merged reader must exclude both (union of tombstone sets)
    ra, rb2 = IndexReader(a_dir), IndexReader(b_dir)
    hit = rf.search_and(["grape", "honeydew"]).tolist()
    da = next(d for d in hit if d < 40)
    db = next(d for d in hit if d >= 40)
    ra.delete_documents([da])
    rb2.delete_documents([db])
    t_dir = str(tmp_path_factory.mktemp("idx_tomb"))
    merge_indexes(a_dir, b_dir, t_dir, cfg)
    got = set(IndexReader(t_dir).search_and(["grape", "honeydew"]).tolist())
    assert got == set(hit) - {da, db}
    # overlapping doc_ids must be rejected, not silently merged
    # (the ValueError from the range task arrives wrapped in RayTaskError)
    dup_dir = str(tmp_path_factory.mktemp("idx_dup"))
    with pytest.raises(Exception, match="doc_id overlap"):
        merge_indexes(a_dir, a_dir, dup_dir, cfg)


def test_index_algebra_compositions(ray_session, tmp_path_factory):
    """The index lifecycle ops form a closed algebra: chained merges and
    extend∘merge compositions all produce byte-identical segments to one
    full build over the union corpus."""
    import filecmp
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (
        build_index, extend_index, merge_indexes)
    import ray.data as rd

    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    rows = synth_rows(60)
    parts = [rd.from_arrow(_wrap_batch(rows.slice(o, n)))
             for o, n in ((0, 25), (25, 20), (45, 15))]
    full_dir = str(tmp_path_factory.mktemp("alg_full"))
    m_full = build_index(rd.from_arrow(_wrap_batch(rows)), full_dir, cfg)

    def fresh(tag):
        return str(tmp_path_factory.mktemp(f"alg_{tag}"))

    # path 1: merge(merge(A, B), C)
    dirs = [fresh(f"p1_{i}") for i in range(3)]
    for d, p, tok in zip(dirs, parts, "ABC"):
        build_index(p, d, cfg, input_token=tok)
    ab = fresh("p1_ab")
    merge_indexes(dirs[0], dirs[1], ab, cfg)
    abc1 = fresh("p1_abc")
    m1 = merge_indexes(ab, dirs[2], abc1, cfg)
    # path 2: merge(extend(A, B), C)
    a2 = fresh("p2_a")
    build_index(parts[0], a2, cfg, input_token="A2")
    extend_index(parts[1], a2, cfg)
    abc2 = fresh("p2_abc")
    c2 = fresh("p2_c")
    build_index(parts[2], c2, cfg, input_token="C2")
    m2 = merge_indexes(a2, c2, abc2, cfg)

    for m, d in ((m1, abc1), (m2, abc2)):
        assert m["n_docs"] == m_full["n_docs"] == 60
        assert abs(m["avgdl"] - m_full["avgdl"]) < 1e-12
        for fn in sorted(os.listdir(os.path.join(full_dir, "segments"))):
            if fn.endswith(".bin") or fn.endswith(".dir.parquet"):
                assert filecmp.cmp(
                    os.path.join(full_dir, "segments", fn),
                    os.path.join(d, "segments", fn), shallow=False), (d, fn)


def test_positions_gather_matches_bulk(built):
    """positions_gather(term, subset) must equal the subset-restriction of
    positions_bulk(term) for arbitrary candidate sets (incl. ids absent
    from the term's postings)."""
    reader, oracle, *_ , cfg = built
    rng = np.random.RandomState(7)
    for term in ["peterman", "grape", "appl", "unique3", "honeydew"]:
        toks = reader.analyze_query([term])
        if not toks:
            continue
        t = toks[0]
        for sr in reader.term_segments(t):
            bulk = sr.positions_bulk(t, cfg.block_size)
            if bulk is None:
                continue
            all_docs = np.unique(bulk[0])
            for trial in range(4):
                # mix of present docs, absent ids, empty, and full sets
                if trial == 0:
                    cand = np.empty(0, np.int64)
                elif trial == 1:
                    cand = all_docs
                else:
                    cand = np.unique(np.concatenate([
                        rng.choice(all_docs,
                                   size=max(1, all_docs.size // 2),
                                   replace=False),
                        rng.randint(0, N_DOCS + 20, size=3)]))
                g = sr.positions_gather(t, cand, cfg.block_size)
                mask = np.isin(bulk[0], cand)
                if not mask.any():
                    assert g is None or g[0].size == 0
                    continue
                assert g is not None
                assert np.array_equal(g[0], bulk[0][mask])
                assert np.array_equal(g[1], bulk[1][mask])


def test_extend_twice_equals_full_build(ray_session, tmp_path_factory):
    """Two successive extensions must still match the one-shot build."""
    import filecmp
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            extend_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    full_dir = str(tmp_path_factory.mktemp("idx_full2"))
    inc_dir = str(tmp_path_factory.mktemp("idx_inc2"))
    build_index(rd.from_arrow(_wrap_batch(all_rows)), full_dir, cfg)
    build_index(rd.from_arrow(_wrap_batch(all_rows.slice(0, 30))),
                inc_dir, cfg, input_token="gen0")
    extend_index(rd.from_arrow(_wrap_batch(all_rows.slice(30, 15))),
                 inc_dir, cfg)
    extend_index(rd.from_arrow(_wrap_batch(all_rows.slice(45, 15))),
                 inc_dir, cfg)
    rf, ri = IndexReader(full_dir), IndexReader(inc_dir)
    assert ri.manifest["n_docs"] == 60
    assert abs(ri.manifest["avgdl"] - rf.manifest["avgdl"]) < 1e-12
    for fn in sorted(os.listdir(os.path.join(full_dir, "segments"))):
        if fn.endswith(".bin"):
            assert filecmp.cmp(os.path.join(full_dir, "segments", fn),
                               os.path.join(inc_dir, "segments", fn),
                               shallow=False), fn
    d1, s1 = rf.bm25_topk_auto(["peterman", "grape"], 10)
    d2, s2 = ri.bm25_topk_auto(["peterman", "grape"], 10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()


def test_compact_equals_build_without_deleted(ray_session, tmp_path_factory):
    """delete_documents + compact_index must be byte-identical to building
    the surviving corpus from scratch, clear the tombstones, and leave
    unaffected ranges' files untouched (same mtime)."""
    import filecmp
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            compact_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    import pyarrow as pa
    all_rows = synth_rows(60)
    dead = [5, 17, 40]                       # ranges 0, 1 and 2 affected
    keep_tbl = all_rows.filter(
        pa.array([i not in dead for i in range(60)]))

    ref_dir = str(tmp_path_factory.mktemp("idx_ref"))
    cmp_dir = str(tmp_path_factory.mktemp("idx_cmp"))
    build_index(rd.from_arrow(_wrap_batch(keep_tbl)), ref_dir, cfg)
    build_index(rd.from_arrow(_wrap_batch(all_rows)), cmp_dir, cfg)
    r = IndexReader(cmp_dir)
    r.delete_documents(dead)
    untouched_seg = os.path.join(cmp_dir, "segments", "seg-0-3.bin")
    mtime_before = os.path.getmtime(untouched_seg)
    compact_index(cmp_dir, cfg)

    assert os.path.getmtime(untouched_seg) == mtime_before  # range 3 untouched
    rc = IndexReader(cmp_dir)
    rr = IndexReader(ref_dir)
    assert rc.manifest["n_docs"] == 57
    assert abs(rc.manifest["avgdl"] - rr.manifest["avgdl"]) < 1e-12
    assert rc._tombstones().size == 0
    ref_segs = {f for f in os.listdir(os.path.join(ref_dir, "segments"))
                if f.endswith(".bin")}
    cmp_segs = {f for f in os.listdir(os.path.join(cmp_dir, "segments"))
                if f.endswith(".bin")}
    assert ref_segs == cmp_segs
    for fn in sorted(ref_segs):
        assert filecmp.cmp(os.path.join(ref_dir, "segments", fn),
                           os.path.join(cmp_dir, "segments", fn),
                           shallow=False), fn
    for q in (["peterman"], ["grape", "honeydew"]):
        d1, s1 = rr.bm25_topk_auto(q, 10)
        d2, s2 = rc.bm25_topk_auto(q, 10)
        assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    assert sorted(rc.get_docs(np.array([5, 6]))["doc_id"].tolist()) == [6]


def test_read_webpages_assigns_dense_ids(ray_session, tmp_path):
    """A doc_id-less Common-Crawl-style table (the input_hint schema) gets
    stable dense ids from parquet-footer offsets, and the index built over
    it answers queries."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from peterman_search_engine_ray.corpus import (_wrap_batch,
                                                   read_webpages, synth_rows)
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    pages = _wrap_batch(synth_rows(40)).drop_columns(["doc_id"])
    d = tmp_path / "cc"
    d.mkdir()
    pq.write_table(pages.slice(0, 25), str(d / "part-000.parquet"))
    pq.write_table(pages.slice(25, 15), str(d / "part-001.parquet"))

    ds = read_webpages(str(d))
    ids = sorted(ds.select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert ids == list(range(40))            # dense, stable, file-ordered

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_partitions=2, doc_range_bits=5,
                      block_size=8, positional=True)
    build_index(ds, idx, cfg)
    r = IndexReader(idx)
    assert r.manifest["n_docs"] == 40
    assert r.search_keyword("peterman").size == 40


def test_keyword_snippets(built):
    """Snippets reconstructed from the positional index == token windows
    over the oracle's analyzed stream (first occurrence, +-width)."""
    import pandas as pd
    from peterman_search_engine_ray.stages.snippet import keyword_snippets
    reader, oracle, *_ = built
    for kw, width in [("grape", 3), ("peterman", 2), ("unique3", 3),
                      ("nosuchword", 3)]:
        got = keyword_snippets(reader, kw, width=width).to_pandas()
        if len(got):
            got = got.sort_values("doc_id").reset_index(drop=True)
        term_l = oracle._q(kw)
        rows = []
        if term_l:
            term = term_l[0]
            for i, toks in enumerate(oracle.tokens):
                if term in toks:
                    p = toks.index(term)
                    rows.append((oracle.doc_ids[i],
                                 " ".join(toks[max(0, p - width):
                                               p + width + 1])))
        exp = pd.DataFrame(rows, columns=["doc_id", "snippet"])
        if len(exp) == 0:
            assert len(got) == 0, kw
            continue
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()),
                                      obj=kw)


def test_ingest_chain_auto_compact_bounds_fragments(ray_session,
                                                    tmp_path_factory):
    """A long ingest chain with the LSM roll-up policy (reference
    DEFAULT_MERGE_THRESHOLD semantics, InvertedIndexManager.java:42)
    keeps per-range forward fragment counts bounded, while segments and
    query results stay identical to the one-shot build — and a FURTHER
    extend after compaction still works (the rolled-up store feeds the
    re-encode path correctly)."""
    import filecmp
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (
        auto_compact, build_index, ingest)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=6,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    full_dir = str(tmp_path_factory.mktemp("idx_fullc"))
    inc_dir = str(tmp_path_factory.mktemp("idx_incc"))
    build_index(rd.from_arrow(_wrap_batch(all_rows)), full_dir, cfg)
    # chain: initial 12 docs, then 8 ingests of 6 docs — every ingest
    # lands in range 0 (bits=6 -> one range), fragmenting the doc store
    build_index(rd.from_arrow(_wrap_batch(all_rows.slice(0, 12))),
                inc_dir, cfg, input_token="gen0")
    threshold = 4
    for i in range(8):
        m = ingest(rd.from_arrow(_wrap_batch(all_rows.slice(12 + 6 * i, 6))),
                   inc_dir, cfg, merge_threshold=threshold)
    fwd = os.path.join(inc_dir, "forward")
    for rname in os.listdir(fwd):
        if rname.startswith("r="):
            frags = [f for f in os.listdir(os.path.join(fwd, rname))
                     if f.endswith(".parquet")]
            assert len(frags) < threshold + 1, (rname, frags)
    # identity with the one-shot build survives the roll-ups
    rf, ri = IndexReader(full_dir), IndexReader(inc_dir)
    assert ri.manifest["n_docs"] == 60
    for fn in sorted(os.listdir(os.path.join(full_dir, "segments"))):
        if fn.endswith(".bin"):
            assert filecmp.cmp(os.path.join(full_dir, "segments", fn),
                               os.path.join(inc_dir, "segments", fn),
                               shallow=False), fn
    d1, s1 = rf.bm25_topk_auto(["peterman", "grape"], 10)
    d2, s2 = ri.bm25_topk_auto(["peterman", "grape"], 10)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    # point-get over the rolled-up store
    got = ri.get_docs(np.array([3, 41]))
    assert got["doc_id"].tolist() == [3, 41]
    # idempotent / no-op second pass
    stats = auto_compact(inc_dir, cfg, max_fragments=threshold)
    assert stats["ranges_compacted"] == 0


def test_auto_compact_crash_windows_never_duplicate(ray_session,
                                                    tmp_path_factory):
    """ADVICE r4: a crash between the compacted file landing and the
    source unlinks must not duplicate docs.  Simulate every window of
    the sidecar protocol and assert readers (live_fragments /
    get_docs / resume doc stats) see each doc exactly once, and that
    the next auto_compact sweep reconverges."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import (
        _fwd_doc_stats, auto_compact, build_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.state import manifest as mf
    import ray.data as rd
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=6,
                      block_size=8, positional=True)
    idx = str(tmp_path_factory.mktemp("idx_crash"))
    build_index(rd.from_arrow(_wrap_batch(synth_rows(30))), idx, cfg)
    rdir = os.path.join(idx, "forward", "r=0")
    srcs = mf.live_fragments(rdir)
    assert srcs
    n0, len0 = _fwd_doc_stats(os.path.join(idx, "forward"))

    # window 1: sidecar landed, cmp parquet did not → sources stay live
    mf.atomic_write_json(os.path.join(rdir, "cmp-dead.srcs.json"), srcs)
    assert mf.live_fragments(rdir) == srcs
    assert _fwd_doc_stats(os.path.join(idx, "forward")) == (n0, len0)

    # window 2: cmp published, sources not yet unlinked → sources dead,
    # every doc exactly once through every reader
    t = pa.concat_tables([pq.read_table(os.path.join(rdir, f))
                          for f in srcs])
    order = np.argsort(t["doc_id"].to_numpy(), kind="stable")
    mf.atomic_write_json(os.path.join(rdir, "cmp-w2.srcs.json"), srcs)
    pq.write_table(t.take(order), os.path.join(rdir, "cmp-w2.parquet"))
    os.unlink(os.path.join(rdir, "cmp-dead.srcs.json"))
    live = mf.live_fragments(rdir)
    assert live == ["cmp-w2.parquet"]
    assert _fwd_doc_stats(os.path.join(idx, "forward")) == (n0, len0)
    got = IndexReader(idx).get_docs(np.array([3, 7]))
    assert got["doc_id"].tolist() == [3, 7]

    # the sweep reconverges: superseded-but-present sources are dropped,
    # the fully-applied sidecar goes, counts are sane
    auto_compact(idx, cfg, max_fragments=99)
    names = sorted(os.listdir(rdir))
    assert names == ["cmp-w2.parquet"]
    assert _fwd_doc_stats(os.path.join(idx, "forward")) == (n0, len0)


def test_reader_io_counters_prove_pruning(ray_session, tmp_path_factory):
    """Query-side IO accounting (reference PageFileChannel counter tests):
    candidate-only phrase gathers PROVABLY skip position bytes, block-max
    pruning reports pruned candidates on a selective query, and counters
    reset."""
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    import ray.data as rd
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=8,
                      block_size=8, positional=True)
    idx = str(tmp_path_factory.mktemp("idx_io"))
    # WAND-shaped corpus: 'aax' docs are short (high per-term contrib);
    # 'bbx' docs are long with tf=2 except doc 50 (tf=20, one hot block).
    # After the aax list evaluates, θ exceeds every tf=2 bbx BLOCK bound
    # (max_tf=2, long min_dl) but not the hot block's — the block-max
    # filter must prune the cold blocks' candidates, provably.
    import pyarrow as pa
    texts = []
    for i in range(100):
        if i < 3:
            # rare co-occurrence: phrase candidates ≪ either df → the
            # phrase path takes the candidate-only position gather
            texts.append("aax bbx end")
        elif i < 5:
            texts.append("aax aax eex")     # rare high-idf term
        elif i < 50:
            texts.append("aax aax end")
        elif i == 50:
            texts.append(" ".join(["bbx"] * 20) + " pad pad pad pad")
        else:
            texts.append("bbx bbx " + " ".join(f"pad{j}" for j in range(10)))
    rows = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                     "text": pa.array(texts)})
    build_index(rd.from_arrow(_wrap_batch(rows)), idx, cfg)
    r = IndexReader(idx)
    r.search_keyword("aax")
    c1 = r.io_counters()
    assert c1["bytes_read"] > 0
    # selective phrase: the candidate-only gather skips most pos bytes
    r.reset_io_counters()
    assert r.io_counters()["bytes_read"] == 0
    hits = r.search_phrase(["aax", "bbx"])
    assert hits.tolist() == [0, 1, 2]
    c2 = r.io_counters()
    assert c2["pos_bytes_skipped"] > 0
    # pruned BM25: after the rare high-idf list fills top-k, the common
    # term's whole list is suffix-bound skipped — identically to the
    # exact scorer
    r.reset_io_counters()
    dp, sp = r.bm25_topk_pruned(["aax", "eex"], 2)
    de, se = r.bm25_topk(["aax", "eex"], 2)
    assert dp.tolist() == de.tolist() and sp.tolist() == se.tolist()
    assert r.io_counters()["lists_skipped"] > 0
    # with an external θ floor (the sharded pilot-wave path,
    # serve.ShardSearcher), the block-max filter prunes candidates whose
    # block bound cannot beat θ — result still exact
    dx, sx = r.bm25_topk(["bbx"], 1)
    r.reset_io_counters()
    dq, sq = r._bm25_pruned_terms(r._query_weights(["bbx"]), 1,
                                  theta0=float(sx[0]))
    assert dq.tolist() == dx.tolist() and sq.tolist() == sx.tolist()
    assert r.io_counters()["pruned_candidates"] > 0


def test_alias_blue_green_switch(built, ray_session, tmp_path):
    """Alias file atomically flips readers between two live indexes;
    refuses dangling targets; plain dirs pass through everywhere."""
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.state import manifest as mf
    _, _, _, idx_a, cfg = built
    idx_b = str(tmp_path / "idx_b")
    # a different (smaller) corpus so the two indexes are distinguishable
    build_index(synth_webpages(17), idx_b, cfg)
    alias = str(tmp_path / "current.alias")

    mf.set_alias(alias, idx_a)
    ra = IndexReader(alias)
    assert ra.index_dir == mf.resolve_alias(alias)
    n_a = ra.n_docs

    mf.set_alias(alias, idx_b)                    # the blue/green flip
    rb = IndexReader(alias)
    assert rb.n_docs == 17 and n_a != rb.n_docs
    assert ra.n_docs == n_a                       # in-flight reader unaffected

    with pytest.raises(ValueError, match="manifest"):
        mf.set_alias(alias, str(tmp_path / "nope"))   # refuse half-built dir
    assert mf.resolve_alias(alias) == os.path.abspath(idx_b)  # flip survived
    with pytest.raises(FileNotFoundError):
        IndexReader(str(tmp_path / "missing"))


def test_text_dir_source_end_to_end(ray_session, tmp_path):
    """Reference-shaped ingestion: a directory of numbered .txt files
    indexes end-to-end and queries identically to the same corpus fed
    through the synthetic-webpage path."""
    from peterman_search_engine_ray.corpus import _wrap_batch, synth_rows
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.sources.textdir import read_text_dir
    rows = synth_rows(20).to_pandas()
    d = tmp_path / "webpages"
    d.mkdir()
    for _, r in rows.iterrows():
        (d / f"{int(r['doc_id'])}.txt").write_text(r["text"])
    ds = read_text_dir(str(d))
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(range(20))
    assert got["text"].tolist() == rows["text"].tolist()
    idx = str(tmp_path / "idx_txt")
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    build_index(ds.map_batches(_wrap_batch, batch_format="pyarrow"), idx, cfg)
    r = IndexReader(idx)
    assert r.n_docs == 20
    oracle = FullScanOracle(synth_rows(20).to_pandas())
    assert sorted(r.search_keyword("apple")) == sorted(
        oracle.search_or(["apple"]))
    # non-numeric stems fall back to dense ordinals
    d2 = tmp_path / "named"
    d2.mkdir()
    for name, txt in [("alpha", "x"), ("beta", "y")]:
        (d2 / f"{name}.txt").write_text(txt)
    got2 = read_text_dir(str(d2)).to_pandas().sort_values("doc_id")
    assert list(got2["doc_id"]) == [0, 1]


def test_jsonl_source_matches_parquet(ray_session, tmp_path):
    """JSONL shards get the same dense per-file-offset doc_ids as the
    parquet reader, across multiple shards."""
    import json as _json
    from peterman_search_engine_ray.sources.jsonl import read_webpages_jsonl
    rows = [{"url": f"u{i}", "text": f"doc {i} words", "lang": "en"}
            for i in range(25)]
    for shard, lo, hi in [("a", 0, 10), ("b", 10, 18), ("c", 18, 25)]:
        with open(tmp_path / f"{shard}.jsonl", "w") as f:
            for r in rows[lo:hi]:
                f.write(_json.dumps(r) + "\n")
    (tmp_path / "d.jsonl").write_text("")     # empty shard = 0 rows, not a crash
    got = (read_webpages_jsonl(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == list(range(25))
    assert got["url"].tolist() == [r["url"] for r in rows]


def test_pinned_reader_snapshot_isolated_across_extend(ray_session,
                                                       tmp_path):
    """A pinned reader keeps serving the pre-extend corpus while
    extend_index rewrites shared doc ranges in place (mmap inode
    retention); a reader opened afterwards sees the extended corpus."""
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            extend_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    all_rows = synth_rows(60)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_wrap_batch(all_rows.slice(0, 40))), idx, cfg,
                input_token="A")
    old = IndexReader(idx).pin()
    terms = ("apple", "banana", "cherry", "kiwi", "mango")
    pre = {t: old.search_keyword(t).tolist() for t in terms}
    pre_n = old.n_docs

    extend_index(rd.from_arrow(_wrap_batch(all_rows.slice(40, 20))), idx, cfg)

    post_old = {t: old.search_keyword(t).tolist() for t in terms}
    assert post_old == pre and old.n_docs == pre_n     # snapshot held
    new = IndexReader(idx)
    assert new.n_docs == 60
    grew = {t: new.search_keyword(t).tolist() for t in terms}
    assert any(len(grew[t]) > len(pre[t]) for t in terms)
    for t in terms:                                    # superset per term
        assert set(pre[t]) <= set(grew[t])


def test_pin_freezes_tombstones_across_compact(ray_session, tmp_path):
    """A pinned-but-not-yet-queried reader must not resurrect a deleted
    doc when compact_index clears tombstones.json under it."""
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            compact_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_wrap_batch(synth_rows(30))), idx, cfg)
    victim = int(IndexReader(idx).search_keyword("grape")[0])
    IndexReader(idx).delete_documents([victim])
    pinned = IndexReader(idx).pin()          # no query yet
    compact_index(idx, cfg)                  # clears tombstones.json
    assert victim not in pinned.search_keyword("grape").tolist()
    assert victim not in IndexReader(idx).search_keyword("grape").tolist()


def test_alias_accepted_by_extend(ray_session, tmp_path):
    """Write-path operations (extend_index et al.) resolve alias files,
    as the CLI contract promises."""
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import (build_index,
                                                            extend_index)
    from peterman_search_engine_ray.pipelines.query import IndexReader
    from peterman_search_engine_ray.state import manifest as mf
    cfg = IndexConfig(num_term_partitions=4, doc_range_bits=4,
                      block_size=8, positional=True)
    rows = synth_rows(40)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_wrap_batch(rows.slice(0, 30))), idx, cfg,
                input_token="A")
    alias = str(tmp_path / "cur")
    mf.set_alias(alias, idx)
    m = extend_index(rd.from_arrow(_wrap_batch(rows.slice(30, 10))),
                     alias, cfg)
    assert m["n_docs"] == 40
    assert IndexReader(alias).n_docs == 40
