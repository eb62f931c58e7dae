"""Edge-case conformance: phrase semantics over the post-filter token
stream (reference positional semantics), empty corpus, unicode, giant
tokens — the reference crowd-test long tail."""

import numpy as np
import pyarrow as pa
import pytest

from peterman_search_engine_ray.config import IndexConfig
from peterman_search_engine_ray.functions.analysis import punctuation_tokenize


def _build(ray_session, tmp_path, texts, **cfg_kw):
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import build_index
    from peterman_search_engine_ray.pipelines.query import IndexReader
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
    })
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_term_partitions=2, doc_range_bits=62,
                      block_size=4, positional=True, **cfg_kw)
    build_index(rd.from_arrow(_wrap_batch(tbl)), idx, cfg)
    return IndexReader(idx)


def test_phrase_over_post_filter_stream(ray_session, tmp_path):
    """Positions index the analyzer OUTPUT (stopwords removed, punctuation
    split) — reference M8 semantics: a phrase 'matches across' dropped
    stopwords and punctuation, but not across a real intervening word."""
    r = _build(ray_session, tmp_path, [
        "grape honeydew plain",              # 0: adjacent
        "grape. honeydew",                   # 1: across sentence punctuation
        "grape the honeydew",                # 2: across a dropped stopword
        "grape tasty honeydew",              # 3: real word between — NO match
        "honeydew grape",                    # 4: wrong order — NO match
    ])
    assert r.search_phrase(["grape", "honeydew"]).tolist() == [0, 1, 2]


def test_empty_and_stopword_only_docs(ray_session, tmp_path):
    r = _build(ray_session, tmp_path, ["", "the and of", "real content here"])
    assert r.n_docs == 3                      # empty docs still count for N
    assert r.search_keyword("content").tolist() == [2]
    d, s = r.bm25_topk(["content"], 10)
    assert d.tolist() == [2]


def test_unicode_terms(ray_session, tmp_path):
    r = _build(ray_session, tmp_path, ["café naïve résumé", "café only"])
    assert punctuation_tokenize("Café!") == ["café"]
    assert r.search_and(["café"]).tolist() == [0, 1]
    assert r.search_and(["naïve"]).tolist() == [0]


def test_high_tf_and_long_doc(ray_session, tmp_path):
    """tf>block_size exercises multi-block posting positions."""
    texts = ["spam " * 50 + "ham", "ham only here"]
    r = _build(ray_session, tmp_path, texts)
    docs, tf, dl = r.postings("spam")
    assert docs.tolist() == [0] and tf.tolist() == [50]
    plists = r.term_segments("spam")[0].positions("spam", docs, r.cfg.block_size)
    assert plists[0].tolist() == list(range(50))
    assert r.search_and(["ham"]).tolist() == [0, 1]


def test_near_and_boolean_edge_cases(ray_session, tmp_path):
    r = _build(ray_session, tmp_path, [
        "grape one two three honeydew tail",  # distance 4
        "grape honeydew adjacent",            # distance 1
        "grape the honeydew",                 # stopword dropped: distance 1
        "grape only",
        "",                                   # empty doc
    ])
    assert r.search_near(["grape", "honeydew"], window=1).tolist() == [1, 2]
    assert r.search_near(["grape", "honeydew"], window=4).tolist() == [0, 1, 2]
    # single keyword degenerates to the postings list
    assert r.search_near(["grape"], window=1).tolist() == [0, 1, 2, 3]
    # a dropped stopword vanishes from the analyzed stream (same semantics
    # as search_phrase): ["the","grape"] degenerates to the grape postings
    assert r.search_near(["the", "grape"], window=9).tolist() == [0, 1, 2, 3]
    assert r.search_near(["zzz", "grape"], window=9).size == 0
    with pytest.raises(ValueError):
        r.search_near(["grape", "honeydew"], window=0)
    # NOT with empty include/exclude sets
    assert r.search_not(["grape"], ["zzz"]).tolist() == [0, 1, 2, 3]
    assert r.search_not(["zzz"], ["grape"]).size == 0
    # boolean language over the same corpus
    assert r.search_boolean("grape AND NOT honeydew").tolist() == [3]
    assert r.search_boolean('"grape honeydew" OR adjacent').tolist() == [1, 2]
    assert r.search_boolean("").size == 0


def test_empty_corpus_build(ray_session, tmp_path):
    import ray.data as rd
    from peterman_search_engine_ray.corpus import _wrap_batch
    from peterman_search_engine_ray.pipelines.build import build_index
    tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string())})
    idx = str(tmp_path / "empty")
    m = build_index(rd.from_arrow(_wrap_batch(tbl)), idx,
                    IndexConfig(num_term_partitions=2))
    assert m["n_docs"] == 0 and m["segments"] == []


@pytest.mark.parametrize("seed", [11, 77, 301])
def test_randomized_rank_identity(ray_session, tmp_path, seed):
    """Random corpora (fresh vocab/zipf mix per seed): every query mode must
    match the brute-force oracle — rank identity for BM25/TF-IDF, set
    equality for boolean/phrase."""
    import pandas as pd
    from peterman_search_engine_ray.pipelines.oracle import FullScanOracle
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)] + ["the", "and", "of"]  # + stopwords
    texts = []
    for i in range(80):
        n = rng.randint(1, 40)
        words = rng.choice(vocab, size=n,
                           p=np.arange(len(vocab), 0, -1.0)
                           / np.arange(len(vocab), 0, -1.0).sum())
        texts.append(" ".join(words))
    r = _build(ray_session, tmp_path / str(seed), texts,
               analyzer="porter")
    oracle = FullScanOracle(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}), analyzer="porter")
    qs = [["w0"], ["w1", "w2"], ["w5", "w0", "w3"], ["w29"], ["nosuch"]]
    for q in qs:
        d, s = r.bm25_topk_auto(q, 10)
        od, os_ = oracle.bm25_topk(q, 10)
        assert d.tolist() == od.tolist(), (q, seed)
        assert np.allclose(s, os_), (q, seed)
        assert sorted(r.search_and(q).tolist()) == \
            sorted(oracle.search_and(q).tolist())
        assert sorted(r.search_or(q).tolist()) == \
            sorted(oracle.search_or(q).tolist())
        if len(q) <= 2:     # 2-term sums commute: scores bit-compare
            fd, fs = r.bm25f_topk(q, 10, lead_len=5, lead_weight=3)
            ofd, ofs = oracle.bm25f_topk(q, 10, lead_len=5, lead_weight=3)
            assert fd.tolist() == ofd.tolist(), (q, seed)
            assert np.allclose(fs, ofs), (q, seed)
    for ph in (["w0", "w1"], ["w3", "w3"], ["w2", "w0", "w1"]):
        assert sorted(r.search_phrase(ph).tolist()) == \
            sorted(oracle.search_phrase(ph).tolist()), (ph, seed)
    for pair in (["w0", "w1"], ["w4", "w7"], ["w2", "w2"]):
        for w in (1, 2, 5, 30):
            assert r.search_near(pair, window=w).tolist() == \
                oracle.search_near(pair, window=w).tolist(), (pair, w, seed)
    for inc, exc in ((["w0"], ["w1"]), (["w1", "w2"], ["w0", "w9"])):
        assert r.search_not(inc, exc).tolist() == \
            oracle.search_not(inc, exc).tolist(), (inc, exc, seed)
    # zone search vs the naive oracle
    for kw, z in (("w0", 1), ("w1", 3), ("w5", 7), ("nosuch", 2)):
        assert r.search_zone(kw, z).tolist() == \
            oracle.search_zone(kw, z).tolist(), (kw, z, seed)
    # chained search_after pages reproduce the full ranking
    q = ["w1", "w2"]
    full_d, full_s = r.bm25_topk(q, k=None)
    got, cursor = [], None
    while True:
        d, s = r.bm25_search_after(q, k=7, after=cursor)
        if d.size == 0:
            break
        got.extend(d.tolist())
        cursor = (float(s[-1]), int(d[-1]))
    assert got == full_d.tolist(), seed
    # restrict == filtering the full ranking (scores unchanged)
    filt = r.search_not(["w0"], ["w9"])
    rd_, rs_ = r.bm25_topk(q, k=6, restrict=filt)
    fset = set(filt.tolist())
    want = [(d, s) for d, s in zip(full_d.tolist(), full_s.tolist())
            if d in fset][:6]
    assert list(zip(rd_.tolist(), rs_.tolist())) == want, seed
