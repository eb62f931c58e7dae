"""Tests for dedup / similarity / textstats / pagerank / multimodal /
wordbreak operators, against brute-force numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from peterman_search_engine_ray.functions.textstats import (
    bpe_ish_count, doc_fingerprint, lang_id, raw_tokens, token_stats)
from peterman_search_engine_ray.functions.wordbreak import (
    WordBreakTokenizer, WordBreakStage)
from peterman_search_engine_ray.stages.dedup import shingle_set
from peterman_search_engine_ray.stages import multimodal as mm


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about databases and queries",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "rain rain go away, come again another day!",
        "",
    ]
    return pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})


# --- pure functions ---------------------------------------------------------

def test_textstats():
    t = "The quick, brown fox; the FOX!"
    assert raw_tokens(t) == ["the", "quick", "brown", "fox", "the", "fox"]
    n_tok, n_stop, n_types, n_punct = token_stats(t)
    assert (n_tok, n_stop, n_types, n_punct) == (6, 2, 4, 3)
    assert lang_id(t) == "en"
    assert lang_id("zumba wumba") == "und"
    assert bpe_ish_count("abc123 x-y") == 5  # abc,123,x,-,y
    assert doc_fingerprint(t) == doc_fingerprint("the QUICK brown fox the fox")
    assert doc_fingerprint("a b") != doc_fingerprint("b a")


def test_shingles():
    assert shingle_set("a b c d", 2) == {"a b", "b c", "c d"}
    assert shingle_set("a", 2) == {"a"}
    assert shingle_set("", 3) == set()


def test_wordbreak():
    tok = WordBreakTokenizer()
    assert tok.tokenize("catdog") == ["cat", "dog"]
    assert tok.tokenize("itisaniceday") == ["nice", "day"]  # stopwords dropped
    with pytest.raises(ValueError):
        tok.tokenize("qzqzqz")
    assert tok.tokenize("") == []
    # prefers high-frequency segmentation: "cats" vs "cat"+"s"? 's' not in dict
    assert tok.tokenize("catsdogs") == ["cats", "dogs"]


# --- Ray operators ----------------------------------------------------------

def test_exact_dedup(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.dedup import exact_dedup
    out = exact_dedup(rd.from_arrow(_docs_table())).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 4, 5]  # 3 deduped into 0
    # the loser emitter is the exact complement (result-scale set)
    from peterman_search_engine_ray.stages.dedup import exact_dedup_losers
    losers = exact_dedup_losers(rd.from_arrow(_docs_table())).to_pandas()
    assert sorted(losers["doc_id"]) == [3]


def test_ngram_jaccard(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.dedup import ngram_jaccard_pairs
    out = ngram_jaccard_pairs(rd.from_arrow(_docs_table()), k=2,
                              tau_num=1, tau_den=2)
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 3) in pairs           # exact dup: jaccard 1
    assert (0, 1) in pairs           # near dup
    assert (0, 2) not in pairs
    # brute-force check every reported pair
    texts = _docs_table()["text"].to_pylist()
    for a, b in pairs:
        sa, sb = shingle_set(texts[a], 2), shingle_set(texts[b], 2)
        assert 2 * len(sa & sb) >= len(sa | sb)


def test_ngram_containment(ray_session):
    """Asymmetric containment finds the quote-inside-a-bigger-page pairs
    symmetric Jaccard misses, with brute-force verification of both the
    reported set and its complement."""
    import ray.data as rd
    import pyarrow as pa
    from peterman_search_engine_ray.stages.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)
    texts = [
        "the quick brown fox jumps over the lazy dog",          # 0
        ("padding one the quick brown fox jumps over the lazy dog "
         "plus lots of extra words making this page much longer "
         "so jaccard collapses but containment stays one"),     # 1 ⊇ 0
        "completely different content about databases",          # 2
        "the quick brown fox",                                   # 3 ⊆ 0, 1
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(2)
    out = ngram_containment_pairs(ds, k=2, tau_num=8, tau_den=10)
    got = set(zip(out["contained"], out["container"]))
    assert (0, 1) in got and (3, 0) in got and (3, 1) in got
    assert all(p[0] != 2 and p[1] != 2 for p in got)
    # Jaccard at the same threshold misses the asymmetric inclusions
    jac = ngram_jaccard_pairs(ds, k=2, tau_num=8, tau_den=10)
    assert (0, 1) not in set(zip(jac["a"], jac["b"]))
    # brute force: reported pairs satisfy the predicate, others don't
    sets = [shingle_set(t, 2) for t in texts]
    for a in range(4):
        for b in range(4):
            if a == b:
                continue
            want = 10 * len(sets[a] & sets[b]) >= 8 * len(sets[a])
            assert ((a, b) in got) == want, (a, b)


def test_champion_lists(ray_session, tmp_path):
    """Champion-list tier: per-term top-m by (tf desc, doc) is exact vs
    brute force, probes read only the query terms' buckets, and scoring
    is the deterministic champion approximation."""
    import ray.data as rd
    import pyarrow as pa
    from peterman_search_engine_ray.stages.champion import (
        build_champions, champion_rows, champion_topk)
    rng = np.random.RandomState(5)
    rows = []
    for d in range(40):
        for t in ("alpha", "beta", "gamma"):
            tf = int(rng.randint(1, 30))
            rows.append((t, d, tf))
    tbl = pa.table({"term": pa.array([r[0] for r in rows]),
                    "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                    "tf": pa.array([r[2] for r in rows], pa.int64())})
    out = str(tmp_path / "champ")
    build_champions(rd.from_arrow(tbl).repartition(4), out,
                    {"x": 1}, m=8)
    build_champions(rd.from_arrow(tbl).repartition(4), out,
                    {"x": 1}, m=8)     # manifest hit, idempotent
    df = pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
    stats = {}
    got = champion_rows(out, ["alpha", "beta"], stats=stats)
    want = (df[df["term"].isin(["alpha", "beta"])]
            .sort_values(["term", "tf", "doc_id"],
                         ascending=[True, False, True])
            .groupby("term").head(8))
    assert (set(zip(got["term"], got["doc_id"]))
            == set(zip(want["term"], want["doc_id"])))
    assert stats["rows_read"] == 16      # m per probed term, nothing else
    top = champion_topk(out, ["alpha", "beta"], k=5)
    agg = (want.groupby("doc_id", as_index=False)["tf"].sum()
           .rename(columns={"tf": "score"})
           .sort_values(["score", "doc_id"], ascending=[False, True])
           .head(5).reset_index(drop=True).astype(np.int64))
    pd.testing.assert_frame_equal(top, agg)


def test_minhash_lsh(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.dedup import minhash_lsh_pairs
    out = minhash_lsh_pairs(rd.from_arrow(_docs_table()),
                            tau_num=1, tau_den=2)
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 3) in pairs
    assert (0, 2) not in pairs
    # every emitted pair satisfies the exact-Jaccard predicate
    texts = _docs_table()["text"].to_pylist()
    for a, b in pairs:
        sa, sb = shingle_set(texts[a], 2), shingle_set(texts[b], 2)
        assert 2 * len(sa & sb) >= len(sa | sb)


def test_simhash(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.dedup import simhash_pairs
    out = simhash_pairs(rd.from_arrow(_docs_table()), max_dist=3)
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 3) in pairs                      # identical text, dist 0
    assert all(d <= 3 for d in out["dist"])


def test_embedding_neardup_and_ann(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.dedup import embedding_neardup_pairs
    from peterman_search_engine_ray.stages.similarity import (
        LshAnnIndex, cosine_topk)
    rng = np.random.RandomState(3)
    M = rng.randn(200, 16)
    M[50] = M[10] + rng.randn(16) * 0.01        # planted near-dup
    tbl = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                    "embedding": pa.array([r.tolist() for r in M],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    pairs = embedding_neardup_pairs(ds, tau=0.95)
    assert (10, 50) in set(zip(pairs["a"], pairs["b"]))

    # LSH-banded variant finds the planted pair too (high-tau scale path),
    # and every pair it emits satisfies the exact predicate
    from peterman_search_engine_ray.stages.dedup import (
        embedding_neardup_lsh_pairs)
    lsh_pairs = embedding_neardup_lsh_pairs(ds, tau=0.95)
    assert (10, 50) in set(zip(lsh_pairs["a"], lsh_pairs["b"]))
    exact = set(zip(pairs["a"], pairs["b"]))
    assert set(zip(lsh_pairs["a"], lsh_pairs["b"])) <= exact

    # brute-force oracle for top-k
    q = M[10].astype(np.float64)
    Mn = M.astype(np.float32).astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = Mn @ qn
    expected = np.lexsort((np.arange(200), -cos))[:5]

    got = cosine_topk(ds, q, k=5)
    assert got["vec_id"].tolist() == expected.tolist()

    ann = LshAnnIndex(nbits=8, dim=16).build(ds)
    ids, cs = ann.query(q, k=5, probe_hamming=2)
    # approximate: must at least find the vector itself + planted dup
    assert 10 in ids[:2] and 50 in ids[:2]


def test_synth_edges_ds(ray_session):
    """Map-side distributed edge generation == the driver-side rule on
    dense ids (sorted edge multiset identity), and refuses non-dense ids
    loudly instead of silently gathering the corpus to the driver."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        synth_edges, synth_edges_ds)
    ids = np.arange(37, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(4)
    got = synth_edges_ds(docs).to_pandas()
    want = synth_edges(ids).to_pandas()
    key = lambda df: df.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(want))
    # dense-but-shifted ids also work (lo != 0)
    docs2 = rd.from_arrow(pa.table({"doc_id": pa.array(ids + 100)}))
    got2 = synth_edges_ds(docs2).to_pandas()
    want2 = synth_edges(ids + 100).to_pandas()
    pd.testing.assert_frame_equal(key(got2), key(want2))
    sparse = rd.from_arrow(pa.table({"doc_id": pa.array([0, 2, 5],
                                                        pa.int64())}))
    with pytest.raises(ValueError, match="dense"):
        synth_edges_ds(sparse)


def test_pagerank(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        pagerank_numpy, pagerank_ray, synth_edges)
    edges_tbl = synth_edges(np.arange(40))
    edges = edges_tbl.to_pandas()
    a = pagerank_numpy(edges, num_iterations=30)
    b = pagerank_ray(rd.from_arrow(edges_tbl), num_iterations=30)
    pd.testing.assert_frame_equal(a, b)
    # hub (doc 0) gets extra in-links → ranks top
    assert a.iloc[0]["node"] == 0
    # reference init/update semantics: no in-links → score = 0.15
    solo = pagerank_numpy(pd.DataFrame({"src": [1, 2], "dst": [2, 1]}), 10)
    assert set(solo["node"]) == {1, 2}
    # personalized variant: ray twin == numpy twin; mass concentrates
    # around the seed set; non-seed teleport term is 0
    seeds = np.array([2, 5, 9], dtype=np.int64)
    ap = pagerank_numpy(edges, num_iterations=30, teleport_ids=seeds)
    bp = pagerank_ray(rd.from_arrow(edges_tbl), num_iterations=30,
                      teleport_ids=seeds)
    pd.testing.assert_frame_equal(ap, bp)
    assert not ap["score"].equals(a["score"])   # personalization matters
    dead = ap[~ap["node"].isin(seeds)]["score"]
    assert (dead < ap[ap["node"].isin(seeds)]["score"].max()).all()


def test_host_collapse_and_weighted_pagerank(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        collapse_edges, pagerank_numpy, pagerank_weighted, synth_edges)
    mod = 7
    edges_tbl = synth_edges(np.arange(60))
    edges = edges_tbl.to_pandas()
    # distributed collapse == the naive driver-side collapse
    got = collapse_edges(rd.from_arrow(edges_tbl).repartition(5), mod)
    naive = edges.assign(src=edges["src"] % mod, dst=edges["dst"] % mod)
    naive = naive[naive["src"] != naive["dst"]]
    want = (naive.groupby(["src", "dst"], as_index=False).size()
            .rename(columns={"size": "weight"})
            .sort_values(["src", "dst"]).reset_index(drop=True)
            .astype(np.int64))
    pd.testing.assert_frame_equal(got, want)
    # weighted PR over the collapsed graph == plain PR over the expanded
    # multigraph (identical up to float summation order; compare rounded)
    expanded = want.loc[want.index.repeat(want["weight"])][["src", "dst"]]
    a = pagerank_weighted(want, num_iterations=25)
    b = pagerank_numpy(expanded.reset_index(drop=True), num_iterations=25)
    a["score"] = a["score"].round(9)
    b["score"] = b["score"].round(9)
    pd.testing.assert_frame_equal(
        a.sort_values("node").reset_index(drop=True),
        b.sort_values("node").reset_index(drop=True))


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.synth_media_table(10))
    feats = ds.map_batches(mm.ImageFeatures, batch_format="pyarrow",
                           batch_size=4, concurrency=2).to_pandas()
    assert len(feats) == 10
    assert (feats["height"] == 8).all() and (feats["channels"] == 3).all()
    assert ((feats["mean_px"] > 80) & (feats["mean_px"] < 175)).all()

    resized = ds.select_columns(["media_id", "image"]).map_batches(
        mm.ImageResize, fn_constructor_kwargs={"out_h": 4, "out_w": 4},
        batch_format="pyarrow", batch_size=4, concurrency=2)
    rfeats = resized.map_batches(mm.ImageFeatures, batch_format="pyarrow",
                                 batch_size=4, concurrency=2).to_pandas()
    assert (rfeats["height"] == 4).all() and (rfeats["width"] == 4).all()

    audio = ds.select_columns(["media_id", "audio"]).map_batches(
        mm.AudioFeatures, batch_format="pyarrow", batch_size=4,
        concurrency=2).to_pandas()
    assert (audio["sample_rate"] == 16000).all()
    assert (audio["rms"] > 0).all()

    frames = ds.select_columns(["media_id", "video"]).map_batches(
        mm.VideoFrameSample, fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow", batch_size=4, concurrency=2).to_pandas()
    assert len(frames) == 10 * 3  # 6 frames, stride 2
    assert frames["image"].map(lambda b: b[:4] == b"FAKI").all()


def test_multimodal_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_fake_image(b"JPEG1234")


def test_wordbreak_stage(ray_session):
    import ray.data as rd
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["catdog", "zzz"], pa.string())})
    out = (rd.from_arrow(tbl)
           .map_batches(WordBreakStage, batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("doc_id"))
    assert out["tokens"].tolist()[0].tolist() == ["cat", "dog"]
    assert out["ok"].tolist() == [True, False]


def test_text_stats_stage(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.functions.textstats import text_stats_batch
    out = (rd.from_arrow(_docs_table())
           .map_batches(text_stats_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id"))
    assert out["n_tokens"].tolist()[0] == 9
    assert out["lang_pred"].tolist()[0] == "en"
    assert out["n_tokens"].tolist()[5] == 0
    assert out["fingerprint"].tolist()[0] == out["fingerprint"].tolist()[3]


def test_windowed_counts_and_sessionize(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.events import (sessionize,
                                                          windowed_counts)
    H = 3_600_000_000           # 1h in us
    M30 = 1_800_000_000
    rows = [
        # user 1: two sessions (gap 31min between 2nd and 3rd event)
        (0, 10 * H,               1, "click"),
        (1, 10 * H + M30,         1, "click"),
        (2, 10 * H + 2 * M30 + 1, 1, "view"),
        # user 2: ONE session (gap < 30min) spanning two hour-windows
        (3, 10 * H + M30 + 100,   2, "click"),
        (4, 11 * H,               2, "click"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(tbl)

    w = windowed_counts(ds)
    got = {(r.event_type, r.win_us): (r.n, r.min_id, r.max_id)
           for r in w.itertuples()}
    assert got[("click", 10 * H)] == (3, 0, 3)
    assert got[("click", 11 * H)] == (1, 4, 4)
    assert got[("view", 11 * H)] == (1, 2, 2)   # 10h+60min+1us is in 11h

    s = sessionize(ds)
    sess = {(r.user_id, r.session_id): (r.n_events, r.start_us, r.end_us)
            for r in s.itertuples()}
    assert sess[(1, 0)] == (2, 10 * H, 10 * H + M30)
    assert sess[(1, 1)] == (1, 10 * H + 2 * M30 + 1, 10 * H + 2 * M30 + 1)
    assert sess[(2, 0)] == (2, 10 * H + M30 + 100, 11 * H)
    assert len(sess) == 3


def test_sessionize_salted_hot_user(ray_session):
    """Skew valve: one bot user whose events span MANY time slices (tiny
    salt_us forces the split that a block-overflowing user would hit at
    scale) must sessionize identically to the unsalted single-block
    reference — sessions that straddle slice boundaries included."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.events import sessionize
    M = 60_000_000  # 1 min in us
    rng = np.random.RandomState(7)
    # user 9: 500 events, gaps drawn so some sessions span slice borders
    gaps = rng.choice([1 * M, 5 * M, 40 * M], size=499,
                      p=[0.6, 0.3, 0.1]).astype(np.int64)
    ts9 = np.concatenate(([0], np.cumsum(gaps)))
    # user 3: small control user in the same table
    ts3 = np.array([10 * M, 15 * M, 200 * M], dtype=np.int64)
    ts = np.concatenate([ts9, ts3])
    uid = np.concatenate([np.full(500, 9), np.full(3, 3)]).astype(np.int64)
    eid = np.arange(ts.size, dtype=np.int64)
    tbl = pa.table({"event_id": pa.array(eid),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array(uid),
                    "event_type": pa.array(["e"] * ts.size)})
    # salt_us = 1h → user 9 spans dozens of slices; gap threshold 30 min
    got = sessionize(rd.from_arrow(tbl), salt_us=3_600_000_000)

    # unsalted reference, plain pandas
    df = pd.DataFrame({"uid": uid, "ts": ts, "eid": eid}).sort_values(
        ["uid", "ts", "eid"]).reset_index(drop=True)
    brk = (df["uid"].ne(df["uid"].shift())
           | (df["ts"] - df["ts"].shift()).gt(1_800_000_000))
    df["grp"] = brk.cumsum()
    ref = (df.groupby(["uid", "grp"])
             .agg(n_events=("eid", "size"), start_us=("ts", "min"),
                  end_us=("ts", "max")).reset_index())
    ref["session_id"] = ref.groupby("uid").cumcount()
    ref = ref.rename(columns={"uid": "user_id"})[
        ["user_id", "session_id", "n_events", "start_us", "end_us"]]
    ref = ref.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64).reset_index(drop=True), ref.astype(np.int64))


def test_broadcast_join_and_topk_per_group(ray_session):
    import ray.data as rd
    from peterman_search_engine_ray.stages.join import (broadcast_join,
                                                        topk_per_group)
    big = pa.table({"k": pa.array([1, 2, 3, 2, 9], pa.int64()),
                    "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    small = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    out = (broadcast_join(rd.from_arrow(big), small, on="k")
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["name"].tolist() == ["a", "b", "c", "b"] and len(out) == 4
    # k=9 (no match) dropped — inner join

    tbl = pa.table({"g": pa.array(["x"] * 4 + ["y"] * 2, pa.string()),
                    "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                    "score": pa.array([5, 9, 9, 1, 7, 7], pa.int64())})
    top = topk_per_group(rd.from_arrow(tbl), "g", "score", 2, "id")
    got = list(zip(top["g"], top["id"], top["rank"]))
    # x: score 9 (ids 1,2 — tie broken by id), y: 7 (ids 4,5)
    assert got == [("x", 1, 0), ("x", 2, 1), ("y", 4, 0), ("y", 5, 1)]


def test_curate_corpus(ray_session, tmp_path):
    import os
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.curate import curate_corpus
    out_dir = str(tmp_path / "curated")
    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "under a warm maple tree near the river bend every day")
    texts = [
        base,                                  # 0: keeper
        base.replace("dog", "cat"),            # 1: near-dup of 0 -> removed
        "totally different words about engines pipelines shuffles "
        "segments postings queries rankings caches benchmarks",  # 2 keeper
        base,                                  # 3: exact dup of 0 -> removed
        "tiny doc",                            # 4: fails quality
        "",                                    # 5: fails quality
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(tbl)
    got = curate_corpus(ds, out_dir, tau_num=1, tau_den=2)
    ids = set(got["doc_id"])
    assert 0 in ids and 2 in ids
    assert 3 not in ids          # exact-dup loser
    assert 1 not in ids          # near-dup loser (larger id of pair (0,1))
    assert 4 not in ids and 5 not in ids      # fail quality
    # partitioned output on disk + resume manifest
    assert any(d.startswith("r=") for d in os.listdir(out_dir))
    import pyarrow.dataset as pads
    written = pads.dataset(out_dir, partitioning="hive").to_table()
    assert set(written["doc_id"].to_pylist()) == ids
    # second run with identical fingerprint skips the write (manifest valid)
    again = curate_corpus(ds, out_dir, tau_num=1, tau_den=2)
    assert set(again["doc_id"]) == ids


def test_hll_distinct_terms(ray_session):
    import ray.data as rd
    import pyarrow.parquet as pq
    from peterman_search_engine_ray.functions.textstats import raw_tokens
    from peterman_search_engine_ray.stages.dedup import hll_distinct_terms
    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                        columns=["doc_id", "text"])
    exact = len({t for x in tbl["text"].to_pylist() for t in raw_tokens(x or "")})
    est = hll_distinct_terms(rd.from_arrow(tbl), p=12)
    # 2^12 registers -> ~1.6% standard error; allow 3 sigma
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_ivf_ann(ray_session, tmp_path):
    import ray.data as rd
    from peterman_search_engine_ray.stages.similarity import (IvfAnnIndex,
                                                              cosine_topk)
    rng = np.random.RandomState(9)
    # 4 well-separated clusters in 16d
    centers = rng.randn(4, 16) * 6
    M = np.concatenate([c + rng.randn(60, 16) for c in centers])
    tbl = pa.table({"vec_id": pa.array(np.arange(240, dtype=np.int64)),
                    "embedding": pa.array([r.tolist() for r in M],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    ivf = IvfAnnIndex(n_centroids=8, dim=16, iters=4,
                      path=str(tmp_path / "ivf")).build(ds)
    q = M[10].astype(np.float64)
    exact = cosine_topk(ds, q, k=5)["vec_id"].tolist()
    ids, cos = ivf.query(q, k=5, nprobe=4)
    # clustered data: probing half the cells must recover the exact top-5
    # (the query's own cluster spans at most a few cells)
    assert ids.tolist() == exact
    assert np.all(np.diff(cos) <= 1e-12)      # descending


def test_count_min_sketch(ray_session):
    """CMS never undercounts; shard sketches ADD (mergeable); a forced
    tiny width produces overcounts that equal the brute-force cells."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.bloom import bit_positions
    from peterman_search_engine_ray.stages.sketch import cms_build, cms_query
    rng = np.random.default_rng(2)
    vocab = [f"t{i}" for i in range(300)]
    terms = list(rng.choice(vocab, 2000))
    tf = rng.integers(1, 9, 2000).astype(np.int64)
    exact = {}
    for t, c in zip(terms, tf):
        exact[t] = exact.get(t, 0) + int(c)
    ds = rd.from_arrow(pa.table({"term": pa.array(terms, pa.string()),
                                 "tf": pa.array(tf)})).repartition(4)
    M = cms_build(ds)
    probes = vocab[:50] + ["absent1", "absent2"]
    est = cms_query(M, probes)
    assert all(e >= exact.get(t, 0) for t, e in zip(probes, est))
    # mergeable: sketch(shard1) + sketch(shard2) == sketch(all)
    half = rd.from_arrow(pa.table({"term": pa.array(terms[:1000], pa.string()),
                                   "tf": pa.array(tf[:1000])}))
    rest = rd.from_arrow(pa.table({"term": pa.array(terms[1000:], pa.string()),
                                   "tf": pa.array(tf[1000:])}))
    assert (cms_build(half) + cms_build(rest) == M).all()
    # tiny width -> real collisions; estimates equal brute-force cells
    w, d = 16, 4
    Ms = cms_build(ds, depth=d, width=w)
    pos = bit_positions(vocab, m_bits=w, k=d)
    cell_sum = np.zeros((d, w), np.int64)
    for t, p in zip(vocab, pos):
        for i in range(d):
            cell_sum[i, int(p[i])] += exact.get(t, 0)
    got = cms_query(Ms, vocab[:30])
    exp = [min(cell_sum[i, int(p[i])] for i in range(d))
           for p in pos[:30]]
    assert got.tolist() == exp
    assert any(g > exact[t] for g, t in zip(got, vocab[:30]))  # overcounts


def test_ivf_extend_equals_union_assign(ray_session, tmp_path):
    """Incremental IVF add (frozen quantizer, appended partitions) ==
    assigning the union corpus under the same centroids in one pass, and
    recovers the exact top-k on clustered data."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.similarity import (IvfAnnIndex,
                                                              cosine_topk)
    rng = np.random.RandomState(11)
    centers = rng.randn(4, 16) * 6
    M = np.concatenate([c + rng.randn(50, 16) for c in centers])
    perm = rng.permutation(len(M))          # interleave clusters A/B
    half_a, half_b = np.sort(perm[:100]), np.sort(perm[100:])

    def mk(idx):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(idx.astype(np.int64)),
            "embedding": pa.array([M[i].tolist() for i in idx],
                                  pa.list_(pa.float32()))}))

    ivf = IvfAnnIndex(n_centroids=8, dim=16, iters=4,
                      path=str(tmp_path / "a")).build(mk(half_a))
    ivf.extend(mk(half_b))
    # reference: same centroids, union assigned in one pass
    ref = IvfAnnIndex(n_centroids=8, dim=16, path=str(tmp_path / "u"))
    ref.id_col, ref.emb_col = "vec_id", "embedding"
    ref.centroids = ivf.centroids.copy()
    ref._assign_write(mk(np.arange(len(M))))
    full = mk(np.arange(len(M)))
    for qi in (3, 77, 150):
        q = M[qi].astype(np.float64)
        ids_e, cos_e = ivf.query(q, k=5, nprobe=4)
        ids_r, cos_r = ref.query(q, k=5, nprobe=4)
        assert ids_e.tolist() == ids_r.tolist()
        np.testing.assert_allclose(cos_e, cos_r, rtol=0, atol=0)
        assert ids_e.tolist() == cosine_topk(full, q, k=5)["vec_id"].tolist()


def test_vectorized_sketch_kernels_match_per_doc():
    """The batch-vectorized MinHash/SimHash kernels must be bit-identical
    to their per-doc reference methods on empty/short/unicode/dup texts."""
    import pyarrow as pa
    from peterman_search_engine_ray.stages.dedup import MinHasher, SimHasher
    texts = ["the quick brown fox jumps over the lazy dog",
             "", "one", "a b", "the the the the",
             "punct,marks.every;where?now!",
             "蓼食う虫も好き好き 猿も木から落ちる",
             "the quick brown fox jumps over the lazy dog",  # exact dup
             None, "x " * 50]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    mh = MinHasher(num_perm=64, k=2)
    got = mh(batch)
    for i, t in enumerate(texts):
        want = mh.signature(t or "")
        assert got["sig"][i].as_py() == want.tolist(), i

    sh = SimHasher()
    got_s = sh(batch)["simhash"].to_numpy().astype(np.uint64)
    for i, t in enumerate(texts):
        assert int(got_s[i]) == sh.simhash(t or ""), i

    # shingle semantics for k=3 (short docs contribute single tokens)
    mh3 = MinHasher(num_perm=16, k=3)
    got3 = mh3(batch)
    for i, t in enumerate(texts):
        assert got3["sig"][i].as_py() == mh3.signature(t or "").tolist(), i


def test_audio_wav_real_codec(ray_session):
    """RIFF/WAVE PCM16 decodes through the stdlib wave module — a REAL
    format, no fake header — and flows through the AudioFeatures stage."""
    import io
    import wave

    import ray.data as rd

    def make_wav(seed, rate=8000, n=256):
        x = (((seed * 2654435761 + np.arange(n, dtype=np.int64) * 48271)
              % 65536) - 32768).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())
        return buf.getvalue(), x

    blobs, raws = zip(*[make_wav(s) for s in range(6)])
    tbl = pa.table({"media_id": pa.array(range(6), pa.int64()),
                    "audio": pa.array(list(blobs), pa.binary())})
    out = (rd.from_arrow(tbl)
           .map_batches(mm.AudioFeatures, batch_format="pyarrow",
                        batch_size=3, concurrency=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert (out["sample_rate"] == 8000).all()
    assert (out["n_samples"] == 256).all()
    for i, x in enumerate(raws):
        sq = int((x.astype(np.int64) ** 2).sum())
        assert abs(out["rms"][i] - np.sqrt(sq / 256)) < 1e-12
        assert out["zero_crossings"][i] == int(
            ((x[:-1].astype(np.int32) * x[1:]) < 0).sum())


def test_image_real_codec_gate():
    """Without PIL the image decoder must refuse non-FAKI payloads loudly
    (and decode through PIL when it exists)."""
    from peterman_search_engine_ray.stages.multimodal import (
        _decode_fake_image)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            _decode_fake_image(b"\x89PNG\r\n\x1a\nnotarealpng")
    else:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image
        buf = io.BytesIO()
        Image.new("RGB", (4, 4), (1, 2, 3)).save(buf, "PNG")
        img = _decode_fake_image(buf.getvalue())
        assert img.shape == (4, 4, 3)


def test_chunk_documents(ray_session):
    """Sliding-window chunking: edge docs (empty, < L, == L, long) against
    a per-doc reference implementation."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.chunk import chunk_documents
    L, S = 5, 3
    texts = ["", "one two", "a b c d e",
             " ".join(f"t{i}" for i in range(12)),
             "Pun,ct.uated; tokens? here! now"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = (chunk_documents(rd.from_arrow(tbl), L, S)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))

    rows = []
    for d, t in enumerate(texts):
        toks = raw_tokens(t)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - L) // S)) if n > L else 1
        for j in range(n_chunks):
            ct = toks[j * S: j * S + L]
            rows.append((d, j, len(ct), " ".join(ct)))
    ref = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "n_tokens",
                                      "chunk"])
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))
    # invariants: first chunk starts at token 0; last chunk ends at token n
    assert (got.groupby("doc_id")["chunk_id"].min() == 0).all()


def _uf_components(n_nodes, pairs):
    """Reference union-find: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in range(n_nodes):
        r = find(x)
        out.setdefault(r, []).append(x)
    return {x: min(members) for r, members in out.items()
            for x in members if len(members) > 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_random(ray_session, seed):
    """Large-star/small-star clusters == union-find on random graphs."""
    from peterman_search_engine_ray.stages.cluster import connected_components
    rng = np.random.default_rng(seed)
    n = 300
    m = int(rng.integers(50, 400))
    pairs = rng.integers(0, n, size=(m, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    df = pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]}).astype(np.int64)
    got = (connected_components(df, num_parts=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _uf_components(n, pairs.tolist())
    assert dict(zip(got["doc_id"], got["cluster_id"])) == ref


def test_connected_components_chain_and_edge_cases(ray_session):
    """A 120-node path (worst-case diameter for label propagation),
    duplicate + reversed input pairs, and the empty input."""
    from peterman_search_engine_ray.stages.cluster import connected_components
    chain = [(i, i + 1) for i in range(119)]
    extra = [(200, 201), (201, 200), (200, 201), (300, 300)]  # dups + self
    df = pd.DataFrame(chain + extra, columns=["a", "b"]).astype(np.int64)
    got = (connected_components(df, num_parts=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _uf_components(302, chain + extra)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == ref
    assert 300 not in set(got["doc_id"])  # self-loop-only node dropped

    empty = connected_components(
        pd.DataFrame({"a": [], "b": []}), num_parts=4).to_pandas()
    assert len(empty) == 0


def test_connected_components_dataset_input(ray_session):
    """The distributed contract: pairs arrive as a multi-block Dataset
    (the 100 TB shape), not a driver frame."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.cluster import connected_components
    pairs = [(i, i + 1) for i in range(0, 40, 2)]      # 20 two-node comps
    pairs += [(100, 101), (101, 102), (102, 103)]      # one 4-node chain
    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(np.int64)
    ds = rd.from_pandas(df).repartition(6)
    got = (connected_components(ds, num_parts=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _uf_components(104, pairs)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == ref


def test_value_quantiles_matches_duckdb(ray_session):
    """Distributed histogram quantiles == DuckDB quantile_disc on random
    integer columns of several sizes (incl. n=1 and heavy ties)."""
    import duckdb
    import ray.data as rd
    from peterman_search_engine_ray.stages.sample import value_quantiles
    rng = np.random.default_rng(11)
    for n, hi in [(1, 5), (37, 4), (999, 50), (5000, 3)]:
        vals = rng.integers(0, hi, size=n).astype(np.int64)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(5)
        got = value_quantiles(ds, "x", qs=(0.25, 0.5, 0.9, 0.99),
                              num_parts=4)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": vals}))
        exp = con.sql(
            "SELECT quantile_disc(x, 0.25) a, quantile_disc(x, 0.5) b, "
            "quantile_disc(x, 0.9) c, quantile_disc(x, 0.99) d FROM t"
        ).fetchone()
        assert (int(got["q25"][0]), int(got["q50"][0]),
                int(got["q90"][0]), int(got["q99"][0])) == tuple(
                    int(v) for v in exp), (n, hi)


def test_stratified_sample_deterministic(ray_session):
    """Per-group sample == pandas reference over the same md5 keys, and
    identical across re-runs / repartitionings."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.sample import (
        stratified_sample, _sample_keys)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    grp = np.array([f"s{i % 7}" for i in ids])
    tbl = pa.table({"doc_id": pa.array(ids), "source": pa.array(grp)})
    ref = (pd.DataFrame({"source": grp, "doc_id": ids,
                         "skey": _sample_keys(ids)})
           .sort_values(["source", "skey", "doc_id"]))
    ref["rank"] = ref.groupby("source").cumcount()
    ref = (ref[ref["rank"] < 6][["source", "doc_id", "rank"]]
           .reset_index(drop=True))
    for parts in (3, 11):
        got = stratified_sample(
            rd.from_arrow(tbl).repartition(parts), "source", "doc_id", 6,
            num_parts=4).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref.astype(got.dtypes.to_dict()))


def test_edit_distances_match_duckdb():
    """Vectorized cross-term Levenshtein DP == DuckDB levenshtein on
    random ASCII strings (incl. empty and length-skewed cases)."""
    import duckdb
    from peterman_search_engine_ray.stages.spell import edit_distances
    rng = np.random.default_rng(5)
    alpha = np.array(list("abcde"))
    terms = ["".join(rng.choice(alpha, size=rng.integers(0, 12)))
             for _ in range(300)] + ["", "a", "abcdefghijklmnop"]
    for probe in ("qery", "ab", "", "abcde"):
        got = edit_distances(pa.array(terms, pa.string()), probe)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"s": terms}))
        exp = [r[0] for r in con.sql(
            f"SELECT levenshtein(s, '{probe}') FROM t").fetchall()]
        assert got.tolist() == exp, probe
        # large_string offsets are int64 — must not be read as int32 pairs
        got_ls = edit_distances(pa.array(terms, pa.large_string()), probe)
        assert got_ls.tolist() == exp, ("large_string", probe)
    # all-empty block: the values buffer has zero bytes
    assert edit_distances(pa.array(["", ""], pa.string()),
                          "ab").tolist() == [2, 2]


def test_spell_correct(ray_session):
    """Block-parallel reduction picks the global (dist, -df, term) min."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.spell import spell_correct
    vocab = pd.DataFrame({
        "term": ["aaa", "aab", "query", "data", "stream"],
        "df":   [9,     9,     40,      90,     10]})
    ds = rd.from_pandas(vocab).repartition(3)
    out = spell_correct(ds, ["aax", "qery", "datx"])
    got = {r.probe: (r.term, r.df, r.dist) for r in out.itertuples()}
    # aax: aaa and aab both dist 1, df tied -> lexicographic
    assert got["aax"] == ("aaa", 9, 1)
    assert got["qery"] == ("query", 40, 1)
    assert got["datx"] == ("data", 90, 1)

    # df tie-break: higher df wins at equal distance
    vocab2 = vocab.assign(df=[3, 9, 40, 90, 10])
    out2 = spell_correct(rd.from_pandas(vocab2).repartition(2), ["aax"])
    assert out2.iloc[0]["term"] == "aab" and int(out2.iloc[0]["df"]) == 9


def test_pnm_real_image_codec(ray_session):
    """Netpbm P6/P5 are REAL image formats that decode with no library:
    the same pixel sequence as FAKI must yield identical features, and the
    whitespace/comment-tolerant header must parse."""
    import ray.data as rd
    tbl = pa.table({
        "media_id": pa.array(range(6), pa.int64()),
        "image": pa.array([mm.make_pnm_image(5 + i) for i in range(6)],
                          pa.binary())})
    out = (rd.from_arrow(tbl)
           .map_batches(mm.ImageFeatures, batch_format="pyarrow",
                        batch_size=3, concurrency=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    ref = (rd.from_arrow(mm.synth_media_table(6))
           .map_batches(mm.ImageFeatures, batch_format="pyarrow",
                        batch_size=3, concurrency=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref)   # same pixels -> same features
    # grayscale P5 + a header comment, decoded directly
    gray = mm.make_pnm_image(9, h=4, w=6, c=1)
    gray = gray[:2] + b"\n# a comment\n" + gray[3:]
    img = mm._decode_fake_image(gray)
    assert img.shape == (4, 6, 1)
    want = ((9 * 2654435761 + np.arange(24, dtype=np.int64) * 40503) % 256)
    assert np.array_equal(img.ravel(), want.astype(np.uint8))


def test_y4m_real_video_codec(ray_session):
    """YUV4MPEG2 is a REAL video container: frame-sampling a .y4m stream
    must emit byte-identical frames to the FAKV stream with the same pixel
    sequences, through the same actor-pool stage."""
    import ray.data as rd
    n = 5
    y4m = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "video": pa.array([mm.make_y4m_video(5 + i) for i in range(n)],
                          pa.binary())})
    fakv = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "video": pa.array([mm.make_fake_video(5 + i) for i in range(n)],
                          pa.binary())})
    def run(tbl):
        return (rd.from_arrow(tbl)
                .map_batches(mm.VideoFrameSample,
                             fn_constructor_kwargs={"stride": 2},
                             batch_format="pyarrow", batch_size=3,
                             concurrency=2)
                .to_pandas().sort_values(["media_id", "frame_idx"])
                .reset_index(drop=True))
    a, b = run(y4m), run(fakv)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == n * 3 and a["image"].map(
        lambda x: x[:4] == b"FAKI").all()
    # mono colorspace and the unsupported-subsampling guard
    mono_payload = bytes(range(16))
    mono = (b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 Cmono\n"
            + b"FRAME\n" + mono_payload)
    frames = list(mm.VideoFrameSample._y4m_frames(mono))
    assert frames[0].shape == (4, 4, 1)
    assert frames[0].tobytes() == mono_payload
    with pytest.raises(NotImplementedError):
        list(mm.VideoFrameSample._y4m_frames(
            b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + bytes(24)))


def test_lm_quality(ray_session):
    """Bigram-LM scoring vs a brute-force model on a corpus where the
    repeated phrase must out-score the one-off gibberish."""
    import math
    from collections import Counter

    import ray.data as rd
    from peterman_search_engine_ray.functions.textstats import raw_tokens
    from peterman_search_engine_ray.stages.lm import lm_quality

    texts = ["the cat sat on the mat",
             "the cat sat on the hat",
             "zeta xylo quib flurb nark",
             "the cat sat quietly",
             "on the mat the cat sat"]
    tbl = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    out = lm_quality(rd.from_arrow(tbl).repartition(3))

    toks = [raw_tokens(t) for t in texts]
    c1 = Counter(w for ts in toks for w in ts)
    c2 = Counter((ts[i], ts[i + 1]) for ts in toks
                 for i in range(len(ts) - 1))
    V = len(c1)
    want = {}
    for did, ts in enumerate(toks):
        terms = [math.log((c2[(ts[i], ts[i + 1])] + 1.0)
                          / float(c1[ts[i]] + V))
                 for i in range(len(ts) - 1)]
        acc = 0.0
        for v in terms:
            acc += v
        want[did] = (len(terms), acc / len(terms))
    assert out["doc_id"].tolist() == list(range(5))
    for did in range(5):
        row = out[out["doc_id"] == did].iloc[0]
        assert row["n_bigrams"] == want[did][0]
        assert row["lm_score"] == want[did][1]        # bit-identical fold
    # the gibberish doc scores strictly worst
    assert out.sort_values("lm_score").iloc[0]["doc_id"] == 2


def test_kmeans_topics(ray_session):
    """Distributed Lloyd == a driver-side numpy Lloyd with the same
    deterministic init, on well-separated planted clusters."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.kmeans import kmeans_topics

    n, dim, k = 120, 8, 4
    ids = np.arange(n, dtype=np.int64)
    M = np.zeros((n, dim), np.int64)
    M[ids, 2 * (ids % k)] = 1000
    M += (ids[:, None] * 97 + np.arange(dim)[None, :] * 13) % 5
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([r.tolist() for r in M],
                                          pa.list_(pa.float64()))})
    out = kmeans_topics(rd.from_arrow(tbl).repartition(5), k=k, iters=2)

    C = M[:k].astype(np.float64)
    for _ in range(2):
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        sums = np.zeros((k, dim)); counts = np.bincount(assign, minlength=k)
        np.add.at(sums, assign, M.astype(np.float64))
        C = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], C)
    want = []
    for j in np.unique(assign):
        members = ids[assign == j]
        want.append((int(members.min()), int(members.size),
                     int(np.argmax(sums[j]))))
    want.sort()
    assert len(out) == len(want)
    for row, (mn, sz, td) in zip(out.itertuples(index=False), want):
        assert (row.min_member, row.n_members, row.top_dim) == (mn, sz, td)
    assert out["cluster"].tolist() == list(range(len(want)))


def test_dup_ngram_stats(ray_session):
    """Inter-document duplicated-trigram stats vs a brute-force Counter."""
    from collections import Counter

    import ray.data as rd
    from peterman_search_engine_ray.functions.textstats import raw_tokens
    from peterman_search_engine_ray.stages.dedup import dup_ngram_stats

    texts = ["a b c d e",                  # 'a b c','b c d','c d e'
             "x y z a b c q",              # shares 'a b c'
             "a b c d e",                  # full dup of 0
             "one two",                    # < 3 tokens -> no grams
             "p p p p"]                    # self-repeats only (1 doc)
    tbl = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    out = (dup_ngram_stats(rd.from_arrow(tbl).repartition(3), k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    grams = {}
    for did, t in enumerate(texts):
        ts = raw_tokens(t)
        grams[did] = Counter(" ".join(ts[i:i + 3])
                             for i in range(len(ts) - 2))
    ndocs = Counter()
    for c in grams.values():
        for g in c:
            ndocs[g] += 1
    want = {did: (sum(c.values()),
                  sum(m for g, m in c.items() if ndocs[g] > 1))
            for did, c in grams.items() if c}
    assert out["doc_id"].tolist() == sorted(want)
    for row in out.itertuples(index=False):
        assert (row.n_grams, row.n_dup) == want[row.doc_id], row.doc_id
    # doc 3 absent (too short); doc 4's self-repeated gram is NOT dup
    assert 3 not in out["doc_id"].tolist()
    assert out[out["doc_id"] == 4]["n_dup"].iloc[0] == 0


def test_dup_spans(ray_session):
    """Duplicated-substring spans vs a brute-force islands computation."""
    from collections import Counter

    import ray.data as rd
    from peterman_search_engine_ray.functions.textstats import raw_tokens
    from peterman_search_engine_ray.stages.dedup import dup_spans

    texts = ["alpha beta gamma delta epsilon zeta",
             "junk alpha beta gamma delta words end",   # shares a 4-token run
             "totally unrelated content here now",
             "alpha beta gamma delta epsilon zeta"]     # full dup of 0
    tbl = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    out = (dup_spans(rd.from_arrow(tbl).repartition(2), k=3, min_grams=2)
           .to_pandas().sort_values(["doc_id", "start"])
           .reset_index(drop=True))

    k = 3
    toks = [raw_tokens(t) for t in texts]
    owner = {}
    for did, ts in enumerate(toks):
        for i in range(len(ts) - k + 1):
            owner.setdefault(" ".join(ts[i:i + k]), set()).add(did)
    want = []
    for did, ts in enumerate(toks):
        dup_pos = sorted({i + 1 for i in range(len(ts) - k + 1)
                          if len(owner[" ".join(ts[i:i + k])]) > 1})
        run = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                if len(run) >= 2:
                    want.append((did, run[0], run[-1], len(run)))
                run = []
            if p is not None:
                run.append(p)
    assert [tuple(r) for r in out.itertuples(index=False)] == want
    # doc 0 and 3 fully duplicated: span covers all 4 gram positions
    full = out[out["doc_id"] == 0].iloc[0]
    assert (full["start"], full["end"], full["n_grams"]) == (1, 4, 4)
    # doc 1's shared run: grams at positions 2,3 ('alpha beta gamma',
    # 'beta gamma delta')
    mid = out[out["doc_id"] == 1].iloc[0]
    assert (mid["start"], mid["end"]) == (2, 3)


def test_mg_sketch_heavy_hitters(ray_session):
    """MG compress bound holds; sketch+verify == brute-force top-k; the
    prover refuses when m is too small to prove the answer."""
    from collections import Counter

    import ray.data as rd
    from peterman_search_engine_ray.functions.textstats import raw_tokens
    from peterman_search_engine_ray.stages.sketch import (mg_compress,
                                                          top_terms_exact)

    # compress bound: undercount per surviving term <= dropped kth value
    rng = np.random.RandomState(4)
    counts = rng.zipf(1.5, 400).astype(np.int64)
    terms = np.array([f"t{i}" for i in range(400)], dtype=object)
    ct, cc, b = mg_compress(terms, counts, 64)
    assert ct.size <= 64
    full = dict(zip(terms, counts))
    assert all(0 < c <= full[t] and full[t] - c <= b
               for t, c in zip(ct, cc))

    # zipfian corpus: provably-exact top-k == brute force
    vocab = [f"w{i}" for i in range(200)]
    p = 1.0 / np.arange(1, 201); p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=p)) for _ in range(60)]
    tbl = pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    out = top_terms_exact(rd.from_arrow(tbl).repartition(4), k=10, m=256)
    brute = Counter(w for t in texts for w in raw_tokens(t))
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["term"], out["n"])) == want

    # near-uniform counts with a tiny m: unprovable -> refuses loudly
    # instead of approximating
    utexts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    utbl = pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                     "text": pa.array(utexts, pa.string())})
    with pytest.raises(ValueError, match="cannot prove"):
        top_terms_exact(rd.from_arrow(utbl).repartition(4), k=10, m=2)


def test_percolate(ray_session):
    """Stored-query matching vs hand-derived expectations, AND + phrase
    modes, incl. doc-boundary safety for the phrase run check."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.percolate import percolate

    texts = ["big data systems win",          # phrase + and(data)
             "data is big",                   # and-terms present, no phrase
             "big\ndata never sleeps",        # phrase across whitespace ok
             "nothing relevant",
             "ends with big",                 # phrase must NOT leak into
             "data starts here"]              # ...the next doc
    tbl = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    stored = [(7, "and", ["big", "data"]),
              (9, "phrase", ["big", "data"])]
    out = (percolate(rd.from_arrow(tbl).repartition(1), stored)
           .to_pandas().sort_values(["query_id", "doc_id"]))
    got = set(zip(out["query_id"], out["doc_id"]))
    assert got == {(7, 0), (7, 1), (7, 2), (9, 0), (9, 2)}
    with pytest.raises(Exception, match="unknown stored-query mode"):
        percolate(rd.from_arrow(tbl), [(0, "nope", ["x"])]).to_pandas()


def test_funnel_counts(ray_session):
    """Ordered funnel vs hand-computed chains, incl. the strict-order
    rule (a click BEFORE the first view must not count)."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.events import funnel_counts

    rows = [  # (user, ts_us, type)
        (1, 100, "view"), (1, 200, "click"), (1, 300, "error"),   # full
        (2, 100, "view"), (2, 150, "click"),                      # 2 steps
        (3, 100, "click"), (3, 200, "view"),                      # click too
        (3, 300, "click"),                                        # ...then ok
        (4, 100, "error"), (4, 200, "view"),                      # view only
        (5, 100, "view"), (5, 100, "click"),                      # same-ts:
    ]                                                             # not after
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64())})
    out = funnel_counts(rd.from_arrow(tbl).repartition(3))
    assert out["step"].tolist() == [0, 1, 2]
    assert out["event_type"].tolist() == ["view", "click", "error"]
    # step0: users 1,2,3,4,5; step1: 1,2,3 (5's click ties, 3's later
    # click counts); step2: 1 only
    assert out["n_users"].tolist() == [5, 3, 1]


def test_hits(ray_session):
    """Distributed HITS == the numpy twin; authorities behave (the hub
    target doc 0 gets the most in-links -> top authority)."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        hits_numpy, hits_ray, synth_edges)
    edges_tbl = synth_edges(np.arange(50))
    a = hits_numpy(edges_tbl.to_pandas(), iters=2)
    b = hits_ray(rd.from_arrow(edges_tbl), iters=2)
    pd.testing.assert_frame_equal(a, b)
    top = a.sort_values(["authority", "node"],
                        ascending=[False, True]).iloc[0]
    assert top["node"] == 0                 # extra in-links from idx%7==1
    assert (a["authority"] >= 0).all() and a["authority"].dtype == np.int64
    # a 3rd iteration changes scores (sanity that iters matters)
    c = hits_numpy(edges_tbl.to_pandas(), iters=3)
    assert not c["authority"].equals(a["authority"])


def test_lpa_label_propagation(ray_session):
    """Distributed synchronous LPA == the numpy twin, on the synthetic
    graph AND a random multigraph; labels converge toward the hub."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        lpa_numpy, lpa_ray, synth_edges)
    edges_tbl = synth_edges(np.arange(60))
    a = lpa_numpy(edges_tbl.to_pandas(), rounds=2)
    b = lpa_ray(rd.from_arrow(edges_tbl), rounds=2)
    pd.testing.assert_frame_equal(a, b)
    assert a["label"].nunique() < 60        # propagation actually merged

    rng = np.random.default_rng(3)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    df = pd.DataFrame({"src": src[keep].astype(np.int64),
                       "dst": dst[keep].astype(np.int64)})
    a = lpa_numpy(df, rounds=3)
    b = lpa_ray(rd.from_pandas(df).repartition(4), rounds=3)
    pd.testing.assert_frame_equal(a, b)


def test_bfs_levels(ray_session):
    """Partition-once BFS == a single-process reference on random
    directed graphs; stops when the frontier dries up."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import bfs_levels_ray

    def ref_bfs(df, src, max_level):
        adj: dict = {}
        for s, d in zip(df["src"], df["dst"]):
            adj.setdefault(int(s), set()).add(int(d))
        visited, frontier = {src}, {src}
        rows = [(0, 1)]
        for lvl in range(1, max_level + 1):
            nxt = set()
            for u in frontier:
                nxt |= adj.get(u, set())
            nxt -= visited
            if not nxt:
                break
            visited |= nxt
            frontier = nxt
            rows.append((lvl, len(nxt)))
        return pd.DataFrame(rows, columns=["level", "n_nodes"]) \
            .astype(np.int64)

    rng = np.random.default_rng(17)
    for _ in range(3):
        df = pd.DataFrame({
            "src": rng.integers(0, 40, 150).astype(np.int64),
            "dst": rng.integers(0, 40, 150).astype(np.int64)})
        got = bfs_levels_ray(rd.from_pandas(df).repartition(4), 0,
                             max_level=4)
        pd.testing.assert_frame_equal(got, ref_bfs(df, 0, 4))
    # isolated source: single level-0 row
    tiny = pd.DataFrame({"src": np.array([5], np.int64),
                         "dst": np.array([6], np.int64)})
    got = bfs_levels_ray(rd.from_pandas(tiny), 99, max_level=3)
    assert got.to_dict("records") == [{"level": 0, "n_nodes": 1}]


def test_graph_edge_guards(ray_session):
    """Empty inputs return empty frames (not crashes); packed edge keys
    refuse out-of-range ids instead of silently corrupting counts."""
    import pytest
    from peterman_search_engine_ray.pipelines.pagerank import (
        lpa_numpy, triangle_count_numpy)
    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)})
    assert len(lpa_numpy(empty)) == 0
    assert triangle_count_numpy(empty)["triangles"][0] == 0
    big = pd.DataFrame({"src": np.array([1 << 33], np.int64),
                        "dst": np.array([1], np.int64)})
    with pytest.raises(ValueError, match="2\\^32"):
        triangle_count_numpy(big)


def test_triangle_count(ray_session):
    """Distributed degree-ordered triangle counting == numpy twin ==
    brute-force neighborhood intersection, on random multigraphs and the
    synthetic link graph."""
    import ray.data as rd
    from peterman_search_engine_ray.pipelines.pagerank import (
        synth_edges, triangle_count_numpy, triangle_count_ray)

    def brute(df):
        und = {(min(s, d), max(s, d))
               for s, d in zip(df["src"], df["dst"]) if s != d}
        adj: dict = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        return sum(len(adj[u] & adj[v]) for u, v in und) // 3

    rng = np.random.default_rng(5)
    for _ in range(3):
        src = rng.integers(0, 30, 200)
        dst = rng.integers(0, 30, 200)
        df = pd.DataFrame({"src": src.astype(np.int64),
                           "dst": dst.astype(np.int64)})
        a = triangle_count_numpy(df)
        b = triangle_count_ray(rd.from_pandas(df).repartition(4))
        assert a["triangles"][0] == brute(df)
        pd.testing.assert_frame_equal(a, b)
    e = synth_edges(np.arange(100)).to_pandas()
    a = triangle_count_numpy(e)
    b = triangle_count_ray(rd.from_pandas(e).repartition(4))
    assert a["triangles"][0] == brute(e) == 5
    pd.testing.assert_frame_equal(a, b)


def test_sliding_and_coview(ray_session):
    """Sliding windows vs brute force; co-view pairs vs brute force."""
    import json
    from collections import Counter
    from itertools import combinations

    import ray.data as rd
    from peterman_search_engine_ray.stages.events import (coview_pairs,
                                                          sliding_counts)

    H = 3_600_000_000
    rows = [(i, (i * 7919) % (6 * H), i % 5, "view" if i % 3 else "click",
             '{"k": %d}' % (i % 7)) for i in range(200)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "props": pa.array([r[4] for r in rows], pa.string())})
    ds = rd.from_arrow(tbl).repartition(4)

    out = sliding_counts(ds, window_us=H, hop_us=H // 4)
    want = Counter()
    for _, ts, _, et, _ in rows:
        last = (ts // (H // 4)) * (H // 4)
        for i in range(4):
            want[(et, last - i * (H // 4))] += 1
    got = {(r.event_type, r.win_us): r.n for r in out.itertuples(index=False)}
    assert got == dict(want)

    cv = coview_pairs(ds, k=50)
    ui = {}
    for _, _, u, _, pr in rows:
        ui.setdefault(u, set()).add(json.loads(pr)["k"])
    brute = Counter()
    for items in ui.values():
        for a, b in combinations(sorted(items), 2):
            brute[(a, b)] += 1
    want_sorted = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got_pairs = [((r.a, r.b), r.n) for r in cv.itertuples(index=False)]
    assert got_pairs == want_sorted


def test_retention_cohorts(ray_session):
    """Cohort retention vs brute force."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.events import retention_cohorts

    D = 86_400_000_000
    rows = [(1, 0), (1, 0), (1, 1), (1, 3),        # cohort 0: offsets 0,1,3
            (2, 1), (2, 2),                        # cohort 1: offsets 0,1
            (3, 0), (3, 1)]                        # cohort 0: offsets 0,1
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * D + 5 for _, d in rows], pa.timestamp("us")),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string())})
    out = retention_cohorts(rd.from_arrow(tbl).repartition(3))
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in out.itertuples(index=False)}
    assert got == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_langid_trained(ray_session):
    """Trained trigram profiles separate distinct scripts/languages; the
    confusion diagonal dominates, and the packed-key order matches
    string order for 3-char grams."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.langid import (_key_to_str,
                                                          _tri_keys,
                                                          langid_confusion)
    # packed order == lexicographic order for 3-char strings
    ks = _tri_keys("abcXyz日本語x")
    strs = ["abcXyz日本語x"[i:i + 3] for i in range(len("abcXyz日本語x") - 2)]
    order_k = np.argsort(ks).tolist()
    order_s = sorted(range(len(strs)), key=lambda i: strs[i])
    assert order_k == order_s
    assert _key_to_str(int(ks[0])) == "abc"

    en = ["the quick brown fox jumps over the lazy dog"] * 8
    ja = ["日本語のテキストです。形態素解析が必要です。"] * 8
    texts = en + ja
    langs = ["en"] * 8 + ["ja"] * 8
    tbl = pa.table({"doc_id": pa.array(np.arange(16, dtype=np.int64)),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string())})
    out = langid_confusion(rd.from_arrow(tbl).repartition(3), k=20)
    got = {(r.lang, r.lang_pred): r.n for r in out.itertuples(index=False)}
    assert got == {("en", "en"): 8, ("ja", "ja"): 8}


def test_knn_candidates(ray_session):
    """Block-nested-loop kNN candidates contain the true top-k of every
    row (brute-force check), across multiple blocks."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.similarity import knn_candidates

    rng = np.random.RandomState(9)
    n, dim, k = 120, 8, 3
    M = rng.randn(n, dim)
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array([r.tolist() for r in M],
                                          pa.list_(pa.float64()))})
    cand = knn_candidates(rd.from_arrow(tbl).repartition(5), k=k)
    got = {}
    for r in cand.itertuples(index=False):
        got.setdefault(r.src, set()).add(r.dst)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = Mn @ Mn.T
    np.fill_diagonal(cos, -np.inf)
    for i in range(n):
        true_top = set(np.argsort(-cos[i])[:k].tolist())
        assert true_top <= got[i], i          # candidates cover true kNN
        assert i not in got[i]                # no self edges
