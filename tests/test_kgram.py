"""k-gram + reversed-term dictionary: probe-scale wildcard discovery.

Asserts the VERDICT-r3 'done' criteria: wildcard/regex/suffix discovery
reads only k-gram postings + matched terms (posting_rows_read < vocab),
and candidates match the brute-force predicate over the full vocabulary.
"""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from peterman_search_engine_ray.stages.kgram import (
    build_term_dicts, gram_bucket, kgram_candidates, literal_grams,
    suffix_candidates)

VOCAB = sorted({
    "query", "queries", "quell", "hat", "harbor", "harvest", "window",
    "yellow", "flow", "florid", "work", "works", "border", "or",
    "日本語", "語日", "a", "be", "data", "stream", "quorum", "hallow",
})


@pytest.fixture(scope="module")
def dicts(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("kgram")
    src = os.path.join(root, "dir0.parquet")
    # two 'segment dirs' with overlapping vocab (dedup must collapse them)
    pq.write_table(pa.table({"term": pa.array(VOCAB)}), src)
    src2 = os.path.join(root, "dir1.parquet")
    pq.write_table(pa.table({"term": pa.array(VOCAB[: len(VOCAB) // 2])}),
                   src2)
    out = os.path.join(root, "termdict")
    build_term_dicts([src, src2], out)
    # idempotent second call (manifest hit, no rebuild)
    build_term_dicts([src, src2], out)
    return out


def _brute(pred):
    return sorted(t for t in VOCAB if pred(t))


def test_kgram_prefix_parity_and_scan_free(dicts):
    stats = {}
    cand = kgram_candidates(os.path.join(dicts, "kgram"),
                            [literal_grams("^qu")], stats)
    # candidates ⊇ true matches; exact post-filter closes the gap
    keep = pc.starts_with(pa.array(cand), "qu").to_pylist()
    got = sorted(t for t, k in zip(cand, keep) if k)
    assert got == _brute(lambda t: t.startswith("qu"))
    # scan-freedom: the probe read gram postings, not the vocabulary
    assert stats["posting_rows_read"] < len(VOCAB)
    assert stats["buckets_read"] <= len(set(
        gram_bucket(g) for g in literal_grams("^qu")))


def test_kgram_infix_and_regex_branches(dicts):
    stats = {}
    cand = kgram_candidates(os.path.join(dicts, "kgram"),
                            [literal_grams("or")], stats)
    keep = pc.match_substring(pa.array(cand), "or").to_pylist()
    got = sorted(t for t, k in zip(cand, keep) if k)
    assert got == _brute(lambda t: "or" in t)
    # OR-of-branches (regex alternation shape)
    cand2 = kgram_candidates(os.path.join(dicts, "kgram"),
                             [literal_grams("^qu"), literal_grams("^ha")])
    assert set(cand2) >= set(_brute(
        lambda t: t.startswith("qu") or t.startswith("ha")))


def test_reversed_dict_suffix_exact(dicts):
    stats = {}
    got = suffix_candidates(os.path.join(dicts, "rev"), "ow", stats)
    assert got == _brute(lambda t: t.endswith("ow"))
    # exact: posting rows read == matches (no post-filter waste)
    assert stats["posting_rows_read"] == len(got)
    assert stats["buckets_read"] == 1
    # unicode suffix goes through the same codepoint semantics
    assert suffix_candidates(os.path.join(dicts, "rev"), "本語") == ["日本語"]


def test_short_literal_refuses(dicts):
    with pytest.raises(ValueError, match="gram"):
        kgram_candidates(os.path.join(dicts, "kgram"), [[]])


LONG_A = "x" * 70 + "needleterm"          # probe gram lives past char 64
LONG_B = "z" * 80 + "tailsuffix"


def test_long_term_overflow_recall(ray_session, tmp_path_factory):
    """Terms longer than the gram cap must still be discoverable by ANY
    probe (ADVICE r4: grams past char 64 were silently dropped, so
    infix/'$'-anchored probes missed long terms entirely).  They now ride
    the overflow bucket, which every probe unions in."""
    root = tmp_path_factory.mktemp("kgram_long")
    vocab = VOCAB + [LONG_A, LONG_B]
    src = os.path.join(root, "dir0.parquet")
    pq.write_table(pa.table({"term": pa.array(vocab)}), src)
    out = os.path.join(root, "termdict")
    build_term_dicts([src], out)
    # infix gram entirely past position 64 of LONG_A
    stats = {}
    cand = kgram_candidates(os.path.join(out, "kgram"),
                            [literal_grams("needle")], stats)
    assert LONG_A in cand and stats["overflow_terms"] == 2
    # '$'-anchored gram of LONG_B's tail
    cand2 = kgram_candidates(os.path.join(out, "kgram"),
                             [literal_grams("tailsuffix$")])
    assert LONG_B in cand2
    # short-term probes are unchanged and still scan-free: overflow adds
    # only the (tiny) long-term set, never the vocabulary
    stats3 = {}
    cand3 = kgram_candidates(os.path.join(out, "kgram"),
                             [literal_grams("^qu")], stats3)
    keep = pc.starts_with(pa.array(cand3), "qu").to_pylist()
    assert sorted(t for t, k in zip(cand3, keep) if k) == _brute(
        lambda t: t.startswith("qu"))
    assert stats3["posting_rows_read"] < len(vocab)
    # reversed dict is uncapped: suffix probe finds the long term exactly
    got = suffix_candidates(os.path.join(out, "rev"), "tailsuffix")
    assert got == [LONG_B]


def test_spell_kgram_matches_full_scan(ray_session, tmp_path_factory):
    """k-gram-prefiltered correction == the vocab-scale full scan
    (same (dist, -df, term) argmin) while reading only gram-posting rows
    — VERDICT r4 #2's 'done' criterion."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.spell import (
        spell_correct, spell_correct_kgram)
    root = tmp_path_factory.mktemp("spellk")
    dfs = {t: 10 + i for i, t in enumerate(VOCAB)}
    src = os.path.join(root, "dir0.parquet")
    pq.write_table(pa.table({"term": pa.array(VOCAB)}), src)
    td = os.path.join(root, "termdict")
    build_term_dicts([src], td)
    tdf = rd.from_pandas(pd.DataFrame(
        {"term": list(dfs), "df": list(dfs.values())})).repartition(3)
    probes = ["qery", "strem", "window", "harbr", "query"]
    want = spell_correct(tdf, probes)
    stats = {}
    got = spell_correct_kgram(
        os.path.join(td, "kgram"), probes, lambda t: dfs[t],
        fallback=lambda rest: spell_correct(tdf, rest), stats=stats)
    pd.testing.assert_frame_equal(got, want)
    # scan-freedom: gram-posting rows, not |vocab| * probes
    assert stats["fallback_probes"] == 0
    assert stats["posting_rows_read"] < len(VOCAB) * len(probes)
    # a hopeless probe (nothing within the gram bound) falls back to the
    # full scan and still returns the exact global argmin
    wild = ["zzqxv"]
    want2 = spell_correct(tdf, wild)
    stats2 = {}
    got2 = spell_correct_kgram(
        os.path.join(td, "kgram"), wild, lambda t: dfs[t],
        fallback=lambda rest: spell_correct(tdf, rest), stats=stats2)
    pd.testing.assert_frame_equal(got2, want2)
    assert stats2["fallback_probes"] == 1
    # no fallback provided -> loud refusal, never a silent wrong answer
    with pytest.raises(Exception, match="fallback"):
        spell_correct_kgram(os.path.join(td, "kgram"), wild,
                            lambda t: dfs[t])


def test_knn_candidates_ivf_bounded_and_recall(ray_session):
    """Bucketed kNN == exact kNN on cluster-structured data, with every
    task's candidate pool bounded far below all-pairs."""
    import ray.data as rd
    from peterman_search_engine_ray.stages.similarity import (
        IvfAnnIndex, knn_candidates, knn_candidates_ivf)
    rng = np.random.RandomState(7)
    n, d, cdim = 120, 16, 4
    ids = np.arange(n, dtype=np.int64)
    base = np.zeros((n, d))
    base[np.arange(n), 2 * (ids % cdim)] = 500.0
    V = base + rng.randint(0, 7, size=(n, d))
    emb = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * d),
            pa.array(V.ravel(), pa.float64()))})
    ds = rd.from_arrow(emb).repartition(4)
    ivf = IvfAnnIndex(n_centroids=cdim, dim=d, iters=6).build(ds)
    cand, stats = knn_candidates_ivf(ivf, k=3, nprobe=2)
    exact = knn_candidates(ds, k=3)
    # per-task volume is bounded: no task saw the whole table as pool
    assert stats and all(s["pool_rows"] < n for s in stats)
    # recall 1 on clustered data after identical re-rank: the candidate
    # set must cover every exact edge's (src,dst) whose dst is in-cluster
    def rerank(c):
        s, t = c["src"].to_numpy(), c["dst"].to_numpy()
        cs = (V[s] * V[t]).sum(1) / (
            np.linalg.norm(V[s], axis=1) * np.linalg.norm(V[t], axis=1))
        df = pd.DataFrame({"src": s, "dst": t, "c": cs})
        top = (df.sort_values(["src", "c", "dst"],
                              ascending=[True, False, True])
               .groupby("src", sort=False).head(3))
        return set(map(tuple, top[["src", "dst"]].to_numpy()))
    assert rerank(cand) == rerank(exact)
