"""Winnowing fingerprinter (stages/winnow.py) — the SIGMOD 2003
properties that make the sketch useful, checked against a transparent
per-doc reference implementation."""

import numpy as np
import pyarrow as pa

from peterman_search_engine_ray.stages.winnow import (
    WINNOW_K, WINNOW_W, _MOD, _select_positions, _shingle_hashes,
    winnow_partials_batch)


def _ref_select(h: list) -> set:
    """Reference winnowing over ONE doc's hash sequence: rightmost min
    of every W-window; short docs use their single whole-doc window."""
    n = len(h)
    if n == 0:
        return set()
    if n < WINNOW_W:
        m = min(h)
        return {max(i for i, x in enumerate(h) if x == m)}
    out = set()
    for e in range(WINNOW_W - 1, n):
        w = h[e - WINNOW_W + 1: e + 1]
        m = min(w)
        out.add(e - WINNOW_W + 1
                + max(i for i, x in enumerate(w) if x == m))
    return out


def test_select_matches_reference_randomized():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n_docs = int(rng.integers(1, 6))
        hs, ds = [], []
        for d in range(n_docs):
            n = int(rng.integers(0, 20))
            hs.extend(rng.integers(0, 9, n).tolist())  # dense → many ties
            ds.extend([d] * n)
        if not hs:
            continue
        sdoc = np.array(ds, np.int64)
        h = np.array(hs, np.int64)
        got = set(_select_positions(sdoc, h).tolist())
        want = set()
        for d in range(n_docs):
            idx = np.flatnonzero(sdoc == d)
            want |= {int(idx[0]) + p
                     for p in _ref_select(h[idx].tolist())}
        assert got == want


def test_rightmost_tie_break():
    # ties inside one window must select the RIGHTMOST minimum
    h = np.array([5, 1, 1, 1, 9], np.int64)
    sdoc = np.zeros(5, np.int64)
    got = set(_select_positions(sdoc, h).tolist())
    # windows: [5,1,1,1]→pos3, [1,1,1,9]→pos3
    assert got == {3}


def test_shared_run_guarantee():
    """Any shared token run of ≥ W+K-1 tokens ⇒ ≥1 shared fingerprint
    (the paper's detection guarantee), checked over random doc pairs
    with a planted common run."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    run = " ".join(vocab[i] for i in
                   rng.integers(0, 50, WINNOW_W + WINNOW_K - 1))
    for _ in range(20):
        a = " ".join(vocab[i] for i in rng.integers(0, 50, 30)) \
            + " " + run + " " \
            + " ".join(vocab[i] for i in rng.integers(0, 50, 30))
        b = " ".join(vocab[i] for i in rng.integers(0, 50, 25)) \
            + " " + run + " " \
            + " ".join(vocab[i] for i in rng.integers(0, 50, 25))
        out = winnow_partials_batch(
            pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array([a, b])}))
        fps = out.to_pandas()
        shared = set(fps[fps.doc_id == 0].fp) & set(fps[fps.doc_id == 1].fp)
        assert shared, "planted common run must share a fingerprint"


def test_density_bound():
    """Selected density ≈ 2/(W+1) on random hashes — assert the sketch
    actually compresses (< 60% of shingles selected)."""
    rng = np.random.default_rng(3)
    h = rng.integers(0, _MOD, 5000).astype(np.int64)
    sdoc = np.zeros(5000, np.int64)
    sel = _select_positions(sdoc, h)
    assert sel.size < 3000
    assert sel.size > 1000  # and isn't degenerate


def test_shingle_hashes_match_per_doc():
    texts = ["the quick brown fox jumps", "tiny", "a b c"]
    sdoc, h = _shingle_hashes(texts)
    # doc 0: 3 shingles; doc 1: 0 (1 token); doc 2: 1
    assert sdoc.tolist() == [0, 0, 0, 2]
    import hashlib
    want = int.from_bytes(
        hashlib.md5(b"the quick brown").digest()[8:], "little") % _MOD
    assert h[0] == want
