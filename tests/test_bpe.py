"""Distributed BPE tokenizer training (stages/bpe.py).

No reference analog — the reference indexes text, it does not learn a
subword vocabulary; this is the tokenizer-training stage of an LLM data
pipeline.  The oracle contract is pinned by tests: run-parity rewrite ==
left-to-right textbook merge, and the distributed trainer == a
single-process reference loop on the same word-frequency table.
"""

import itertools
import random
from collections import Counter

import pandas as pd
import pyarrow as pa

from peterman_search_engine_ray.stages.bpe import (
    _make_apply_merge, _pair_partials, merge_word, train_bpe, vocab_counts)


def _ref_bpe(wf: dict[str, int], num_merges: int):
    """Single-process textbook BPE — the semantics train_bpe must match."""
    words = {w: list(w) for w in wf}
    merges = []
    for it in range(num_merges):
        pc = Counter()
        for w, sym in words.items():
            for p in zip(sym[:-1], sym[1:]):
                pc[p] += wf[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((it, a, b, cnt))
        for w in words:
            words[w] = merge_word(words[w], a, b)
    return merges


def test_merge_word_run_parity_cases():
    # overlapping same-symbol runs: left-to-right semantics
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_word(list("xaby"), "a", "b") == ["x", "ab", "y"]
    assert merge_word(["ab", "c"], "ab", "c") == ["abc"]
    assert merge_word(list("xy"), "q", "r") == ["x", "y"]


def test_apply_merge_vectorized_equals_merge_word():
    """The numpy run-parity rewrite (one if_else + filter over the flat
    symbol array) == the per-row scalar merge_word on adversarial
    shapes: self-overlap runs, cross-word boundaries, deep symbols,
    randomized blocks."""
    import itertools
    import numpy as np
    rng = np.random.RandomState(3)
    words = ["aaa", "aaaa", "aaaaa", "abab", "xaby", "ba", "", "a", "b",
             "aabbaabb", "bbaa"]
    for n in range(4):   # randomized extra rows over a tiny alphabet
        words.append("".join(rng.choice(list("ab"), size=rng.randint(0, 9))))
    sy0 = [list(w) for w in words]
    for a, b in itertools.product("ab", repeat=2):
        batch = pa.table({
            "w": pa.array(words, pa.string()),
            "f": pa.array(np.ones(len(words), np.int64)),
            "sy": pa.array(sy0, pa.list_(pa.string()))})
        got = _make_apply_merge(a, b)(batch)["sy"].to_pylist()
        want = [merge_word(s, a, b) for s in sy0]
        assert got == want, (a, b)
    # multi-char symbols (deep-iteration shape)
    batch = pa.table({
        "w": pa.array(["abcabc", "abab"], pa.string()),
        "f": pa.array([1, 1], pa.int64()),
        "sy": pa.array([["ab", "c", "ab", "c"], ["ab", "ab"]],
                       pa.list_(pa.string()))})
    got = _make_apply_merge("ab", "c")(batch)["sy"].to_pylist()
    assert got == [["abc", "abc"], ["ab", "ab"]]


def test_pair_partials_exact_counts():
    batch = pa.table({
        "w": ["abab", "aab"],
        "f": pa.array([3, 2], pa.int64()),
        "sy": pa.array([list("abab"), list("aab")], pa.list_(pa.string()))})
    out = _pair_partials(batch).to_pandas()
    got = {(r["a"], r["b"]): r["cnt"] for _, r in out.iterrows()}
    # abab: ab×2, ba×1 (weight 3); aab: aa×1, ab×1 (weight 2)
    assert got == {("a", "b"): 3 * 2 + 2, ("b", "a"): 3, ("a", "a"): 2}


def test_apply_merge_prefilter_noop_block():
    batch = pa.table({
        "w": ["xy"], "f": pa.array([1], pa.int64()),
        "sy": pa.array([list("xy")], pa.list_(pa.string()))})
    out = _make_apply_merge("a", "b")(batch)
    assert out is batch  # untouched block passes through zero-copy


def test_train_bpe_matches_reference_loop(ray_session):
    import ray.data
    random.seed(7)
    alph = "abcde"
    wf = {"".join(random.choice(alph) for _ in range(random.randint(2, 9))):
          random.randint(1, 50) for _ in range(120)}
    words_ds = ray.data.from_arrow(pa.table({
        "w": list(wf), "f": pa.array(list(wf.values()), pa.int64())}))
    got = train_bpe(words_ds, num_merges=8)
    exp = pd.DataFrame(_ref_bpe(wf, 8), columns=["it", "a", "b", "cnt"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.astype({"it": "int64", "cnt": "int64"}))


def test_vocab_counts_matches_reference_loop(ray_session):
    import ray.data
    random.seed(11)
    wf = {"".join(random.choice("abcd") for _ in range(random.randint(2, 8))):
          random.randint(1, 30) for _ in range(80)}
    words_ds = ray.data.from_arrow(pa.table({
        "w": list(wf), "f": pa.array(list(wf.values()), pa.int64())}))
    _, final = train_bpe(words_ds, num_merges=5, return_state=True)
    got = vocab_counts(final, k=20)

    # reference: replay merges single-process, count final symbols
    words = {w: list(w) for w in wf}
    for _, a, b, _cnt in _ref_bpe(wf, 5):
        for w in words:
            words[w] = merge_word(words[w], a, b)
    cnt = Counter()
    for w, sym in words.items():
        for s in sym:
            cnt[s] += wf[w]
    exp = (pd.DataFrame(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20],
                        columns=["token", "cnt"]).astype({"cnt": "int64"}))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_sql_rewrite_matches_merge_word():
    """The oracle's window-function rewrite (gaps-and-islands run-parity)
    == merge_word, executed in DuckDB itself — pins the oracle property
    against DuckDB behavior changes."""
    import duckdb
    con = duckdb.connect()
    random.seed(13)
    cases = {f"w{i}": [random.choice("ab") for _ in range(random.randint(2, 10))]
             for i in range(60)}
    cases["runs3"] = list("aaa")
    cases["runs5"] = list("aaaaa")
    con.execute("CREATE TABLE st AS SELECT * FROM (VALUES " + ",".join(
        f"('{w}', {list(sy)!r}::VARCHAR[])" for w, sy in cases.items())
        + ") t(w, sy)")
    for a, b in [("a", "a"), ("a", "b"), ("b", "a")]:
        got = dict(con.execute(f"""
WITH ex AS (SELECT w, UNNEST(sy) AS s, UNNEST(range(1, len(sy)+1)) AS i FROM st),
m AS (SELECT w, s, i, lead(s) OVER (PARTITION BY w ORDER BY i) AS ns,
        (s = '{a}' AND lead(s) OVER (PARTITION BY w ORDER BY i) = '{b}') AS im
      FROM ex),
g AS (SELECT *, CASE WHEN im THEN i - ROW_NUMBER() OVER (PARTITION BY w, im ORDER BY i) END AS grp FROM m),
p AS (SELECT *, im AND (ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) % 2 = 1) AS dm FROM g),
d AS (SELECT *, COALESCE(lag(dm) OVER (PARTITION BY w ORDER BY i), FALSE) AS dropped FROM p)
SELECT w, list(CASE WHEN dm THEN s || ns ELSE s END ORDER BY i)
FROM d WHERE NOT dropped GROUP BY w""").fetchall())
        for w, sy in cases.items():
            assert got[w] == merge_word(sy, a, b), (w, sy, a, b)


def test_run_parity_equals_left_to_right_exhaustive():
    # run-parity is how the SQL oracle rewrites; prove it equals the
    # left-to-right loop on every ≤6-symbol binary sequence × all pairs
    for L in range(2, 7):
        for t in itertools.product("ab", repeat=L):
            sym = list(t)
            for a, b in itertools.product("ab", repeat=2):
                exp = merge_word(sym, a, b)
                # run-parity re-derivation
                match = [i for i in range(len(sym) - 1)
                         if sym[i] == a and sym[i + 1] == b]
                keep, run = [], []
                for i in match:
                    if run and i == run[-1] + 1:
                        run.append(i)
                    else:
                        run = [i]
                    if (len(run) % 2) == 1:
                        keep.append(i)
                out, i = [], 0
                ks = set(keep)
                while i < len(sym):
                    if i in ks:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                assert out == exp, (sym, a, b)
