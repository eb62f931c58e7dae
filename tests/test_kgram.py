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
