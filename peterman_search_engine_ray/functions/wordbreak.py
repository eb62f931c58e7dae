"""Dictionary word-break tokenizer (reference M4/M5): DP segmentation of
space-free text maximizing Σ log(freq / freq_total), case-insensitive dict
match, unbreakable input raises; stop words dropped from the result
(reference ``analysis/WordBreakTokenizer.java:95-162`` and the Japanese
variant ``JapaneseWordBreakTokenizer.java:39-175``).

The reference ships 82,765-entry English / 60,993-entry Japanese frequency
dictionaries as resources; we deliberately do NOT bundle them — the
tokenizer takes any "word<space>freq" file (or a dict) at construction, and
the actor-pool stage loads it ONCE per worker (ST1).  A tiny built-in demo
dict covers unit tests ("catdog" → ["cat","dog"]).
"""

from __future__ import annotations

import math

import pyarrow as pa

from .analysis import STOP_WORDS

DEMO_FREQ = {
    "cat": 100, "dog": 100, "cats": 40, "dogs": 40,
    "it": 500, "is": 500, "a": 900, "nice": 80, "day": 120,
    "to": 700, "rain": 60, "rainy": 30, "sunny": 30,
}


def load_freq_dict(path: str) -> dict[str, float]:
    """Parse 'word freq' lines; strips BOM (reference
    WordBreakTokenizer.initializeMap, :41-80).  Frequencies may be ints or
    doubles — the reference's Japanese dictionary stores ``783900.0``-style
    values (JapaneseWordBreakTokenizer.java:52-66)."""
    out: dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.lstrip("﻿").strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0].lower()] = float(parts[1])
    return out


class WordBreakTokenizer:
    def __init__(self, freq: dict[str, int] | str | None = None,
                 drop_stopwords: bool = True):
        if freq is None:
            freq = DEMO_FREQ
        if isinstance(freq, str):
            freq = load_freq_dict(freq)
        self.freq = {k.lower(): v for k, v in freq.items()}
        self.total = sum(self.freq.values())
        self.max_len = max((len(k) for k in self.freq), default=0)
        self.drop_stopwords = drop_stopwords

    def tokenize(self, text: str) -> list[str]:
        s = text.lower()
        n = len(s)
        if n == 0:
            return []
        NEG = -math.inf
        best = [NEG] * (n + 1)
        back = [-1] * (n + 1)
        best[0] = 0.0
        freq, total, max_len = self.freq, self.total, self.max_len
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                if best[j] == NEG:
                    continue
                w = s[j:i]
                f = freq.get(w)
                if f is None:
                    continue
                score = best[j] + math.log(f / total)
                if score > best[i]:
                    best[i] = score
                    back[i] = j
        if best[n] == NEG:
            raise ValueError(f"text is unbreakable with this dictionary: {text[:50]!r}")
        toks: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            toks.append(s[j:i])
            i = j
        toks.reverse()
        if self.drop_stopwords:
            toks = [t for t in toks if t not in STOP_WORDS]
        return toks


class WordBreakStage:
    """Actor-pool stage: dict loaded once per actor (__init__), DP per doc.
    Rows whose text is unbreakable get an empty token list + ok=False
    (a pipeline can't throw per-row at scale; errors become data)."""

    def __init__(self, freq_path: str | None = None,
                 freq: dict[str, int] | None = None):
        self.tok = WordBreakTokenizer(freq_path or freq)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_out, ok = [], []
        for t in batch["text"].to_pylist():
            try:
                toks_out.append(self.tok.tokenize(t or ""))
                ok.append(True)
            except ValueError:
                toks_out.append([])
                ok.append(False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "tokens": pa.array(toks_out, pa.list_(pa.string())),
            "ok": pa.array(ok, pa.bool_()),
        })
