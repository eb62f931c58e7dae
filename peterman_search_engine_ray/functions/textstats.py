"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality counts, token counting, document fingerprinting.

All functions are deterministic and (where SQL-checkable) designed so a
DuckDB oracle computes the identical integers:

* ``raw_tokens``: the punctuation-tokenizer split WITHOUT the stopword
  filter (lowercased, empties dropped) — matches
  ``list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r,.;?!]+'), x -> x <> '')``.
* ``token_stats``: (n_tokens, n_stop, n_types, n_punct) int counts.
* ``lang_id``: heuristic — ≥2 English stop-word tokens → 'en' else 'und'
  (the real multi-language n-gram model slot; deliberately SQL-mirrorable).
* ``bpe_ish_tokens``: letter-runs / digit-runs / single other-symbols —
  a BPE-style pre-tokenizer count (RE2-compatible so DuckDB
  ``regexp_extract_all`` agrees).
* ``doc_fingerprint``: 61-bit polynomial rolling hash over the raw token
  stream (winnowing-style content identity).  Per-token hashes are the lower
  8 bytes (little-endian) of md5 — DuckDB's ``md5_number_lower`` computes the
  identical uint64, so the whole fingerprint is SQL-mirrorable via
  ``list_reduce`` over HUGEINT arithmetic.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import STOP_WORDS, _TOKEN_RE

_BPE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]")
_PUNCT_RE = re.compile(r"[,.;?!]")

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def raw_tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def token_stats(text: str) -> tuple[int, int, int, int]:
    toks = raw_tokens(text)
    n_stop = sum(1 for t in toks if t in STOP_WORDS)
    return len(toks), n_stop, len(set(toks)), len(_PUNCT_RE.findall(text))


def lang_id(text: str) -> str:
    toks = raw_tokens(text)
    hits = sum(1 for t in toks if t in STOP_WORDS)
    return "en" if hits >= 2 else "und"


def bpe_ish_count(text: str) -> int:
    return len(_BPE_RE.findall(text.lower()))


# token -> lower-64-bit md5 memo (vocab is zipfian: hits dominate after warmup)
_MD5_MEMO: dict[str, int] = {}


def md5_lower64(token: str) -> int:
    """Lower 8 bytes (little-endian) of md5(token) — DuckDB
    ``md5_number_lower`` computes the identical uint64."""
    h = _MD5_MEMO.get(token)
    if h is None:
        h = int.from_bytes(hashlib.md5(token.encode()).digest()[8:], "little")
        if len(_MD5_MEMO) < 1_000_000:
            _MD5_MEMO[token] = h
    return h


def md5_lower64_arr(tokens) -> np.ndarray:
    """uint64 md5-lower hashes for a sequence of tokens (memoized)."""
    return np.fromiter((md5_lower64(t) for t in tokens), dtype=np.uint64,
                       count=len(tokens))


def doc_fingerprint(text: str) -> int:
    toks = raw_tokens(text)
    if not toks:
        return 0
    h = 0
    for t in toks:
        h = (h * _FP_BASE + md5_lower64(t) % _FP_MOD) % _FP_MOD
    return h


# ---------------------------------------------------------------------------
# map_batches stage
# ---------------------------------------------------------------------------

def text_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text, …) → per-doc integer stats + lang prediction."""
    texts = batch["text"].to_pylist()
    n_tok = np.empty(len(texts), np.int64)
    n_stop = np.empty(len(texts), np.int64)
    n_types = np.empty(len(texts), np.int64)
    n_punct = np.empty(len(texts), np.int64)
    n_bpe = np.empty(len(texts), np.int64)
    langs = []
    fps = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        a, b, c, d = token_stats(t)
        n_tok[i], n_stop[i], n_types[i], n_punct[i] = a, b, c, d
        n_bpe[i] = bpe_ish_count(t)
        langs.append("en" if b >= 2 else "und")
        fps[i] = doc_fingerprint(t)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n_tok),
        "n_stop": pa.array(n_stop),
        "n_types": pa.array(n_types),
        "n_punct": pa.array(n_punct),
        "n_bpe": pa.array(n_bpe),
        "lang_pred": pa.array(langs, pa.string()),
        "fingerprint": pa.array(fps),
    })


# --- PII scrubbing ---------------------------------------------------------
# RE2-compatible patterns (pyarrow's and DuckDB's regex engines are both
# RE2), so a SQL oracle computes identical counts and redacted strings.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized PII scrub: count and redact email addresses and phone
    numbers in one Arrow pass (``count_substring_regex`` +
    ``replace_substring_regex`` — compiled RE2, no Python per-row loop).
    Pure map-side: the 100 TB shape is embarrassingly parallel, no
    exchange.  Returns (doc_id, n_emails, n_phones, clean)."""
    t = batch[text_col]
    n_em = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
    n_ph = pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64())
    clean = pc.replace_substring_regex(
        pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>")
    return pa.table({"doc_id": batch["doc_id"], "n_emails": n_em,
                     "n_phones": n_ph, "clean": clean})
