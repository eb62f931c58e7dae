"""Deterministic HTML → text extraction.

The reference consumes pre-cleaned text files (``search/IcsSearchEngine.java:43-52``)
— extraction is new here, required by the north rule's per-row invariant:
*byte-identical extracted text per url*, pinned by golden-file tests.

Specification (applied in order, all regex-deterministic, no parser state):
1. decode UTF-8 (errors="replace" — invalid bytes become U+FFFD)
2. drop ``<!-- ... -->`` comments
3. drop ``<![CDATA[ ... ]]>`` sections (HTML parsers treat them as bogus
   markup, never as renderable text)
4. drop ``<script>...</script>`` and ``<style>...</style>``
   (case-insensitive); an UNCLOSED ``<script>``/``<style>`` drops to end
   of document (real-crawl pages truncate mid-script — leaking raw JS
   into the text corrupts every downstream token stat)
5. keep only the ``<body>...</body>`` content when a body tag exists
   (case-insensitive, attributes allowed; otherwise drop
   ``<head>...</head>`` and keep the rest)
6. strip every remaining ``<...>`` tag (no whitespace inserted)
7. unescape HTML entities (invalid/unknown entities pass through
   verbatim — html.unescape semantics)

Pure function — used inside ``map_batches`` (batch_format="pyarrow"), with the
``html`` binary column dropped immediately after extraction (project early;
HTML rows are the fat payload).
"""

from __future__ import annotations

import html as _html
import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
# a <script>/<style> with no closing tag left after the pair pass:
# everything to end of document is script payload, never text
_OPEN_SCRIPT_RE = re.compile(r"<(?:script|style)\b.*$", re.S | re.I)
_BODY_RE = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.S | re.I)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(html_bytes: bytes | str) -> str:
    s = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, (bytes, bytearray, memoryview)) else html_bytes
    s = _COMMENT_RE.sub("", s)
    s = _CDATA_RE.sub("", s)
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _OPEN_SCRIPT_RE.sub("", s)
    m = _BODY_RE.search(s)
    s = m.group(1) if m else _HEAD_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)
