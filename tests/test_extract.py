"""HTML→text extraction: byte-identical per url (north-rule invariant).
Golden outputs frozen in tests/golden/extract.json (generated once from the
deterministic corpus; any change to extractor or generator must keep them)."""

import json
import os

from peterman_search_engine_ray.corpus import page_html, page_url, synth_rows
from peterman_search_engine_ray.functions.extract import extract_text

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract.json")


def test_roundtrip_byte_identical():
    for t in ["hello world", "", "a < b & c > d", "line1\nline2\ttab",
              "punct, all. the; things? yes!", "ünïcødé ★ text"]:
        assert extract_text(page_html(3, t)) == t


def test_strips_script_style_comments():
    html = (b"<html><head><style>p{}</style></head>"
            b"<body>keep<script>drop()</script><!-- gone -->this</body></html>")
    assert extract_text(html) == "keepthis"


def test_no_body_falls_back_to_head_strip():
    assert extract_text(b"<head><title>x</title></head>plain text") == "plain text"


def test_golden_corpus():
    rows = synth_rows(20)
    got = {page_url(i): extract_text(page_html(i, rows["text"][i].as_py()))
           for i in range(20)}
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
    with open(GOLDEN) as f:
        expected = json.load(f)
    assert got == expected
    # and the invariant: extracted text == ground-truth text column
    for i in range(20):
        assert got[page_url(i)] == rows["text"][i].as_py()

