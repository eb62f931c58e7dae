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


ADVERSARIAL = [
    # (name, raw bytes, expected text) — real-crawl chaos the synthesizer
    # never emits; the spec's behavior on each is FROZEN here (VERDICT r4
    # #6: the byte-identity invariant must hold beyond clean HTML)
    ("unclosed_script",
     b"<body>keep <script type='x'>var a=1; never closed", "keep "),
    ("unclosed_style",
     b"<body>text<style>p{color:red", "text"),
    ("unclosed_after_closed",
     b"<body>a<script>x()</script>b<script>trailing", "ab"),
    ("cdata_dropped",
     b"<body>x<![CDATA[ raw <junk> & noise ]]>y</body>", "xy"),
    ("cdata_multiline",
     b"<body>a<![CDATA[\nline1\nline2\n]]>b</body>", "ab"),
    ("uppercase_body_attrs",
     b"<HTML><BODY CLASS=\"M\" ONLOAD='f()'>shout</BODY></HTML>", "shout"),
    ("mixed_case_close",
     b"<body>inner</BoDy>tail", "inner"),
    ("broken_entity_passthrough",
     b"<body>a &nosuchentity; b &#xZZ; c &amp; d</body>",
     "a &nosuchentity; b &#xZZ; c & d"),
    ("bare_ampersand",
     b"<body>AT&T &lt;ok&gt;</body>", "AT&T <ok>"),
    ("non_utf8_bytes",
     b"<body>caf\xe9 ok</body>", "caf� ok"),
    ("comment_hides_script_open",
     b"<body>a<!-- <script> -->b</body>", "ab"),
    ("angle_in_attr_truncates_tag",   # regex spec: tag ends at first '>'
     b"<body><a title=\"x > y\">link</a></body>", " y\">link"),
]


def test_adversarial_goldens():
    for name, raw, want in ADVERSARIAL:
        assert extract_text(raw) == want, name


def test_adversarial_deterministic_on_reruns():
    # the invariant is BYTE-IDENTITY per input — run twice, compare
    for name, raw, _ in ADVERSARIAL:
        assert extract_text(raw) == extract_text(raw), name


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

