"""Common-Crawl-style web-page corpus: deterministic synthesis + adapters.

Schema per BASELINE.json ``input_hint``:
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)
plus a stable ``doc_id:int64`` column (replacing the reference's
"doc id is the first line of the text" workaround, IcsSearchEngine.java:128-131).

Two entry points:

* :func:`webpages_from_documents` — wraps the driver's
  ``documents.parquet`` table (doc_id, text, lang, …) into web pages whose
  ``html`` deterministically embeds the text; the ground-truth ``text`` column
  is what :func:`~..functions.extract.extract_text` must reproduce
  byte-identically.  This is the corpus used for sf-scale tests and benches.
* :func:`synth_webpages` — a small seeded corpus with controlled vocabulary
  (shared terms, hot terms, df=1 terms, tf>1, adjacent / non-adjacent phrase
  pairs — FIXTURES.md F1) for unit tests.
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa

import ray.data

WARC_EPOCH_US = 1_554_076_800_000_000  # 2019-04-01T00:00:00Z in microseconds

_BOILER_HEAD = ("<head><title>p{i}</title><meta charset=\"utf-8\">"
                "<style>body{{margin:0}}</style>"
                "<script>var p={i};</script></head>")


def page_html(doc_id: int, text: str) -> bytes:
    """Deterministic HTML wrapper: head boilerplate + comments + an inline
    script inside the body; the escaped text is the only body content that
    survives extraction."""
    esc = _html.escape(text)
    return (
        "<html>" + _BOILER_HEAD.format(i=doc_id) +
        f"<body><!-- id:{doc_id} --><article>{esc}</article>"
        f"<script>track({doc_id});</script></body></html>"
    ).encode("utf-8")


def page_url(doc_id: int) -> str:
    return f"https://site{doc_id % 50}.example/page/{doc_id}"


def _wrap_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    langs = (batch["lang"].to_pylist() if "lang" in batch.column_names
             else ["en"] * len(texts))
    urls = [page_url(int(d)) for d in doc_ids]
    htmls = [page_html(int(d), t if t is not None else "")
             for d, t in zip(doc_ids, texts)]
    ts = pa.array(WARC_EPOCH_US + doc_ids * 1_000_000,
                  type=pa.timestamp("us"))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([t if t is not None else "" for t in texts], pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def webpages_from_documents(sf_dir: str, *, columns=("doc_id", "text", "lang"),
                            replicate: int = 1,
                            replicate_shift: int = 1 << 23) -> "ray.data.Dataset":
    """Driver documents table → web-page corpus Dataset (lazy, streaming).

    ``replicate > 1`` emits that many doc_id-shifted copies of every batch —
    the bench uses it to scale compute volume on the fixed test tables
    (mirrors the reference stress tests' corpus replication,
    Team2StressTest.java:26-62)."""
    # documents.parquet is a single file with ONE row group → the read is a
    # single unsplittable task and every fused downstream map would run
    # serially (block count is Ray's map-parallelism unit).  The raw table is
    # tiny, so an explicit repartition barrier here is cheap and unlocks full
    # parallelism for the replicate/wrap/tokenize maps.  A real 100 TB corpus
    # arrives as many files/row groups and needs no such step.
    # Fixed block count: the scatter stage writes one IPC stream per
    # (task, part), so task count must be independent of the CPU count or
    # aggregate overhead inflates with parallelism (and scaling runs stop
    # comparing the same job).
    nblocks = int(os.environ.get("PETERMAN_CORPUS_BLOCKS", "64"))
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=list(columns)).repartition(nblocks)
    if replicate > 1:
        shift = replicate_shift  # must exceed max doc_id to stay collision-free

        def rep(batch: pa.Table) -> pa.Table:
            parts = []
            for r in range(replicate):
                ids = pa.array(batch["doc_id"].to_numpy() + r * shift, pa.int64())
                parts.append(batch.set_column(
                    batch.schema.get_field_index("doc_id"), "doc_id", ids))
            return pa.concat_tables(parts)

        ds = ds.map_batches(rep, batch_format="pyarrow")
    return ds.map_batches(_wrap_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Seeded unit-test corpus (FIXTURES.md F1)
# ---------------------------------------------------------------------------

_VOCAB = ("apple banana cherry date elderberry fig grape honeydew kiwi lemon "
          "mango nectarine orange papaya quince raspberry strawberry tangerine "
          "ugli vanilla walnut").split()


def synth_rows(n: int, seed: int = 42) -> pa.Table:
    """n deterministic pages. Every doc contains hot term 'peterman';
    doc i contains 'unique{i}' (df=1); doc 0 repeats 'apple' 3× (tf>1);
    even docs contain the adjacent phrase 'grape honeydew', odd docs contain
    both words non-adjacent (negative phrase case)."""
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n):
        words = ["peterman", f"unique{i}"]
        words += [_VOCAB[j] for j in rng.randint(0, len(_VOCAB), size=8)]
        if i == 0:
            words += ["apple", "apple", "apple"]
        if i % 2 == 0:
            words += ["grape", "honeydew"]
        else:
            words += ["grape", "cherry", "honeydew"]
        # mixed case, punctuation, stopwords, tabs/newlines — tokenizer food
        text = ("The " + " ".join(w.capitalize() if j % 3 == 0 else w
                                  for j, w in enumerate(words))
                + f",\tand so it was; doc {i}!\nEnd.")
        texts.append(text)
    doc_ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })


def synth_webpages(n: int, seed: int = 42) -> "ray.data.Dataset":
    return ray.data.from_arrow(_wrap_batch(synth_rows(n, seed)))


def read_webpages(input_path: str, columns: list[str] | None = None
                  ) -> "ray.data.Dataset":
    """Read a Common-Crawl-style parquet table — the BASELINE.json
    ``input_hint`` schema ``(url, warc_ts, html, text, lang)`` carries NO
    doc_id — and assign stable, DENSE int64 doc_ids.

    ids = per-file offset + row ordinal: offsets come from parquet FOOTER
    metadata only (no data read), each file is loaded by exactly one task,
    so the assignment is deterministic across runs and dense — density is
    what the ``doc_id >> doc_range_bits`` partitioning needs (hashed-url
    ids would scatter every doc into its own range).  Files are the
    natural ingest unit for a sharded crawl; a >memory single file should
    be re-sharded upstream."""
    import pyarrow.parquet as pq

    if os.path.isdir(input_path):
        files = sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.endswith(".parquet"))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path!r}")
    offsets: dict[str, int] = {}
    cum = 0
    for f in files:
        offsets[f] = cum
        cum += pq.ParquetFile(f).metadata.num_rows

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["path"].to_pylist():
            t = pq.read_table(p, columns=columns)
            if "doc_id" not in t.column_names:
                ids = pa.array(
                    np.arange(t.num_rows, dtype=np.int64) + offsets[p])
                t = t.add_column(0, "doc_id", ids)
            out.append(t)
        return pa.concat_tables(out)

    return (ray.data.from_items([{"path": f} for f in files])
            .repartition(len(files))
            .map_batches(load, batch_format="pyarrow"))
