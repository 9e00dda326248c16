"""Pages corpus sources.

The engine's input table (``BASELINE.json`` input_hint)::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: large_string, lang: string)

Two deterministic sources:

* :func:`synthetic_pages_table` — seeded, templated factual sentences with a
  closed-form expected triple set (mirrors the semantics exercised by the
  reference's tests ``/root/reference/tests/test_basic.py`` and
  ``tests/test_clustering.py``); used for hermetic P/R conformance and bench.
* :func:`pages_from_documents` — wraps the driver-provided ``documents``
  Parquet table into the pages shape with a deterministic, SQL-expressible
  mapping (url / warc_ts / html derived from doc_id + text), so the DuckDB
  oracle can reproduce every downstream result.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

EPOCH = datetime(2026, 1, 1)

# ---------------------------------------------------------------------------
# documents -> pages (the SQL-expressible mapping used by driver correctness)
# ---------------------------------------------------------------------------

HTML_PRE = "<html><head><title>Doc "
HTML_MID = "</title></head><body><p>"
HTML_POST = "</p></body></html>"


def _wrap_html(doc_id: int, text: str) -> bytes:
    """Deterministic minimal HTML wrapper. Inverse of
    :func:`kg_gen_ray.stages.extract_text.extract_text` (byte-identical
    for ARBITRARY text: ``&`` and ``<`` are entity-escaped so embedded
    markup like ``</p>`` cannot truncate the paragraph capture; the
    extractor unescapes in the reverse order)."""
    esc = text.replace("&", "&amp;").replace("<", "&lt;")
    return (HTML_PRE + str(doc_id) + HTML_MID + esc + HTML_POST).encode("utf-8")


# warc_ts = EPOCH + (doc_id % _TS_MOD) seconds. The modulo keeps the
# mapping inside the timestamp range at any doc_id (a raw doc_id
# overflows datetime.max at ~2.5e11 — under the engine's own 10^12-doc
# story); a no-op below 1e9, so small-scale oracle hashes are unchanged.
# The SQL mirror applies the same modulo (see __ray_entry__ kg_pages).
_TS_MOD = 1_000_000_000
_EPOCH_US = int((EPOCH - datetime(1970, 1, 1)).total_seconds()) * 1_000_000


def _pages_batch(batch: pa.Table) -> pa.Table:
    """Vectorized documents -> pages mapping (Arrow kernels throughout:
    this is the ingest path, so no per-row Python)."""
    import numpy as np
    ids = pc.cast(batch["doc_id"], pa.int64())
    idstr = pc.cast(ids, pa.string())
    text = pc.cast(batch["text"], pa.string())
    # unknown language is a VALUE, not a hole: a null lang would
    # propagate into a null url (no page identity) and null triple
    # objects (crash the canonicalize sort); 'unknown' routes to the
    # default extractor like any unlisted language
    lang = pc.coalesce(pc.cast(batch["lang"], pa.string()),
                       pa.scalar("unknown"))
    urls = pc.binary_join_element_wise(
        "https://example.org/", lang,
        "/doc-", pc.utf8_lpad(idstr, 6, "0"), "")
    ids_np = ids.to_numpy(zero_copy_only=False)
    ts_us = _EPOCH_US + (ids_np % _TS_MOD) * 1_000_000
    # same escape chain as _wrap_html (& first, then <)
    esc = pc.replace_substring(
        pc.replace_substring(text, "&", "&amp;"), "<", "&lt;")
    html = pc.cast(pc.binary_join_element_wise(
        HTML_PRE, idstr, HTML_MID, esc, HTML_POST, ""), pa.binary())
    return pa.table({
        "url": urls,
        "warc_ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        "html": html,
        "text": pc.cast(batch["text"], pa.large_string()),
        "lang": lang,
    })


def pages_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents.parquet -> pages Dataset (input_hint shape).

    url = ``https://example.org/{lang}/doc-{doc_id:06d}``,
    warc_ts = 2026-01-01 + (doc_id % 1e9) seconds, html = minimal
    wrapper around text. All columns SQL-derivable from the documents
    view.
    """
    from kg_gen_ray.stages.common import size_aware_read_blocks
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(
        path, columns=["doc_id", "text", "lang"],
        override_num_blocks=size_aware_read_blocks(path))
    return ds.map_batches(_pages_batch, batch_format="pyarrow")


def read_pages(path: str, columns=None) -> "ray.data.Dataset":
    """Read an already-materialized pages Parquet directory/file."""
    return ray.data.read_parquet(path, columns=columns)


# ---------------------------------------------------------------------------
# synthetic templated corpus (closed-form truth; FIXTURES.md design)
# ---------------------------------------------------------------------------

_PEOPLE = ["Linda", "Joshua", "Andrew", "Judy", "Sarah", "Michael", "Emma",
           "Oliver", "Sophia", "Liam", "Ava", "Noah", "Mia", "Ethan"]
_COUNTRIES = [("France", "Paris"), ("Japan", "Tokyo"), ("Brazil", "Brasilia"),
              ("Canada", "Ottawa"), ("Egypt", "Cairo"), ("India", "Delhi"),
              ("Kenya", "Nairobi"), ("Norway", "Oslo")]
_TAXA = [("spruce", "tree"), ("oak", "tree"), ("salmon", "fish"),
         ("sparrow", "bird"), ("basalt", "rock"), ("tulip", "flower")]
# surface-variant pool: case + plural variants that canonicalization must merge
_VARIANTS = ["cat", "Cat", "CAT", "cats", "dog", "Dogs", "engine", "Engines"]
# distinct pool: items that must NOT merge (ref tests/test_clustering.py:203-242)
_DISTINCT = ["apple", "banana", "carrot", "farmer", "river"]
_FILLER = [
    "The weather stayed calm for most of the afternoon.",
    "Nothing unusual happened along the old road.",
    "It rained quietly over the empty harbor.",
]


def synthetic_corpus(n_pages: int = 64, seed: int = 42,
                     hot_entity: str | None = None,
                     hot_fraction: float = 0.0,
                     facts_range: tuple = (3, 8)):
    """Generate (rows, truth) where rows are pages dicts and truth is the
    closed-form expected canonical triple set.

    Deterministic for a given (n_pages, seed). ``hot_entity`` injects a
    skewed entity into ``hot_fraction`` of pages (skew fixture,
    FIXTURES.md §6).
    """
    rng = random.Random(seed)
    rows = []
    # RAW expected triples (surface forms exactly as the PatternExtractor
    # emits them). Canonical expected triples are derived from these by
    # kg_gen_ray.pipelines.conformance.expected_canonical — representative
    # choice depends on the observed member set, so it is a corpus-level
    # post-pass, not a per-sentence rule.
    truth = set()

    for i in range(n_pages):
        lang = "de" if i % 10 == 9 else "en"
        sents = []
        n_facts = rng.randint(*facts_range)
        for _ in range(n_facts):
            pool = rng.randint(0, 4)
            if pool == 0:
                a, b = rng.sample(_PEOPLE, 2)
                rel = rng.choice(["mother", "brother", "friend"])
                sents.append(f"{a} is {b}'s {rel}.")
                truth.add((a, f"is {rel} of", b))
            elif pool == 1:
                c, cap = rng.choice(_COUNTRIES)
                sents.append(f"The capital of {c} is {cap}.")
                truth.add((c, "has capital", cap))
            elif pool == 2:
                x, y = rng.choice(_TAXA)
                sents.append(f"{x} is a type of {y}.")
                truth.add((x, "is a type of", y))
            elif pool == 3:
                v = rng.choice(_VARIANTS)
                d = rng.choice(_DISTINCT)
                sents.append(f"{v} is a type of {d}.")
                truth.add((v, "is a type of", d))
            else:
                sents.append(rng.choice(_FILLER))
        if hot_entity and rng.random() < hot_fraction:
            y = rng.choice(_DISTINCT)
            sents.append(f"{hot_entity} is a type of {y}.")
            truth.add((hot_entity, "is a type of", y))
        # one oversized run-on sentence every 16 pages to exercise the
        # chunker's word-split fallback (ref chunk_text.py:44-57 semantics)
        if i % 16 == 7:
            sents.append("veryplain " * 80 + "end")
        text = " ".join(sents)
        rows.append({
            "url": f"https://example.org/{lang}/doc-{i:06d}",
            "warc_ts": EPOCH + timedelta(seconds=i),
            "html": _wrap_html(i, text),
            "text": text,
            "lang": lang,
        })
    return rows, truth


def synthetic_pages_table(n_pages: int = 64, seed: int = 42, **kw) -> pa.Table:
    rows, _ = synthetic_corpus(n_pages, seed, **kw)
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def write_synthetic_pages(path: str, n_pages: int, seed: int = 42,
                          rows_per_file: int = 4096, **kw) -> None:
    """Materialize a synthetic pages corpus as a Parquet directory (one file
    per shard so the lineage/resume machinery has real input shards)."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    t = synthetic_pages_table(n_pages, seed, **kw)
    for shard, lo in enumerate(range(0, t.num_rows, rows_per_file)):
        pq.write_table(t.slice(lo, rows_per_file),
                       os.path.join(path, f"pages-{shard:05d}.parquet"))
