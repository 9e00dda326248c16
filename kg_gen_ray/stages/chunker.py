"""Sentence-aware text chunking stage.

Re-implements the *semantics* of the reference chunker
(``/root/reference/src/kg_gen/utils/chunk_text.py:17-66``) from its documented
contract (see SURVEY.md §2.2 M1 and the reference tests
``tests/test_chunk_text.py``):

* split text into sentences,
* greedily pack consecutive sentences into chunks of at most
  ``max_chunk_size`` characters (joined by single spaces),
* a single sentence longer than the limit is split on whitespace and its
  words greedily packed instead (word-split fallback),
* chunks are stripped; empty chunks are dropped.

Differences by design: the reference uses the NLTK punkt model for sentence
splitting; we use a deterministic, dependency-free regex splitter
(terminator ``.!?`` followed by whitespace). Determinism and byte-stable
chunk boundaries per url matter more at 100 TB than punkt's heuristics, and
the per-url invariant (chunks rejoin to the original sentence stream) is
asserted in tests.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENT_SPLIT.split(text) if s.strip()]


def chunk_text(text: str, max_chunk_size: int = 500) -> list[str]:
    """Pure chunking function (same contract as reference ``chunk_text``)."""
    if max_chunk_size <= 0 or len(text) <= max_chunk_size:
        stripped = text.strip()
        return [stripped] if stripped else []
    chunks: list[str] = []
    current = ""

    def flush():
        nonlocal current
        c = current.strip()
        if c:
            chunks.append(c)
        current = ""

    for sent in split_sentences(text):
        if len(sent) > max_chunk_size:
            # word-split fallback (ref chunk_text.py:44-57 semantics)
            flush()
            for word in sent.split():
                if current and len(current) + 1 + len(word) > max_chunk_size:
                    flush()
                current = f"{current} {word}" if current else word
            flush()
            continue
        if current and len(current) + 1 + len(sent) > max_chunk_size:
            flush()
        current = f"{current} {sent}" if current else sent
    flush()
    return chunks


class _ChunkBatch:
    """Row-expanding map: pages -> chunks(url, chunk_id, text, lang)."""

    def __init__(self, max_chunk_size: int):
        self.max_chunk_size = max_chunk_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, cids, texts, langs = [], [], [], []
        lang_col = batch["lang"].to_pylist()
        for url, text, lang in zip(batch["url"].to_pylist(),
                                   batch["text"].to_pylist(), lang_col):
            for cid, chunk in enumerate(chunk_text(text, self.max_chunk_size)):
                urls.append(url)
                cids.append(cid)
                texts.append(chunk)
                langs.append(lang)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(cids, pa.int32()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        })


def chunk_stage(pages: "ray.data.Dataset", max_chunk_size: int = 500
                ) -> "ray.data.Dataset":
    """pages(..., text, lang) -> chunks(url, chunk_id, text, lang).

    ``chunk_id`` is the ordinal within the page — deterministic provenance
    (the reference loses chunk identity in its set-union merge,
    ``kg_gen.py:233-236``; we keep it for lineage).
    """
    if max_chunk_size <= 0:
        # no-chunk path (ref kg_gen.py:206-213): one chunk per page
        max_chunk_size = 0
    fn = _ChunkBatch(max_chunk_size)
    return pages.map_batches(fn, batch_format="pyarrow")
