"""HTML -> text extraction stage.

The reference consumes plain text; the north_star requires a zero-copy Arrow
``map_batches`` HTML-to-text stage that is **byte-identical per url** to the
``text`` column. The extraction spec is deterministic and pure:

* drop ``<script>``/``<style>``/``<nav>``/``<head>`` blocks entirely,
* the extracted text is the concatenation of ``<p>...</p>`` block contents
  (joined by a single newline).

The synthetic wrapper in :mod:`kg_gen_ray.sources.pages` is the exact
inverse, so ``extract_text(html) == text`` byte-for-byte — asserted in
tests and usable as a per-row invariant at any scale.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

# compiled once at import (shared by all map_batches tasks in a worker proc)
_DROP_BLOCK = re.compile(
    rb"<(script|style|nav|head)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_PARA = re.compile(rb"<p\b[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)


def extract_text(html: bytes) -> str:
    """Pure deterministic extraction; see module docstring."""
    body = _DROP_BLOCK.sub(b"", html)
    paras = _PARA.findall(body)
    return b"\n".join(paras).decode("utf-8")


def _extract_batch(batch: pa.Table) -> pa.Table:
    texts = pa.array([extract_text(h) for h in batch["html"].to_pylist()],
                     pa.large_string())
    # drop the (potentially MBs-wide) html column immediately so downstream
    # blocks stay narrow (SURVEY.md §7.5 risk 6)
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    out = batch.select(keep)
    return out.append_column("text", texts)


def extract_text_stage(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """pages(url, warc_ts, html, lang[, text]) -> (url, warc_ts, lang, text).

    Stateless tasks, ``batch_format="pyarrow"`` with ``zero_copy_batch=True``:
    html bytes are read straight from the object store without a copy; the
    replacement ``text`` column is freshly allocated.
    """
    return pages.map_batches(_extract_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
