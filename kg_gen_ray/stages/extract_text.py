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

import pyarrow as pa

import ray.data

# compiled once at import (shared by all map_batches tasks in a worker proc)
_DROP_BLOCK = re.compile(
    rb"<(script|style|nav|head)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_PARA = re.compile(rb"<p\b[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)


def extract_text(html: bytes) -> str:
    """Pure deterministic extraction; see module docstring. Unescapes the
    two entities the corpus wrapper escapes (``&lt;`` then ``&amp;``, the
    reverse of the wrap order) so round-trip holds for arbitrary text."""
    body = _DROP_BLOCK.sub(b"", html)
    paras = _PARA.findall(body)
    return (b"\n".join(paras).decode("utf-8")
            .replace("&lt;", "<").replace("&amp;", "&"))


# ---------------------------------------------------------------------------
# general-mode extractor for arbitrary (CommonCrawl-style) HTML
# ---------------------------------------------------------------------------

_SKIP_TAGS = {"script", "style", "head", "nav", "noscript", "template"}
_BLOCK_TAGS = {"p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5",
               "h6", "section", "article", "ul", "ol", "table", "blockquote"}


class _TextExtractor:
    """stdlib HTMLParser-based extraction: decodes entities, skips
    script/style/head/nav blocks, emits newlines at block boundaries,
    collapses runs of whitespace. Deterministic, dependency-free."""

    def __init__(self):
        from html.parser import HTMLParser

        class P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts: list = []
                self.skip_depth = 0

            def handle_starttag(self, tag, attrs):
                if tag in _SKIP_TAGS:
                    self.skip_depth += 1
                elif tag in _BLOCK_TAGS:
                    self.parts.append("\n")
                elif tag in ("td", "th"):
                    self.parts.append(" ")   # cells separate with a space

            def handle_endtag(self, tag):
                if tag in _SKIP_TAGS:
                    self.skip_depth = max(0, self.skip_depth - 1)
                elif tag in _BLOCK_TAGS:
                    self.parts.append("\n")

            def handle_data(self, data):
                if not self.skip_depth and data:
                    self.parts.append(data)

        self._cls = P

    def __call__(self, html: bytes) -> str:
        p = self._cls()
        try:
            p.feed(html.decode("utf-8", errors="replace"))
            p.close()
        except Exception:
            pass  # malformed HTML: keep whatever was parsed
        raw = "".join(p.parts)
        # collapse intra-line whitespace, drop blank lines
        lines = [" ".join(ln.split()) for ln in raw.split("\n")]
        return "\n".join(ln for ln in lines if ln)


_GENERAL = _TextExtractor()


def extract_text_general(html: bytes) -> str:
    """General HTML -> text (arbitrary real-world pages): entity decoding,
    comment/script/style removal, block-aware newlines, whitespace
    normalization. NOT byte-identical to the synthetic corpus's ``text``
    column — use the default paragraphs mode for the conformance
    invariant."""
    return _GENERAL(html)


_MODES = {"paragraphs": extract_text, "general": extract_text_general}


def _extract_batch(batch: pa.Table, mode: str = "paragraphs") -> pa.Table:
    fn = _MODES[mode]
    # null html -> empty text (engine-wide null-text convention)
    texts = pa.array([fn(h) if h is not None else ""
                      for h in batch["html"].to_pylist()],
                     pa.large_string())
    # drop the (potentially MBs-wide) html column immediately so downstream
    # blocks stay narrow (SURVEY.md §7.5 risk 6)
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    out = batch.select(keep)
    return out.append_column("text", texts)


def extract_text_stage(pages: "ray.data.Dataset", mode: str = "paragraphs"
                       ) -> "ray.data.Dataset":
    """pages(url, warc_ts, html, lang[, text]) -> (url, warc_ts, lang, text).

    Stateless tasks, ``batch_format="pyarrow"`` with ``zero_copy_batch=True``:
    html bytes are read straight from the object store without a copy; the
    replacement ``text`` column is freshly allocated. ``mode``:
    ``"paragraphs"`` (byte-identity invariant vs the corpus text column) or
    ``"general"`` (arbitrary real-world HTML).
    """
    if mode not in _MODES:
        raise ValueError(f"unknown extract mode: {mode!r}; "
                         f"choose from {sorted(_MODES)}")
    import functools
    return pages.map_batches(functools.partial(_extract_batch, mode=mode),
                             batch_format="pyarrow", zero_copy_batch=True)
