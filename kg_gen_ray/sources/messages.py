"""Chat-messages ingestion (API parity with the reference).

The reference's ``generate()`` accepts a ``List[Dict]`` of
``{role, content}`` messages, validates them, keeps user/assistant turns and
flattens to ``"role: content"`` lines joined by newlines
(``/root/reference/src/kg_gen/kg_gen.py:176-193``). Here a conversations
table (``conv_id, messages: list<struct<role, content>>``) flattens to the
pages shape so conversations flow through the same pipeline.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

# module-level import (pickle-by-value compatibility): worker-side UDF
# bodies must not lazily import kg_gen_ray
from kg_gen_ray.sources.pages import EPOCH, _wrap_html

KEEP_ROLES = ("user", "assistant")


def flatten_messages(messages: list) -> str:
    """Validate + flatten one conversation (reference rules: every message
    must be a dict with 'role' and 'content'; only user/assistant kept).
    A NULL messages cell fails validation like any malformed conversation
    (clean ValueError, not a TypeError from iterating None)."""
    if messages is None:
        raise ValueError(
            "Each message must be a dict with 'role' and 'content' keys")
    lines = []
    for m in messages:
        if not isinstance(m, dict) or "role" not in m or "content" not in m:
            raise ValueError(
                "Each message must be a dict with 'role' and 'content' keys")
        if m["role"] in KEEP_ROLES:
            lines.append(f"{m['role']}: {m['content']}")
    return "\n".join(lines)


def _flatten_batch(batch: pa.Table) -> pa.Table:
    # full pages shape (url, warc_ts, html, text, lang): build_kg's first
    # stage is extract_text_stage, which reads the html column
    # unconditionally — a conversation "page" carries the same wrapper
    # the synthetic corpus uses, so extract_text round-trips the
    # flattened text byte-identically
    ids = batch["conv_id"].to_pylist()
    texts = [flatten_messages(m) for m in batch["messages"].to_pylist()]
    return pa.table({
        "url": pa.array([f"conv://{i}" for i in ids], pa.string()),
        "warc_ts": pa.array([EPOCH] * len(ids)),
        "html": pa.array([_wrap_html(i, t) for i, t in zip(ids, texts)],
                         pa.binary()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
    })


def conversations_to_pages(convs: "ray.data.Dataset") -> "ray.data.Dataset":
    """conversations(conv_id, messages) -> pages-shaped
    (url, warc_ts, html, text, lang)."""
    return convs.map_batches(_flatten_batch, batch_format="pyarrow")
