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

KEEP_ROLES = ("user", "assistant")


def flatten_messages(messages: list) -> str:
    """Validate + flatten one conversation (reference rules: every message
    must be a dict with 'role' and 'content'; only user/assistant kept)."""
    lines = []
    for m in messages:
        if not isinstance(m, dict) or "role" not in m or "content" not in m:
            raise ValueError(
                "Each message must be a dict with 'role' and 'content' keys")
        if m["role"] in KEEP_ROLES:
            lines.append(f"{m['role']}: {m['content']}")
    return "\n".join(lines)


def _flatten_batch(batch: pa.Table) -> pa.Table:
    ids = batch["conv_id"].to_pylist()
    texts = [flatten_messages(m) for m in batch["messages"].to_pylist()]
    return pa.table({
        "url": pa.array([f"conv://{i}" for i in ids], pa.string()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
    })


def conversations_to_pages(convs: "ray.data.Dataset") -> "ray.data.Dataset":
    """conversations(conv_id, messages) -> pages-shaped (url, text, lang)."""
    return convs.map_batches(_flatten_batch, batch_format="pyarrow")
