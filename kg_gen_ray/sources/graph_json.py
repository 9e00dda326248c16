"""Reference-shape graph.json reader/writer.

The reference serializes its ``Graph`` pydantic model (sets -> sorted lists)
to ``{output_folder}/graph.json`` (``/root/reference/src/kg_gen/kg_gen.py:247-266``)
and reads it back with ``KGGen.from_file`` (``kg_gen.py:139-147``). We keep the
same JSON shape for small-graph export/interop; the scalable representation
is the node/edge Parquet tables written by
:mod:`kg_gen_ray.stages.materialize`.
"""

from __future__ import annotations

import json
import os


def write_graph_json(path: str, entities, relations, edges,
                     entity_clusters=None, edge_clusters=None) -> str:
    """Write the reference-compatible graph.json.

    ``entities``/``edges``: iterables of str; ``relations``: iterable of
    (subj, pred, obj); cluster maps: dict[representative -> set(members)].
    Lists are sorted for byte-stable output (the reference dumps unordered
    set->list conversions; we are deterministic on purpose).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    doc = {
        "entities": sorted(set(entities)),
        "relations": sorted([list(r) for r in relations]),
        "edges": sorted(set(edges)),
    }
    if entity_clusters is not None:
        doc["entity_clusters"] = {k: sorted(v) for k, v in sorted(entity_clusters.items())}
    if edge_clusters is not None:
        doc["edge_clusters"] = {k: sorted(v) for k, v in sorted(edge_clusters.items())}
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return path


def read_graph_json(path: str) -> dict:
    """Load a graph.json into sets/tuples (the reference's in-memory shape)."""
    with open(path) as f:
        doc = json.load(f)
    out = {
        "entities": set(doc.get("entities", [])),
        "relations": {tuple(r) for r in doc.get("relations", [])},
        "edges": set(doc.get("edges", [])),
    }
    for k in ("entity_clusters", "edge_clusters"):
        if doc.get(k) is not None:
            out[k] = {rep: set(members) for rep, members in doc[k].items()}
        else:
            out[k] = None
    return out
