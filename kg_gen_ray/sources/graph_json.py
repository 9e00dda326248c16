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


def to_nx(triples, entities=None):
    """Reference-parity NetworkX export (``KGGen.to_nx``, ref
    ``src/kg_gen/kg_gen.py:321-330``): a ``nx.DiGraph`` with one node per
    entity and one edge per (subj, obj) carrying a ``relation`` attribute.

    ``nx.DiGraph`` cannot hold parallel edges, so multiple predicates
    between one (subj, obj) pair COLLAPSE to a single edge — in the
    reference the surviving ``relation`` is whichever the (set-ordered)
    iteration added last, i.e. unspecified. Here triples are sorted
    (subj, pred, obj) first, so the surviving relation is the
    lexicographically GREATEST predicate — deterministic on purpose.
    The engine's own triples table keeps parallel edges (see
    pipelines/query.py); this exporter exists for users porting
    reference retrieval code that expects a DiGraph.

    ``triples``: a Ray Dataset / pyarrow Table / iterable of (s, p, o).
    ``entities``: optional extra node labels (isolated nodes — the
    reference adds ``graph.entities`` before edges). Driver-side by
    design: a DiGraph is a driver object; export a SMALL (e.g. already
    filtered/neighborhood) graph, not a 100 TB edge set.
    """
    import networkx as nx

    if hasattr(triples, "iter_batches"):         # ray.data.Dataset
        rows = []
        for b in triples.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            rows.extend(zip(b["subj"].to_pylist(),
                            b["pred"].to_pylist(),
                            b["obj"].to_pylist()))
    elif hasattr(triples, "column_names"):       # pyarrow Table
        rows = list(zip(triples["subj"].to_pylist(),
                        triples["pred"].to_pylist(),
                        triples["obj"].to_pylist()))
    else:
        rows = [tuple(r) for r in triples]

    G = nx.DiGraph()
    for e in entities or ():
        G.add_node(e)
    for s, p, o in sorted(rows):
        G.add_node(s)
        G.add_node(o)
        G.add_edge(s, o, relation=p)
    return G
