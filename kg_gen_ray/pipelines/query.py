"""Graph querying / retrieval over materialized graph tables.

Re-expresses the reference's serving-side retrieval
(``/root/reference/src/kg_gen/kg_gen.py:321-405``: nx.DiGraph + top-k
embedding match + depth-2 BFS context) as table operations:

* top-k relevant nodes = embed labels once, cosine top-k (the ANN module),
* n-hop neighborhood = iterated semi-join of the edges table on the
  frontier entity set (broadcast — frontiers are small),
* context sentences = ``"s p o."`` rendering of the neighborhood triples
  (ref ``retrieve_context`` emits the same shape, ``kg_gen.py:397-403``).

Unlike the reference's ``to_nx`` export, the triples table keeps parallel
edges — multiple predicates between one (s, o) pair are NOT collapsed
(reference quirk documented at SURVEY.md §1.3; deliberately not replicated).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level (pickle-by-value compatibility): worker-side UDF bodies
# must not lazily import kg_gen_ray
from kg_gen_ray.stages.common import in_set_mask


def neighborhood(triples: "ray.data.Dataset", seeds: set,
                 depth: int = 2) -> "ray.data.Dataset":
    """All triples reachable from ``seeds`` within ``depth`` hops
    (both directions, like the reference's neighbors+predecessors walk)."""
    frontier = set(seeds)
    seen_triples = None
    for _ in range(depth):
        ref = ray.put(frontier)

        def touching(t: pa.Table, ref=ref) -> pa.Table:
            mask = pc.or_(in_set_mask(t["subj"], ref),
                          in_set_mask(t["obj"], ref))
            return t.filter(mask)

        hop = triples.map_batches(touching, batch_format="pyarrow")
        hop_rows = hop.take_all()
        new_frontier = set()
        for r in hop_rows:
            new_frontier.add(r["subj"])
            new_frontier.add(r["obj"])
        if seen_triples is None:
            seen_triples = {(r["subj"], r["pred"], r["obj"]) for r in hop_rows}
        else:
            seen_triples |= {(r["subj"], r["pred"], r["obj"]) for r in hop_rows}
        if new_frontier <= frontier:
            break
        frontier |= new_frontier

    rows = sorted(seen_triples or set())
    return ray.data.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    }))


def context_sentences(triples: "ray.data.Dataset", seeds: set,
                      depth: int = 2) -> list:
    """Reference-shaped context strings: ``"s p o."`` per triple in the
    depth-limited neighborhood (ref kg_gen.py:397-403)."""
    hood = neighborhood(triples, seeds, depth)
    return [f"{r['subj']} {r['pred']} {r['obj']}."
            for r in hood.take_all()]


def relevant_nodes(triples: "ray.data.Dataset", query: str, k: int = 8,
                   dim: int = 64) -> list:
    """Top-k entities by embedding cosine to the query (ref
    ``retrieve_relevant_nodes``, kg_gen.py:370-384; hash-embedder backend
    here, SentenceTransformer in production)."""
    import numpy as np
    from kg_gen_ray.functions.ann import brute_force_topk
    from kg_gen_ray.pipelines.kg_pipeline import entity_labels
    from kg_gen_ray.stages.embed import HashEmbedder, embed_stage

    labels = entity_labels(triples)
    emb = embed_stage(labels, backend="hash", dim=dim)

    # give rows a stable integer id by sorting labels (small table)
    rows = emb.take_all()
    rows.sort(key=lambda r: r["member"])
    ids = pa.table({
        "vec_id": pa.array(range(len(rows)), pa.int64()),
        "member": pa.array([r["member"] for r in rows], pa.string()),
        "embedding": pa.array([r["embedding"] for r in rows],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(ids)
    q = HashEmbedder(dim).embed_one(query).astype(np.float64)
    top = brute_force_topk(ds, q, k=k)
    id2label = {i: m for i, m in zip(ids["vec_id"].to_pylist(),
                                     ids["member"].to_pylist())}
    return [id2label[i] for i in top["vec_id"]]
