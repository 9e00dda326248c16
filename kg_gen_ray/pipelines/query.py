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
from kg_gen_ray.stages.common import dual_limit, in_set_mask


def neighborhood(triples: "ray.data.Dataset", seeds: set,
                 depth: int = 2,
                 broadcast_limit: int = 64 * 1024 * 1024
                 ) -> "ray.data.Dataset":
    """All triples reachable from ``seeds`` within ``depth`` hops
    (both directions, like the reference's neighbors+predecessors walk).

    The frontier stays a DATASET end to end — nothing frontier-sized ever
    reaches the driver (a hub entity's 2-hop frontier on a crawl-scale
    graph is O(graph); the earlier ``take_all()``-per-hop version was a
    driver scale-killer). Per hop, the triples table is semi-filtered
    against the frontier with a size-selected dual: a broadcast
    membership set + one OR-mask pass while the frontier fits
    ``broadcast_limit``, else a Bloom-prefiltered ``left_semi`` join per
    endpoint (:func:`kg_gen_ray.functions.dedup.keep_ids`). Because the
    frontier only grows, hop k's touching-set contains hop k-1's, so the
    final hop IS the full neighborhood — only it is returned, and it is
    never collected here. Callers pass a materialized ``triples`` (the
    lineage is consumed once per hop per direction)."""
    from kg_gen_ray.functions.dedup import keep_ids
    from kg_gen_ray.stages.rewrite import distinct

    frontier = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(seeds), pa.string())}))
    hop = None
    for _ in range(depth):
        frontier = frontier.materialize()
        if frontier.count() == 0:
            # dead frontier (seeds touch nothing): a further hop cannot
            # add triples, and an all-empty frontier dataset carries
            # schemaless blocks that a hash join cannot key on
            break
        if (frontier.size_bytes() or 0) <= dual_limit(broadcast_limit):
            # one pass, one OR mask: the serving-sized common case
            ents = set()
            for b in frontier.iter_batches(batch_format="pyarrow", batch_size=None):
                ents.update(b["doc_id"].to_pylist())
            ref = ray.put(ents)

            def touching(t: pa.Table, ref=ref) -> pa.Table:
                mask = pc.or_(in_set_mask(t["subj"], ref),
                              in_set_mask(t["obj"], ref))
                return t.filter(mask)

            hop = triples.map_batches(touching, batch_format="pyarrow")
        else:
            # scale dual: subj-side semi-filter ∪ obj-side semi-filter
            # (a triple touching both appears twice; distinct removes it)
            hop = distinct(
                keep_ids(triples, frontier, "subj", broadcast_limit)
                .union(keep_ids(triples, frontier, "obj", broadcast_limit)),
                ["subj", "pred", "obj"])
        # checkpoint: the hop feeds both the next frontier and (on the
        # last iteration) the returned neighborhood
        hop = hop.materialize()
        def endpoint(col):
            return hop.map_batches(
                lambda t, c=col: pa.table({"doc_id": t[c]}),
                batch_format="pyarrow")

        frontier = distinct(endpoint("subj").union(endpoint("obj")),
                            ["doc_id"])
    if hop is None:
        return ray.data.from_arrow(pa.table({
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string())}))
    return distinct(hop, ["subj", "pred", "obj"])


def context_sentences(triples: "ray.data.Dataset", seeds: set,
                      depth: int = 2) -> list:
    """Reference-shaped context strings: ``"s p o."`` per triple in the
    depth-limited neighborhood (ref kg_gen.py:397-403)."""
    # neighborhood consumes the triples lineage once per hop per
    # direction; checkpoint here so callers can pass a lazy pipeline
    hood = neighborhood(triples.materialize(), seeds, depth)
    return [f"{r['subj']} {r['pred']} {r['obj']}."
            for r in hood.take_all()]


def relevant_nodes(triples: "ray.data.Dataset", query: str, k: int = 8,
                   dim: int = 64) -> list:
    """Top-k entities by embedding cosine to the query (ref
    ``retrieve_relevant_nodes``, kg_gen.py:370-384; hash-embedder backend
    here, SentenceTransformer in production).

    The entity-embedding table never reaches the driver: a per-block
    partial top-k keyed directly on (score desc, member asc) reduces
    each block to k rows, and the driver merges O(blocks x k) rows.
    No internal integer ids exist, so score ties — including ties
    across the k-th rank — resolve by member order deterministically,
    independent of any id layout."""
    import numpy as np
    from kg_gen_ray.functions.ann import _cosine, _mat
    from kg_gen_ray.pipelines.kg_pipeline import entity_labels
    from kg_gen_ray.stages.embed import HashEmbedder, embed_stage

    labels = entity_labels(triples)
    emb = embed_stage(labels, backend="hash", dim=dim)
    q_ref = ray.put(HashEmbedder(dim).embed_one(query).astype(np.float64))

    def partial(t: pa.Table, q_ref=q_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"member": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        sims = _cosine(_mat(t), ray.get(q_ref))
        members = t["member"].to_numpy(zero_copy_only=False)
        order = np.lexsort((members, -sims))[:k]
        return pa.table({
            "member": pa.array(members[order], pa.string()),
            "score": pa.array(sims[order], pa.float64()),
        })

    rows = emb.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["score"], r["member"]))
    return [r["member"] for r in rows[:k]]
