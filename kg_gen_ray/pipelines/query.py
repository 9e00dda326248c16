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

    The entity-embedding table never reaches the driver: ids are minted
    distributed (``functions.ids.mint_doc_ids`` — deterministic from the
    label), the per-block partial top-k reduces to k rows, and only
    those k ids map back to labels (broadcast-set filter). The returned
    order is (score desc, member asc) — member, not internal vec_id, so
    the ordering is independent of the id layout."""
    import numpy as np
    from kg_gen_ray.functions.ann import brute_force_topk
    from kg_gen_ray.functions.ids import mint_doc_ids
    from kg_gen_ray.pipelines.kg_pipeline import entity_labels
    from kg_gen_ray.stages.common import in_set_mask
    from kg_gen_ray.stages.embed import HashEmbedder, embed_stage

    labels = entity_labels(triples)
    emb = embed_stage(labels, backend="hash", dim=dim)
    ds = mint_doc_ids(emb, key_col="member", id_col="vec_id").materialize()

    q = HashEmbedder(dim).embed_one(query).astype(np.float64)
    top = brute_force_topk(ds, q, k=k)          # k rows on the driver
    if not len(top):
        return []
    score = {int(i): float(s)
             for i, s in zip(top["vec_id"], top["score"])}
    want = set(score)

    def winners(t: pa.Table, want=want) -> pa.Table:
        t = t.select(["vec_id", "member"])
        return t.filter(in_set_mask(t["vec_id"], want))

    rows = ds.map_batches(winners, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-score[int(r["vec_id"])], r["member"]))
    return [r["member"] for r in rows]
