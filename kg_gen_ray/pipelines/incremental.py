"""Graph aggregation + incremental updates (SURVEY.md §2 A3 / D4 / S5).

Reference semantics:

* ``KGGen.aggregate(graphs)`` — n-way set union of entities/relations/edges
  that DROPS cluster maps (``/root/reference/src/kg_gen/kg_gen.py:291-304``);
  callers re-cluster afterwards (``tests/test_configs.py:52-60``).
* MCP ``add_memories`` — generate a graph from new input, aggregate it into
  the persistent memory graph, save (``mcp/server.py:130-166``).

Ours: triples are already datasets, so aggregation is ``Dataset.union`` +
the shared pipeline tail (distinct -> canonicalize -> rewrite), and the
"memory store" is the materialized graph Parquet directory — incremental
adds re-canonicalize the union, exactly the reference's
cluster-after-aggregate flow, at dataset scale.
"""

from __future__ import annotations

import ray.data

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.pipelines.kg_pipeline import (
    KGResult,
    canonicalize_triples,
    raw_triples,
)


def aggregate_graphs(triple_sets: list, config: PipelineConfig | None = None
                     ) -> KGResult:
    """Union N triple datasets and re-canonicalize (ref ``aggregate`` +
    cluster-after-aggregate). Input datasets need columns
    (subj, pred, obj); provenance columns are dropped in the union."""
    if not triple_sets:
        raise ValueError("aggregate_graphs needs at least one triple set")
    projected = [ds.select_columns(["subj", "pred", "obj"])
                 for ds in triple_sets]
    unioned = projected[0]
    if len(projected) > 1:
        unioned = unioned.union(*projected[1:])
    return canonicalize_triples(unioned, config)


def add_pages(existing_triples: "ray.data.Dataset | None",
              new_pages: "ray.data.Dataset",
              config: PipelineConfig | None = None) -> KGResult:
    """MCP ``add_memories`` equivalent: extract triples from ``new_pages``
    and merge into the existing graph. ``existing_triples`` may be None
    (first add). The union re-canonicalizes, so new surface forms can
    change representatives — same behavior as the reference's
    re-cluster-on-add."""
    config = config or PipelineConfig()
    config.validate()
    new_raw = raw_triples(new_pages, config) \
        .select_columns(["subj", "pred", "obj"])
    if existing_triples is None:
        return canonicalize_triples(new_raw, config)
    return aggregate_graphs([existing_triples, new_raw], config)


def load_graph(out_dir: str) -> "ray.data.Dataset":
    """Read back a materialized graph's triples (the persistent store)."""
    return ray.data.read_parquet(f"{out_dir}/triples")
