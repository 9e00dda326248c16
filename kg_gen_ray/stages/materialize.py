"""Graph materialization: node / edge-type tables, stats, sorted output.

Mirrors the reference's graph assembly (``edges = {p for (s,p,o)}``,
``/root/reference/src/kg_gen/kg_gen.py:238-242``) and the stats the
visualizer computes (degrees, predicate histogram, top-k —
``src/kg_gen/utils/visualize_kg.py:97-234``), as grouped aggregations.
The final ``sort(pred, subj, obj)`` gives byte-stable, diffable output
(the reference sorts only at viz time, ``visualize_kg.py:38-41``).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count


def nodes_table(triples: "ray.data.Dataset",
                shuffle_partitions=None) -> "ray.data.Dataset":
    """distinct triples -> nodes(entity, degree).

    degree = number of triples in which the entity appears as subject plus
    as object (a self-loop counts twice) — matches the visualizer's
    Counter-over-endpoints (``visualize_kg.py:104-110``).
    """
    def endpoints(t: pa.Table) -> pa.Table:
        ents = pa.concat_arrays([t["subj"].combine_chunks().cast(pa.string()),
                                 t["obj"].combine_chunks().cast(pa.string())])
        # local combiner: count per entity inside the batch before shuffling
        tmp = pa.table({"entity": ents}).group_by(["entity"]) \
                .aggregate([([], "count_all")])
        return tmp.rename_columns(["entity", "partial"])

    from kg_gen_ray.stages.common import coalesce
    partial = coalesce(triples.map_batches(endpoints, batch_format="pyarrow"),
                       shuffle_partitions)
    from ray.data.aggregate import Sum
    out = partial.groupby("entity").aggregate(Sum("partial", alias_name="degree"))
    return out


def edge_types_table(triples: "ray.data.Dataset",
                     shuffle_partitions=None) -> "ray.data.Dataset":
    """distinct triples -> edge_types(pred, n_triples)."""
    def local(t: pa.Table) -> pa.Table:
        tmp = t.select(["pred"]).group_by(["pred"]).aggregate([([], "count_all")])
        return tmp.rename_columns(["pred", "partial"])

    from kg_gen_ray.stages.common import coalesce
    partial = coalesce(triples.map_batches(local, batch_format="pyarrow"),
                       shuffle_partitions)
    from ray.data.aggregate import Sum
    return partial.groupby("pred").aggregate(Sum("partial", alias_name="n_triples"))


def top_entities(triples: "ray.data.Dataset", k: int = 10,
                 shuffle_partitions=None) -> "ray.data.Dataset":
    """Top-k entities by degree, deterministic tiebreak on entity asc
    (reference shows top-10 entities, ``visualize_kg.py:191-216``)."""
    nodes = nodes_table(triples, shuffle_partitions)
    # sort by (-degree, entity): negate degree so one ascending sort gives
    # a deterministic total order, then limit
    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column("_neg", pc.negate(t["degree"]))
    return nodes.map_batches(neg, batch_format="pyarrow") \
                .sort(["_neg", "entity"]).limit(k) \
                .select_columns(["entity", "degree"])


def sorted_triples(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic (pred, subj, obj) ordering — the graph-materialize sort."""
    return triples.sort(["pred", "subj", "obj"])


def write_graph(triples: "ray.data.Dataset", out_dir: str,
                sort_output: bool = True, shuffle_partitions=None) -> dict:
    """Write nodes / edge_types / triples Parquet directories.

    Each is a directory of part files (never one giant file); returns row
    counts for the manifest.
    """
    # checkpoint once: the sorted write, nodes_table and edge_types_table
    # are three separate consumers — an unmaterialized canonical-triples
    # lineage (rewrite + distinct shuffle) would re-execute per consumer
    triples = triples.materialize()
    t = sorted_triples(triples) if sort_output else triples
    t.write_parquet(f"{out_dir}/triples")
    n = nodes_table(triples, shuffle_partitions)
    n.write_parquet(f"{out_dir}/nodes")
    e = edge_types_table(triples, shuffle_partitions)
    e.write_parquet(f"{out_dir}/edge_types")
    import ray.data as rd
    return {
        "triples": rd.read_parquet(f"{out_dir}/triples").count(),
        "nodes": rd.read_parquet(f"{out_dir}/nodes").count(),
        "edge_types": rd.read_parquet(f"{out_dir}/edge_types").count(),
    }


def graph_stats(triples: "ray.data.Dataset", shuffle_partitions=None) -> dict:
    """Small summary dict (subset of ``visualize_kg.py:97-234`` stats)."""
    n_triples = triples.count()
    n_entities = nodes_table(triples, shuffle_partitions).count()
    n_preds = edge_types_table(triples, shuffle_partitions).count()
    return {"n_entities": n_entities, "n_triples": n_triples,
            "n_edge_types": n_preds}
