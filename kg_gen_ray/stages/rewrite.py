"""Triple rewrite onto cluster representatives + exact dedup.

The reference rewrites each triple by linear-scanning the cluster dict for
membership (``/root/reference/src/kg_gen/steps/_3_cluster_graph.py:294-317``,
duplicated at ``experiments/wikiqa/utils/cluster_and_deduplication.py:386-410``).
At scale that is a join; since the alias map (distinct labels) is orders of
magnitude smaller than the triples table, the idiomatic Ray Data plan is a
**broadcast hash join**: ``ray.put`` the member->representative dict once,
look it up vectorized inside ``map_batches`` — no shuffle. The following
``distinct`` collapses triples that became equal after rewriting (the
reference gets this for free from set semantics).
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def distinct(ds: "ray.data.Dataset", keys: list[str],
             shuffle_partitions=None) -> "ray.data.Dataset":
    """Exact multi-column dedup (reference set semantics, SURVEY.md §2.7 D1).

    Two-level: per-batch local dedup first (pyarrow group_by — a free
    combiner that shrinks the shuffle input), then the global hash-shuffle
    groupby with a vectorized Count aggregate (NOT per-group Python
    ``map_groups`` — the aggregate path stays in Arrow end to end).
    Returns only ``keys`` columns.
    """
    from ray.data.aggregate import Count

    from kg_gen_ray.stages.common import coalesce

    def local(t: pa.Table) -> pa.Table:
        return t.select(keys).group_by(keys).aggregate([])

    pre = coalesce(ds.map_batches(local, batch_format="pyarrow"),
                   shuffle_partitions)
    agg = pre.groupby(keys).aggregate(Count(alias_name="__n"))
    return agg.select_columns(keys)


def build_alias_dicts(alias_map: "ray.data.Dataset") -> tuple[dict, dict]:
    """alias_map rows -> ({entity member->rep}, {edge member->rep}).

    Driver-side collect of the (small) alias table; identity mappings are
    dropped to keep the broadcast dict minimal.
    """
    ent, edge = {}, {}
    for batch in alias_map.iter_batches(batch_format="pyarrow", batch_size=None):
        for kind, rep, member in zip(batch["kind"].to_pylist(),
                                     batch["representative"].to_pylist(),
                                     batch["member"].to_pylist()):
            if member == rep:
                continue
            (ent if kind == "entity" else edge)[member] = rep
    return ent, edge


def rewrite_stage(triples: "ray.data.Dataset",
                  entity_alias: dict, edge_alias: dict
                  ) -> "ray.data.Dataset":
    """Substitute subj/obj via entity aliases and pred via edge aliases.

    Broadcast join, Arrow end-to-end: the dicts go through the object
    store once (``ray.put``); each batch column is dictionary-encoded so
    the Python dict lookup runs once per UNIQUE label (vocabulary-sized,
    not row-count-sized), then a vectorized ``take`` rebuilds the column.
    The batch never leaves Arrow, so the downstream distinct shuffle gets
    zero-copy input.
    """
    from kg_gen_ray.stages.common import dict_lookup

    ent_ref = ray.put(entity_alias)
    edge_ref = ray.put(edge_alias)

    def sub(t: pa.Table, ent_ref=ent_ref, edge_ref=edge_ref) -> pa.Table:
        ent = ray.get(ent_ref)
        edge = ray.get(edge_ref)
        cols = {c: t[c] for c in t.column_names}
        if ent:
            cols["subj"] = dict_lookup(t["subj"], ent, identity=True,
                                       out_type=pa.string())
            cols["obj"] = dict_lookup(t["obj"], ent, identity=True,
                                      out_type=pa.string())
        if edge:
            cols["pred"] = dict_lookup(t["pred"], edge, identity=True,
                                       out_type=pa.string())
        return pa.table(cols)

    return triples.map_batches(sub, batch_format="pyarrow")


def rewrite_stage_join(triples: "ray.data.Dataset",
                       alias_map: "ray.data.Dataset",
                       num_partitions: int | None = None
                       ) -> "ray.data.Dataset":
    """Shuffle-join rewrite — the fallback when the alias map is too large
    to broadcast (at 10^12 documents the distinct-label table can reach
    many GB; a driver-side dict would not fit, and re-shipping it per task
    would dominate the run). Three hash joins on (member -> representative),
    one per triple position, each keyed on the column being rewritten.

    Left-outer semantics via an identity guard are emulated by coalescing
    missing matches back to the original label (alias maps from
    canonicalization are total over observed labels, so at most the
    identity rows are absent)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def prep(kind: str, member_col: str, rep_col: str):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["kind"], kind)
            sub = t.filter(mask)
            return pa.table({
                member_col: sub["member"].combine_chunks().cast(pa.string()),
                rep_col: sub["representative"].combine_chunks().cast(pa.string()),
            })
        return fn

    def coalesce_col(t: pa.Table, out: str, rep: str, orig: str) -> pa.Table:
        fixed = pc.coalesce(t[rep], t[orig])
        t = t.drop_columns([c for c in (rep, orig) if c in t.column_names])
        return t.append_column(out, fixed)

    # pass every input column through (provenance etc.), matching the
    # broadcast dual's schema — a scale-threshold crossing must never
    # change the result schema; the per-round select_columns also
    # doubles as the schema-stamping Project between chained joins
    in_names = list(triples.schema().names)
    out = triples
    for col, kind in (("subj", "entity"), ("obj", "entity"),
                      ("pred", "edge")):
        # the join key name is built directly into prep's output (a
        # map_batches RENAME would skip the schemaless empty blocks an
        # aggregate-lineage alias_map carries), and each join input /
        # output is normalized with an engine-side Project
        # (select_columns), which stamps a schema even on empty blocks —
        # without it the NEXT join's key resolution fails on them
        renamed = alias_map.map_batches(prep(kind, col, f"__r_{col}"),
                                        batch_format="pyarrow") \
                           .select_columns([col, f"__r_{col}"]) \
                           .materialize()
        if renamed.count() == 0:
            # no aliases of this kind: the rewrite is the identity and
            # an ALL-empty join side carries schemaless blocks the key
            # resolution chokes on — skip the join outright
            continue
        renamed = renamed.repartition(num_partitions)
        out = out.join(renamed, join_type="left_outer", on=(col,),
                       num_partitions=num_partitions)
        out = out.map_batches(
            lambda t, c=col: coalesce_col(t, c, f"__r_{c}", c),
            batch_format="pyarrow").select_columns(list(in_names)) \
            .repartition(num_partitions)
    return out.select_columns(list(in_names))
