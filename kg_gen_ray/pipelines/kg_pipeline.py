"""End-to-end KG construction pipeline (the flagship).

The reference's ``KGGen.generate()`` flow
(``/root/reference/src/kg_gen/kg_gen.py:149-268``: normalize input -> chunk
-> per-chunk extract entities+relations -> union -> optional cluster ->
rewrite -> Graph) re-expressed as a streaming Ray Data plan::

    pages --extract_text--> text --chunk--> chunks
      --TripleExtractor actor pool--> triples_raw
      --distinct--> triples                              (shuffle 1)
      --canonicalize labels (salted groupby)--> alias_map (shuffle 2)
      --broadcast rewrite + distinct--> canonical triples (shuffle 3)
      --sort + write--> graph tables                      (shuffle 4)

Everything streams with backpressure; nothing materializes the pages table.
Driver-side collections are limited to the alias map (distinct labels) —
the broadcast small side.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.stages.chunker import chunk_stage
from kg_gen_ray.stages.extract import extract_stage
from kg_gen_ray.stages.extract_text import extract_text_stage
from kg_gen_ray.stages.materialize import graph_stats, write_graph
from kg_gen_ray.stages.rewrite import build_alias_dicts, distinct, rewrite_stage


@dataclass
class KGResult:
    triples: "ray.data.Dataset"        # canonical distinct (subj, pred, obj)
    alias_map: "ray.data.Dataset"      # (kind, representative, member)
    config: PipelineConfig

    def stats(self) -> dict:
        return graph_stats(self.triples, self.config.shuffle_partitions)

    def write(self, out_dir: str) -> dict:
        """Write the graph ATOMICALLY (temp dir + rename): write_parquet
        into an existing directory appends new uniquely-named part files,
        so a plain re-run onto the same --out would silently double
        every table; the rename replaces the previous output instead."""
        from kg_gen_ray.state.lineage import atomic_output_dir
        with atomic_output_dir(out_dir) as tmp:
            counts = write_graph(self.triples, tmp,
                                 self.config.sort_output,
                                 self.config.shuffle_partitions)
            self.alias_map.write_parquet(f"{tmp}/alias_map")
        return counts


def raw_triples(pages: "ray.data.Dataset", config: PipelineConfig
                ) -> "ray.data.Dataset":
    """pages -> raw (pre-dedup) triples with (url, chunk_id) provenance."""
    text = extract_text_stage(pages)
    # the pattern backend consumes sentences: carry the chunker's own
    # sentence grouping through so extraction never re-splits (the split
    # is the dominant extraction cost); other backends ignore the column
    wants_sents = any(
        cfg.backend == "pattern"
        for cfg in [config.default_extractor, *config.lang_routes.values()])
    chunks = chunk_stage(text, config.chunk_size,
                         emit_sentences=wants_sents)
    return extract_stage(chunks, config)


def entity_labels(triples: "ray.data.Dataset",
                  shuffle_partitions=None) -> "ray.data.Dataset":
    """distinct entity labels (subj union obj) as a 'member' column."""
    import pyarrow as pa

    def endpoints(t: pa.Table) -> pa.Table:
        ents = pa.concat_arrays([t["subj"].combine_chunks().cast(pa.string()),
                                 t["obj"].combine_chunks().cast(pa.string())])
        return pa.table({"member": ents}).group_by(["member"]).aggregate([])

    return distinct(triples.map_batches(endpoints, batch_format="pyarrow"),
                    ["member"], shuffle_partitions)


def edge_labels(triples: "ray.data.Dataset",
                shuffle_partitions=None) -> "ray.data.Dataset":
    import pyarrow as pa

    def preds(t: pa.Table) -> pa.Table:
        return pa.table({"member": t["pred"].combine_chunks().cast(pa.string())}) \
                 .group_by(["member"]).aggregate([])

    return distinct(triples.map_batches(preds, batch_format="pyarrow"),
                    ["member"], shuffle_partitions)


def all_labels(triples: "ray.data.Dataset",
               shuffle_partitions=None) -> "ray.data.Dataset":
    """distinct (kind, member) over entity endpoints and predicates — ONE
    pass + ONE distinct shuffle for both label kinds."""
    import pyarrow as pa

    def labels(t: pa.Table) -> pa.Table:
        ents = pa.concat_arrays([t["subj"].combine_chunks().cast(pa.string()),
                                 t["obj"].combine_chunks().cast(pa.string())])
        preds = t["pred"].combine_chunks().cast(pa.string())
        tab = pa.table({
            "kind": pa.concat_arrays([
                pa.array(["entity"] * len(ents), pa.string()),
                pa.array(["edge"] * len(preds), pa.string())]),
            "member": pa.concat_arrays([ents, preds]),
        })
        return tab.group_by(["kind", "member"]).aggregate([])

    return distinct(triples.map_batches(labels, batch_format="pyarrow"),
                    ["kind", "member"], shuffle_partitions)


def build_kg(pages: "ray.data.Dataset",
             config: PipelineConfig | None = None) -> KGResult:
    """Run the full pipeline; returns lazily-evaluated result datasets.

    Execution discipline (what keeps wall-time ~= extraction time): the
    distinct triples are materialized ONCE (extraction never re-runs for
    downstream consumers; the resumable path checkpoints them to Parquet
    instead), small materialized intermediates are adaptively compacted
    (see ``common.compact_if_small``), and entity+edge canonicalization is
    a single fused (kind, norm_key) flow — one distinct shuffle + one
    salted aggregate pair for both kinds.
    """
    config = config or PipelineConfig()
    config.validate()
    raw = raw_triples(pages, config)
    return canonicalize_triples(raw, config)


def canonicalize_triples(raw: "ray.data.Dataset",
                         config: PipelineConfig | None = None) -> KGResult:
    """The pipeline tail: raw/unioned triples -> distinct -> canonicalize
    -> rewrite. Shared by :func:`build_kg`, graph aggregation
    (:mod:`kg_gen_ray.pipelines.incremental`) and the resumable phase-2."""
    from kg_gen_ray.stages.canonicalize import canonicalize_label_table
    from kg_gen_ray.stages.common import compact_if_small

    config = config or PipelineConfig()
    sp = config.shuffle_partitions

    def drop_null_parts(t: "pa.Table") -> "pa.Table":
        # a triple with ANY null component is invalid (an entity or
        # relation cannot be NULL — our extractors never emit one, but
        # aggregated EXTERNAL graphs can): drop at entry, else the null
        # label crashes the canonicalize sort shuffle
        import pyarrow.compute as pc
        mask = pc.and_(pc.and_(pc.is_valid(t["subj"]),
                               pc.is_valid(t["pred"])),
                       pc.is_valid(t["obj"]))
        return t.filter(mask)

    raw = raw.map_batches(drop_null_parts, batch_format="pyarrow")
    triples = compact_if_small(
        distinct(raw, ["subj", "pred", "obj"], sp).materialize())

    if not config.cluster:
        # no-cluster path (ref generate(cluster=False)): identity alias map
        import pyarrow as pa

        def ident(t: pa.Table) -> pa.Table:
            return pa.table({
                "kind": t["kind"],
                "representative": t["member"],
                "member": t["member"],
            })

        am = all_labels(triples, sp).map_batches(ident, batch_format="pyarrow")
        return KGResult(triples=triples, alias_map=am, config=config)

    labels = compact_if_small(all_labels(triples, sp).materialize())
    alias_map = canonicalize_label_table(
        labels, config.salt_buckets, max_group_size=config.max_group_size,
        shuffle_partitions=sp).materialize()

    # rewrite strategy by measured size (alias_map is materialized):
    # broadcast dict when small, shuffle join when it wouldn't fit
    from kg_gen_ray.stages.common import dual_limit
    alias_bytes = alias_map.size_bytes() or 0
    if alias_bytes <= dual_limit(config.broadcast_alias_limit):
        ent_dict, edge_dict = build_alias_dicts(alias_map)
        rewritten = rewrite_stage(triples, ent_dict, edge_dict)
    else:
        from kg_gen_ray.stages.rewrite import rewrite_stage_join
        rewritten = rewrite_stage_join(triples, alias_map)
    canonical = distinct(rewritten, ["subj", "pred", "obj"], sp)
    return KGResult(triples=canonical, alias_map=alias_map, config=config)
