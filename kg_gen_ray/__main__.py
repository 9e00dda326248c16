"""CLI entry point — the ``ray job submit`` surface.

Replaces the reference's CLI (``/root/reference/src/kg_gen/cli.py:88-139``,
which only launches the MCP server) with the batch-engine commands a
cluster job actually needs::

    python -m kg_gen_ray build --input <pages.parquet|dir> --out <dir>
        [--chunk-size 500] [--backend pattern|bigram] [--no-cluster]
        [--salt-buckets 16] [--resumable --partitions N]
    python -m kg_gen_ray stats --graph <dir>
    python -m kg_gen_ray export-json --graph <dir> --out graph.json
    python -m kg_gen_ray add --input <pages.parquet> --graph <dir>

On a cluster: ``ray job submit -- python -m kg_gen_ray build ...`` — the
script owns its Ray session (guarded init; the driver-contract module
``__ray_entry__`` never inits).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


class _RaySession:
    """Guarded Ray ownership: init only if nobody else did, and shut down
    only what we started — a command must never tear down an externally
    owned session (e.g. a pytest fixture's cluster or an interactive
    driver)."""

    def __init__(self):
        import ray
        self._ray = ray
        self._owned = not ray.is_initialized()
        if self._owned:
            ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                     include_dashboard=False, logging_level="ERROR")

    def shutdown(self):
        if self._owned:
            self._ray.shutdown()


def _init_ray() -> _RaySession:
    return _RaySession()


def _config(args) -> "object":
    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    return PipelineConfig(
        chunk_size=args.chunk_size,
        default_extractor=ExtractorConfig(backend=args.backend),
        cluster=not args.no_cluster,
        salt_buckets=args.salt_buckets,
        shuffle_partitions=_parse_shuffle(args.shuffle_partitions),
    )


def _parse_shuffle(v: str):
    """"auto" (combiner-sized, the small/medium-corpus default) | "none"
    (Ray's input-block-driven width — right when the post-combiner data
    is still huge) | an explicit int."""
    if v == "auto":
        return "auto"
    if v == "none":
        return None
    return int(v)


def _input_files(spec: str) -> list:
    if os.path.isdir(spec):
        files = sorted(glob.glob(os.path.join(spec, "*.parquet")))
        if not files:
            # fail with the actual problem; read_parquet([]) dies deep
            # inside Ray without naming the input path
            raise SystemExit(f"no *.parquet files in directory {spec!r}")
        return files
    return sorted(glob.glob(spec)) or [spec]


def cmd_build(args) -> int:
    import ray.data as rd

    from kg_gen_ray.pipelines.kg_pipeline import build_kg

    files = _input_files(args.input)
    if args.resumable:
        from kg_gen_ray.pipelines.partitioned import run_partitioned
        summary = run_partitioned(files, args.out, _config(args),
                                  n_partitions=args.partitions)
        print(json.dumps({"out": args.out, "summary": summary}, default=str))
    else:
        pages = rd.read_parquet(files)
        result = build_kg(pages, _config(args))
        # write() already returns the row counts read from the written
        # parquet; calling stats() here would re-execute the whole
        # rewrite + distinct lineage a second time just to reprint them
        counts = result.write(args.out)
        print(json.dumps({"out": args.out, "counts": counts}))
    return 0


def cmd_add(args) -> int:
    import ray.data as rd

    from kg_gen_ray.pipelines.incremental import add_pages, load_graph

    pages = rd.read_parquet(_input_files(args.input))
    existing = load_graph(args.graph) if os.path.isdir(
        os.path.join(args.graph, "triples")) else None
    res = add_pages(existing, pages, _config(args))
    # write to a new versioned dir then report (caller swaps atomically)
    out = args.out or f"{args.graph}.new"
    counts = res.write(out)
    print(json.dumps({"out": out, "counts": counts}))
    return 0


def cmd_stats(args) -> int:
    from kg_gen_ray.pipelines.incremental import load_graph
    from kg_gen_ray.stages.viz import extended_stats

    triples = load_graph(args.graph)
    print(json.dumps(extended_stats(triples)))
    return 0


def cmd_export_json(args) -> int:
    import ray.data as rd

    from kg_gen_ray.pipelines.incremental import load_graph
    from kg_gen_ray.sources.graph_json import write_graph_json

    triples = load_graph(args.graph)
    rels = [(r["subj"], r["pred"], r["obj"]) for r in triples.take_all()]
    entities = {s for s, _, _ in rels} | {o for _, _, o in rels}
    edges = {p for _, p, _ in rels}
    alias_dir = os.path.join(args.graph, "alias_map")
    ent_clusters = edge_clusters = None
    if os.path.isdir(alias_dir):
        from kg_gen_ray.stages.viz import cluster_maps
        ent_clusters, edge_clusters = cluster_maps(
            rd.read_parquet(alias_dir).take_all())
    write_graph_json(args.out, entities, rels, edges,
                     ent_clusters, edge_clusters)
    print(json.dumps({"out": args.out, "entities": len(entities),
                      "relations": len(rels)}))
    return 0


def cmd_prepare(args) -> int:
    """Training-data hygiene flow over a documents/pages parquet: scrub ->
    (gopher cut) -> (paragraph dedup) -> (span removal) -> (decontaminate)
    -> near-dup dedup -> (LM filter) -> (cap) -> pack; writes clean docs +
    packed assignment, prints the per-stage audit counts."""
    import ray.data as rd

    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    docs = rd.read_parquet(_input_files(args.input))
    benchmark = rd.read_parquet(_input_files(args.benchmark)) \
        if args.benchmark else None
    res = prepare_training_data(
        docs, benchmark=benchmark, group_col=args.group_col,
        per_group_cap=args.per_group_cap, max_tokens=args.max_tokens,
        id_col=args.id_col, text_col=args.text_col,
        url_col=args.url_col, dedup_method=args.dedup_method,
        c4_rules=args.c4_rules,
        gopher_rules=(
            {k: v for k, v in (
                ("min_stop_hits", args.gopher_stop_hits),
                ("max_mean_word_len", args.gopher_max_mean_word_len),
            ) if v is not None} or None),
        dedup_paragraphs=args.dedup_paragraphs,
        span_k=args.span_k,
        min_lm_score_micro=args.min_lm_score_micro)
    # atomic output (temp dir + rename): write_parquet into an existing
    # directory would append part files and double the corpus on a rerun
    from kg_gen_ray.state.lineage import atomic_output_dir
    with atomic_output_dir(args.out) as tmp:
        res.clean_docs.write_parquet(os.path.join(tmp, "clean_docs"))
        res.packed.write_parquet(os.path.join(tmp, "packed"))
    print(json.dumps({"out": args.out, "counts": res.counts}))
    return 0


def cmd_visualize(args) -> int:
    import ray.data as rd

    from kg_gen_ray.pipelines.incremental import load_graph
    from kg_gen_ray.stages.viz import write_html

    triples = load_graph(args.graph)
    alias_dir = os.path.join(args.graph, "alias_map")
    alias = rd.read_parquet(alias_dir) if os.path.isdir(alias_dir) else None
    out = write_html(triples, args.out, alias)
    print(json.dumps({"out": out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kg_gen_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--chunk-size", type=int, default=500)
        sp.add_argument("--backend", choices=["pattern", "bigram"],
                        default="pattern")
        sp.add_argument("--no-cluster", action="store_true")
        sp.add_argument("--salt-buckets", type=int, default=16)
        sp.add_argument("--shuffle-partitions", default="auto",
                        help='"auto" (combiner-sized) | "none" (input-'
                             "block-driven; right for huge corpora) | int")

    b = sub.add_parser("build", help="pages parquet -> graph tables")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--resumable", action="store_true",
                   help="per-partition checkpointed run (skips completed)")
    b.add_argument("--partitions", type=int, default=8)
    common(b)
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser("add", help="incremental add into an existing graph")
    a.add_argument("--input", required=True)
    a.add_argument("--graph", required=True)
    a.add_argument("--out", default=None)
    common(a)
    a.set_defaults(fn=cmd_add)

    s = sub.add_parser("stats", help="graph summary stats")
    s.add_argument("--graph", required=True)
    s.set_defaults(fn=cmd_stats)

    e = sub.add_parser("export-json", help="reference-shape graph.json")
    e.add_argument("--graph", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export_json)

    v = sub.add_parser("visualize",
                       help="self-contained HTML dashboard (ref visualize)")
    v.add_argument("--graph", required=True)
    v.add_argument("--out", required=True)
    v.set_defaults(fn=cmd_visualize)

    pr = sub.add_parser(
        "prepare", help="training-data hygiene: scrub/dedup/filter/pack")
    pr.add_argument("--input", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--benchmark", default=None,
                    help="eval-benchmark parquet for decontamination")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--group-col", default="lang")
    pr.add_argument("--url-col", default=None,
                    help="enable URL re-crawl dedup on this column")
    pr.add_argument("--per-group-cap", type=int, default=None)
    pr.add_argument("--max-tokens", type=int, default=2048)
    pr.add_argument("--dedup-method", choices=["fast", "md5"],
                    default="fast")
    pr.add_argument("--c4-rules", action="store_true",
                    help="C4 line filter (terminal punct / min words / "
                         "javascript lines; lorem-ipsum + brace pages)")
    pr.add_argument("--dedup-paragraphs", action="store_true",
                    help="CCNet paragraph-level boilerplate dedup")
    pr.add_argument("--span-k", type=int, default=None,
                    help="Lee et al. duplicated-span removal at this "
                         "k-gram width (after the paragraph pass)")
    pr.add_argument("--gopher-stop-hits", type=int, default=None,
                    help="Gopher cut: required distinct stop-word hits")
    pr.add_argument("--gopher-max-mean-word-len", type=float, default=None,
                    help="Gopher cut: maximum mean word length")
    pr.add_argument("--min-lm-score-micro", type=int, default=None,
                    help="bigram-LM per-bigram avg threshold (micro-nats)")
    pr.set_defaults(fn=cmd_prepare)

    args = p.parse_args(argv)
    # one guarded session for every command, released even on error (a
    # raising command must not leak a CLI-owned Ray runtime into an
    # importing process)
    session = _init_ray()
    try:
        return args.fn(args)
    finally:
        session.shutdown()


if __name__ == "__main__":
    sys.exit(main())
