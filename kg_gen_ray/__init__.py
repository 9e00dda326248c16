"""kg_gen_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of ``vishalbelsare/kg-gen``
(text -> (subject, predicate, object) knowledge graph with entity/edge
canonicalization) as a streaming Ray Data pipeline over Parquet tables of
Common-Crawl-style web pages::

    pages(url, warc_ts, html, text, lang)
      -> map_batches(extract_text)          # zero-copy Arrow, byte-identical per url
      -> map_batches(chunker)               # sentence-aware, row-expanding
      -> map_batches(TripleExtractor, ...)  # actor pool, pluggable backend
      -> distinct triples                   # shuffle 1
      -> canonicalize (salted groupby)      # shuffle 2
      -> broadcast alias rewrite + distinct # shuffle 3
      -> sort + write node/edge Parquet     # shuffle 4

Reference parity citations throughout the package point at files under
``/root/reference`` (read-only snapshot of kg-gen); the architecture is
Ray-Data-first, not a port.
"""

import os as _os

# Pin polars' rayon pool to one thread per process UNLESS the user chose a
# value. Every per-batch UDF here runs inside a Ray worker whose CPU share
# is one slot; numpy/Arrow already honor the OMP_NUM_THREADS=1 that Ray
# propagates, but polars sizes its pool from POLARS_MAX_THREADS (else ALL
# host cores) — so without this, N concurrent workers spawn N x cores rayon
# threads and the oversubscription destroys scaling exactly when every CPU
# slot is busy (measured: the polars-hash text-analysis stage scaled 1.2x
# from 8->32 CPUs; with the pin it scales like the Arrow/numpy stages).
# Must run before any `import polars`, which all live inside UDF bodies in
# this package — and workers import the package before unpickling them.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

from kg_gen_ray.config import ExtractorConfig, PipelineConfig  # noqa: F401,E402


# lazy public API table: the heavy pipeline modules import Ray; keep
# `import kg_gen_ray` cheap until a symbol is actually used
_API = {
        "build_kg": ("kg_gen_ray.pipelines.kg_pipeline", "build_kg"),
        "canonicalize_triples": ("kg_gen_ray.pipelines.kg_pipeline",
                                 "canonicalize_triples"),
        "KGResult": ("kg_gen_ray.pipelines.kg_pipeline", "KGResult"),
        "add_pages": ("kg_gen_ray.pipelines.incremental", "add_pages"),
        "aggregate_graphs": ("kg_gen_ray.pipelines.incremental",
                             "aggregate_graphs"),
        "load_graph": ("kg_gen_ray.pipelines.incremental", "load_graph"),
        "run_partitioned": ("kg_gen_ray.pipelines.partitioned",
                            "run_partitioned"),
        # sinks / serving surface
        "write_html": ("kg_gen_ray.stages.viz", "write_html"),
        "view_model": ("kg_gen_ray.stages.viz", "view_model"),
        "pagerank": ("kg_gen_ray.stages.viz", "pagerank"),
        "LiteLLMTransport": ("kg_gen_ray.stages.transport",
                             "LiteLLMTransport"),
        # training-data operator families
        "near_dup_canonical": ("kg_gen_ray.functions.dedup",
                               "near_dup_canonical"),
        "exact_dedup": ("kg_gen_ray.functions.dedup", "exact_dedup"),
        "winnow_fingerprints": ("kg_gen_ray.functions.fast_text",
                                "winnow_fingerprints"),
        "fused_text_analysis": ("kg_gen_ray.functions.fast_text",
                                "fused_text_analysis"),
        "asof_join": ("kg_gen_ray.functions.windows", "asof_join"),
        "multi_window": ("kg_gen_ray.functions.windows", "multi_window"),
        "range_join": ("kg_gen_ray.functions.windows", "range_join"),
        "sessionize": ("kg_gen_ray.functions.sessions", "sessionize"),
        "hll_estimate": ("kg_gen_ray.functions.sketch", "hll_estimate"),
        "approx_distinct": ("kg_gen_ray.functions.sketch",
                            "approx_distinct"),
        "heavy_hitters": ("kg_gen_ray.functions.sketch", "heavy_hitters"),
        "bloom_build": ("kg_gen_ray.functions.sketch", "bloom_build"),
        "stratified_sample": ("kg_gen_ray.functions.sessions",
                              "stratified_sample"),
        "grouped_topk": ("kg_gen_ray.functions.sessions", "grouped_topk"),
        "hash_sample": ("kg_gen_ray.functions.sessions", "hash_sample"),
        "pack_sequences": ("kg_gen_ray.functions.sessions",
                           "pack_sequences"),
        "StreamingDedupIndex": ("kg_gen_ray.state.dedup_index",
                                "StreamingDedupIndex"),
        "decontaminate": ("kg_gen_ray.functions.decontaminate",
                          "decontaminate"),
        "contaminated_ids": ("kg_gen_ray.functions.decontaminate",
                             "contaminated_ids"),
        "scrub_pii": ("kg_gen_ray.functions.scrub", "scrub_pii"),
        "scrub_report": ("kg_gen_ray.functions.scrub", "scrub_report"),
        "prepare_training_data": ("kg_gen_ray.pipelines.hygiene",
                                  "prepare_training_data"),
        "pq_train": ("kg_gen_ray.functions.pq", "pq_train"),
        "pq_encode": ("kg_gen_ray.functions.pq", "pq_encode"),
        "pq_topk": ("kg_gen_ray.functions.pq", "pq_topk"),
}


def __getattr__(name):
    if name in _API:
        import importlib
        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'kg_gen_ray' has no attribute {name!r}")


__version__ = "0.1.0"
