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

from kg_gen_ray.config import PipelineConfig  # noqa: F401

__version__ = "0.1.0"
