"""Pipeline configuration.

Mirrors the reference's user-extension surface (model choice, context
steering, chunk_size / cluster flags — ``/root/reference/src/kg_gen/kg_gen.py:26-61,149-160``)
as one declarative config object consumed by the pipeline builder.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class ExtractorConfig:
    """Per-language extractor routing entry.

    The reference configures a single LiteLLM model string
    (``kg_gen.py:26-61``); we generalize to a per-``lang`` routing table so a
    multi-lingual corpus can route each language to a different backend /
    model (north_star: "Language-aware routing (lang column) selects
    per-language extractor actors").
    """

    backend: str = "pattern"  # "pattern" | "bigram" | "llm"
    model: str = ""           # LiteLLM-style model string for the llm backend
    context: str = ""         # prompt steering (ref kg_gen.py:155)
    temperature: float = 0.0
    max_tokens: int = 4096
    reasoning_effort: str | None = None  # gpt-5-family only (ref kg_gen.py:63-67)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end KG-construction pipeline configuration."""

    # chunking (ref kg_gen.py:156, chunk_text.py:17)
    chunk_size: int = 500           # max chars per chunk; 0 = no chunking
    # extraction
    default_extractor: ExtractorConfig = field(default_factory=ExtractorConfig)
    lang_routes: dict = field(default_factory=dict)  # lang -> ExtractorConfig
    extractor_concurrency: int = 4  # actor pool MAX (elastic (1, n) at build)
    extractor_batch_size: int = 256
    # canonicalization (ref _3_cluster_graph.py / wikiqa cluster_and_deduplication.py)
    cluster: bool = True
    salt_buckets: int = 16          # hot-key salt for the canonicalization groupby
    max_group_size: int = 128       # per-group cap (ref cluster_and_deduplication.py:153)
    # shuffle width override for post-combiner aggregations:
    # None = Ray default (input-block-driven; right for huge data),
    # "auto" = one partition per cluster CPU, int = explicit
    shuffle_partitions: object = None
    # rewrite strategy: alias maps under this many bytes are broadcast
    # (ray.put dict + vectorized lookup); above it, the rewrite falls back
    # to a shuffle join (rewrite_stage_join) — at 10^12 docs the distinct-
    # label table can outgrow any broadcast
    broadcast_alias_limit: int = 128 * 1024 * 1024
    # output
    sort_output: bool = True        # deterministic (pred, subj, obj) ordering

    def route(self, lang: str) -> ExtractorConfig:
        return self.lang_routes.get(lang, self.default_extractor)

    def config_hash(self) -> str:
        """Stable hash for lineage manifests (stage-version fingerprint).
        ``asdict`` already recursed into ``lang_routes`` values."""
        blob = json.dumps(asdict(self), sort_keys=True,
                          default=str).encode()
        return hashlib.md5(blob).hexdigest()

    def validate(self) -> None:
        """Build-time guard rails (ref kg_gen.py:63-75 model validation)."""
        if self.chunk_size < 0:
            raise ValueError("chunk_size must be >= 0")
        if self.salt_buckets < 1:
            raise ValueError("salt_buckets must be >= 1")
        from kg_gen_ray.stages.transport import validate_model_params
        for cfg in [self.default_extractor, *self.lang_routes.values()]:
            if cfg.backend not in ("pattern", "bigram", "llm"):
                raise ValueError(f"unknown extractor backend: {cfg.backend}")
            if cfg.backend == "llm":
                if not cfg.model:
                    raise ValueError("llm backend requires a model string")
                # reference model-parameter rules (kg_gen.py:63-75)
                validate_model_params(cfg.model, cfg.temperature,
                                      cfg.max_tokens, cfg.reasoning_effort)
