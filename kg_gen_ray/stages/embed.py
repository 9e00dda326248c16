"""Label embedding stage (reference X3: SentenceTransformer encoder,
``/root/reference/src/kg_gen/kg_gen.py:113-114,332-346``).

An actor-pool ``map_batches`` stage: the model loads once per actor in
``__init__``; batches of distinct labels become fixed-size float32 vectors.
Backends:

* :class:`HashEmbedder` — deterministic, dependency-free (md5-seeded
  pseudo-random unit vectors): hermetic stand-in so the embedding-space
  machinery (k-means partitioning, ANN, near-dup) is fully testable here.
* :class:`SentenceTransformerEmbedder` — the production backend, gated
  behind an import-try (the library is not in this container).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


class HashEmbedder:
    """Deterministic pseudo-embedding: md5(label) seeds a RandomState that
    draws a unit vector. Same label -> same vector, any process, any day."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_one(self, label: str) -> np.ndarray:
        seed = int(hashlib.md5(label.encode("utf-8")).hexdigest()[:8], 16)
        v = np.random.RandomState(seed).randn(self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels = batch["member"].to_pylist()
        vecs = [self.embed_one(x) for x in labels]
        # pass input columns through: embedding is an added column, not a
        # projection (callers keep kind/ids without a re-join)
        return batch.append_column(
            "embedding", pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())))


class SentenceTransformerEmbedder:
    """Production backend (ref uses ``all-mpnet-base-v2`` cached to .npy,
    ``experiments/wikiqa/utils/cluster_and_deduplication.py:61-110``).
    Weights load once per actor; raises if the library is unavailable."""

    def __init__(self, model_name: str = "all-mpnet-base-v2"):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - not in this container
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use HashEmbedder or install the dependency") from e
        self.model = SentenceTransformer(model_name)  # pragma: no cover

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        labels = batch["member"].to_pylist()
        vecs = self.model.encode(labels, convert_to_numpy=True)
        return batch.append_column(
            "embedding", pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())))


def embed_stage(labels: "ray.data.Dataset", backend: str = "hash",
                dim: int = 64, concurrency=None,
                model_name: str = "all-mpnet-base-v2") -> "ray.data.Dataset":
    """distinct labels(member) -> (member, embedding list<float32>)."""
    from kg_gen_ray.stages.common import elastic_concurrency
    if backend == "hash":
        return labels.map_batches(HashEmbedder, fn_constructor_args=(dim,),
                                  batch_format="pyarrow",
                                  concurrency=elastic_concurrency(concurrency))
    if backend == "sentence_transformer":
        # each actor loads the full model (~hundreds of MB): cap the
        # derived pool width so a wide node doesn't multiply model
        # memory 32x; an explicit concurrency still pins its own max
        return labels.map_batches(SentenceTransformerEmbedder,
                                  fn_constructor_args=(model_name,),
                                  batch_format="pyarrow",
                                  concurrency=elastic_concurrency(
                                      concurrency, cap=4))
    raise ValueError(f"unknown embedder backend: {backend}")
