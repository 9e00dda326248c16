"""Embedder stage: determinism, shape, actor-pool plumbing, gated backend."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.stages.embed import HashEmbedder, embed_stage


def test_hash_embedder_deterministic():
    e = HashEmbedder(dim=32)
    v1 = e.embed_one("cat")
    v2 = HashEmbedder(dim=32).embed_one("cat")
    assert np.allclose(v1, v2)
    assert v1.shape == (32,)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert not np.allclose(v1, e.embed_one("dog"))


def test_embed_stage(ray_session):
    labels = rd.from_arrow(pa.table({
        "member": pa.array(["cat", "dog", "tree"], pa.string())}))
    out = embed_stage(labels, backend="hash", dim=16).take_all()
    assert len(out) == 3
    for r in out:
        assert len(r["embedding"]) == 16
    # same vector as direct call
    direct = HashEmbedder(16).embed_one("cat")
    got = next(np.asarray(r["embedding"]) for r in out if r["member"] == "cat")
    assert np.allclose(got, direct, atol=1e-6)


def test_sentence_transformer_gated(ray_session):
    from kg_gen_ray.stages.embed import SentenceTransformerEmbedder
    with pytest.raises(NotImplementedError):
        SentenceTransformerEmbedder()


def test_unknown_backend(ray_session):
    labels = rd.from_arrow(pa.table({"member": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        embed_stage(labels, backend="bogus")


# ---------------------------------------------------------------------------
# recorded-fake production backend (same pattern as the litellm shim in
# test_transport): exercises SentenceTransformerEmbedder beyond its gate
# ---------------------------------------------------------------------------

def test_sentence_transformer_round_trip_recorded_fake(monkeypatch):
    """A fake sentence_transformers module drives the production embedder
    end to end: asserts the model name reaching the constructor, the exact
    encode() call surface (label list + convert_to_numpy), and the output
    schema contract (input columns passed through + list<float32>
    embedding)."""
    import sys
    import types

    import numpy as np
    import pyarrow as pa

    calls = {"ctor": [], "encode": []}

    class _FakeST:
        def __init__(self, model_name):
            calls["ctor"].append(model_name)

        def encode(self, labels, convert_to_numpy=False):
            calls["encode"].append((list(labels), convert_to_numpy))
            # deterministic: vector i = [i, i, i, i]
            return np.array([[float(i)] * 4 for i in range(len(labels))],
                            dtype=np.float32)

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = _FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

    from kg_gen_ray.stages.embed import SentenceTransformerEmbedder
    emb = SentenceTransformerEmbedder("custom/model-x")
    out = emb(pa.table({"kind": ["entity", "entity"],
                        "member": ["alpha", "beta"]}))

    assert calls["ctor"] == ["custom/model-x"]
    assert calls["encode"] == [(["alpha", "beta"], True)]
    assert out.column_names == ["kind", "member", "embedding"]
    assert out["embedding"].type == pa.list_(pa.float32())
    assert out["embedding"].to_pylist() == [[0.0] * 4, [1.0] * 4]
