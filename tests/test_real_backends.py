"""Opt-in tests for the import-gated production backends.

The sandbox ships neither sentence-transformers, PIL, litellm nor the
NLTK punkt data, so the engine runs hermetic siblings (HashEmbedder,
FakeCodec, injected transports, the rule-based splitter) everywhere.
These tests give a user WITH the dependencies installed real-backend
coverage: each skips cleanly when its dependency (or required env/API
key) is absent, and runs the actual model/codec path when present.
"""

from __future__ import annotations

import importlib.util
import os

import pyarrow as pa
import pytest

import ray.data as rd


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(not _has("sentence_transformers"),
                    reason="sentence-transformers not installed")
def test_sentence_transformer_embedder_real(ray_session):
    """X3 production backend (ref kg_gen.py:113-114): real model weights
    load once per actor; vectors are deterministic and unit-scale."""
    import numpy as np

    from kg_gen_ray.stages.embed import embed_stage
    labels = rd.from_arrow(pa.table({
        "member": pa.array(["solar panel", "solar panels", "wind turbine"])}))
    out = embed_stage(labels, backend="sentence_transformer",
                      concurrency=1).take_all()
    assert len(out) == 3
    dim = len(out[0]["embedding"])
    assert dim >= 128                      # a real model, not the hash stub
    v = {r["member"]: np.asarray(r["embedding"]) for r in out}
    # same label -> same vector (determinism), and near-dup labels are
    # closer than unrelated ones (the property A5/X6 clustering relies on)
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos(v["solar panel"], v["solar panels"]) > \
        cos(v["solar panel"], v["wind turbine"])


@pytest.mark.skipif(not _has("PIL"), reason="pillow not installed")
def test_pil_codec_real(ray_session):
    """Real image decode through the actor-pool probe/resize stages: a
    PNG generated in-process (no network), dims and resize round-trip."""
    import io

    import PIL.Image

    from kg_gen_ray.stages.multimodal import (MediaProbe, PilCodec,
                                              probe_stage, resize_stage)
    buf = io.BytesIO()
    PIL.Image.new("RGB", (48, 32), (255, 0, 0)).save(buf, format="PNG")
    payload = buf.getvalue()
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image/png"]),
        "content": pa.array([payload], pa.binary()),
    }))
    probed = probe_stage(media, codec_cls=PilCodec).take_all()
    assert (probed[0]["width"], probed[0]["height"]) == (48, 32)
    resized = resize_stage(media, 16, 8, codec_cls=PilCodec).take_all()
    with PIL.Image.open(io.BytesIO(resized[0]["content"])) as im:
        assert im.size == (16, 8)


@pytest.mark.skipif(
    not (_has("litellm") and os.environ.get("KG_REAL_LLM_MODEL")),
    reason="litellm not installed or KG_REAL_LLM_MODEL unset "
           "(a real call needs a configured model + credentials)")
def test_litellm_transport_real(ray_session):
    """End-to-end LLM extraction through LiteLLMTransport against the
    model named by KG_REAL_LLM_MODEL (credentials via the provider's own
    env vars). Asserts the transport returns text and the extractor's
    hard post-filter keeps only in-chunk entities."""
    from kg_gen_ray.stages.extract import extract_stage
    from kg_gen_ray.stages.transport import LiteLLMTransport

    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    model = os.environ["KG_REAL_LLM_MODEL"]
    transport = LiteLLMTransport(model=model)
    resp = transport("Reply with exactly: PONG")
    assert isinstance(resp, str) and resp.strip()

    cfg = PipelineConfig(
        chunk_size=0,
        default_extractor=ExtractorConfig(backend="llm", model=model),
        extractor_concurrency=1)
    chunks = rd.from_arrow(pa.table({
        "url": pa.array(["u1"]), "lang": pa.array(["en"]),
        "chunk_id": pa.array([0], pa.int64()),
        "text": pa.array(["The sun heats the earth."]),
    }))
    triples = extract_stage(chunks, cfg,
                            transports={"default": transport}).take_all()
    text = "the sun heats the earth."
    for r in triples:
        assert r["subj"].lower() in text and r["obj"].lower() in text


def _punkt_ready() -> bool:
    if not _has("nltk"):
        return False
    try:
        import nltk
        nltk.data.find("tokenizers/punkt")
        return True
    except LookupError:
        return False


@pytest.mark.skipif(not _punkt_ready(),
                    reason="nltk punkt data not installed")
def test_chunker_split_matches_nltk_punkt_on_web_text(ray_session):
    """M1 divergence fuzz (pairs with the documented asterisk in
    stages/chunker.py): the rule-based splitter vs real NLTK punkt over
    web-text punctuation families — quotes, ellipses, initials,
    abbreviations, decimal numbers. Failures here are new rule families
    to fold into the splitter."""
    import nltk

    from kg_gen_ray.stages.chunker import split_sentences
    corpus = [
        'He said "Stop. Now." and left. She agreed.',
        "Wait... was that Dr. Smith? I think so.",
        "Prices rose 3.5 percent. Demand fell.",
        "J. R. R. Tolkien wrote it. It sold well.",
        "See fig. 2 for details. The curve flattens.",
        "Visit example.com today! Offers end soon.",
        # starter-heuristic family (round 5: abbreviation + capitalized
        # frequent starter now breaks — must agree with trained punkt)
        "He moved to the U.S. The climate differs.",
        "It opens at 9 a.m. They arrive early.",
        "Apples, pears, etc. However, figs differ.",
        # proper-noun-after-abbreviation: the remaining documented
        # divergence (punkt's ortho data may break; we do not)
        "He moved to the U.S. Canada stayed neutral.",
        # quote / bracket realignment + non-English punctuation families
        '"Stop!" he said. Then he left.',
        "He said (see p. 12) it works. Fine.",
        "C'est fini. Très bien. Voilà.",
        "Der Test lief gut. Prof. Dr. Meier kam. Dann ging er.",
    ]
    # ONLY the documented divergence families may mismatch — an explicit
    # allowlist, not a ratio, so drift in any previously-agreeing family
    # (including the new starter-heuristic cases) fails loudly
    allowed_divergent = {
        "He moved to the U.S. Canada stayed neutral.",   # ortho proper noun
        '"Stop!" he said. Then he left.',                # quote collocation
        "Der Test lief gut. Prof. Dr. Meier kam. Dann ging er.",  # non-EN
    }
    mismatches = [t for t in corpus
                  if split_sentences(t) != nltk.sent_tokenize(t)]
    assert set(mismatches) <= allowed_divergent, mismatches
