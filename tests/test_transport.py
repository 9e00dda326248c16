"""Config-matrix tests for the LiteLLM-shaped transport — mirrors the
reference's model validation rules (ref src/kg_gen/kg_gen.py:63-75 and the
config surface its tests/test_configs.py exercises), without network."""

import pytest

from kg_gen_ray.config import ExtractorConfig, PipelineConfig
from kg_gen_ray.stages.transport import LiteLLMTransport, validate_model_params


def test_default_params_valid():
    validate_model_params("openai/gpt-4o", 0.0, 4096, None)


def test_reasoning_effort_rejected_for_non_gpt5():
    with pytest.raises(ValueError, match="gpt-5 family"):
        validate_model_params("openai/gpt-4o", 0.0, 16000, "high")


def test_gpt5_requires_temperature_one():
    with pytest.raises(ValueError, match="Temperature must be 1.0"):
        validate_model_params("openai/gpt-5", 0.0, 16000, None)
    validate_model_params("openai/gpt-5", 1.0, 16000, None)


def test_gpt5_requires_min_max_tokens():
    with pytest.raises(ValueError, match="Max tokens must be 16000"):
        validate_model_params("openai/gpt-5-mini", 1.0, 4096, None)
    validate_model_params("openai/gpt-5-mini", 1.0, 16000, "low")


def test_transport_validates_at_construction():
    with pytest.raises(ValueError):
        LiteLLMTransport("openai/gpt-5", temperature=0.0)
    t = LiteLLMTransport("openai/gpt-4o", api_key="k", api_base="http://b")
    kw = t._request_kwargs()
    assert kw["model"] == "openai/gpt-4o"
    assert kw["api_key"] == "k" and kw["api_base"] == "http://b"
    assert "reasoning_effort" not in kw


def test_transport_gated_without_litellm():
    t = LiteLLMTransport("openai/gpt-4o")
    if not t.available:         # this sandbox: litellm absent
        with pytest.raises(NotImplementedError):
            t("hello")


def test_pipeline_config_applies_model_rules():
    bad = PipelineConfig(default_extractor=ExtractorConfig(
        backend="llm", model="openai/gpt-5", temperature=0.0,
        max_tokens=16000))
    with pytest.raises(ValueError, match="Temperature"):
        bad.validate()
    good = PipelineConfig(default_extractor=ExtractorConfig(
        backend="llm", model="openai/gpt-5", temperature=1.0,
        max_tokens=16000, reasoning_effort="medium"))
    good.validate()


def test_llm_extractor_builds_default_transport_or_gates():
    from kg_gen_ray.stages.extract import LLMExtractor
    cfg = ExtractorConfig(backend="llm", model="openai/gpt-4o")
    try:
        ex = LLMExtractor(cfg)           # litellm installed: real transport
        assert ex.transport.model == "openai/gpt-4o"
    except NotImplementedError:          # this sandbox: gated honestly
        pass


# ---------------------------------------------------------------------------
# recorded-fake round trip: the production last mile beyond construction
# ---------------------------------------------------------------------------

class _FakeChoice:
    def __init__(self, content):
        class _Msg:
            pass
        self.message = _Msg()
        self.message.content = content


class _FakeResponse:
    def __init__(self, content):
        self.choices = [_FakeChoice(content)]


class _FakeLiteLLM:
    """Canned-response litellm shim that records every completion() call's
    full request surface."""

    def __init__(self, script):
        self.script = script      # prompt-prefix -> response text
        self.calls = []           # recorded (messages, kwargs)

    def completion(self, messages, **kwargs):
        self.calls.append((messages, kwargs))
        prompt = messages[0]["content"]
        for prefix, resp in self.script:
            if prompt.startswith(prefix):
                return _FakeResponse(resp)
        raise AssertionError(f"unscripted prompt: {prompt[:60]!r}")


def _shimmed_transport(shim, **kw):
    t = LiteLLMTransport(**kw)
    # construction already probed for the real litellm (absent here);
    # install the recorded fake exactly where the import landed
    t._litellm = shim
    return t


def test_transport_round_trip_request_surface():
    """A full LLMExtractor extract() through LiteLLMTransport with a
    recorded fake: asserts the EXACT request surface litellm would receive
    (model/params per validate_model_params, message shape) and the ladder
    prompts, not just that construction succeeds."""
    import pyarrow as pa

    from kg_gen_ray.stages.extract import LLMExtractor

    shim = _FakeLiteLLM([
        ("ENTITIES\n", "alpha\nbeta\ngamma"),
        ("RELATIONS_STRICT\n", "alpha|links|beta\nbeta|links|gamma"),
    ])
    transport = _shimmed_transport(
        shim, model="openai/gpt-4o", temperature=0.25, max_tokens=2048,
        api_key="k-test", api_base="https://example.invalid/v1",
        num_retries=3, timeout=45.0)
    ex = LLMExtractor(ExtractorConfig(backend="llm"), transport=transport)

    out = ex.extract_batch(pa.table({
        "url": ["u1"], "chunk_id": [0], "text": ["alpha beta gamma"],
        "lang": ["en"]}))
    triples = set(zip(out["subj"].to_pylist(), out["pred"].to_pylist(),
                      out["obj"].to_pylist()))
    assert triples == {("alpha", "links", "beta"),
                       ("beta", "links", "gamma")}

    # two rungs used: ENTITIES then RELATIONS_STRICT (no fallback)
    assert [m[0]["content"].split("\n", 1)[0] for m, _ in shim.calls] \
        == ["ENTITIES", "RELATIONS_STRICT"]
    for messages, kw in shim.calls:
        assert [m["role"] for m in messages] == ["user"]
        assert kw == {"model": "openai/gpt-4o", "temperature": 0.25,
                      "max_tokens": 2048, "num_retries": 3,
                      "timeout": 45.0, "api_key": "k-test",
                      "api_base": "https://example.invalid/v1"}


def test_transport_round_trip_gpt5_surface_and_fallback_ladder():
    """gpt-5 family adds reasoning_effort to the wire kwargs, and a
    malformed strict response walks the fallback->fix rungs through the
    SAME transport (3 more calls), with the entity post-filter applied."""
    from kg_gen_ray.stages.extract import LLMExtractor

    shim = _FakeLiteLLM([
        ("ENTITIES\n", "alpha\nbeta"),
        ("RELATIONS_STRICT\n", "this is not a relation line"),
        ("RELATIONS_ANY\n", "alpha|links|beta\nalpha|links|omega"),
        ("FIX\n", "alpha|links|beta\nalpha|links|omega"),
    ])
    transport = _shimmed_transport(
        shim, model="openai/gpt-5", temperature=1.0, max_tokens=16000,
        reasoning_effort="low")
    ex = LLMExtractor(ExtractorConfig(backend="llm"), transport=transport)

    rels = ex.extract("alpha beta")
    # omega is not an extracted entity -> post-filter drops it
    assert rels == [("alpha", "links", "beta")]
    assert [m[0]["content"].split("\n", 1)[0] for m, _ in shim.calls] \
        == ["ENTITIES", "RELATIONS_STRICT", "RELATIONS_ANY", "FIX"]
    for _, kw in shim.calls:
        assert kw["reasoning_effort"] == "low"
        assert kw["temperature"] == 1.0
        assert kw["max_tokens"] == 16000
