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
