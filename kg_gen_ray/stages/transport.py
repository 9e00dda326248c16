"""Production LLM transport (LiteLLM-compatible), network-gated.

Mirrors the reference's model surface exactly — ``dspy.LM(model, api_key,
reasoning_effort, temperature, max_tokens, api_base)`` built in
``/root/reference/src/kg_gen/kg_gen.py:77-137`` — as a plain callable
``transport(prompt) -> str`` that plugs into the existing
:class:`kg_gen_ray.stages.extract.LLMExtractor` retry ladder and
:class:`kg_gen_ray.stages.extract.LLMFilter`.

The class validates its configuration eagerly (the reference's
gpt-5-family rules, ``kg_gen.py:63-75``) so a bad config fails at pipeline
BUILD time on the driver, not per-batch on a thousand actors. The network
client itself is import-gated: ``litellm`` is not installed in this
sandbox, so construction succeeds (validation + config capture are real)
and the first call raises ``NotImplementedError`` unless the library is
present — the same honest availability gate as
``SentenceTransformerEmbedder``.
"""

from __future__ import annotations


def validate_model_params(model: str, temperature: float, max_tokens: int,
                          reasoning_effort: str | None) -> None:
    """The reference's model-parameter rules (``kg_gen.py:63-75``):
    reasoning_effort is gpt-5-only; gpt-5 requires temperature 1.0 and
    max_tokens >= 16000."""
    if "gpt-5" not in model and reasoning_effort is not None:
        raise ValueError(
            "Reasoning effort is only supported for gpt-5 family models")
    if "gpt-5" in model and temperature < 1.0:
        raise ValueError("Temperature must be 1.0 for gpt-5 family models")
    if "gpt-5" in model and max_tokens < 16000:
        raise ValueError("Max tokens must be 16000 for gpt-5 family models")


class LiteLLMTransport:
    """``transport(prompt) -> str`` over LiteLLM's completion API.

    One instance is built per extractor actor (``TripleExtractor.__init__``
    runs once per actor), so the underlying HTTP client/session is reused
    across every batch the actor processes — no per-batch setup.
    """

    def __init__(self, model: str, temperature: float = 0.0,
                 max_tokens: int = 16000,
                 reasoning_effort: str | None = None,
                 api_key: str | None = None,
                 api_base: str | None = None,
                 num_retries: int = 2, timeout: float = 120.0):
        validate_model_params(model, temperature, max_tokens,
                              reasoning_effort)
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.reasoning_effort = reasoning_effort
        self.api_key = api_key
        self.api_base = api_base
        self.num_retries = num_retries
        self.timeout = timeout
        try:
            import litellm
            self._litellm = litellm
        except ImportError:
            self._litellm = None

    @property
    def available(self) -> bool:
        return self._litellm is not None

    def _request_kwargs(self) -> dict:
        kw = dict(model=self.model, temperature=self.temperature,
                  max_tokens=self.max_tokens, num_retries=self.num_retries,
                  timeout=self.timeout)
        if self.reasoning_effort is not None:
            kw["reasoning_effort"] = self.reasoning_effort
        if self.api_key:
            kw["api_key"] = self.api_key
        if self.api_base:
            kw["api_base"] = self.api_base
        return kw

    def __call__(self, prompt: str) -> str:
        if self._litellm is None:
            raise NotImplementedError(
                "litellm is not installed in this environment; inject a "
                "deterministic transport (e.g. AdjacencyFakeTransport) or "
                "install litellm for production use")
        resp = self._litellm.completion(
            messages=[{"role": "user", "content": prompt}],
            **self._request_kwargs())
        return resp.choices[0].message.content or ""
