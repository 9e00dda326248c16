"""MINE evaluation operators (SURVEY.md §2 X7 answer-judge + A7 accuracy).

The reference's MINE harness (``experiments/MINE/evaluation.py:18-43``)
asks GPT one question per (correct_answer, retrieved_context) pair — does
the context contain the information in the answer? — expecting a bare
``"1"``/``"0"``, then averages the 0/1 judgments into an accuracy
(``:46-76``). Here that is a first-class engine stage:

* :class:`AnswerJudge` — actor-pool ``map_batches`` stage; the LLM client
  (transport) is built once per actor in ``__init__`` and answers one
  prompt per row in ``__call__`` (per-row calls are inherent — each is a
  network round trip in production; the pool provides the parallelism).
  The transport is injectable: :class:`ContainmentJudgeTransport` is the
  deterministic hermetic stand-in (and is SQL-expressible, so the full
  actor path is driver-oracled), ``LiteLLMTransport`` the production one.
* :func:`accuracy_micro` — A7's mean as an exact integer: one distributed
  Sum/Count aggregate, ``(1_000_000 * n_correct) // n_total`` micro-units
  (same integer-exactness contract as PageRank/lm_score — float means
  diverge by reduction order at scale, integer division cannot).

100 TB story: the judge streams (answers/contexts never materialize), the
accuracy is a two-scalar aggregate, and ``concurrency`` sizes the actor
pool to the provider's rate limit rather than the cluster.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from kg_gen_ray.stages.common import elastic_concurrency

_CTX_MARK = "Context:\n"
_ANS_MARK = "\n\nCorrect Answer:\n"
_TASK_MARK = "\n\nTask:\n"


def judge_prompt(correct_answer: str, context: str) -> str:
    """The reference's evaluation prompt (``evaluation.py:20-30``),
    whitespace-normalized (no indentation inside the markers so a
    transport can parse the fields back out deterministically)."""
    return (f"{_CTX_MARK}{context}"
            f"{_ANS_MARK}{correct_answer}"
            f"{_TASK_MARK}"
            "Determine whether the context contains the information "
            "stated in the correct answer. Respond with \"1\" if yes, "
            "and \"0\" if no. Do not provide any explanation, just the "
            "number.")


class AnswerJudge:
    """Per-row 0/1 answer-judge over (answer, context) pairs — appends an
    int64 ``evaluation`` column. A malformed transport reply raises (the
    reference's ``int(content.strip())`` contract: fail loudly, don't
    score garbage as wrong)."""

    def __init__(self, transport, answer_col: str = "correct_answer",
                 context_col: str = "context"):
        if transport is None:
            raise NotImplementedError(
                "AnswerJudge requires a transport callable (no network "
                "here); inject ContainmentJudgeTransport or LiteLLMTransport")
        self.transport = transport
        self.answer_col = answer_col
        self.context_col = context_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        evals = [
            # null answer/context judge as empty strings — never "None"
            int(self.transport(judge_prompt(ans or "", ctx or "")).strip())
            for ans, ctx in zip(batch[self.answer_col].to_pylist(),
                                batch[self.context_col].to_pylist())
        ]
        if any(e not in (0, 1) for e in evals):
            raise ValueError("answer-judge transport returned a non-0/1 "
                             "evaluation")
        return batch.append_column("evaluation",
                                   pa.array(evals, pa.int64()))


def answer_judge_stage(ds: "ray.data.Dataset", transport,
                       answer_col: str = "correct_answer",
                       context_col: str = "context",
                       concurrency=None,
                       batch_size: int = 256) -> "ray.data.Dataset":
    return ds.map_batches(
        AnswerJudge,
        fn_constructor_args=(transport, answer_col, context_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=elastic_concurrency(concurrency))


class ContainmentJudgeTransport:
    """Deterministic judge stand-in: \"1\" iff the Correct Answer occurs
    verbatim in the Context — the decidable core of the GPT judgment, and
    exactly ``strpos(context, answer) > 0`` in SQL, which is what lets the
    whole actor-pool path be driver-oracled. Parses the fields back out of
    the canonical :func:`judge_prompt` layout from the END (the fixed Task
    text is always the trailing segment and the answer sits after the LAST
    answer marker), so a CONTEXT containing the literal marker strings —
    the plausible collision in crawl/QA-shaped text — still parses
    correctly; only an ANSWER that itself embeds a marker (pathological)
    would confuse it."""

    def __call__(self, prompt: str) -> str:
        body = prompt.partition(_CTX_MARK)[2]
        body = body.rpartition(_TASK_MARK)[0]
        context, _, answer = body.rpartition(_ANS_MARK)
        return "1" if answer and answer in context else "0"


def accuracy_micro(ds: "ray.data.Dataset",
                   eval_col: str = "evaluation") -> tuple[int, int, int]:
    """A7: (n_correct, n_total, accuracy in exact integer micro-units).
    ``accuracy_micro == (1_000_000 * n_correct) // n_total`` — matches
    DuckDB ``(1000000 * SUM(e)) // COUNT(*)`` bit-for-bit."""
    from ray.data.aggregate import Count, Sum

    row = ds.aggregate(Sum(eval_col, alias_name="n_correct"),
                       Count(alias_name="n_total"))
    if not row:
        # a schemaless empty dataset aggregates to None (a schema-ful
        # empty returns a dict of Nones, which the guards below handle)
        return 0, 0, 0
    n_correct = int(row["n_correct"] or 0)
    n_total = int(row["n_total"] or 0)
    if n_total == 0:
        return 0, 0, 0
    return n_correct, n_total, (1_000_000 * n_correct) // n_total


def accuracy_percent(ds: "ray.data.Dataset",
                     eval_col: str = "evaluation") -> str:
    """The reference's display form (``evaluation.py:70``):
    ``f\"{accuracy * 100:.2f}%\"``."""
    n_correct, n_total, _ = accuracy_micro(ds, eval_col)
    acc = n_correct / n_total if n_total else 0.0
    return f"{acc * 100:.2f}%"
