"""Scalable semantic canonicalization tests (SURVEY.md §2 A5/X6).

Reference semantics: /root/reference/experiments/wikiqa/utils/
cluster_and_deduplication.py:151-296 (k-means partition, per-cluster
retrieve-then-judge dedup loop).
"""
import numpy as np
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.stages.semantic_dedup import (
    dedup_cluster,
    norm_equality_judge,
    semantic_canonicalize,
)

LABELS = ["cat", "cats", "Cat", "dog", "dogs", "running", "runs", "bank"]


def _labels(names=LABELS, kind="entity"):
    return rd.from_arrow(pa.table({
        "kind": [kind] * len(names), "member": list(names)}))


def _vecs(n, seed=3):
    return np.random.default_rng(seed).normal(size=(n, 8))


def test_dedup_cluster_merges_norm_variants():
    members = sorted(LABELS, key=lambda m: (len(m), m))
    pairs = dedup_cluster(members, _vecs(len(members)))
    rep_of = dict((m, r) for r, m in pairs)
    assert rep_of["cat"] == rep_of["cats"] == rep_of["Cat"] == "Cat" or \
        rep_of["cat"] == rep_of["cats"] == rep_of["Cat"] == "cat"
    assert rep_of["dog"] == rep_of["dogs"]
    assert rep_of["bank"] == "bank"
    assert rep_of["cat"] != rep_of["dog"]
    # every member appears exactly once
    assert sorted(m for _, m in pairs) == sorted(members)


def test_dedup_cluster_judge_pluggable():
    # a judge that merges nothing -> every label its own representative
    pairs = dedup_cluster(["a", "ab", "abc"], _vecs(3),
                          judge=lambda item, cands: [])
    assert pairs == [("a", "a"), ("ab", "ab"), ("abc", "abc")]


def test_retrieval_k_limits_candidates():
    # with retrieval_k=0 no candidates are ever judged -> singletons
    members = ["cat", "cats"]
    pairs = dedup_cluster(members, _vecs(2), retrieval_k=0)
    assert dict((m, r) for r, m in pairs) == {"cat": "cat", "cats": "cats"}


def test_semantic_canonicalize_single_cluster(ray_session):
    out = semantic_canonicalize(_labels()).take_all()
    rep_of = {r["member"]: r["representative"] for r in out}
    assert len(out) == len(LABELS)
    assert rep_of["cats"] == rep_of["cat"]
    assert rep_of["dogs"] == rep_of["dog"]
    assert all(r["kind"] == "entity" for r in out)


def test_semantic_canonicalize_partitions_large_set(ray_session):
    # 600 labels in variant pairs -> multiple k-means cells; every pair
    # that lands in the same cell merges; coverage stays total
    names = []
    for i in range(300):
        names.append(f"label{i:03d}")
        names.append(f"label{i:03d}s")   # plural variant
    out = semantic_canonicalize(_labels(names),
                                cluster_capacity=64).take_all()
    assert len(out) == len(names)
    rep_of = {r["member"]: r["representative"] for r in out}
    merged = sum(rep_of[f"label{i:03d}"] == rep_of[f"label{i:03d}s"]
                 for i in range(300))
    # hash embeddings scatter variants across cells ("label000" and
    # "label000s" are different tokens, so near-orthogonal vectors) and
    # merges only happen in-cell — the reference trade-off — so most of
    # the 300 planted pairs never co-locate. The deterministic fixture
    # co-locates 4 pairs; a broken judge wiring merges ZERO, which is
    # what this floor catches (the old `>= 0` was a tautology)
    assert merged >= 1, merged
    assert set(rep_of) == set(names)


def test_kind_isolation(ray_session):
    # same member text in different kinds never cross-merges
    ents = pa.table({"kind": ["entity", "edge"], "member": ["like", "likes"]})
    out = semantic_canonicalize(rd.from_arrow(ents)).take_all()
    kinds = {(r["kind"], r["member"]): r["representative"] for r in out}
    assert kinds[("entity", "like")] == "like"
    assert kinds[("edge", "likes")] == "likes"


def test_llm_dedup_judge_with_fake_transport(ray_session):
    """The production judge shape: transport + context steering; with a
    normalization-faithful fake transport it reproduces the deterministic
    judge's alias map exactly."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.stages.canonicalize import normalize_label
    from kg_gen_ray.stages.semantic_dedup import (
        LLMDedupJudge, semantic_canonicalize)

    class FakeJudgeTransport:
        def __call__(self, prompt):
            head, _, cand_blob = prompt.partition("\n---\n")
            kind, context, item = head.split("\n", 2)
            assert kind == "DEDUP" and context == "animals"
            key = normalize_label(item)
            return "\n".join(c for c in cand_blob.splitlines()
                             if normalize_label(c) == key)

    labels = rd.from_arrow(pa.table({
        "kind": ["entity"] * 5,
        "member": ["cat", "Cat", "cats", "dog", "Dogs"]}))
    with_llm = {(r["representative"], r["member"])
                for r in semantic_canonicalize(
                    labels, judge=LLMDedupJudge(FakeJudgeTransport(),
                                                context="animals"))
                .take_all()}
    baseline = {(r["representative"], r["member"])
                for r in semantic_canonicalize(labels).take_all()}
    assert with_llm == baseline
    assert ("Cat", "cat") in with_llm   # shortest-then-lex rep


def test_llm_dedup_judge_requires_transport():
    import pytest

    from kg_gen_ray.stages.semantic_dedup import LLMDedupJudge
    with pytest.raises(NotImplementedError):
        LLMDedupJudge(None)


def test_llm_judge_escape_roundtrip():
    from kg_gen_ray.stages.semantic_dedup import LLMDedupJudge
    for s in ["plain", "two\nlines", "back\\slash", "a\\nb",
              "\\", "\n", "mix\\\n\\n end", ""]:
        assert LLMDedupJudge._unesc(LLMDedupJudge._esc(s)) == s
    # escaped form is always single-line
    assert "\n" not in LLMDedupJudge._esc("x\ny\nz")


def test_llm_judge_preserves_edge_whitespace():
    """Candidates with leading/trailing spaces (crawl text) must match
    the transport's echo — an over-eager strip() made them unmatchable."""
    from kg_gen_ray.stages.semantic_dedup import LLMDedupJudge

    class EchoAll:
        def __call__(self, prompt):
            _, _, cand_blob = prompt.partition("\n---\n")
            return cand_blob

    judge = LLMDedupJudge(EchoAll(), context="c")
    cands = [" Paris", "Paris ", "Paris"]
    assert judge("paris", cands) == cands
