"""Extractor backends: pattern rules, vectorized bigram, LLM retry ladder."""

import re

import pyarrow as pa
import pytest

from kg_gen_ray.config import ExtractorConfig, PipelineConfig
from kg_gen_ray.stages.extract import (
    BigramExtractor, LLMExtractor, PatternExtractor, TripleExtractor)


def chunk_batch(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "chunk_id": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
    })


def triples_of(table):
    return list(zip(table["subj"].to_pylist(), table["pred"].to_pylist(),
                    table["obj"].to_pylist()))


def test_pattern_extractor_rules():
    b = chunk_batch([
        ("u1", 0, "Linda is Josh's mother. The capital of France is Paris. "
                  "oak is a type of tree. Nothing else here.", "en"),
    ])
    out = PatternExtractor().extract_batch(b)
    assert set(triples_of(out)) == {
        ("Linda", "is mother of", "Josh"),
        ("France", "has capital", "Paris"),
        ("oak", "is a type of", "tree"),
    }
    assert out["url"].to_pylist() == ["u1"] * 3
    assert out["chunk_id"].to_pylist() == [0] * 3


def test_bigram_extractor_matches_naive():
    texts = ["a b c", "x", "", "p q"]
    b = chunk_batch([(f"u{i}", 0, t, "en") for i, t in enumerate(texts)])
    out = BigramExtractor().extract_batch(b)
    got = set(zip(out["subj"].to_pylist(), out["pred"].to_pylist(),
                  out["obj"].to_pylist(), out["url"].to_pylist()))
    expected = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for a, c in zip(toks, toks[1:]):
            expected.add((a, "precedes", c, f"u{i}"))
        for w in toks:
            expected.add((w, "written_in", "en", f"u{i}"))
    assert got == expected
    # multiset row count: bigrams + token occurrences
    n_tokens = sum(len(t.split(" ")) for t in texts)
    n_bigrams = sum(max(0, len(t.split(" ")) - 1) for t in texts)
    assert out.num_rows == n_tokens + n_bigrams


def test_bigram_empty_batch():
    out = BigramExtractor().extract_batch(chunk_batch([]))
    assert out.num_rows == 0


class FakeTransport:
    """Deterministic fake LLM: understands the three prompt kinds."""

    def __init__(self, fail_strict=False):
        self.fail_strict = fail_strict
        self.calls = []

    def __call__(self, prompt):
        kind = prompt.split("\n", 1)[0]
        self.calls.append(kind)
        if kind == "ENTITIES":
            return "Alice\nBob\nParis"
        if kind == "RELATIONS_STRICT":
            if self.fail_strict:
                return "garbage line without pipes"
            return "Alice|knows|Bob\nAlice|visited|Paris"
        if kind == "RELATIONS_ANY":
            return "Alice|knows|Bob\nEve|hacks|Mallory\nbadline"
        if kind == "FIX":
            return "Alice|knows|Bob\nEve|hacks|Mallory"
        raise AssertionError(kind)


def test_llm_extractor_strict_path():
    t = FakeTransport()
    ex = LLMExtractor(ExtractorConfig(backend="llm", model="fake"), transport=t)
    rels = ex.extract("some text")
    assert rels == [("Alice", "knows", "Bob"), ("Alice", "visited", "Paris")]
    assert t.calls == ["ENTITIES", "RELATIONS_STRICT"]


def test_llm_extractor_fallback_ladder_and_postfilter():
    t = FakeTransport(fail_strict=True)
    ex = LLMExtractor(ExtractorConfig(backend="llm", model="fake"), transport=t)
    rels = ex.extract("some text")
    # Eve/Mallory filtered out: not in extracted entity list
    # (ref _2_get_relations.py:101-104 hard post-filter)
    assert rels == [("Alice", "knows", "Bob")]
    assert t.calls == ["ENTITIES", "RELATIONS_STRICT", "RELATIONS_ANY", "FIX"]


def test_llm_extractor_requires_transport():
    with pytest.raises(NotImplementedError):
        LLMExtractor(ExtractorConfig(backend="llm", model="fake"))


def test_lang_routing():
    cfg = PipelineConfig(
        default_extractor=ExtractorConfig(backend="pattern"),
        lang_routes={"de": ExtractorConfig(backend="bigram")},
    )
    ex = TripleExtractor(cfg)
    b = chunk_batch([
        ("u1", 0, "oak is a type of tree.", "en"),
        ("u2", 0, "nur zwei", "de"),
    ])
    out = ex(b)
    trips = set(triples_of(out))
    assert ("oak", "is a type of", "tree") in trips       # pattern route (en)
    assert ("nur", "precedes", "zwei") in trips           # bigram route (de)


def test_config_validation():
    with pytest.raises(ValueError):
        PipelineConfig(default_extractor=ExtractorConfig(backend="nope")).validate()
    with pytest.raises(ValueError):
        PipelineConfig(default_extractor=ExtractorConfig(backend="llm")).validate()
    PipelineConfig().validate()


def test_llm_filter_stage(ray_session):
    # NOTE: the transport must live in the package, not this test module —
    # actor constructor args deserialize on workers, where test modules
    # are not importable (the actor would restart forever)
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.stages.extract import KeywordFilterTransport, llm_filter_stage

    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat sat", "a dog ran", "cat and dog", "nothing here"],
    }))
    out = llm_filter_stage(docs, "cat", KeywordFilterTransport(),
                           concurrency=1).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2]


def test_llm_filter_requires_transport(ray_session):
    import pytest

    from kg_gen_ray.stages.extract import LLMFilter
    with pytest.raises(NotImplementedError):
        LLMFilter("q", None)


def test_pattern_extractor_matches_serial_replay():
    """The batch extractor must agree with an INDEPENDENT serial replay —
    the rule table below is a second, hand-written copy of the FIXTURES.md
    §2 template grammar (NOT the product's ``_rules`` objects), so a
    regression in the product table (swapped capture groups, predicate
    typo, broken role prefix) diverges here. Adversarial sentences
    exercise greedy-capture preference (multiple ' is ', nested \"'s\"),
    rule precedence, role prefixes, and non-matching shapes."""
    from kg_gen_ray.stages.chunker import split_sentences

    texts = [
        # greedy: the subject takes the LAST ' is '
        "A is B is C's mother.",
        # both kin and type could match pieces; kin wins by precedence
        "X is a type of Y's friend.",
        "The capital of The capital of A is B is C.",
        "user: Linda is Josh's mother. assistant: oak is a type of tree.",
        "Alpha is Beta's friend. The capital of X is Y. Nope here.",
        "z is q's sister. not a rule.",  # near-miss kin keyword
        "A is B's mother",               # no terminal period -> no match
        "  The capital of  is P.",       # empty-ish captures still .+
    ]
    # independent oracle: re-declared from the fixture grammar, first
    # match wins, kin > capital > type precedence
    oracle_rules = [
        (re.compile(r"^(.+) is (.+)'s (mother|brother|friend)\.$"),
         lambda m: (m.group(1), "is %s of" % m.group(3), m.group(2))),
        (re.compile(r"^The capital of (.+) is (.+)\.$"),
         lambda m: (m.group(1), "has capital", m.group(2))),
        (re.compile(r"^(.+) is a type of (.+)\.$"),
         lambda m: (m.group(1), "is a type of", m.group(2))),
    ]
    role_prefix = re.compile(r"^(user|assistant): ")
    expected = []
    for i, text in enumerate(texts):
        for sent in split_sentences(text):
            sent = role_prefix.sub("", sent)
            for rx, emit in oracle_rules:
                m = rx.match(sent)
                if m:
                    s, p, o = emit(m)
                    expected.append((s, p, o, f"u{i}", 0))
                    break
    b = chunk_batch([(f"u{i}", 0, t, "en") for i, t in enumerate(texts)])
    out = PatternExtractor().extract_batch(b)
    got = list(zip(out["subj"].to_pylist(), out["pred"].to_pylist(),
                   out["obj"].to_pylist(), out["url"].to_pylist(),
                   out["chunk_id"].to_pylist()))
    assert got == expected
    assert len(got) >= 6
