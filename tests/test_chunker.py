"""Chunker invariants — mirrors the reference's chunker test contract
(/root/reference/tests/test_chunk_text.py): single chunk for short text,
length bound respected, word-split fallback, content preservation."""

import re

import pytest
from hypothesis import given, settings, strategies as st

from kg_gen_ray.stages.chunker import chunk_text, split_sentences


def test_short_text_single_chunk():
    assert chunk_text("Hello world.", 500) == ["Hello world."]


def test_empty_text():
    assert chunk_text("", 100) == []
    assert chunk_text("   ", 100) == []


def test_length_bound_respected():
    text = " ".join(f"Sentence number {i} is here." for i in range(50))
    chunks = chunk_text(text, 80)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c) <= 80


def test_word_split_fallback():
    # one giant "sentence" with no terminator must be split on words
    text = "word " * 200 + "tail"
    chunks = chunk_text(text, 50)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c) <= 50
        assert not c.startswith(" ") and not c.endswith(" ")


def test_sentences_not_split_when_they_fit():
    sents = [f"Alpha beta gamma {i}." for i in range(20)]
    chunks = chunk_text(" ".join(sents), 60)
    # every sentence must appear intact in exactly one chunk
    joined = " ".join(chunks)
    for s in sents:
        assert s in joined


def test_content_preservation():
    text = " ".join(f"Fact {i} is true." for i in range(30))
    chunks = chunk_text(text, 70)
    assert " ".join(chunks) == text


def test_mixed_oversized_and_normal():
    text = "Short one. " + "x" * 300 + " done now. Short two."
    chunks = chunk_text(text, 100)
    for c in chunks:
        # a single word longer than the limit cannot be split further —
        # it becomes its own oversized chunk; all other chunks obey the bound
        if max(len(w) for w in c.split()) <= 100:
            assert len(c) <= 100
    assert any("Short one." in c for c in chunks)
    assert any("Short two." in c for c in chunks)
    assert any(len(c) == 300 for c in chunks)


@given(st.lists(st.integers(1, 12), min_size=1, max_size=40),
       st.integers(30, 200))
@settings(max_examples=50, deadline=None)
def test_property_bound_and_preservation(word_counts, max_size):
    sents = []
    for i, wc in enumerate(word_counts):
        sents.append(" ".join(f"w{i}x{j}" for j in range(wc)) + ".")
    text = " ".join(sents)
    chunks = chunk_text(text, max_size)
    for c in chunks:
        # bound holds unless a single word exceeds it
        if max(len(w) for w in c.split()) <= max_size:
            assert len(c) <= max_size
        assert c == c.strip()
    # token stream preserved
    assert " ".join(chunks).split() == text.split()


def test_deterministic():
    text = " ".join(f"Sentence {i} here." for i in range(100))
    assert chunk_text(text, 90) == chunk_text(text, 90)


def test_split_sentences():
    assert split_sentences("A is B. C is D! E?  F.") == \
        ["A is B.", "C is D!", "E?", "F."]
