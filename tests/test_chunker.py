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
    assert split_sentences("Apples are red. Grapes are sour! Oranges?  Fine.") == \
        ["Apples are red.", "Grapes are sour!", "Oranges?", "Fine."]


# --- punkt-equivalence family (the behaviors nltk punkt's English model
# exhibits on abbreviations, initials, ellipses, quotes — the divergences
# the old regex splitter got wrong) ------------------------------------------

def test_abbreviations_do_not_split():
    assert split_sentences("Dr. Smith went home. He slept.") == \
        ["Dr. Smith went home.", "He slept."]
    assert split_sentences("The U.S. economy grew. It was fast.") == \
        ["The U.S. economy grew.", "It was fast."]
    assert split_sentences("Fruits, e.g. apples, are good. Eat them.") == \
        ["Fruits, e.g. apples, are good.", "Eat them."]
    assert split_sentences("See Fig. 3 for details. It helps.") == \
        ["See Fig. 3 for details.", "It helps."]


def test_initials_do_not_split():
    assert split_sentences("J. R. R. Tolkien wrote books. They sold well.") \
        == ["J. R. R. Tolkien wrote books.", "They sold well."]


def test_lowercase_continuation_does_not_split():
    assert split_sentences("He paused... then continued walking.") == \
        ["He paused... then continued walking."]


def test_ellipsis_before_capital_splits():
    assert split_sentences("He waited... Then he left.") == \
        ["He waited...", "Then he left."]


def test_trailing_quote_attaches_left():
    assert split_sentences('"Stop." He ran away.') == \
        ['"Stop."', "He ran away."]


def test_exclamation_question_always_terminate():
    assert split_sentences("Stop! go now? fine then.") == \
        ["Stop!", "go now?", "fine then."]


# --- reference test parity (ported byte-for-byte expectations from
# /root/reference/tests/test_chunk_text.py:5-88) ------------------------------

def test_ref_single_short_sentence():
    assert chunk_text("Hello world.", max_chunk_size=50) == ["Hello world."]


def test_ref_multiple_sentences_under_limit():
    result = chunk_text("Hello world. This is a test.", max_chunk_size=50)
    assert result == ["Hello world. This is a test."]


def test_ref_multiple_sentences_exceed_limit():
    text = ("Sentence number one is not too long. "
            "Sentence number two might push us over the limit. "
            "Short last sentence.")
    result = chunk_text(text, max_chunk_size=50)
    assert len(result) > 1
    assert all(len(c) <= 50 for c in result)


def test_ref_long_sentence_fallback():
    text = " ".join(["word"] * 100) + "."
    result = chunk_text(text, max_chunk_size=20)
    assert all(len(c) <= 20 for c in result)
    assert "word" in " ".join(result)


def test_ref_mixed_scenario():
    text = ("Short sentence. " + " ".join(["longword"] * 30) + ". "
            + "Another short sentence.")
    result = chunk_text(text, max_chunk_size=50)
    assert len(result) >= 3
    assert all(len(c) <= 50 for c in result)
    assert result[0].startswith("Short sentence.")
    assert "Another short sentence." in result[-1]


def test_packing_trailing_space_accounting():
    # the reference joins while len(current_with_trailing_space) +
    # len(sentence) + 1 <= max; an exact-fit pair (len(joined) == max) must
    # therefore SPLIT — one char stricter than naive packing
    s1, s2 = "Abcd efgh.", "Ijkl mnop."       # joined = 21 chars
    assert chunk_text(f"{s1} {s2}", max_chunk_size=21) == [s1, s2]
    assert chunk_text(f"{s1} {s2}", max_chunk_size=22) == [f"{s1} {s2}"]


def test_whitespace_normalized_like_reference():
    # the reference never short-circuits short texts: sentences are
    # re-joined with single spaces, normalizing inter-sentence whitespace
    assert chunk_text("One sentence here.   Another one.", 500) == \
        ["One sentence here. Another one."]


# --- golden corpora (the reference's own test data): stability pins ----------

def _read_golden(name):
    with open(f"/root/reference/tests/data/{name}", encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize("name,n_chunks,md5", [
    ("kingkiller_chapter_one.txt", 73,
     "eedc4038b81dce5c1d6b879c2d6f1e4a"),
    ("fresh_wiki_article.md", 53,
     "d89725a3d7b8955fddc6b7ed99cc96f8"),
])
def test_golden_corpus_chunks_pinned(name, n_chunks, md5):
    """Byte-stable chunk boundaries over the reference's golden corpora
    (ref tests/data). The hash pins OUR splitter's output so any future
    edit that moves a boundary fails loudly; invariants mirror the
    reference contract."""
    import hashlib
    text = _read_golden(name)
    chunks = chunk_text(text, 500)
    assert all(len(c) <= 500 for c in chunks)
    assert all(c == c.strip() for c in chunks)
    digest = hashlib.md5("\x00".join(chunks).encode("utf-8")).hexdigest()
    assert (len(chunks), digest) == (n_chunks, md5)


# --- documented punkt-parity scope (adversarial splitter table) --------------
# nltk/punkt is not installable in this sandbox (no network), so parity with
# the reference's sent_tokenize cannot be asserted directly. This table IS
# the documented parity scope instead of prose: every encoded rule family
# (abbreviations, multi-initial names, ellipsis before lower/upper, closing
# quotes/brackets, !/? hard terminators, numeric/citation forms) with the
# exact expected boundaries — including the two known conservative
# DIVERGENCES from trained punkt, marked below. Any edit that moves a
# boundary fails this test loudly.

@pytest.mark.parametrize("text,expected", [
    # honorific abbreviation never breaks
    ("Dr. Smith arrived. He sat down.",
     ["Dr. Smith arrived.", "He sat down."]),
    # NARROWED DIVERGENCE (round 5): abbreviation + capitalized frequent
    # sentence starter now breaks (punkt's starter heuristic, a closed
    # function-word set standing in for the trained sent_starters table)
    ("He moved to the U.S. The climate differs.",
     ["He moved to the U.S.", "The climate differs."]),
    ("It opens at 9 a.m. They arrive early.",
     ["It opens at 9 a.m.", "They arrive early."]),
    ("Apples, pears, etc. However, figs differ.",
     ["Apples, pears, etc.", "However, figs differ."]),
    # REMAINING DIVERGENCE: a capitalized PROPER NOUN after an
    # abbreviation stays on the conservative no-break branch (trained
    # punkt breaks when its ortho data has seen the noun lowercase)
    ("He moved to the U.S. Canada stayed neutral.",
     ["He moved to the U.S. Canada stayed neutral."]),
    # the starter rule must NOT fire mid-phrase: lowercase continuation
    ("The U.S. the and of are words.",
     ["The U.S. the and of are words."]),
    # nor after person honorifics / legal citations, whose collocation
    # with a following capitalized NAME outranks starter evidence
    ("Ask Dr. No about it.", ["Ask Dr. No about it."]),
    ("Roe v. The State of Ohio won.", ["Roe v. The State of Ohio won."]),
    # numeric-citation forms are NOT guarded: a digit already fails the
    # starter check, so "No. 5" holds while sentence-final readings break
    ("See No. 5 for details. Then read on.",
     ["See No. 5 for details.", "Then read on."]),
    ("He said no. The deal was off.",
     ["He said no.", "The deal was off."]),
    ("She lives on Main St. Then she moved away.",
     ["She lives on Main St.", "Then she moved away."]),
    ("See fig. A few lines down.", ["See fig.", "A few lines down."]),
    # nor after single-letter initials (initials chain into names)
    ("J. R. R. Tolkien wrote it. He was English.",
     ["J. R. R. Tolkien wrote it.", "He was English."]),
    # single-letter initials chain without breaking
    ("J. R. R. Tolkien wrote books. They sold well.",
     ["J. R. R. Tolkien wrote books.", "They sold well."]),
    # ellipsis + lowercase continuation stays mid-sentence
    ("Well... maybe not. Done.", ["Well... maybe not.", "Done."]),
    # ellipsis before an orthographic sentence start breaks
    ("Wait... Stop now.", ["Wait...", "Stop now."]),
    # Latin abbreviation mid-list
    ("Choose fruit, e.g. apples and pears. Next sentence here.",
     ["Choose fruit, e.g. apples and pears.", "Next sentence here."]),
    # KNOWN DIVERGENCE: '!' always terminates (with the closing quote
    # attached, punkt's realign_boundaries); trained punkt often keeps
    # '"Stop!" he said.' as one sentence via its collocation stats
    ('"Stop!" he said. Then he left.',
     ['"Stop!"', 'he said.', 'Then he left.']),
    # citation/measurement abbreviations before digits
    ("See fig. 3 for details. Then read on.",
     ["See fig. 3 for details.", "Then read on."]),
    ("Mt. Everest is tall. Climbers love it.",
     ["Mt. Everest is tall.", "Climbers love it."]),
    # ordinary word + '.' breaks regardless of next-word case family
    ("It cost $5. Then it doubled.",
     ["It cost $5.", "Then it doubled."]),
    # ? and ! hard-terminate back to back
    ("Is that so? Yes! Absolutely.",
     ["Is that so?", "Yes!", "Absolutely."]),
    # abbreviation inside brackets; bracket does not end the sentence
    ("He said (see p. 12) it works. Fine.",
     ["He said (see p. 12) it works.", "Fine."]),
    ("A vs. B was close. C won.", ["A vs. B was close.", "C won."]),
])
def test_punkt_parity_scope(text, expected):
    assert split_sentences(text) == expected


def test_punkt_parity_scope_through_chunker():
    """The same adversarial families flowing through chunk_text: boundary
    decisions and packing interact (golden pin, like the reference-corpora
    hashes above)."""
    import hashlib
    corpus = (
        "Dr. Smith met J. R. R. Tolkien at Acme Inc. headquarters... "
        "they talked for hours. Prof. Jones arrived at 3 p.m. with figs. "
        '"Wonderful!" she said. The U.S. delegation (see fig. 4) left. '
        "Costs rose, i.e. by 12 pct. Then talks resumed. Is that all? No! "
        "There was more... Much more.")
    chunks = chunk_text(corpus, 80)
    assert all(len(c) <= 80 for c in chunks)
    # golden pin: abbreviation/initial/ellipsis boundaries interacting
    # with the 80-char packing (incl. the word-split fallback on the long
    # first sentence)
    digest = hashlib.md5("\x00".join(chunks).encode("utf-8")).hexdigest()
    assert (len(chunks), digest) == (5, "caeb878a6496b98ac9dd874231da3ddf")
    assert chunks[1] == "hours."   # fallback tail of the oversized sentence
    assert chunks[2] == 'Prof. Jones arrived at 3 p.m. with figs. ' \
                        '"Wonderful!" she said.'


def test_chunk_text_sents_join_parity():
    """chunk_text == ' '.join of chunk_text_sents on every family: packed
    sentences, word-fallback pieces, unbounded, empty."""
    from kg_gen_ray.stages.chunker import chunk_text, chunk_text_sents
    texts = [
        "Linda is Josh's mother. The capital of France is Paris. "
        "oak is a type of tree. Nothing else here.",
        "Dr. Smith visited the U.S. in Jan. 1999. He stayed a week.",
        "word " * 200,                     # one oversize sentence
        "Tiny.",
        "",
        "   ",
        "A! B? C... d continues here. Done.",
    ]
    for text in texts:
        for size in (0, 25, 80, 500):
            chunks = chunk_text(text, size)
            sent_lists = chunk_text_sents(text, size)
            assert len(chunks) == len(sent_lists)
            for chunk, sents in zip(chunks, sent_lists):
                if sents is None:          # unbounded chunk: raw text
                    assert chunk == text.strip()
                else:
                    assert chunk == " ".join(sents)


def test_pattern_extractor_uses_chunker_sentences(ray_session):
    """raw_triples with the pattern backend consumes the chunker's sents
    column (no re-split) and matches the column-free replay."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    from kg_gen_ray.pipelines.kg_pipeline import raw_triples
    from kg_gen_ray.stages.chunker import chunk_stage
    from kg_gen_ray.stages.extract import PatternExtractor

    from kg_gen_ray.sources.pages import synthetic_pages_table
    from kg_gen_ray.stages.extract_text import extract_text_stage

    pages = rd.from_arrow(synthetic_pages_table(64, 1))
    cfg = PipelineConfig(
        chunk_size=300,
        default_extractor=ExtractorConfig(backend="pattern"))
    got = sorted(
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in raw_triples(pages, cfg).take_all())
    # replay without the sents column: identical triples
    chunks = chunk_stage(extract_text_stage(pages), 300)
    assert "sents" not in chunks.schema().names
    replay = PatternExtractor().extract_batch(
        pa.table(chunks.take_batch(100000, batch_format="pyarrow")))
    expected = sorted(zip(replay["subj"].to_pylist(),
                          replay["pred"].to_pylist(),
                          replay["obj"].to_pylist(),
                          replay["url"].to_pylist()))
    assert got == expected
    assert len(got) > 0
