"""Sentence-aware text chunking stage.

Re-implements the reference chunker
(``/root/reference/src/kg_gen/utils/chunk_text.py:17-66``) with parity at
both levels:

* **Packing arithmetic** mirrors the reference exactly, including its
  trailing-space accounting: the running chunk always carries a trailing
  space, and a sentence joins only while
  ``len(current) + len(sentence) + 1 <= max_chunk_size`` — one character
  stricter than a naive ``len(joined) <= max`` check. A short text is NOT
  short-circuited: like the reference, it is split into sentences and
  re-joined with single spaces (normalizing inter-sentence whitespace).
* **Sentence splitting** is a punkt-equivalent rule-based tokenizer (the
  reference uses ``nltk.sent_tokenize``'s pre-trained English punkt
  model, a ~trained abbreviation table + orthographic heuristics; that
  model artifact is not shippable here, so the rules below encode its
  documented English behavior): boundaries at ``[.!?]`` runs followed by
  whitespace, EXCEPT after known abbreviations ("Dr.", "U.S.", "e.g.") —
  unless the next word is a capitalized frequent sentence starter
  (punkt's starter heuristic via the closed ``_SENT_STARTERS`` set:
  "the U.S. The climate..." breaks) — single-letter initials
  ("J. R. R. Tolkien"), or when the next word starts lowercase
  (mid-sentence ellipsis/abbreviation); trailing closing
  quotes/brackets attach to the preceding sentence (punkt's
  ``realign_boundaries``). ``!``/``?`` always terminate.

Documented divergences from the reference: NLTK punkt is a trained model,
so texts outside these rule families may split differently — the main
remaining family is a capitalized PROPER NOUN after an abbreviation
("U.S. Canada ..."), where trained punkt's ortho data can break and we
conservatively do not; and the
reference's word-fallback can append an empty-string chunk when a long
sentence's first word exceeds the limit (``chunk_text.py:52``) — we drop
empty chunks (an engine guard), everything else is identical. Chunk
boundaries are pinned by golden-file hashes over the reference's own test
corpora (``tests/test_chunker.py``).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

# Standard written-English abbreviations (the families punkt's pre-trained
# English model learns from WSJ): honorifics, Latin abbreviations, months,
# address/corporate suffixes, measurements, citation forms. Keys are
# lowercase WITHOUT the final period; internal periods kept ("e.g", "u.s").
_ABBREVS = frozenset("""
    mr mrs ms dr prof rev fr sr jr st mt hon pres gov sen rep gen col maj
    capt lt sgt cpl pvt adm cmdr
    e.g i.e etc viz cf al eg ie
    u.s u.k u.n a.m p.m a.d b.c ph.d m.d b.a m.a d.c
    jan feb mar apr jun jul aug sep sept oct nov dec
    no vol pp ch sec fig figs ed eds approx dept est min max
    inc ltd co corp bros ave blvd rd hwy apt ste
    vs v var stat
""".split())

# a potential boundary: terminator run + trailing closers + whitespace
_BOUNDARY = re.compile(
    r'(?P<term>[.!?]+)(?P<close>["\'”’\)\]\}]*)(?=(?P<ws>\s+))')

_OPENERS = "\"'“‘([{"

# Frequent sentence starters: punkt's second heuristic (Kiss & Strunk
# 2006 §4.3; nltk.tokenize.punkt's trained ``sent_starters``) breaks
# after a known abbreviation when the NEXT token is a word that starts
# sentences far more often than it continues them. The trained WSJ set
# is not shippable; this closed set of English function words — words
# that are essentially always lowercase mid-sentence, so their
# capitalization after an abbreviation IS the sentence-start signal —
# covers the unambiguous core ("the U.S. The climate...") while proper
# nouns ("U.S. Canada ...") stay on the conservative no-break branch
# (still a documented divergence when trained punkt's ortho data knows
# the noun).
_SENT_STARTERS = frozenset("""
    the this that these those a an
    he she it they we you i his her its their our your my
    but however meanwhile nevertheless moreover furthermore finally
    then there thus hence instead also still yet
    today yesterday tomorrow now
    when while after before although though since because if unless
    some many most several both each few all no one two
""".split())

# Abbreviations the starter heuristic must NEVER fire after: PERSON
# honorifics and legal/taxonomic citation forms, whose collocate is a
# following capitalized NAME that can collide with the function-word
# starter set ("Dr. No", "Roe v. The State") — punkt's collocation
# evidence outranks its starter evidence (Kiss & Strunk §4.2).
# Numeric-citation forms (no/vol/pp/ch/sec/fig/ed) are deliberately NOT
# guarded: their real collocate is a DIGIT, which already fails the
# starter check (_next_word returns '' for non-alpha), so "No. 5" never
# breaks while the sentence-final readings ("He said no. The deal was
# off.", "Main St. Then she left.") break like trained punkt does.
_NO_STARTER_BREAK = frozenset("""
    mr mrs ms dr prof rev fr sr jr hon pres gov sen rep gen col maj
    capt lt sgt cpl pvt adm cmdr
    v vs var
""".split())


def _next_word(text: str, start: int) -> str:
    """The word deciding sentence-starter status after ``start``: skips
    whitespace/openers, collects letters up to the next non-letter
    (so "However," yields "However")."""
    i = start
    n = len(text)
    while i < n and (text[i].isspace() or text[i] in _OPENERS):
        i += 1
    j = i
    while j < n and text[j].isalpha():
        j += 1
    return text[i:j]


def _prev_token(text: str, end: int) -> str:
    """The whitespace-delimited token ending at ``end`` (exclusive),
    without the final terminator run. The backward character loop is
    O(token), measured 15x faster than a ``\\S+\\Z`` regex search, which
    scans forward from position 0 on every call. Two more rejected
    variants (measured on the 400k-page corpus, outputs identical):
    capturing the token in the boundary regex itself via a lazy
    ``\\S*?`` group is 2x SLOWER end-to-end (the lazy group backtracks
    per boundary), and a windowed ``str.rsplit(None, 1)`` is 1.0x —
    tokens are short, so the Python loop is already at the floor."""
    i = end
    while i > 0 and not text[i - 1].isspace():
        i -= 1
    return text[i:end]


def _next_alpha(text: str, start: int) -> str:
    """First character after ``start`` that decides sentence-starter case,
    skipping whitespace and opening quotes/brackets."""
    for ch in text[start:]:
        if ch.isspace() or ch in _OPENERS:
            continue
        return ch
    return ""


def split_sentences(text: str) -> list[str]:
    """Punkt-equivalent sentence tokenization (see module docstring)."""
    bounds = []
    for m in _BOUNDARY.finditer(text):
        term = m.group("term")
        if "." in term and "!" not in term and "?" not in term:
            prev = _prev_token(text, m.start())
            stripped = prev.lstrip("\"'“‘([{")
            low = stripped.lower()
            if len(term) == 1:
                # known abbreviation ("Dr.", "U.S.", "e.g.") never breaks
                # — UNLESS the next word is a capitalized frequent
                # sentence starter (punkt's starter heuristic, see
                # _SENT_STARTERS): "the U.S. The climate..." breaks,
                # "the U.S. Canada..." conservatively does not. A
                # single-letter initial ("J. R. R. Tolkien") never
                # breaks (initials chain into names, and punkt's
                # starter evidence is dominated by the initial reading).
                if low in _ABBREVS:
                    if low in _NO_STARTER_BREAK:
                        continue
                    nxt_w = _next_word(text, m.end() + len(m.group("ws")))
                    if not (nxt_w[:1].isupper()
                            and nxt_w.lower() in _SENT_STARTERS):
                        continue
                elif len(stripped) == 1 and stripped.isalpha():
                    continue
            else:
                # ellipsis ("..."): punkt breaks only before an
                # orthographic sentence start (uppercase/digit); a
                # lowercase continuation stays mid-sentence. An ordinary
                # word + "." breaks REGARDLESS of the next word's case —
                # punkt's first (type-based) stage marks every
                # non-abbreviation final period as sentence-final.
                nxt = _next_alpha(text, m.end() + len(m.group("ws")))
                if nxt and nxt.islower():
                    continue
        bounds.append(m.end())

    sents = []
    start = 0
    for b in bounds:
        seg = text[start:b].strip()
        if seg:
            sents.append(seg)
        start = b
    tail = text[start:].strip()
    if tail:
        sents.append(tail)
    return sents


def chunk_text_sents(text: str, max_chunk_size: int = 500
                     ) -> "list[list[str] | None]":
    """Chunks as their SENTENCE lists — the packing fold's own grouping,
    so a sentence-level consumer (the pattern extractor) never pays a
    re-split of the joined chunk. Each chunk's text is exactly
    ``" ".join(sents)``; a word-fallback piece of one oversize sentence
    is a single-element list; the unbounded (``max_chunk_size <= 0``)
    chunk keeps raw inter-sentence whitespace, so its sentence list is
    ``None`` (consumers split it themselves)."""
    if max_chunk_size <= 0:
        stripped = text.strip()
        return [None] if stripped else []

    chunks: list[list[str]] = []
    current: list[str] = []
    cur_len = 0           # len(" ".join(current)) + 1 trailing space

    for sentence in split_sentences(text):
        if cur_len + len(sentence) + 1 <= max_chunk_size:
            current.append(sentence)
            cur_len += len(sentence) + 1
            continue
        if current:
            chunks.append(current)
            current, cur_len = [], 0
        if len(sentence) > max_chunk_size:
            # word-split fallback (ref chunk_text.py:44-57)
            temp = ""
            for word in sentence.split():
                if len(temp) + len(word) + 1 <= max_chunk_size:
                    temp += word + " "
                else:
                    if temp.strip():
                        chunks.append([temp.strip()])
                    temp = word + " "
            if temp.strip():
                chunks.append([temp.strip()])
        else:
            current, cur_len = [sentence], len(sentence) + 1
    if current:
        chunks.append(current)
    return chunks


def _chunk_str(text: str, sents: "list[str] | None") -> str:
    """One chunk's text from its sentence list (``None`` = the unbounded
    chunk, which keeps raw inter-sentence whitespace) — the single
    decoder for ``chunk_text_sents``' convention."""
    return text.strip() if sents is None else " ".join(sents)


def chunk_text(text: str, max_chunk_size: int = 500) -> list[str]:
    """Pure chunking function — reference packing arithmetic exactly
    (``chunk_text.py:29-66``); empty chunks are dropped (see module
    docstring)."""
    return [_chunk_str(text, sents)
            for sents in chunk_text_sents(text, max_chunk_size)]


class _ChunkBatch:
    """Row-expanding map: pages -> chunks(url, chunk_id, text, lang),
    plus the per-chunk sentence lists when ``emit_sentences`` (an
    internal pipeline wiring — the public chunk schema is unchanged by
    default)."""

    def __init__(self, max_chunk_size: int, emit_sentences: bool = False):
        self.max_chunk_size = max_chunk_size
        self.emit_sentences = emit_sentences

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, cids, texts, langs, sents = [], [], [], [], []
        lang_col = batch["lang"].to_pylist()
        for url, text, lang in zip(batch["url"].to_pylist(),
                                   batch["text"].to_pylist(), lang_col):
            if text is None:    # null text -> no chunks (same as empty)
                continue
            for cid, ss in enumerate(
                    chunk_text_sents(text, self.max_chunk_size)):
                urls.append(url)
                cids.append(cid)
                texts.append(_chunk_str(text, ss))
                langs.append(lang)
                sents.append(ss)
        cols = {
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(cids, pa.int32()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
        if self.emit_sentences:
            cols["sents"] = pa.array(sents, pa.list_(pa.string()))
        return pa.table(cols)


def chunk_stage(pages: "ray.data.Dataset", max_chunk_size: int = 500,
                emit_sentences: bool = False) -> "ray.data.Dataset":
    """pages(..., text, lang) -> chunks(url, chunk_id, text, lang).

    ``chunk_id`` is the ordinal within the page — deterministic provenance
    (the reference loses chunk identity in its set-union merge,
    ``kg_gen.py:233-236``; we keep it for lineage).

    ``emit_sentences`` adds a ``sents`` list column carrying the packing
    fold's own sentence grouping, so a sentence-level downstream (the
    pattern extractor) skips a whole re-split of the chunk text — the
    split is ~60% of extraction CPU. Off by default: the public chunk
    schema (and the kg_chunks oracle) is unchanged.
    """
    fn = _ChunkBatch(max_chunk_size, emit_sentences)
    return pages.map_batches(fn, batch_format="pyarrow")
