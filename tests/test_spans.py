"""Duplicated-span removal (Lee et al. exact-substring dedup, token
k-gram variant): serial-reference parity on both duals, edge docs,
duplicate-id guard."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.functions.spans import (SPAN_K, dedup_spans,
                                        span_hash_coeffs, span_losers)

DOCS = [
    (1, "a b c d e f"),
    (2, "x a b c d y"),            # cross-doc loser spans
    (3, "a b c a b c a b c"),      # self-overlap, fully covered
    (4, ""),                       # empty doc round-trips
    (5, "q r"),                    # shorter than k
    (6, "p  q"),                   # double space round-trips (split/join)
]
K = 3


def _table():
    return pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string())})


def _serial_losers(docs, k):
    """Plain-python replay of the loser rule (same hash family):
    doc_id -> list of losing span start positions."""
    C = 0x100000001B3
    occ: dict = {}
    for did, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            h = 0
            for j in range(k):
                h = (h * C + int(hashlib.md5(
                    toks[i + j].encode()).hexdigest()[:8], 16)) % (1 << 64)
            occ.setdefault(h, []).append((did, i))
    losers: dict = {}
    for lst in occ.values():
        if len(lst) >= 2:
            w = min(lst)
            for o in lst:
                if o != w:
                    losers.setdefault(o[0], []).append(o[1])
    return losers


def _serial_expected(docs, k):
    """Plain-python replay of the full span-removal rule."""
    losers = _serial_losers(docs, k)
    out = {}
    for did, text in docs:
        toks = text.split(" ")
        cov = np.zeros(len(toks) + k, dtype=int)
        for p in losers.get(did, []):
            cov[p] += 1
            cov[p + k] -= 1
        keep = np.cumsum(cov[:len(toks)]) <= 0
        out[did] = " ".join(t for t, kp in zip(toks, keep) if kp)
    return out


def test_dedup_spans_serial_parity_both_duals(ray_session):
    expected = _serial_expected(DOCS, K)
    # the hand-visible facts, so the fixture stays honest
    assert expected[2] == "x y"      # covered union of two loser spans
    assert expected[3] == ""         # self-overlap empties the doc
    assert expected[6] == "p  q"     # untouched docs round-trip exactly
    ds = rd.from_arrow(_table())
    got_b = {r["doc_id"]: r["text"]
             for r in dedup_spans(ds, k=K).take_all()}
    assert got_b == expected
    got_j = {r["doc_id"]: r["text"]
             for r in dedup_spans(ds, k=K, broadcast_limit=0).take_all()}
    assert got_j == expected
    for mode in ("losers", "winners", "join"):
        got = {r["doc_id"]: r["text"]
               for r in dedup_spans(ds, k=K, rebuild=mode).take_all()}
        assert got == expected, mode
    # the public mining API agrees with the serial loser set
    from kg_gen_ray.functions.spans import _MAX_POS
    M = _MAX_POS + 1
    got_losers = sorted(r["enc"] for r in span_losers(ds, k=K).take_all())
    want = sorted(d * M + p for d, ps in _serial_losers(DOCS, K).items()
                  for p in ps)
    assert got_losers == want


def test_forced_join_dual_with_no_duplicates(ray_session):
    """rebuild='join' on a dup-free corpus must not choke on the empty
    blob join side."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["one two three four", "five six seven eight"])}))
    out = {r["doc_id"]: r["text"]
           for r in dedup_spans(ds, k=K, rebuild="join").take_all()}
    assert out == {10: "one two three four", 11: "five six seven eight"}


def test_dedup_spans_no_duplicates_is_identity(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["one two three four", "five six seven eight"])}))
    out = {r["doc_id"]: r["text"]
           for r in dedup_spans(ds, k=K).take_all()}
    assert out == {10: "one two three four", 11: "five six seven eight"}


def test_dedup_spans_duplicate_doc_id_raises(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 7], pa.int64()),
        "text": pa.array(["a b c d", "a b c d"])}))
    with pytest.raises(Exception, match="duplicate doc_id"):
        dedup_spans(ds, k=K).take_all()


def test_span_hash_coeffs_closed_form():
    # Horner fold acc = acc*C + h equals sum h_j * coeff_j mod 2^64
    C = 0x100000001B3
    hs = [7, 1 << 31, 12345]
    acc = 0
    for h in hs:
        acc = (acc * C + h) % (1 << 64)
    coeffs = span_hash_coeffs(len(hs))
    assert acc == sum(h * c for h, c in zip(hs, coeffs)) % (1 << 64)
    assert SPAN_K == 8


def test_dedup_spans_randomized_serial_parity(ray_session):
    """Randomized corpora (tiny vocab -> dense duplication, self-overlaps,
    empty docs) against the serial reference, every rebuild mode."""
    import random

    rng = random.Random(23)
    vocab = ["a", "bb", "c", "dd"]
    for trial in range(4):
        docs = []
        for did in range(12):
            n = rng.randrange(0, 14)
            docs.append((did, " ".join(rng.choice(vocab)
                                       for _ in range(n))))
        expected = _serial_expected(docs, K)
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string())}))
        for mode in ("auto", "losers", "winners", "join"):
            got = {r["doc_id"]: r["text"]
                   for r in dedup_spans(ds, k=K, rebuild=mode).take_all()}
            assert got == expected, (trial, mode)


def test_dedup_spans_passes_other_columns_through(ray_session):
    """Text replaced in place; ids keep their dtype (int32 here),
    metadata survives — on ALL THREE rebuild duals, which must agree."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int32()),
        "text": pa.array(["a b c d", "x a b c y"]),
        "lang": pa.array(["en", "de"]),
    }))
    for mode in ("losers", "winners", "join"):
        out = dedup_spans(ds, k=K, rebuild=mode)
        assert [str(t) for t in out.schema().types] == \
            ["int32", "string", "string"], mode
        rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
        assert [r["lang"] for r in rows] == ["en", "de"], mode
        assert rows[1]["text"] == "x y", mode


def test_null_text_contributes_no_spans(ray_session):
    """Null text -> 0 tokens (the paragraphs convention), rebuilt as the
    empty string — not a NaN length wrapping to -2^63 and a nameless
    np.repeat crash."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d", None, "x a b c y"]),
    }))
    for mode in ("losers", "winners", "join"):
        got = {r["doc_id"]: r["text"]
               for r in dedup_spans(ds, k=K, rebuild=mode).take_all()}
        assert got[2] == "" and got[3] == "x y", mode
