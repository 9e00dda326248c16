"""Property-based tests (hypothesis) for the pure core functions.

The reference has no property tests (SURVEY.md §5); these pin the
invariants our distributed correctness rests on: chunker reassembly,
normalization idempotence, representative membership, BM25 bounds,
fused-signature determinism.
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kg_gen_ray.functions.bm25 import okapi_scores
from kg_gen_ray.stages.canonicalize import (
    choose_representative,
    normalize_label,
    salt_of,
)
from kg_gen_ray.stages.chunker import chunk_text, split_sentences

texts = st.text(alphabet=st.characters(codec="utf-8",
                                       exclude_categories=("Cs",)),
                max_size=400)
words = st.lists(st.text(alphabet=st.characters(min_codepoint=97,
                                                max_codepoint=122),
                         min_size=1, max_size=8), min_size=1, max_size=30)


@given(texts, st.integers(min_value=1, max_value=120))
@settings(max_examples=200, deadline=None)
def test_chunk_length_bound_and_content(text, max_size):
    chunks = chunk_text(text, max_size)
    for c in chunks:
        # bound holds unless a single word exceeds it (word-split fallback
        # emits the oversized word whole, as the reference does)
        assert len(c) <= max_size or " " not in c
        assert c == c.strip()
        assert c != ""
    # no content invented: every chunk is made of pieces of the input
    for c in chunks:
        for w in c.split(" "):
            assert w in text


@given(texts)
@settings(max_examples=200, deadline=None)
def test_sentences_rejoin_losslessly_modulo_whitespace(text):
    sents = split_sentences(text)
    assert "".join("".join(s.split()) for s in sents) == \
        "".join(text.split())


@given(texts)
@settings(max_examples=300, deadline=None)
def test_normalize_label_idempotent(label):
    once = normalize_label(label)
    assert normalize_label(once) == once


@given(st.lists(texts.filter(bool), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_representative_is_member_and_stable(members):
    rep = choose_representative(members)
    assert rep in members
    # invariant to input order
    assert choose_representative(list(reversed(members))) == rep
    # shortest-then-lexicographic
    assert all((len(rep), rep) <= (len(m), m) for m in members)


@given(texts, st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_salt_stable_and_in_range(member, buckets):
    s = salt_of(member, buckets)
    assert 0 <= s < buckets
    assert salt_of(member, buckets) == s


@given(st.lists(words, min_size=1, max_size=10), words)
@settings(max_examples=100, deadline=None)
def test_bm25_scores_finite_and_zero_for_absent_terms(corpus, query):
    scores = okapi_scores(corpus, query)
    assert len(scores) == len(corpus)
    assert np.isfinite(scores).all()
    vocab = {w for doc in corpus for w in doc}
    if not any(t in vocab for t in query):
        assert (scores == 0).all()


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=1000),
                        max_size=60), min_size=0, max_size=8))
@settings(max_examples=50, deadline=None)
def test_fused_signatures_deterministic(docs):
    import pyarrow as pa

    from kg_gen_ray.functions.fast_text import fused_text_analysis
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
    a = fused_text_analysis(batch)
    b = fused_text_analysis(batch)
    assert a.equals(b)
    # identical texts always share signatures
    seen = {}
    for i, d in enumerate(docs):
        if d in seen:
            j = seen[d]
            for col in ("simhash", "m0", "m1", "m2", "m3"):
                assert a[col][i].as_py() == a[col][j].as_py()
        else:
            seen[d] = i


@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=40),
                min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_winnowing_window_coverage(texts):
    """The winnowing guarantee: every window of 4 consecutive shingles
    contains at least one of the doc's fingerprints (full-window docs);
    fingerprints are always a subset of the shingle hashes."""
    import numpy as np
    import pyarrow as pa

    from kg_gen_ray.functions.fast_text import (
        _OC1, _OC2, _md5_u32_hashes, winnow_fingerprints)

    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = winnow_fingerprints(tab)
    fps_by_doc = {}
    for did, fp in zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()):
        fps_by_doc.setdefault(did, set()).add(int(fp))

    for did, text in enumerate(texts):
        toks = text.split(" ")
        th = _md5_u32_hashes(pa.array(toks))
        with np.errstate(over="ignore"):
            sh = [int(th[i] * _OC1 + th[i + 1] * _OC2 + th[i + 2])
                  for i in range(len(toks) - 2)]
        fps = fps_by_doc.get(did, set())
        if not sh:
            assert not fps
            continue
        assert fps <= set(sh)
        if len(sh) >= 4:
            for i in range(len(sh) - 3):
                assert fps & set(sh[i:i + 4]), (did, i)
        else:
            assert min(sh) in fps


def test_pagerank_mass_bounds(ray_session):
    """Integer PageRank mass: every node holds at least the uniform base
    share, and total mass never exceeds the scale (damping + integer
    truncation + dangling evaporation only ever remove mass)."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.stages.viz import pagerank

    t = rd.from_arrow(pa.table({
        "subj": ["a", "b", "c", "d", "e", "e"],
        "pred": ["r"] * 6,
        "obj": ["b", "c", "a", "e", "a", "b"]}))
    scale = 10 ** 12
    rows = pagerank(t, scale=scale).take_all()
    n = len(rows)
    base = (scale * 15 // 100) // n
    assert all(r["pr"] >= base for r in rows)
    assert sum(r["pr"] for r in rows) <= scale


@given(st.lists(st.sampled_from([f"v{i}" for i in range(40)]),
                max_size=300),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=200, deadline=None)
def test_misra_gries_guarantee(stream, capacity, n_blocks):
    """The MG invariants the distributed heavy_hitters rests on, over the
    pure compress/merge core under ANY block split: counters only ever
    undercount, the undercount is bounded by the dropped mass, and every
    value with frequency > n/capacity survives."""
    from collections import Counter

    from kg_gen_ray.functions.sketch import _mg_compress

    blocks = [stream[i::n_blocks] for i in range(n_blocks)]
    merged = {}
    for blk in blocks:
        part = _mg_compress(dict(Counter(blk)), capacity)
        for v, c in part.items():
            if c > 0:
                merged[v] = merged.get(v, 0) + c
        merged = _mg_compress(merged, capacity)

    truth = Counter(stream)
    n = len(stream)
    err = n - sum(merged.values())
    assert len(merged) <= capacity
    for v, c in merged.items():
        assert c <= truth[v] <= c + err, (v, c, truth[v], err)
    for v, true_c in truth.items():
        if true_c > n / capacity:
            assert v in merged, (v, true_c, n, capacity)


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=120),
       st.integers(min_value=1, max_value=40))
@settings(max_examples=150, deadline=None)
def test_pack_fold_invariants(ns, max_tokens):
    """The greedy packing fold (reference chunker rule at doc granularity,
    mirrored by pack_sequences' per-group loop): sequence totals never
    exceed max unless the sequence is one oversize doc; seq ids are
    non-decreasing, start at 0, and step by at most 1; packing is maximal
    (a doc never fits the previous sequence it was excluded from)."""
    from kg_gen_ray.functions.sessions import greedy_pack
    seq = list(greedy_pack(np.asarray(ns, dtype=np.int64), max_tokens))
    assert seq[0] == 0
    totals = {}
    for sid, n in zip(seq, ns):
        totals.setdefault(sid, []).append(n)
    for sid, members in totals.items():
        # a sequence may exceed max only via ONE oversize doc; zero-token
        # docs never trigger a break (run stays 0 — the chunker's
        # empty-`current` rule), so they free-ride alongside it
        assert sum(members) <= max_tokens \
            or sum(1 for x in members if x > 0) == 1
    for i in range(1, len(seq)):
        assert seq[i] in (seq[i - 1], seq[i - 1] + 1)
        if seq[i] == seq[i - 1] + 1:
            # maximality: the doc that OPENED sequence i did not fit in
            # i-1 (the break only fires with run > 0, so this is strict)
            assert sum(totals[seq[i - 1]]) + ns[i] > max_tokens


@given(st.sets(st.integers(min_value=-2**62, max_value=2**62),
               min_size=1, max_size=400),
       st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_bitset_never_false_negative(members, probes):
    """Pure-bitset property (no Ray): every inserted key probes True,
    for arbitrary int64 keys including negatives."""
    import pyarrow as pa

    from kg_gen_ray.functions.sketch import BloomFilter

    m_bits = 1 << 13
    bf = BloomFilter(None, m_bits, 7)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    arr = pa.array(sorted(members), pa.int64())
    for idx in bf._probe_indices(arr):
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))

    bf.ref = bits.tobytes()   # raw-bytes ref: probes without a Ray session
    assert all(bf.contains_mask(arr).to_pylist())
    # arbitrary probes (members and non-members alike): the mask is
    # total, crash-free on negatives, and never a false negative
    got = bf.contains_mask(pa.array(probes, pa.int64())).to_pylist()
    assert len(got) == len(probes)
    for pv, hit in zip(probes, got):
        if pv in members:
            assert hit, pv
