"""Benchmark decontamination: planted k-gram leaks are flagged, clean
docs survive, sub-k overlaps don't trigger, and the bloom+semi-join dual
agrees with the broadcast path exactly."""

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.decontaminate import (
    contaminated_ids, decontaminate, doc_kgram_rows)

BENCH_Q = ("what is the capital of france and when was it founded "
           "by the original settlers")


def tables():
    leak = "intro text " + BENCH_Q + " trailing words here"
    sub_k = "what is the capital of france but then it diverges totally"
    clean = " ".join(f"tok{i}" for i in range(30))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([leak, sub_k, clean], pa.string())}))
    bench = rd.from_arrow(pa.table({
        "text": pa.array([BENCH_Q], pa.string())}))
    return docs, bench


def test_planted_leak_flagged_sub_k_not(ray_session):
    docs, bench = tables()
    flagged = sorted(r["doc_id"] for r in
                     contaminated_ids(docs, bench, k=8).take_all())
    assert flagged == [0]       # 7-gram overlap (doc 1) must NOT flag
    kept = sorted(r["doc_id"] for r in
                  decontaminate(docs, bench, k=8).take_all())
    assert kept == [1, 2]


def test_bloom_semijoin_dual_matches_broadcast(ray_session):
    docs, bench = tables()
    bcast = sorted(r["doc_id"] for r in
                   contaminated_ids(docs, bench, k=8).take_all())
    dual = sorted(r["doc_id"] for r in
                  contaminated_ids(docs, bench, k=8,
                                   broadcast_limit=0).take_all())
    assert bcast == dual == [0]


def test_kgram_rows_count_and_short_rows(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 6], pa.int64()),
        "text": pa.array(["a b c d e", "x y"], pa.string())}))
    rows = doc_kgram_rows(ds, k=4).take_all()
    # 5 tokens -> 2 4-grams; 2 tokens -> none
    assert sorted(r["doc_id"] for r in rows) == [5, 5]
    assert len({r["sh"] for r in rows}) == 2


def test_null_text_contributes_no_kgrams(ray_session):
    """A NULL text row (expected corpus condition) must not crash either
    path and must contribute zero k-grams — regression for the
    float64-NaN-length -> negative-repeats crash."""
    leak = "intro text " + BENCH_Q + " tail"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([leak, None, "clean words only here"],
                         pa.string())}))
    bench = rd.from_arrow(pa.table({"text": pa.array([BENCH_Q, None],
                                                     pa.string())}))
    # exploded rows: null doc emits nothing
    assert sorted({r["doc_id"]
                   for r in doc_kgram_rows(docs, k=8).take_all()}) == [0]
    # fused broadcast probe and bloom dual agree
    bcast = sorted(r["doc_id"] for r in
                   contaminated_ids(docs, bench, k=8).take_all())
    dual = sorted(r["doc_id"] for r in
                  contaminated_ids(docs, bench, k=8,
                                   broadcast_limit=0).take_all())
    assert bcast == dual == [0]
    kept = sorted(r["doc_id"] for r in
                  decontaminate(docs, bench, k=8).take_all())
    assert kept == [1, 2]


def test_empty_benchmark_flags_nothing(ray_session):
    docs, _ = tables()
    bench = rd.from_arrow(pa.table({"text": pa.array(["short one"],
                                                     pa.string())}))
    assert contaminated_ids(docs, bench, k=8).count() == 0


def test_decontaminate_randomized_serial_replay(ray_session):
    """Random corpora with spliced benchmark windows vs a plain-Python
    k-gram-set replay: pins the hash explode, the broadcast searchsorted
    probe AND the forced bloom+semi-join dual on arbitrary shapes."""
    import numpy as np

    from kg_gen_ray.functions.decontaminate import (contaminated_ids,
                                                    decontaminate)

    rng = np.random.RandomState(17)
    words = [f"w{i}" for i in range(200)]
    bench_texts = [" ".join(rng.choice(words, 12)) for _ in range(10)]
    k = 4
    docs = []
    for d in range(150):
        toks = list(rng.choice(words, rng.randint(6, 30)))
        if rng.rand() < 0.3:  # splice a benchmark window in
            b = bench_texts[rng.randint(10)].split()
            pos = rng.randint(len(b) - k + 1)
            ins = rng.randint(len(toks) + 1)
            toks[ins:ins] = b[pos:pos + k]
        docs.append(" ".join(toks))

    bench_grams = {tuple(bt.split()[i:i + k])
                   for bt in bench_texts
                   for i in range(len(bt.split()) - k + 1)}

    def hit(tx):
        t = tx.split()
        return any(tuple(t[i:i + k]) in bench_grams
                   for i in range(len(t) - k + 1))

    expected = sorted(d for d, tx in enumerate(docs) if hit(tx))
    assert expected  # the corpus genuinely contains contamination

    docs_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(150), pa.int64()),
        "text": pa.array(docs, pa.string())})).repartition(6)
    bench_ds = rd.from_arrow(pa.table({
        "text": pa.array(bench_texts, pa.string())}))

    for kw in ({}, {"broadcast_limit": 0}):
        got = sorted(r["doc_id"] for r in contaminated_ids(
            docs_ds, bench_ds, k=k, **kw).take_all())
        assert got == expected, kw
    kept = sorted(r["doc_id"] for r in
                  decontaminate(docs_ds, bench_ds, k=k).take_all())
    assert kept == sorted(set(range(150)) - set(expected))
