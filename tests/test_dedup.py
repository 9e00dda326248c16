"""Dedup operators: exact, MinHash+LSH (planted near-dups must be found),
SimHash, Jaccard verification."""

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.dedup import (
    exact_dedup, jaccard_verify, minhash_lsh_pairs, minhash_signature,
    shingle_set, simhash64, simhash_near_dups)


BASE = ("the quick brown fox jumps over the lazy dog while the sun "
        "sets slowly behind the tall green hills of the old country")
NEAR = BASE.replace("green", "blue")          # one-token change -> near-dup
FAR = ("completely different text about databases and distributed "
       "query engines running on large clusters of machines")


def docs_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_shingle_set():
    assert shingle_set("a b c d", 3) == {"a b c", "b c d"}
    assert shingle_set("a b", 3) == {"a b"}   # <k tokens -> whole text
    assert shingle_set("", 3) == set()


def test_minhash_signature_deterministic_and_similar():
    s1 = minhash_signature(BASE)
    s2 = minhash_signature(BASE)
    assert s1 == s2
    near = minhash_signature(NEAR)
    far = minhash_signature(FAR)
    assert sum(a == b for a, b in zip(s1, near)) > \
        sum(a == b for a, b in zip(s1, far))


def test_exact_dedup(ray_session):
    ds = docs_ds([BASE, FAR, BASE, BASE])
    out = exact_dedup(ds).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 1]   # min doc_id per distinct content


def test_minhash_lsh_finds_planted_near_dup(ray_session):
    ds = docs_ds([BASE, NEAR, FAR, BASE])
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(ds).take_all()}
    assert (0, 3) in pairs            # exact dup always collides
    assert (0, 1) in pairs or (1, 3) in pairs   # near-dup shares >=1 band
    assert (0, 2) not in pairs        # unrelated text must not collide
    # the hot-bucket semi-join dual (forced via broadcast_limit=0) must
    # produce the identical pair set — the hot-key restriction is
    # size-selected, not driver-only
    dual = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(ds, broadcast_limit=0).take_all()}
    assert dual == pairs
    # chain mode's dual too (consecutive-id links per bucket)
    chain = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(ds, pair_mode="chain").take_all()}
    chain_dual = {(r["doc_a"], r["doc_b"])
                  for r in minhash_lsh_pairs(
                      ds, pair_mode="chain", broadcast_limit=0).take_all()}
    assert chain_dual == chain


def test_jaccard_verify(ray_session):
    ds = docs_ds([BASE, NEAR, FAR])
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 0], pa.int64()),
        "doc_b": pa.array([1, 2], pa.int64()),
    }))
    out = jaccard_verify(ds, pairs, threshold=0.5).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert (0, 1) in got and got[(0, 1)] >= 0.5
    assert (0, 2) not in got
    # the join dual (forced via broadcast_limit=0) must agree exactly
    out2 = jaccard_verify(ds, pairs, threshold=0.5,
                          broadcast_limit=0).take_all()
    got2 = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out2}
    assert got2 == got


def test_simhash_properties(ray_session):
    h1, h2 = simhash64(BASE), simhash64(NEAR)
    hf = simhash64(FAR)
    d_near = bin(h1 ^ h2).count("1")
    d_far = bin(h1 ^ hf).count("1")
    assert d_near < d_far
    assert simhash64("") == 0
    ds = docs_ds([BASE, NEAR, FAR, BASE])
    dups = {(r["doc_a"], r["doc_b"]) for r in
            simhash_near_dups(ds, max_hamming=6).take_all()}
    assert (0, 3) in dups             # identical -> hamming 0
    assert (0, 2) not in dups


def test_near_dup_canonical_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.dedup import near_dup_canonical

    base = " ".join(f"w{i}" for i in range(40))
    texts = {
        0: base,                          # cluster {0,1,2}: near dups
        1: base + " tail",
        2: base.replace("w39", "w999"),
        3: " ".join(f"x{i}" for i in range(40)),   # singleton
        4: " ".join(f"y{i}" for i in range(40)),   # singleton
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": list(texts), "text": list(texts.values())}))
    kept = sorted(r["doc_id"] for r in near_dup_canonical(docs).take_all())
    assert kept == [0, 3, 4]   # lowest id survives the cluster


def test_drop_ids_bloom_join_dual_exact(ray_session):
    """The bloom-prefiltered anti-join dual (forced via broadcast_limit=0)
    must agree exactly with the broadcast filter — false positives are
    resolved by the join, false negatives don't exist."""
    from kg_gen_ray.functions.dedup import drop_ids

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(500), pa.int64())}))
    losers = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(0, 500, 3), pa.int64())}))

    broadcast = sorted(r["doc_id"]
                       for r in drop_ids(ds, losers, "doc_id").take_all())
    bloomed = sorted(r["doc_id"] for r in drop_ids(
        ds, losers, "doc_id", broadcast_limit=0).take_all())
    plain = sorted(r["doc_id"] for r in drop_ids(
        ds, losers, "doc_id", broadcast_limit=0,
        bloom_prefilter=False).take_all())
    expect = [i for i in range(500) if i % 3 != 0]
    assert broadcast == bloomed == plain == expect


def test_keep_ids_duals_exact(ray_session):
    """keep_ids (positive twin of drop_ids): broadcast, plain join, and
    bloom-prefiltered join paths agree exactly."""
    from kg_gen_ray.functions.dedup import keep_ids

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "v": pa.array([i * 2 for i in range(400)], pa.int64())}))
    keepers = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(0, 400, 5), pa.int64())}))
    expect = sorted(range(0, 400, 5))

    for kw in ({}, {"broadcast_limit": 0},
               {"broadcast_limit": 0, "bloom_prefilter": False}):
        got = sorted(r["doc_id"] for r in
                     keep_ids(ds, keepers, "doc_id", **kw).take_all())
        assert got == expect


def test_keep_ids_duplicate_keepers_and_type_stability(ray_session):
    """A duplicated keeper id must not multiply output rows in the join
    dual, and crossing the size threshold must not change the id dtype
    (set semantics on every path)."""
    from kg_gen_ray.functions.dedup import keep_ids

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int32()),       # non-int64 ids
        "v": pa.array([i * 3 for i in range(50)], pa.int64())}))
    keepers = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 7, 7, 12, 12, 31], pa.int64())}))

    for kw in ({}, {"broadcast_limit": 0},
               {"broadcast_limit": 0, "bloom_prefilter": False}):
        out = keep_ids(ds, keepers, "doc_id", **kw).take_all()
        assert sorted(r["doc_id"] for r in out) == [7, 12, 31], kw
        assert {r["v"] for r in out} == {21, 36, 93}, kw


def test_drop_ids_non_int64_ids(ray_session):
    """drop_ids' join dual must cast the loser side to ds's own id type,
    not a hard int64."""
    from kg_gen_ray.functions.dedup import drop_ids

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int32())}))
    losers = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1, 5, 9], pa.int64())}))
    for kw in ({}, {"broadcast_limit": 0},
               {"broadcast_limit": 0, "bloom_prefilter": False}):
        got = sorted(r["doc_id"] for r in
                     drop_ids(ds, losers, "doc_id", **kw).take_all())
        assert got == [i for i in range(40) if i not in (1, 5, 9)], kw


def test_near_dup_canonical_randomized_serial_replay(ray_session):
    """The end-to-end dedup composition vs a serial union-find replay
    built from the SAME pure per-doc kernels (signatures + band keys):
    whatever survives must be exactly each share-a-band-key component's
    minimum. Pins the distributed banding groupby, chain pairing,
    min-label components, and the loser drop-filter — i.e. everything
    the EXCHANGE layer adds on top of the per-doc math — on a random
    template-mutation corpus rather than hand-planted cases."""
    import numpy as np

    from kg_gen_ray.functions.dedup import near_dup_canonical
    from kg_gen_ray.functions.fast_text import (band_keys_from_sig,
                                                minhash_signatures_fast)

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(60)]
    templates = [" ".join(rng.choice(words, 40)) for _ in range(8)]
    texts = []
    for _ in range(300):
        base = templates[rng.randint(len(templates))].split()
        for _ in range(rng.randint(4)):  # 0-3 word edits off a template
            base[rng.randint(len(base))] = words[rng.randint(len(words))]
        texts.append(" ".join(base))
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    bands = band_keys_from_sig(minhash_signatures_fast(t))
    parent = list(range(300))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_key: dict = {}
    for k, d in zip(bands["band_key"].to_pylist(),
                    bands["doc_id"].to_pylist()):
        by_key.setdefault(k, []).append(d)
    for members in by_key.values():
        for other in members[1:]:
            ra, rb = find(members[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    expected = sorted(i for i in range(300) if find(i) == i)
    assert len(expected) < 300  # the corpus genuinely contains dups

    got = sorted(r["doc_id"] for r in near_dup_canonical(
        rd.from_arrow(t).repartition(7)).take_all())
    assert got == expected

    # and identically through the forced scale-side duals
    forced = sorted(r["doc_id"] for r in near_dup_canonical(
        rd.from_arrow(t).repartition(7), broadcast_limit=0).take_all())
    assert forced == expected
