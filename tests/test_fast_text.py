"""Fused vectorized text-analysis tests (the scale-path operator)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.fast_text import (
    fused_text_analysis,
    minhash_lsh_pairs_fast,
)
from kg_gen_ray.functions.text_analysis import token_stats


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats_agree_with_reference_op():
    texts = ["a b c a", "x", "", "the quick brown fox the"]
    got = fused_text_analysis(_batch(texts))
    ref = token_stats(_batch(texts))
    assert got["n_tokens"].to_pylist() == ref["n_tokens"].to_pylist()
    assert got["n_unique_tokens"].to_pylist() == ref["n_unique_tokens"].to_pylist()


def test_deterministic_and_identity():
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "totally different text here"]
    a = fused_text_analysis(_batch(texts))
    b = fused_text_analysis(_batch(texts))
    assert a.equals(b)
    # identical docs -> identical signatures; different doc differs
    for col in ["simhash", "m0", "m1", "m2", "m3"]:
        assert a[col][0].as_py() == a[col][1].as_py()
    assert any(a[f"m{k}"][0].as_py() != a[f"m{k}"][2].as_py()
               for k in range(4))


def test_minhash_similarity_monotonic():
    # high-overlap docs share more signature components than disjoint docs
    base = "w" + " w".join(str(i) for i in range(50))
    near = base.replace("w49", "w999")        # one token changed
    far = " ".join(f"z{i}" for i in range(50))
    t = fused_text_analysis(_batch([base, near, far]))
    near_matches = sum(t[f"m{k}"][0].as_py() == t[f"m{k}"][1].as_py()
                       for k in range(4))
    far_matches = sum(t[f"m{k}"][0].as_py() == t[f"m{k}"][2].as_py()
                      for k in range(4))
    assert near_matches >= 3
    assert far_matches == 0


def test_simhash_hamming_reflects_similarity():
    base = " ".join(f"tok{i}" for i in range(100))
    near = base + " extra"
    far = " ".join(f"other{i}" for i in range(100))
    t = fused_text_analysis(_batch([base, near, far]))
    h = [int(v) for v in t["simhash"].to_pylist()]
    d_near = bin(h[0] ^ h[1]).count("1")
    d_far = bin(h[0] ^ h[2]).count("1")
    assert d_near < d_far


def test_edge_rows():
    t = fused_text_analysis(_batch(["", "x", "x y", ""]))
    assert t.num_rows == 4
    # single-space-split semantics: "" -> one empty token (DuckDB
    # string_split parity), so it gets a whole-row shingle signature —
    # deterministic and equal across empty docs
    assert t["m0"][0].as_py() == t["m0"][3].as_py()
    assert t["m0"][0].as_py() != np.iinfo(np.uint64).max
    assert t["m0"][1].as_py() != t["m0"][2].as_py()


def test_empty_batch():
    t = fused_text_analysis(_batch([]))
    assert t.num_rows == 0
    assert "simhash" in t.column_names


def test_minhash_sig_fast_duckdb_parity():
    """The u64 family's whole point: DuckDB replays the numpy uint64
    wraparound arithmetic bit-for-bit (HUGEINT % 2^64)."""
    import duckdb

    from kg_gen_ray.functions.fast_text import (
        _OA, _OB, _OC1, _OC2, minhash_signatures_fast)

    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs", "x", "a b", "",
             "one two three four five six seven"]
    tab = _batch(texts)
    got = minhash_signatures_fast(tab).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    P = "18446744073709551616"

    def hu(x):
        return f"('0x'||substr(md5({x}),1,8))::BIGINT"

    mins = ", ".join(
        f"list_min(list_transform(shs, s -> ((s::HUGEINT * {int(_OA[k])} + "
        f"{int(_OB[k])}) % {P})))::UBIGINT AS m{k}" for k in range(4))
    q = f"""
    WITH fts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    fsh AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN
        list_transform(range(1, len(ts)-1), i ->
          ({hu('ts[i]')}::HUGEINT * {int(_OC1)} +
           {hu('ts[i+1]')}::HUGEINT * {int(_OC2)} +
           {hu('ts[i+2]')}) % {P})
      WHEN len(ts) = 2 THEN
        [({hu('ts[1]')}::HUGEINT * {int(_OC1)} + {hu('ts[2]')}) % {P}]
      ELSE [{hu('ts[1]')}::HUGEINT] END AS shs FROM fts)
    SELECT doc_id, {mins} FROM fsh ORDER BY doc_id"""
    con = duckdb.connect()
    con.register("documents", tab)
    want = con.execute(q).df()
    assert got.equals(want)


def test_near_dup_canonical_join_dual_matches_broadcast(ray_session):
    from kg_gen_ray.functions.dedup import near_dup_canonical

    texts = [" ".join(f"w{i}_{j}" for j in range(20)) for i in range(10)]
    texts += [texts[0], texts[3], texts[3]]     # dups of 0 and 3
    docs = rd.from_arrow(_batch(texts))
    via_broadcast = sorted(
        r["doc_id"] for r in near_dup_canonical(docs).take_all())
    via_join = sorted(r["doc_id"] for r in near_dup_canonical(
        docs, broadcast_limit=0).take_all())
    assert via_broadcast == via_join
    assert 10 not in via_broadcast and 11 not in via_broadcast
    assert 0 in via_broadcast and 3 in via_broadcast


def test_lsh_pairs_fast_finds_duplicates(ray_session):
    texts = []
    for i in range(40):
        texts.append(" ".join(f"word{i}_{j}" for j in range(30)))
    texts.append(texts[0])                     # exact dup of doc 0
    texts.append(texts[5] + " tail")           # near dup of doc 5
    docs = rd.from_arrow(_batch(texts))
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs_fast(docs).take_all()}
    assert (0, 40) in pairs
    assert (5, 41) in pairs
    # disjoint docs never pair
    assert all(a != 1 and b != 1 for a, b in pairs)
    # the distributed pairing dual (forced via broadcast_limit=0) must
    # produce the identical pair set
    dist = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs_fast(
                docs, broadcast_limit=0).take_all()}
    assert dist == pairs


def test_winnow_fingerprints_brute_force_parity():
    """Winnowing = distinct window-4 minima over 3-gram shingle hashes;
    short docs contribute one overall min; <3-token docs contribute none."""
    import hashlib

    from kg_gen_ray.functions.fast_text import (
        _OC1, _OC2, winnow_fingerprints)

    texts = ["w1 w2 w3 w4 w5 w6 w7 w8 w1 w2", "a b c d e",
             "one two three", "a b", "", "x"]
    tab = _batch(texts)

    def hu(t):
        return np.uint64(int(hashlib.md5(t.encode()).hexdigest()[:8], 16))

    want = set()
    W = 4
    for did, t in enumerate(texts):
        toks = t.split(" ")
        with np.errstate(over="ignore"):
            sh = [hu(toks[i]) * _OC1 + hu(toks[i + 1]) * _OC2
                  + hu(toks[i + 2]) for i in range(len(toks) - 2)]
        if not sh:
            continue
        if len(sh) < W:
            want.add((did, int(min(sh))))
        else:
            for i in range(len(sh) - W + 1):
                want.add((did, int(min(sh[i:i + W]))))
    got = {(r["doc_id"], int(r["fp"]))
           for r in winnow_fingerprints(tab).to_pylist()}
    assert got == want
    # fingerprint set is a subset of the shingle set, much smaller for
    # long docs, and shared content -> shared fingerprints
    t2 = _batch(["w1 w2 w3 w4 w5 w6 w7 w8", "w1 w2 w3 w4 w5 w6 w7 w8"])
    g2 = winnow_fingerprints(t2).to_pylist()
    fps0 = {r["fp"] for r in g2 if r["doc_id"] == 0}
    fps1 = {r["fp"] for r in g2 if r["doc_id"] == 1}
    assert fps0 == fps1 and fps0


def test_chain_pairs_same_components_as_all(ray_session):
    """pair_mode='chain' must yield the same connected components (and
    so the same dedup survivors) as 'all', at O(b) pairs per bucket —
    checked on both duals."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.fast_text import minhash_lsh_pairs_fast

    base = " ".join(f"c{i}" for i in range(40))
    texts = [base, base + " t1", base + " t2", base.replace("c39", "c99"),
             " ".join(f"d{i}" for i in range(40))]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    def comps(pairs_ds):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs_ds.take_all():
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    for kw in ({}, {"broadcast_limit": 0}):
        all_c = comps(minhash_lsh_pairs_fast(docs, pair_mode="all", **kw))
        chain_c = comps(minhash_lsh_pairs_fast(docs, pair_mode="chain",
                                               **kw))
        assert all_c == chain_c


def test_chain_pairs_linear_on_mega_bucket(ray_session):
    """A 300-copy template bucket: 'chain' emits O(n) pairs (the 'all'
    mode would emit ~45k from this bucket alone)."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.fast_text import minhash_lsh_pairs_fast

    base = " ".join(f"m{i}" for i in range(30))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array([base] * 300, pa.string())}))
    n_pairs = minhash_lsh_pairs_fast(docs, pair_mode="chain").count()
    assert n_pairs == 299
