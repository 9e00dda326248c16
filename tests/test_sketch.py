"""HyperLogLog cardinality sketch tests."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.sketch import M, _estimate, _registers, approx_distinct


def test_register_merge_associative():
    h1 = np.array([123456789, 987654321], dtype=np.uint64)
    h2 = np.array([555555555], dtype=np.uint64)
    both = _registers(np.concatenate([h1, h2]))
    merged = np.maximum(_registers(h1), _registers(h2))
    assert np.array_equal(both, merged)


def test_estimate_accuracy_100k(ray_session):
    n = 100_000
    ds = rd.from_arrow(pa.table({
        "v": pa.array([f"value-{i}" for i in range(n)], pa.string())}))
    est = approx_distinct(ds, "v")
    assert abs(est - n) / n < 0.05      # ~1.6% expected at p=12


def test_estimate_small_range(ray_session):
    ds = rd.from_arrow(pa.table({"v": ["a", "b", "c", "a", "b"]}))
    assert approx_distinct(ds, "v") == 3


def test_duplicates_do_not_inflate(ray_session):
    ds = rd.from_arrow(pa.table({
        "v": pa.array([f"x{i % 50}" for i in range(5000)], pa.string())}))
    est = approx_distinct(ds, "v")
    assert abs(est - 50) <= 2


def test_empty(ray_session):
    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    assert approx_distinct(ds, "v") == 0


def test_heavy_hitters_guarantee(ray_session):
    """MG guarantee: every value with true frequency > n/capacity is in
    the summary and its true count sits inside [min_count, max_count]."""
    from kg_gen_ray.functions.sketch import heavy_hitters

    # 3 hot keys over a long uniform tail, shuffled deterministically
    vals = (["hot_a"] * 4000 + ["hot_b"] * 2500 + ["hot_c"] * 1500
            + [f"tail_{i % 997}" for i in range(4000)])
    import random
    random.Random(7).shuffle(vals)
    truth = {"hot_a": 4000, "hot_b": 2500, "hot_c": 1500}
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})) \
        .repartition(8)

    out = heavy_hitters(ds, "v", capacity=64)
    got = {v: (lo, hi) for v, lo, hi in out}
    n = len(vals)
    for k, true_c in truth.items():
        assert true_c > n // 64          # actually above the threshold
        assert k in got, k
        lo, hi = got[k]
        assert lo <= true_c <= hi, (k, lo, true_c, hi)
    # summary is capacity-bounded and sorted by min_count desc
    assert len(out) <= 64
    assert [t[1] for t in out] == sorted((t[1] for t in out), reverse=True)
    # the heaviest key ranks first
    assert out[0][0] == "hot_a"


def test_heavy_hitters_exact_when_under_capacity(ray_session):
    from kg_gen_ray.functions.sketch import heavy_hitters

    ds = rd.from_arrow(pa.table({
        "v": pa.array(["x"] * 5 + ["y"] * 3 + ["z"] * 2, pa.string())}))
    out = heavy_hitters(ds, "v", capacity=16)
    # under capacity nothing is ever decremented: counts are exact
    assert [(v, lo) for v, lo, _ in out] == [("x", 5), ("y", 3), ("z", 2)]
    assert all(lo == hi for _, lo, hi in out)


def test_heavy_hitters_empty_and_nulls(ray_session):
    from kg_gen_ray.functions.sketch import heavy_hitters

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    assert heavy_hitters(ds, "v") == []
    ds2 = rd.from_arrow(pa.table({
        "v": pa.array([None, "a", None, "a"], pa.string())}))
    assert heavy_hitters(ds2, "v", capacity=4) == [("a", 2, 2)]


# --- Bloom filter ---------------------------------------------------------

def test_bloom_no_false_negatives_int(ray_session):
    from kg_gen_ray.functions.sketch import bloom_build

    members = list(range(0, 10_000, 2))          # evens are members
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(members, pa.int64())}))
    bloom = bloom_build(ids, "doc_id")

    # probe INSIDE Ray workers (map_batches) — pins cross-process hash
    # determinism, the property the anti-join prefilter's exactness needs
    universe = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10_000), pa.int64())}))
    flagged = universe.map_batches(
        lambda t, bloom=bloom: t.filter(bloom.contains_mask(t["doc_id"])),
        batch_format="pyarrow")
    got = {r["doc_id"] for r in flagged.take_all()}
    assert set(members) <= got                   # zero false negatives
    fpr = (len(got) - len(members)) / (10_000 - len(members))
    assert fpr < 0.05                            # ~0.8% expected at 10b/key


def test_bloom_string_keys_no_false_negatives(ray_session):
    from kg_gen_ray.functions.sketch import bloom_build

    members = [f"url-{i}" for i in range(0, 4000, 2)]
    ids = rd.from_arrow(pa.table({"k": pa.array(members, pa.string())}))
    bloom = bloom_build(ids, "k")
    probe = rd.from_arrow(pa.table({
        "k": pa.array([f"url-{i}" for i in range(4000)], pa.string())}))
    got = {r["k"] for r in probe.map_batches(
        lambda t, bloom=bloom: t.filter(bloom.contains_mask(t["k"])),
        batch_format="pyarrow").take_all()}
    assert set(members) <= got


def test_bloom_empty_and_saturation():
    from kg_gen_ray.functions.sketch import BloomFilter, bloom_build
    import ray as _ray

    # empty key set -> every probe may still return False (no members)
    ids = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    bloom = bloom_build(ids, "doc_id")
    mask = bloom.contains_mask(pa.array([1, 2, 3], pa.int64()))
    assert mask.to_pylist() == [False, False, False]

    # all-ones bitset (saturated) -> everything positive, never wrong,
    # just no pruning — the graceful-degradation contract
    m = 1 << 13
    sat = BloomFilter(_ray.put(b"\xff" * (m // 8)), m, 7)
    assert sat.contains_mask(pa.array([42], pa.int64())).to_pylist() == [True]


def test_hll_per_group_matches_global_per_group(ray_session):
    """Each group's grouped-HLL estimate is bit-identical to running the
    global sketch on that group alone (same registers, same estimate);
    null groups form their own group; null values are excluded."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from kg_gen_ray.functions.sketch import (hll_estimate,
                                             hll_estimate_per_group)

    tbl = pa.table({
        "lang": (["en"] * 500 + ["de"] * 300 + [None] * 50 + ["fr"] * 2),
        "text": ([f"e{i % 137}" for i in range(500)]
                 + [f"d{i % 71}" for i in range(300)]
                 + [f"n{i % 13}" for i in range(50)] + ["x", None])})
    out = hll_estimate_per_group(
        rd.from_arrow(tbl).repartition(6), "text", "lang").to_pandas()
    assert set(out["lang"].fillna("<null>")) == {"en", "de", "fr", "<null>"}
    for lang, truth in [("en", 137), ("de", 71), ("fr", 1)]:
        sub = rd.from_arrow(tbl.filter(pc.equal(tbl["lang"], lang)))
        g = hll_estimate(sub, "text")
        got = float(out[out["lang"] == lang]["approx_distinct"].iloc[0])
        assert got == g                        # same merged registers
        assert abs(got - truth) / truth < 0.1  # and within HLL error
    null_grp = float(out[out["lang"].isna()]["approx_distinct"].iloc[0])
    assert abs(null_grp - 13) / 13 < 0.1


def test_hll_per_group_zero_rows(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.sketch import hll_estimate_per_group

    empty = rd.from_arrow(pa.table({
        "lang": pa.array([], pa.string()), "text": pa.array([], pa.string())}))
    assert hll_estimate_per_group(empty, "text", "lang").count() == 0
