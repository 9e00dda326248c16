"""Unit tests for the shared broadcast/lookup utilities in stages/common."""

import pyarrow as pa
import ray

from kg_gen_ray.stages import common
from kg_gen_ray.stages.common import dict_lookup, in_set_mask


def test_dict_lookup_identity_and_default():
    col = pa.array(["a", "b", "c", "a"])
    assert dict_lookup(col, {"a": "A"}, identity=True).to_pylist() == \
        ["A", "b", "c", "A"]
    out = dict_lookup(col, {"a": "A"}, default=None, out_type=pa.string())
    assert out.to_pylist() == ["A", None, None, "A"]


def test_dict_lookup_int_keys():
    col = pa.array([1, 2, 3, 1], pa.int64())
    out = dict_lookup(col, {1: 10, 3: 30}, out_type=pa.int64())
    assert out.to_pylist() == [10, None, 30, 10]


def test_in_set_mask_plain_set_and_invert(ray_session):
    col = pa.array([1, 2, 3, 4], pa.int64())
    assert in_set_mask(col, {2, 4}).to_pylist() == \
        [False, True, False, True]
    assert in_set_mask(col, {2, 4}, invert=True).to_pylist() == \
        [True, False, True, False]
    # empty set: nothing matches / everything survives the inverse
    assert in_set_mask(col, set()).to_pylist() == [False] * 4
    assert in_set_mask(col, set(), invert=True).to_pylist() == [True] * 4


def test_in_set_mask_type_mismatch_uint64(ray_session):
    # uint64 column vs a value set of Python ints >= 2^63 (int64 overflow)
    big = 2**64 - 5
    col = pa.array([big, 7], pa.uint64())
    ref = ray.put({big})
    assert in_set_mask(col, ref).to_pylist() == [True, False]


def test_in_set_mask_cache_bounded(ray_session):
    col = pa.array([1], pa.int64())
    before = dict(common._VALSET_CACHE)
    try:
        refs = [ray.put({i}) for i in range(common._VALSET_CACHE_MAX + 4)]
        for r in refs:
            in_set_mask(col, r)
        assert len(common._VALSET_CACHE) <= common._VALSET_CACHE_MAX
        # most-recent ref is cached, oldest evicted
        assert refs[-1].hex() in common._VALSET_CACHE
        assert refs[0].hex() not in common._VALSET_CACHE
    finally:
        # restore even on failure: a polluted module cache would leak
        # into every later in_set_mask test in the session
        common._VALSET_CACHE.clear()
        common._VALSET_CACHE.update(before)


def test_default_buckets_volume_aware(ray_session):
    base = common.default_buckets()
    assert base >= 4
    # no hint / small hint: the cores term wins, behavior unchanged
    assert common.default_buckets(None) == base
    assert common.default_buckets(0) == base
    assert common.default_buckets(1) == base
    assert common.default_buckets(base * common.TARGET_BUCKET_BYTES) == base
    # a large exchange widens past the base so one bucket stays under
    # TARGET_BUCKET_BYTES (the 100 TB shape: buckets track volume)
    big = 1000 * common.TARGET_BUCKET_BYTES
    assert common.default_buckets(big) == 1000
    assert common.default_buckets(big + 1) == 1001


def test_elastic_concurrency(ray_session):
    from kg_gen_ray.stages.common import elastic_concurrency

    # int request pins the max, min stays 1 (liveness)
    assert elastic_concurrency(4) == (1, 4)
    assert elastic_concurrency(1) == (1, 1)
    # explicit tuples pass through untouched (caller owns the floor)
    assert elastic_concurrency((2, 6)) == (2, 6)
    # None derives max from cluster CPUs, optionally capped
    lo, hi = elastic_concurrency(None)
    assert lo == 1 and hi >= 1
    assert elastic_concurrency(None, cap=2)[1] <= 2
