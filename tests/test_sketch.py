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
