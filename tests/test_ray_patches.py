"""Regression coverage for the Ray-internal workarounds in stages/common.

``_patch_hash_shuffle_schema_broadcast``: Ray 2.49's hash-shuffle lets an
EMPTY input block consume the one-shot schema broadcast without actually
sending schema shards, so a join whose first shuffled block on one side is
empty finalizes zero-column partitions and pyarrow acero aborts with "No
match or multiple matches for key field reference". Observed in the wild
via ``tfidf_top_terms(broadcast_limit=0)`` on a 3-doc corpus; this test
pins the minimal deterministic shape (first right block empty, fewer keys
than partitions).
"""

import pyarrow as pa
import ray.data as rd

import kg_gen_ray.stages.common  # noqa: F401  (applies the patch on import)


def test_join_survives_empty_first_block(ray_session):
    empty = pa.table({"k": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
    data = pa.table({"k": pa.array(["a", "b", "c", "d", "e"]),
                     "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "d", "e", "a"]),
        "x": pa.array([10, 20, 30, 40, 50, 60], pa.int64())}))
    right = rd.from_arrow([empty, data])    # empty block FIRST
    rows = left.join(right, join_type="inner", on=("k",),
                     num_partitions=4).take_all()
    assert len(rows) == 6
    got = sorted((r["k"], r["x"], r["v"]) for r in rows)
    assert got == [("a", 10, 1), ("a", 60, 1), ("b", 20, 2),
                   ("c", 30, 3), ("d", 40, 4), ("e", 50, 5)]


def test_join_empty_blocks_both_sides(ray_session):
    e_l = pa.table({"k": pa.array([], pa.string()),
                    "x": pa.array([], pa.int64())})
    d_l = pa.table({"k": pa.array(["a", "b"]),
                    "x": pa.array([1, 2], pa.int64())})
    e_r = pa.table({"k": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64())})
    d_r = pa.table({"k": pa.array(["b", "c"]),
                    "v": pa.array([20, 30], pa.int64())})
    left = rd.from_arrow([e_l, d_l, e_l])
    right = rd.from_arrow([e_r, e_r, d_r])
    rows = left.join(right, join_type="inner", on=("k",),
                     num_partitions=4).take_all()
    assert [(r["k"], r["x"], r["v"]) for r in rows] == [("b", 2, 20)]
