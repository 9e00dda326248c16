"""Shared stage utilities."""

from __future__ import annotations

import ray
import ray.data


def resolve_shuffle_partitions(shuffle_partitions):
    """``None`` -> keep Ray's input-block-driven width; ``"auto"`` -> one
    partition per cluster CPU; int -> that many.

    Why this knob exists: Ray Data's sort/aggregate shuffle width follows
    the *input* block count. After a local combiner (per-batch pre-
    aggregation) the data volume is tiny relative to the input, and paying
    O(input_blocks^2) shuffle-block overhead for it dominates wall time on
    all but the largest aggregations. Shuffle width should track the size
    of the *combined partials* — approximately O(cluster cores) for
    distinct-label / fingerprint style aggregations — not the raw input.
    Leave ``None`` when the post-combiner data is still huge (e.g. global
    triple dedup over a 100 TB corpus).
    """
    if shuffle_partitions is None:
        return None
    if shuffle_partitions == "auto":
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    return int(shuffle_partitions)


def coalesce(ds: "ray.data.Dataset", shuffle_partitions):
    """Repartition (no shuffle — block split/merge only) ahead of a wide op
    when a width override is requested."""
    n = resolve_shuffle_partitions(shuffle_partitions)
    return ds if n is None else ds.repartition(n)
