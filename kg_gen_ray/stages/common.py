"""Shared stage utilities."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def drop_null_rows(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    """Drop rows whose ``col`` is NULL — the shared entry-point filter for
    operators where a null value has no meaning (a null embedding has no
    position in the space; a null timestamp belongs to no window/session).
    SQL mirror: arithmetic/comparison on NULL is NULL and the row falls
    out of every predicate. ``null_count``-gated so a null-free block
    passes through untouched (and Ray fuses the map with the consumer)."""
    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[col])) if t[col].null_count else t
    return ds.map_batches(drop, batch_format="pyarrow")


def _patch_hash_shuffle_schema_broadcast() -> None:
    """Work around a Ray 2.49 hash-shuffle schema-broadcast loss.

    ``_shuffle_block`` (ray/data/_internal/execution/operators/
    hash_shuffle.py:223) returns early for an EMPTY input block without
    sending the schema-bearing empty shards, but ``_do_add_input_inner``
    (ibid.:548,589) still consumes the one-shot per-sequence
    ``_has_schemas_broadcasted`` flag. If the first block an operator
    happens to shuffle for one join side is empty (tiny inputs after a
    ``repartition``, or a ``map_batches`` kernel that legitimately emits
    zero rows for some blocks), every partition that then receives no
    real rows for that side finalizes a ZERO-COLUMN table and pyarrow's
    acero join aborts the run with ``No match or multiple matches for
    key field reference ... side of the join``.

    Driver-side fix (the shuffle submit loop runs in the driver's
    executor thread): feed the original method one block at a time and
    let only a block KNOWN NON-EMPTY consume the broadcast flag. Empty
    shards are then still disseminated by the first non-empty block, as
    the operator intends. A side with zero rows overall never
    broadcasts, same as stock Ray — callers guard that separately.
    """
    try:
        from ray.data._internal.execution.interfaces import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase)
    except ImportError:          # internals moved — newer Ray fixed this
        return
    orig = getattr(HashShufflingOperatorBase, "_do_add_input_inner", None)
    if orig is None:             # method renamed — don't patch blind
        return
    if getattr(orig, "_kg_schema_broadcast_patch", False):
        return
    # the wrapper below resets an instance flag the 2.49 implementation
    # keeps; if a future Ray renames it, patching would turn into an
    # AttributeError inside every shuffle — verify it is still there
    # (source inspection: the flag is per-instance, so there is nothing
    # to getattr on the class) and otherwise treat the drift like the
    # ImportError above: assume the release reworked (and fixed) the path
    import inspect
    try:
        if "_has_schemas_broadcasted" not in inspect.getsource(orig):
            return
    except (OSError, TypeError):
        return

    def _do_add_input_inner(self, input_bundle, input_index):
        blocks = list(zip(input_bundle.block_refs, input_bundle.metadata))
        for ref, md in blocks:
            sub = (input_bundle if len(blocks) == 1 else
                   RefBundle(blocks=((ref, md),),
                             schema=input_bundle.schema,
                             owns_blocks=input_bundle.owns_blocks))
            consumed = not self._has_schemas_broadcasted[input_index]
            orig(self, sub, input_index)
            if consumed and md.num_rows == 0:
                # the empty block sent nothing — leave the broadcast
                # for the next (non-empty) block
                self._has_schemas_broadcasted[input_index] = False

    _do_add_input_inner._kg_schema_broadcast_patch = True
    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner


_patch_hash_shuffle_schema_broadcast()


def resolve_shuffle_partitions(shuffle_partitions):
    """``None`` -> keep Ray's input-block-driven width; ``"auto"`` ->
    max(8, cluster CPUs // 2) — see the inline comment; int -> that many.

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
        # half the cores: reduce partitions of combined partials are cheap
        # to process, and fewer partitions means quadratically fewer
        # shuffle-block fetches in the sort-based exchange
        return max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    return int(shuffle_partitions)


def elastic_concurrency(requested=None, cap: int | None = None):
    """Actor-pool sizing that cannot deadlock a small session.

    A FIXED pool size is a liveness bug on a busy cluster: two chained
    pools whose fixed sizes together exceed the free CPU slots wait on
    each other forever (observed: two ``concurrency=2`` media pools
    under a 4-CPU session). Returns an autoscaling ``(1, max)`` range
    instead — min 1 keeps every pool schedulable; max is the requested
    size, else cluster CPUs (optionally capped), so a wide cluster still
    gets a wide pool.

    ``requested``: an int pins max (tuples pass through untouched for
    callers that need an explicit floor and accept the liveness risk).
    """
    if isinstance(requested, tuple):
        return requested
    if requested is not None:
        return (1, max(1, int(requested)))
    try:
        n = int(ray.cluster_resources().get("CPU", 2)) \
            if ray.is_initialized() else 2
    except Exception:
        n = 2
    if cap is not None:
        n = min(n, cap)
    return (1, max(1, n))


# one bucket is one map_groups task's working set; pandas conversion and
# the per-bucket sort cost ~2-3x this in heap, so 128 MB keeps a task
# comfortably inside a worker even with several running per node
TARGET_BUCKET_BYTES = 128 * 1024 * 1024


def default_buckets(size_bytes: int | None = None) -> int:
    """Bucket count for a hash-bucketed groupby exchange.

    Base: ~2x cluster cores — enough buckets for parallelism, few enough
    that per-bucket work amortizes Python/group overhead. With a
    ``size_bytes`` hint (e.g. the materialized size of the dataset about
    to be exchanged) the count GROWS past the base so one bucket stays
    under :data:`TARGET_BUCKET_BYTES`: a constant 2x-cores at 100 TB
    would put multi-GB groups in single tasks. The hint only ever widens
    — at small scale the cores term wins and behavior is unchanged."""
    base = max(4, 2 * int(ray.cluster_resources().get("CPU", 8)))
    if size_bytes:
        return max(base, -(-int(size_bytes) // TARGET_BUCKET_BYTES))
    return base


def hash_bucket_array(key_chunked, n_buckets: int):
    """Key column -> int64 bucket ids. Integer keys: masked modulo (the
    mask clears the sign bit so negative keys bucket consistently);
    other types: vectorized polars hash of the string form. Buckets are
    an INTERNAL grouping surrogate (dropped after the groupby), so they
    only need run-internal determinism — same key, same bucket in every
    task of one run — not cross-version stability."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_integer(key_chunked.type):
        # null keys bucket as 0 — which bucket is irrelevant (a null key
        # matches nothing), it just must not crash the modulo
        kv = pc.fill_null(pc.cast(key_chunked, pa.int64()), 0) \
               .to_numpy(zero_copy_only=False)
        return pa.array((kv & ((1 << 62) - 1)) % n_buckets, pa.int64())
    import polars as pl
    arr = pc.fill_null(pc.cast(key_chunked, pa.string()), "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = pl.from_arrow(arr).hash(seed=0).to_numpy().view(np.int64)
    return pa.array((h & ((1 << 62) - 1)) % n_buckets, pa.int64())


def in_set_mask(col, ref, invert: bool = False):
    """Vectorized broadcast-set membership mask for a column: the caller
    ``ray.put`` a set once; every task converts it to an Arrow value_set
    (cached per process, bounded LRU keyed by ObjectRef hex) and runs
    ``pc.is_in`` — no per-element Python loop. Non-ObjectRef inputs are
    converted fresh each call (no id()-keyed caching: addresses are reused
    after GC, so an id key can silently alias two different sets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    key = ref.hex() if hasattr(ref, "hex") else None
    cached = _VALSET_CACHE.get(key) if key is not None else None
    if cached is None:
        vals = list(ray.get(ref) if hasattr(ref, "hex") else ref)
        if vals:
            try:
                arr = pa.array(vals)
            except OverflowError:
                # Python ints >= 2^63 (e.g. uint64 band keys) overflow the
                # default int64 inference
                arr = pa.array(vals, pa.uint64())
        else:
            arr = None
        cached = (arr,)  # empty -> None
        if key is not None:
            _VALSET_CACHE[key] = cached
            while len(_VALSET_CACHE) > _VALSET_CACHE_MAX:
                _VALSET_CACHE.pop(next(iter(_VALSET_CACHE)))
    valset = cached[0]
    if valset is None:
        base = [invert] * len(col)
        return pa.array(base, pa.bool_())
    col_type = col.type
    if valset.type != col_type:
        # e.g. a uint64 key column vs a value set inferred as int64 from
        # Python ints — is_in on mismatched types errors or silently
        # misses; the set is tiny, so the cast is free
        valset = valset.cast(col_type)
    mask = pc.is_in(col, value_set=valset)
    return pc.invert(mask) if invert else mask


# bounded: long-lived workers serve many pipeline invocations; an unbounded
# cache would pin every broadcast set ever seen. Plain dict + FIFO eviction
# (insertion-ordered) — entries are tiny compared to the sets they decode,
# and 8 concurrent hot sets per worker is far above any real pipeline.
_VALSET_CACHE: dict = {}
_VALSET_CACHE_MAX = 8


def dict_lookup(col, mapping: dict, default=None, identity: bool = False,
                out_type=None):
    """Vectorized broadcast-dict lookup for a column: dictionary-encode
    the column (Arrow C++), run the Python dict lookup once per UNIQUE
    value (vocabulary-sized, not row-count-sized), then a vectorized
    ``take`` rebuilds the full column. ``identity=True`` maps missing keys
    to themselves; otherwise to ``default``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    d = pc.dictionary_encode(arr)
    uniq = d.dictionary.to_pylist()
    if identity:
        vals = [mapping.get(v, v) for v in uniq]
    else:
        vals = [mapping.get(v, default) for v in uniq]
    return pa.array(vals, out_type).take(d.indices)


def coalesce(ds: "ray.data.Dataset", shuffle_partitions):
    """Repartition (no shuffle — block split/merge only) ahead of a wide op
    when a width override is requested."""
    n = resolve_shuffle_partitions(shuffle_partitions)
    return ds if n is None else ds.repartition(n)


def compact_if_small(mds: "ray.data.Dataset",
                     max_bytes: int = 256 * 1024 * 1024,
                     target_blocks: int | None = None) -> "ray.data.Dataset":
    """Adaptive (AQE-style) compaction of a MATERIALIZED dataset.

    A shuffle output inherits the upstream partition count, so a tiny
    aggregate result can be spread over dozens of near-empty blocks; every
    downstream stage then pays per-block overhead. Size is known after
    materialize, so compaction is a runtime decision: small result ->
    repartition to a few blocks (cheap — the data is tiny by definition);
    large result -> leave partitioning alone (the 100 TB case).
    """
    if target_blocks is None:
        # up to ~cores/2 blocks is already cheap for downstream stages;
        # only pathological over-fragmentation (e.g. a wide shuffle's
        # hundreds of near-empty outputs) is worth an extra repartition job
        target_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    try:
        size = mds.size_bytes()
        blocks = mds.num_blocks()
    except Exception:
        return mds
    if size is not None and size < max_bytes and blocks > target_blocks:
        return mds.repartition(target_blocks).materialize()
    return mds


def dual_limit(limit: int) -> int:
    """Effective size threshold for a size-selected broadcast/join (or
    driver/distributed) dual. ``KG_FORCE_JOIN_DUALS=1`` forces EVERY dual
    onto its scale-side path (threshold 0) so correctness runs exercise
    the code that normally only runs beyond broadcast scale — at small
    scale the broadcast side always wins the size test, so without the
    knob the join siblings would only ever run in unit tests. An empty
    small side still takes the broadcast path (0 bytes <= 0), which the
    join duals rely on (a hash join cannot key on an all-empty side)."""
    import os
    if os.environ.get("KG_FORCE_JOIN_DUALS", "").strip() not in ("", "0"):
        return 0
    return limit


def size_aware_read_blocks(path: str) -> int:
    """Size-aware read parallelism for a single Parquet file: ~2 MB of
    file or ~8k rows per block (whichever implies more blocks), clamped
    to [4, max(8, cluster cores)] — the floor of 8 means a very small
    cluster still gets a few blocks of read pipelining, at worst a
    handful more blocks than cores. Ray's own default over-fragments tiny files
    into hundreds of near-empty blocks and every downstream shuffle pays
    per-block overhead; a flat cores-sized override over-fragments them
    too. The row term matters for heavily-compressed row-dense files (an
    aggregation's width follows input blocks). At real scale
    files/row-groups set the floor and this override is a no-op-ish
    hint. One definition shared by every single-file reader (the copies
    had already drifted)."""
    import os

    import pyarrow.parquet as pq
    cores = max(8, int(ray.cluster_resources().get("CPU", 8)))
    try:
        size = os.path.getsize(path)
        rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        # missing file or corrupt footer: fall back to cores and let
        # read_parquet surface the real, diagnosable error
        return cores
    return max(4, min(cores, max((size >> 21) + 1, rows // 8192 + 1)))


def md5_hex_memo(col, prefix: str = "") -> "pa.Array":
    """md5 hex digest per row (``md5(prefix || value)``), hashing each
    DISTINCT value once per batch via dictionary encoding — a templated /
    boilerplate-heavy corpus repeats the same text across many rows, and
    re-hashing every occurrence is the per-row-loop anti-pattern the
    paragraph kernel already fixed. NULL -> NULL (DuckDB md5 semantics);
    ``pc.take`` propagates the null indices. Shared by the sampling
    family (``functions/sessions.py``) and ``functions/web.crawl_delta``."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.cast(col, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    hs = [hashlib.md5((prefix + v).encode("utf-8")).hexdigest()
          for v in d.dictionary.to_pylist()]
    return pc.take(pa.array(hs, pa.string()), d.indices)
