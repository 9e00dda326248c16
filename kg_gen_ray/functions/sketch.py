"""Mergeable cardinality sketch — HyperLogLog as a combiner aggregate.

The sketch-combiner shape the 100 TB path needs for "how many distinct X"
questions where an exact `groupby(X).count()` would shuffle every row:
each batch folds its values into a 2^p-register HLL (numpy-vectorized),
register arrays merge associatively (elementwise max), and the estimate is
computed once from the merged registers. Error ~1.04/sqrt(2^p) (~1.6% at
p=12). Exact distinct (`rewrite.distinct`) remains the correctness path;
this is the constant-memory approximation.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

P = 12                       # 4096 registers -> ~1.6% standard error
M = 1 << P


def _hashes(values: list, fast: bool = False) -> np.ndarray:
    """Value -> uint64 hash. Default is the md5-prefix family
    (``('0x'||substr(md5(v),1,16))::UBIGINT`` in DuckDB) so the whole
    sketch — registers, integer register sum, estimate — is
    oracle-replicable bit-for-bit. ``fast=True`` swaps in the polars/Rust
    64-bit hash (~10x cheaper per value) when parity doesn't matter; only
    the hash family changes, never the sketch machinery."""
    if not values:
        return np.zeros(0, dtype=np.uint64)
    if fast:
        import polars as pl
        s = pl.Series([str(v) for v in values])
        return s.hash(seed=0).to_numpy().astype(np.uint64)
    arr = np.asarray([str(v) for v in values], dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    hu = np.fromiter(
        (int(hashlib.md5(v.encode("utf-8")).hexdigest()[:16], 16)
         for v in uniq), dtype=np.uint64, count=len(uniq))
    return hu[inv]


def _registers(h: np.ndarray) -> np.ndarray:
    """64-bit hashes -> HLL register array (uint8, length M)."""
    regs = np.zeros(M, dtype=np.uint8)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)  # pad low bits
    # rank = leading zeros of `rest` + 1, vectorized via bit length
    # (np.log2 is unsafe at 2^63; use 64 - floor(log2) through the
    #  integer route: highest set bit position)
    bitlen = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bitlen[mask] += shift
        r[mask] >>= np.uint64(shift)
    rank = (64 - bitlen).astype(np.uint8)                 # 1..(64-P+1)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    """Registers -> estimate, ORDER-INDEPENDENTLY: the harmonic register
    sum ``sum(2^-reg)`` is accumulated as the exact integer
    ``T = sum(2^(64-reg))`` (each term a power of two, HUGEINT-sized), so
    every float op left is a single deterministic expression DuckDB
    replays bit-for-bit — float summation order, the thing that diverges
    at scale, never enters."""
    alpha = 0.7213 / (1 + 1.079 / M)
    counts = np.bincount(regs, minlength=1)
    T = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    est = alpha * M * M * 2.0 ** 64 / float(T)
    zeros = int(counts[0])
    if est <= 2.5 * M and zeros:
        est = M * math.log(M / zeros)                     # small-range fix
    return float(est)


def hll_estimate(ds: "ray.data.Dataset", col: str,
                 fast: bool = False) -> float:
    """Raw HLL estimate of COUNT(DISTINCT col): per-batch register
    partials, elementwise-max merge (partials are M bytes each — constant
    memory regardless of input size). With the default md5 hash family the
    returned float is bit-identical to the DuckDB replay of the sketch
    (see the ``approx_distinct_docs`` oracle)."""

    def partial(t: pa.Table) -> pa.Table:
        # drop nulls: SQL COUNT(DISTINCT) excludes them, and str(None)
        # would collide with a literal 'None' value
        vals = pc.cast(t[col], pa.string()).drop_null().to_pylist()
        regs = _registers(_hashes(vals, fast=fast))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(M, dtype=np.uint8)
    for b in ds.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow", batch_size=None):
        for blob in b["regs"].to_pylist():
            merged = np.maximum(merged,
                                np.frombuffer(blob, dtype=np.uint8))
    return _estimate(merged)


def approx_distinct(ds: "ray.data.Dataset", col: str,
                    fast: bool = False) -> int:
    """Approximate COUNT(DISTINCT col), rounded to an int."""
    return round(hll_estimate(ds, col, fast=fast))


def hll_estimate_per_group(ds: "ray.data.Dataset", col: str,
                           group_col: str, fast: bool = False
                           ) -> "ray.data.Dataset":
    """One HLL per GROUP — approximate COUNT(DISTINCT col) GROUP BY
    group_col, the per-host / per-language curation stat ("distinct
    pages per domain", "distinct fingerprints per snapshot") where an
    exact grouped distinct would shuffle every row. Output:
    ``(group_col as string, approx_distinct float)``.

    Scale shape: each batch folds its rows into one M-byte register
    blob PER (group, batch) — the combiner — so the single groupby
    exchange carries O(groups x batches x 4 KB), never rows. Register
    merge is elementwise max (associative/commutative); with the md5
    family the per-group estimate is bit-identical to the DuckDB
    replay (the grouped form of the ``approx_distinct_docs`` oracle).
    Null groups form their own group (SQL GROUP BY), carried through
    the exchange on the same null-free surrogate as every grouped op
    (:func:`kg_gen_ray.functions.sessions._arrow_group_key`); null
    values are excluded (SQL COUNT DISTINCT). Groups are the
    parallelism unit of the merge; a group's merge state is
    O(batches x 4 KB), bounded regardless of row count."""
    import pandas as pd

    from kg_gen_ray.functions.sessions import _arrow_group_key

    def partial(t: pa.Table) -> pa.Table:
        vals = pc.cast(t[col], pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        gk = _arrow_group_key(t[group_col])
        keep = pc.is_valid(vals)        # Array mask: both sides combined
        vals = vals.filter(keep)
        gka = gk.filter(keep).to_numpy(zero_copy_only=False)
        h = _hashes(vals.to_pylist(), fast=fast)
        order = np.argsort(gka, kind="stable")
        gs, hs = gka[order], h[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(first)
        bounds = np.append(starts, len(gs))
        groups, blobs = [], []
        for i, s in enumerate(starts):
            groups.append(gs[s])
            blobs.append(_registers(hs[s:bounds[i + 1]]).tobytes())
        return pa.table({"__gk": pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    def merge(df: pd.DataFrame) -> pa.Table:
        out_g, out_est = [], []
        for g, grp in df.groupby("__gk", sort=True):
            merged = np.zeros(M, dtype=np.uint8)
            for blob in grp["regs"]:
                merged = np.maximum(
                    merged, np.frombuffer(blob, dtype=np.uint8))
            out_g.append(None if g == "n" else g[2:])   # undo surrogate
            out_est.append(_estimate(merged))
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "approx_distinct": pa.array(out_est,
                                                     pa.float64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("__gk").map_groups(merge, batch_format="pandas")


# --- Bloom filter ---------------------------------------------------------
#
# The membership sketch that turns a large-side anti/semi-join into a
# mostly-local filter: build a bitset over the (unbroadcastable) key set,
# ship the COMPACT bitset once via ``ray.put`` (plasma shares it per node,
# zero-copy via np.frombuffer), and let every task split its rows into
# "definitely not in the set" (bloom negative — the guarantee direction,
# no false negatives) and "maybe" (true members + ~FPR of the rest). Only
# the maybe rows pay the exchange; the exact join downstream resolves the
# false positives, so results stay EXACT — the bloom only reduces shuffle
# volume, never changes answers. Saturation degrades gracefully: an
# undersized bitset raises FPR (more rows shuffled), never correctness.

_BLOOM_MAX_BITS = 1 << 31          # 256 MB bitset cap (per-node one copy)


def _splitmix64(x: np.ndarray, const: int) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64 finalizer) — pure numpy, so
    integer keys never touch Python or a hash library."""
    x = (x + np.uint64(const))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_hash_pair(col) -> tuple[np.ndarray, np.ndarray]:
    """Key column -> two independent uint64 hash streams. Integer keys mix
    with splitmix64 (vectorized, process-independent by construction);
    other types go through the polars/Rust seeded hash (deterministic for
    a fixed polars version — a no-false-negative property test pins it)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        if pa.types.is_unsigned_integer(col.type):
            # uint64 keys (e.g. shingle hashes) >= 2^63 would overflow an
            # int64 cast; go straight to the numpy uint64 view
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
        return (_splitmix64(v, 0x9E3779B97F4A7C15),
                _splitmix64(v, 0xD1B54A32D192ED03))
    import polars as pl
    s = pl.from_arrow(pc.cast(col, pa.string()))
    return (s.hash(seed=1).to_numpy().astype(np.uint64),
            s.hash(seed=2).to_numpy().astype(np.uint64))


class BloomFilter:
    """Broadcast Bloom filter handle: plasma ref to the bitset + geometry.
    Picklable into ``map_batches`` closures (the ObjectRef travels by
    reference; the bitset itself ships once per node)."""

    def __init__(self, ref, m_bits: int, n_hashes: int):
        self.ref = ref
        self.m_bits = m_bits            # power of two
        self.n_hashes = n_hashes

    def _probe_indices(self, col):
        h1, h2 = _bloom_hash_pair(col)
        h2 = h2 | np.uint64(1)          # odd stride -> full period mod 2^b
        mask = np.uint64(self.m_bits - 1)
        for i in range(self.n_hashes):
            yield (h1 + np.uint64(i) * h2) & mask

    def contains_mask(self, col) -> pa.Array:
        """Vectorized membership probe: True = maybe in set (guaranteed
        True for every inserted key), False = definitely not. ``ref`` is
        normally a plasma ObjectRef (zero-copy per node); raw bytes are
        accepted too so the sketch tests pure, without a Ray session."""
        if hasattr(self.ref, "hex") and not isinstance(self.ref, bytes):
            import ray as _ray
            blob = _ray.get(self.ref)
        else:
            blob = self.ref
        bits = np.frombuffer(blob, dtype=np.uint8)
        n = len(col)
        out = np.ones(n, dtype=bool)
        if not n:
            return pa.array(out)
        for idx in self._probe_indices(col):
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            shift = (idx & np.uint64(7)).astype(np.uint8)
            out &= ((byte >> shift) & np.uint8(1)).astype(bool)
        return pa.array(out)


def bloom_build(ids: "ray.data.Dataset", col: str,
                bits_per_key: int = 10, n_hashes: int = 7,
                build_partitions: int | None = None) -> "BloomFilter":
    """Distributed Bloom build over a key dataset: per-partition partial
    bitsets (one vectorized pass each), OR-merged on the driver. The ids
    are coalesced to a few partitions first so the driver receives
    O(partitions) bitsets, not O(input blocks). At ~10 bits/key, k=7 the
    FPR is ~0.8%; above ``_BLOOM_MAX_BITS`` keys the bitset saturates and
    the FPR rises (still exact downstream — see module note)."""
    ids = ids.materialize()
    n = max(1, ids.count())
    m = 1 << max(13, int(n * bits_per_key - 1).bit_length())
    m = min(m, _BLOOM_MAX_BITS)
    if build_partitions is None:
        build_partitions = min(
            8, max(2, int(ray.cluster_resources().get("CPU", 8)) // 4))
    if ids.num_blocks() > build_partitions:
        ids = ids.repartition(build_partitions)

    def partial(t: pa.Table, m=m, k=n_hashes) -> pa.Table:
        bits = np.zeros(m // 8, dtype=np.uint8)
        if t.num_rows:
            bf = BloomFilter(None, m, k)
            for idx in bf._probe_indices(t[col]):
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(3)).astype(np.int64),
                    np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m // 8, dtype=np.uint8)
    for b in ids.map_batches(partial,
                             batch_format="pyarrow").iter_batches(
                                 batch_format="pyarrow", batch_size=None):
        for blob in b["bits"].to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint8)
    return BloomFilter(ray.put(merged.tobytes()), m, n_hashes)


# --- Misra-Gries heavy hitters -------------------------------------------

def _mg_compress(counts: dict, capacity: int) -> dict:
    """Keep <= capacity counters: subtract the (capacity+1)-th largest
    count from every counter and drop the non-positive ones (the batched
    equivalent of Misra-Gries decrements). Each surviving counter
    undercounts by at most the total subtracted so far."""
    if len(counts) <= capacity:
        return counts
    cut = sorted(counts.values(), reverse=True)[capacity]
    return {v: c - cut for v, c in counts.items() if c > cut}


def heavy_hitters(ds: "ray.data.Dataset", col: str,
                  capacity: int = 256) -> list:
    """Approximate most-frequent values of ``col``: (value, min_count,
    max_count) triples, sorted by min_count descending.

    The hot-key detector for the 100 TB path (what tells a pipeline which
    keys need salting BEFORE the shuffle that would melt on them): each
    block folds into a capacity-bounded Misra-Gries summary via one
    vectorized ``value_counts`` + compress, the per-block summaries (each
    <= capacity rows — sketch-sized, like the HLL register blobs) merge
    by counter addition + re-compress, and the guarantee is the standard
    MG one — every value with true frequency > n/capacity survives, and
    true_count is within [min_count, max_count] = [c, c + total_error].
    Exact top-k by count stays ``groupby(col).count()`` + sort; this is
    the single-pass constant-memory scan."""

    def partial(t: pa.Table) -> pa.Table:
        nonnull = pc.cast(t[col], pa.string()).drop_null()
        vc = pc.value_counts(nonnull)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        # vectorized compress: only the <= capacity survivors are ever
        # materialized as Python objects, not the whole batch vocabulary
        if len(cnts) > capacity:
            cut = np.partition(cnts, -capacity - 1)[-capacity - 1]
            keep = cnts > cut
            vals = vc.field("values").filter(pa.array(keep)).to_pylist()
            kept = (cnts[keep] - cut).tolist()
        else:
            vals = vc.field("values").to_pylist()
            kept = cnts.tolist()
        if not vals:   # all-null batch, or compress dropped everything
            vals, kept = [""], [0]
        return pa.table({
            "value": pa.array(vals, pa.string()),
            "cnt": pa.array(kept, pa.int64()),
            "n_rows": pa.array([len(nonnull)] + [0] * (len(vals) - 1),
                               pa.int64()),
        })

    merged: dict = {}
    n_total = 0
    for b in ds.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow", batch_size=None):
        n_total += int(pc.sum(b["n_rows"]).as_py() or 0)
        for v, c in zip(b["value"].to_pylist(), b["cnt"].to_pylist()):
            if c > 0:
                merged[v] = merged.get(v, 0) + c
        merged = _mg_compress(merged, capacity)
    # max undercount = rows seen - mass retained
    err = n_total - sum(merged.values())
    return sorted(((v, c, c + err) for v, c in merged.items()),
                  key=lambda t: (-t[1], t[0]))
