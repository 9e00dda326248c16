"""Fused, fully-vectorized text analysis — the scale path.

One tokenization pass per batch feeding three outputs (token stats, SimHash,
MinHash signatures) with zero per-row Python:

* tokens: ``pyarrow.compute.split_pattern`` (Arrow C++),
* token hashes: ``polars.Series.hash`` (vectorized 64-bit, Rust),
* SimHash: 64 weighted-bit bincounts over the token-hash bits,
* MinHash: 3-gram shingle hashes = a multiply-mix of 3 consecutive token
  hashes (numpy uint64 wraparound), ``n_hashes`` universal-hash variants,
  per-row minima via ``np.minimum.reduceat``.

Relationship to :mod:`kg_gen_ray.functions.dedup`: that module's md5
hex-string MinHash/SimHash are the *oracle-parity* operators (DuckDB can
reproduce them bit-for-bit, which is what the correctness gate needs).
This module is what a 100 TB run uses — same algorithmic structure, u64
arithmetic instead of cryptographic-hash strings. Hashes are deterministic
for a fixed polars version (ahash with a fixed seed); signatures are
engine-internal values, not a cross-system interchange format.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module-level (pickle-by-value compatibility)
from kg_gen_ray.stages.common import dual_limit  # noqa: E402

N_HASHES = 4
# odd multipliers for the universal-hash family h_k(x) = A_k * x + B_k (mod 2^64)
_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
               0xD6E8FEB86659FD93, 0xA24BAED4963EE407], dtype=np.uint64)
_B = np.array([0x165667B19E3779F9, 0x27D4EB2F165667C5,
               0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D], dtype=np.uint64)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
# (256, 8) bit-decomposition table: _BYTE_BITS[v, j] = bit j of byte v
_BYTE_BITS = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1) \
    .astype(np.int64)


def _token_hashes(flat: pa.Array) -> np.ndarray:
    import polars as pl
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64)
    s = pl.from_arrow(flat)
    return s.hash(seed=0).to_numpy().astype(np.uint64)


# Internal slice width for the fused pass: per-slice transients (token-
# hash arrays, lexsort buffers, the (slice, 256) SimHash histograms) stay
# a few MB — L2/L3-resident — instead of scaling with the block size.
# With full ~12.5k-row blocks the ~100 MB-per-worker allocation churn
# page-faults pathologically on ballooned-memory VMs and saturates
# memory bandwidth at high worker counts (measured 32-CPU wall 11-20s ->
# ~7s at 400k pages from this slicing alone); slices are zero-copy.
_FUSE_SLICE = 512


def fused_text_analysis(batch: pa.Table, n_hashes: int = N_HASHES,
                        include_simhash: bool = True,
                        include_stats: bool = True) -> pa.Table:
    """(doc_id, text) -> (doc_id[, n_tokens, n_unique_tokens][, simhash],
    m0..m{n-1}). The include_* flags let single-purpose callers (e.g. the
    LSH band path, which only needs MinHash) skip the other sections'
    compute. Internally processes ``_FUSE_SLICE``-row zero-copy slices so
    transient allocations stay cache-sized for any incoming block size."""
    if batch.num_rows > _FUSE_SLICE:
        return pa.concat_tables([
            _fused_slice(batch.slice(lo, _FUSE_SLICE), n_hashes,
                         include_simhash, include_stats)
            for lo in range(0, batch.num_rows, _FUSE_SLICE)])
    return _fused_slice(batch, n_hashes, include_simhash, include_stats)


def _fused_slice(batch: pa.Table, n_hashes: int,
                 include_simhash: bool, include_stats: bool) -> pa.Table:
    n = batch.num_rows
    doc_id = pc.cast(batch["doc_id"], pa.int64())
    if n == 0:
        cols = {"doc_id": doc_id}
        if include_stats:
            cols["n_tokens"] = pa.array([], pa.int64())
            cols["n_unique_tokens"] = pa.array([], pa.int64())
        if include_simhash:
            cols["simhash"] = pa.array([], pa.uint64())
        for k in range(n_hashes):
            cols[f"m{k}"] = pa.array([], pa.uint64())
        return pa.table(cols)

    toks = pc.split_pattern(pc.cast(batch["text"], pa.string()), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = np.nan_to_num(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        nan=0).astype(np.int64)    # null text -> 0 tokens
    flat = toks.flatten()
    th = _token_hashes(flat)
    row_idx = np.repeat(np.arange(n), lengths)

    # ---- token stats: unique-per-row via sorted (row, hash) boundaries
    n_unique = np.zeros(n, dtype=np.int64)
    if include_stats and len(th):
        order = np.lexsort((th, row_idx))
        r, h = row_idx[order], th[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        np.add.at(n_unique, r[new], 1)

    # ---- SimHash: majority vote per bit position of token hashes
    # (bit j of the result is set iff more than half the row's tokens have
    # bit j set — the sum(2*bit-1) > 0 rule rewritten as 2*count > len).
    # Computed via per-row BYTE-VALUE histograms: one bincount per byte
    # position (8 passes over the token stream instead of 64) and an
    # (n,256)x(256,8) matmul recovers the 8 per-bit counts of that byte —
    # ~5x faster than the previous 64-x-bincount loop at web batch sizes.
    # All temporaries stay small (the histogram is n x 256); a (T,64)
    # unpackbits matrix would be nicer still but large fresh allocations
    # page-fault pathologically on ballooned-memory VMs (measured 18-34s
    # first touch for a 233 MB temp on this host).
    sim = np.zeros(n, dtype=np.uint64)
    if include_simhash and len(th):
        bm = th.view(np.uint8).reshape(-1, 8)      # (T, 8) little-endian
        base = row_idx.astype(np.int64) * 256
        counts = np.empty((n, 64), dtype=np.int64)
        for b in range(8):
            hist = np.bincount(base + bm[:, b],
                               minlength=n * 256).reshape(n, 256)
            counts[:, 8 * b:8 * b + 8] = hist @ _BYTE_BITS
        maj = (2 * counts) > lengths[:, None]
        sim = (maj.astype(np.uint64)
               << np.arange(64, dtype=np.uint64)).sum(axis=1,
                                                      dtype=np.uint64)

    # ---- MinHash over 3-gram shingle hashes
    mins = _minhash_core(th, row_idx, lengths, n, n_hashes,
                         _MIX1, _MIX2, _A, _B)
    # single-space-split semantics: "" tokenizes to one empty token (DuckDB
    # string_split parity), so every row gets >= 1 shingle; the sentinel
    # max remains only as a guard for rows that somehow had zero tokens

    cols = {"doc_id": doc_id}
    if include_stats:
        cols["n_tokens"] = pa.array(lengths)
        cols["n_unique_tokens"] = pa.array(n_unique)
    if include_simhash:
        cols["simhash"] = pa.array(sim, pa.uint64())
    for k in range(n_hashes):
        cols[f"m{k}"] = pa.array(mins[k], pa.uint64())
    return pa.table(cols)


def _shingle_rows(th: np.ndarray, row_idx: np.ndarray,
                  c1: np.uint64, c2: np.uint64):
    """3-gram shingle hashes (``t0*c1 + t1*c2 + t2``, uint64 wraparound)
    restricted to within-row windows, plus each shingle's row id — the
    shared front half of MinHash signatures and winnowing fingerprints."""
    with np.errstate(over="ignore"):
        if len(th) >= 3:
            same = (row_idx[:-2] == row_idx[2:])
            sh = (th[:-2] * c1 + th[1:-1] * c2 + th[2:])[same]
            srow = row_idx[:-2][same]
        else:
            sh = np.zeros(0, dtype=np.uint64)
            srow = np.zeros(0, dtype=np.int64)
    return sh, srow


def _minhash_core(th: np.ndarray, row_idx: np.ndarray, lengths: np.ndarray,
                  n: int, n_hashes: int, c1: np.uint64, c2: np.uint64,
                  A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Shared vectorized MinHash: token hashes -> 3-gram shingle hashes
    (``t0*c1 + t1*c2 + t2`` in uint64 wraparound) -> ``n_hashes`` affine
    variants -> per-row minima via ``np.minimum.reduceat``. Short rows
    (1-2 tokens) contribute one whole-row fold ``v = v*c1 + t``. Returns
    a ``(n_hashes, n)`` uint64 matrix (sentinel max for zero-token rows).
    """
    sh, srow = _shingle_rows(th, row_idx, c1, c2)
    with np.errstate(over="ignore"):
        short = (lengths > 0) & (lengths < 3)
        if short.any():
            extra = np.zeros(int(short.sum()), dtype=np.uint64)
            srt = np.flatnonzero(short)
            starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
            for i, row in enumerate(srt):
                seg = th[starts[row]:starts[row] + lengths[row]]
                v = np.uint64(0)
                for x in seg:
                    v = v * c1 + x
                extra[i] = v
            sh = np.concatenate([sh, extra])
            srow = np.concatenate([srow, srt])
            order = np.argsort(srow, kind="stable")
            sh, srow = sh[order], srow[order]

        mins = np.full((n_hashes, n), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        if len(sh):
            boundaries = np.flatnonzero(
                np.concatenate([[True], srow[1:] != srow[:-1]]))
            rows_present = srow[boundaries]
            for k in range(n_hashes):
                hk = sh * A[k] + B[k]
                mins[k, rows_present] = np.minimum.reduceat(hk, boundaries)
    return mins


# ---------------------------------------------------------------------------
# oracle-parity fast MinHash (md5-u32 tokens + u64 affine family)
# ---------------------------------------------------------------------------
# Same vectorized structure as the ahash path above, but every constant is
# sized so DuckDB can replay the arithmetic bit-for-bit: token hash = first
# 8 hex chars of md5(token) (a uint32), so `tok*C1` fits INT128 even with a
# 64-bit C1, and the per-shingle affine variants use 32-bit odd multipliers
# so `shingle*Ak` fits INT128 too. numpy computes everything as native
# uint64 wraparound; DuckDB computes HUGEINT `% 2^64` — modular arithmetic
# makes the two identical. One md5 per UNIQUE token per batch (vocabulary-
# sized, not token-stream-sized) is the only Python loop.

_OC1 = np.uint64(0x9E3779B97F4A7C15)
_OC2 = np.uint64(0xC2B2AE3D27D4EB4F)
_OA = np.array([0x9E3779B9, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F],
               dtype=np.uint64)   # 32-bit odd multipliers
_OB = np.array([0x165667B1, 0xD3A2646D, 0xFD7046C5, 0xB55A4F09],
               dtype=np.uint64)


# per-process token->hash memo: md5 runs once per distinct token per
# WORKER (not per batch/slice) — on templated web corpora the shared
# vocabulary dominates the token stream, so this converts the md5 family's
# main cost into a dict lookup. Bounded: reset when it outgrows the cap
# (vocabularies that large no longer fit cache anyway).
_MD5_MEMO: dict = {}
_MD5_MEMO_CAP = 1 << 20


def _md5_u32_hashes(flat: pa.Array) -> np.ndarray:
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # dictionary-encode FIRST (C hash pass): only the distinct tokens
    # ever become Python strings — the old to_pylist + np.unique path
    # materialized every occurrence as an object before deduping
    d = flat.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    if len(_MD5_MEMO) > _MD5_MEMO_CAP:
        _MD5_MEMO.clear()
    memo = _MD5_MEMO
    hu = np.fromiter(
        (memo.get(t) if t in memo else memo.setdefault(
            t, int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16))
         for t in uniq), dtype=np.uint64, count=len(uniq))
    return hu[d.indices.to_numpy(zero_copy_only=False)]


def _sliced(fn, batch: pa.Table, *args) -> pa.Table:
    """Run a per-row-independent table UDF over ``_FUSE_SLICE``-row
    zero-copy slices (see the allocation note at ``_FUSE_SLICE``)."""
    if batch.num_rows > _FUSE_SLICE:
        return pa.concat_tables([
            fn(batch.slice(lo, _FUSE_SLICE), *args)
            for lo in range(0, batch.num_rows, _FUSE_SLICE)])
    return fn(batch, *args)


def _signatures_impl(batch: pa.Table, n_hashes: int,
                     token_hash_fn) -> pa.Table:
    return _sliced(_signatures_slice, batch, n_hashes, token_hash_fn)


def _signatures_slice(batch: pa.Table, n_hashes: int,
                      token_hash_fn) -> pa.Table:
    n = batch.num_rows
    doc_id = pc.cast(batch["doc_id"], pa.int64())
    if n == 0:
        cols = {"doc_id": doc_id}
        for k in range(n_hashes):
            cols[f"m{k}"] = pa.array([], pa.uint64())
        return pa.table(cols)
    toks = pc.split_pattern(pc.cast(batch["text"], pa.string()), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = np.nan_to_num(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        nan=0).astype(np.int64)    # null text -> 0 tokens
    th = token_hash_fn(toks.flatten())
    row_idx = np.repeat(np.arange(n), lengths)
    mins = _minhash_core(th, row_idx, lengths, n, n_hashes,
                         _OC1, _OC2, _OA, _OB)
    cols = {"doc_id": doc_id}
    for k in range(n_hashes):
        cols[f"m{k}"] = pa.array(mins[k], pa.uint64())
    return pa.table(cols)


def minhash_signatures_fast(batch: pa.Table,
                            n_hashes: int = N_HASHES) -> pa.Table:
    """(doc_id, m0..m{n-1}) uint64 MinHash signatures — the oracle-checkable
    scale path (see the family comment above). This is what
    :func:`kg_gen_ray.functions.dedup.near_dup_canonical` composes on; the
    md5-hex-string signatures in ``dedup.minhash_signatures`` remain as the
    reference-parity variant."""
    return _signatures_impl(batch, n_hashes, _md5_u32_hashes)


def minhash_signatures_ahash(batch: pa.Table,
                             n_hashes: int = N_HASHES) -> pa.Table:
    """Maximum-throughput signature family: the polars/Rust token hash in
    place of the md5-u32 family (~10x on the tokenize-hash stage), same
    shingle/affine machinery. NOT DuckDB-replayable — plug into
    ``minhash_lsh_pairs_fast(signatures=...)`` or
    ``StreamingDedupIndex(signatures=...)`` when oracle parity doesn't
    matter; keep BOTH sides of any comparison on one family (families
    never collide with each other)."""
    return _signatures_impl(batch, n_hashes, _token_hashes)


def winnow_fingerprints(batch: pa.Table, window: int = 4) -> pa.Table:
    """MOSS-style winnowing document fingerprints over the oracle-parity
    u64 shingle hashes: the distinct set of per-window minima of every
    ``window`` consecutive 3-gram shingle hashes. Output is exploded
    (doc_id, fp) rows — the standard plagiarism/near-dup fingerprint set,
    ~1/window the size of the full shingle set with guaranteed coverage
    of every window.

    Vectorized: the sliding-window minimum is ``window-1`` shifted
    ``np.minimum`` passes (window is a small constant); dedup per doc via
    the same sorted-boundary trick as the token stats. Rows with fewer
    shingles than ``window`` contribute the min of what they have."""
    return _sliced(_winnow_slice, batch, window)


def _winnow_slice(batch: pa.Table, window: int) -> pa.Table:
    n = batch.num_rows
    doc_id = pc.cast(batch["doc_id"], pa.int64())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "fp": pa.array([], pa.uint64())})
    if n == 0:
        return empty
    toks = pc.split_pattern(pc.cast(batch["text"], pa.string()), " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = np.nan_to_num(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        nan=0).astype(np.int64)    # null text -> 0 tokens
    th = _md5_u32_hashes(toks.flatten())
    row_idx = np.repeat(np.arange(n), lengths)
    sh, srow = _shingle_rows(th, row_idx, _OC1, _OC2)
    if not len(sh):
        return empty

    # sliding min of `window` consecutive shingles WITHIN a row: shift
    # and fold; positions whose window crosses a row boundary are dropped,
    # but every row keeps at least its first in-row window (short rows:
    # the min of all their shingles)
    m = sh.copy()
    for d in range(1, window):
        shifted = np.full_like(sh, np.iinfo(np.uint64).max)
        shifted[:-d] = sh[d:]
        same_row = np.zeros(len(sh), dtype=bool)
        same_row[:-d] = srow[d:] == srow[:-d]
        m = np.where(same_row, np.minimum(m, shifted), m)
    # window start positions: those with `window` in-row shingles, OR the
    # first position of a row shorter than `window`
    starts = np.flatnonzero(
        np.concatenate([[True], srow[1:] != srow[:-1]]))
    row_len = np.diff(np.concatenate([starts, [len(sh)]]))
    keep = np.zeros(len(sh), dtype=bool)
    for s, ln in zip(starts, row_len):
        if ln >= window:
            keep[s:s + ln - window + 1] = True
        else:
            keep[s] = True
            # short row: m[s] currently folds only in-row values (the
            # same_row guard stopped at the boundary) — but only over
            # `window` shifts; recompute exactly as min of the whole row
            m[s] = sh[s:s + ln].min()

    out_row = srow[keep]
    out_fp = m[keep]
    order = np.lexsort((out_fp, out_row))
    out_row, out_fp = out_row[order], out_fp[order]
    new = np.ones(len(out_row), dtype=bool)
    new[1:] = (out_row[1:] != out_row[:-1]) | (out_fp[1:] != out_fp[:-1])
    out_row, out_fp = out_row[new], out_fp[new]

    did = doc_id.to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(did[out_row], pa.int64()),
        "fp": pa.array(out_fp, pa.uint64()),
    })


def band_keys_from_sig(sig: pa.Table,
                       n_hashes: int = N_HASHES) -> pa.Table:
    """u64 signature table -> LSH band rows ``(band_key, doc_id)``:
    band key = ``(m_lo * OA[b] + m_hi + OB[b]) mod 2^64`` — one uint64
    column per (doc, band), no per-row Python. Shared by the batch LSH
    pairing (:func:`minhash_lsh_pairs_fast`) and the streaming dedup
    index (``state/dedup_index.py``), which must agree bit-for-bit so a
    streamed increment collides with the same buckets a batch run
    would."""
    bands = n_hashes // 2
    with np.errstate(over="ignore"):
        doc = sig["doc_id"].to_numpy(zero_copy_only=False)
        out_key, out_doc = [], []
        for b in range(bands):
            lo = sig[f"m{2 * b}"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            hi = sig[f"m{2 * b + 1}"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            out_key.append(lo * _OA[b] + hi + _OB[b])
            out_doc.append(doc)
    return pa.table({
        "band_key": pa.array(np.concatenate(out_key), pa.uint64()),
        "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
    })


def minhash_lsh_pairs_fast(docs, shuffle_partitions=None,
                           signatures=minhash_signatures_fast,
                           broadcast_limit: int = 64 * 1024 * 1024,
                           pair_mode: str = "all"):
    """LSH candidate pairs over u64 signatures (2 bands x 2 rows for the
    default 4 hashes) — distinct (doc_a, doc_b), doc_a < doc_b.

    Band key = ``(m_lo * OA[b] + m_hi + OB[b]) mod 2^64`` — one uint64
    column, no per-row Python anywhere. Size-selected pairing dual: a
    tiny band-rows table (16 bytes/doc/band — the materialize tells us)
    is paired on the driver in one numpy sort, skipping three shuffle
    stages whose fixed cost would dominate; at scale, hot buckets
    (>= 2 docs) are found by a vectorized Count aggregate FILTERED
    DISTRIBUTED (``n >= 2``) before the driver collects the (tiny by
    construction) hot-key set — the full bucket-count table never leaves
    the cluster — and pairing runs as a per-bucket groupby.
    ``signatures`` is pluggable (default: the oracle-parity md5-u32
    family; pass a polars-ahash wrapper for maximum throughput where
    oracle reproducibility is not needed).

    ``pair_mode``: ``"all"`` (default) emits every in-bucket pair — the
    oracle-comparable candidate list, O(b^2) per bucket; ``"chain"``
    links consecutive sorted ids only — O(b) pairs with IDENTICAL
    connected components, which is all a dedup-canonical consumer needs.
    On a template-dominated corpus (one bucket holding 10^5 docs) "all"
    is 5*10^9 pairs and "chain" is 10^5; use "chain" for anything that
    feeds a components pass."""
    import ray
    from ray.data.aggregate import Count

    from kg_gen_ray.stages.common import (
        coalesce, compact_if_small, dual_limit, in_set_mask)
    from kg_gen_ray.stages.rewrite import distinct

    bands = N_HASHES // 2   # 2 rows per band

    def band_rows(t: pa.Table) -> pa.Table:
        return band_keys_from_sig(signatures(t))

    # compact_if_small: AQE-style — a small corpus's band rows collapse to
    # a few blocks so the two downstream groupbys don't pay per-block
    # shuffle overhead; a 100 TB corpus's rows stay at input width
    rows = compact_if_small(
        coalesce(docs.map_batches(band_rows, batch_format="pyarrow"),
                 shuffle_partitions).materialize())

    if (rows.size_bytes() or 0) <= dual_limit(broadcast_limit):
        keys_np, docs_np = [], []
        for b in rows.iter_batches(batch_format="pyarrow", batch_size=None):
            keys_np.append(b["band_key"].to_numpy(zero_copy_only=False))
            docs_np.append(b["doc_id"].to_numpy(zero_copy_only=False))
        if not keys_np:
            return ray.data.from_arrow(pa.table({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64())}))
        k = np.concatenate(keys_np)
        d = np.concatenate(docs_np).astype(np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        if pair_mode == "chain":
            # consecutive distinct ids within a bucket (sorted, so equal
            # ids are contiguous and every distinct neighbor is adjacent)
            # — fully vectorized, O(rows) output
            m = (k[1:] == k[:-1]) & (d[1:] != d[:-1])
            stacked = np.stack([d[:-1][m], d[1:][m]], axis=1)
            uniq = np.unique(stacked, axis=0) if len(stacked) \
                else stacked.reshape(0, 2)
            return ray.data.from_arrow(pa.table({
                "doc_a": pa.array(uniq[:, 0], pa.int64()),
                "doc_b": pa.array(uniq[:, 1], pa.int64())}))
        bnd = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        sizes = np.diff(np.concatenate([bnd, [len(k)]]))
        seen = set()
        out_a, out_b = [], []
        for start, sz in zip(bnd[sizes >= 2], sizes[sizes >= 2]):
            ids = d[start:start + sz]
            for i in range(sz):
                for j in range(i + 1, sz):
                    p = (int(ids[i]), int(ids[j]))
                    if p[0] != p[1] and p not in seen:
                        seen.add(p)
                        out_a.append(p[0])
                        out_b.append(p[1])
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64())}))

    # distributed n>=2 filter FIRST; the full bucket-count table never
    # reaches the driver. The hot-key restriction is itself
    # size-selected: tiny hot set -> driver collect + broadcast;
    # dup-heavy crawl (hot set is O(duplicated-doc clusters), above the
    # broadcast budget) -> hash semi-join against hot_ds, hot keys never
    # leave the cluster (same dual as jaccard_verify's candidate
    # restriction; KG_FORCE_JOIN_DUALS=1 exercises it at test scale).
    # The uint64 key is bit-viewed as int64 first: Ray's aggregate emits
    # uint64 group keys as a pickled-object extension column, which the
    # pyarrow hash join cannot key on — the int64 VIEW is a bijection, so
    # grouping, hotness, and the pair set are unchanged.
    def _i64(t: pa.Table) -> pa.Table:
        return pa.table({
            "band_key": t["band_key"].combine_chunks().view(pa.int64()),
            "doc_id": t["doc_id"],
        })

    rows = rows.map_batches(_i64, batch_format="pyarrow").materialize()
    hot_ds = rows.groupby("band_key").aggregate(Count(alias_name="n")) \
                 .filter(expr="n >= 2").select_columns(["band_key"]) \
                 .materialize()
    if (hot_ds.size_bytes() or 0) <= dual_limit(broadcast_limit):
        hot = {r["band_key"] for r in hot_ds.take_all()}
        if not hot:
            return ray.data.from_arrow(pa.table({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64())}))
        ref = ray.put(hot)

        def only_hot(t: pa.Table, ref=ref) -> pa.Table:
            return t.filter(in_set_mask(t["band_key"], ref))

        rows = rows.map_batches(only_hot, batch_format="pyarrow")
    else:
        # repartition normalizes the aggregate lineage's schemaless empty
        # partitions before the pyarrow join; the band rows were about to
        # shuffle on band_key for the pairing groupby anyway
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
        rows = rows.select_columns(["band_key", "doc_id"]) \
                   .repartition(n_parts) \
                   .join(hot_ds.repartition(n_parts), join_type="inner",
                         on=("band_key",), num_partitions=n_parts)

    import pandas as pd

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        # set(): a doc whose two band keys collide appears twice in one
        # group — without dedup the group would emit a (x, x) self-pair,
        # violating doc_a < doc_b and diverging from the driver dual
        ids = sorted(set(g["doc_id"].tolist()))
        if pair_mode == "chain":
            return pd.DataFrame({"doc_a": ids[:-1], "doc_b": ids[1:]})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = rows.groupby("band_key").map_groups(pair_up,
                                                batch_format="pandas")
    return distinct(pairs, ["doc_a", "doc_b"], shuffle_partitions)
