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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_HASHES = 4
# odd multipliers for the universal-hash family h_k(x) = A_k * x + B_k (mod 2^64)
_A = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
               0xD6E8FEB86659FD93, 0xA24BAED4963EE407], dtype=np.uint64)
_B = np.array([0x165667B19E3779F9, 0x27D4EB2F165667C5,
               0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D], dtype=np.uint64)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _token_hashes(flat: pa.Array) -> np.ndarray:
    import polars as pl
    if len(flat) == 0:
        return np.zeros(0, dtype=np.uint64)
    s = pl.from_arrow(flat)
    return s.hash(seed=0).to_numpy().astype(np.uint64)


def fused_text_analysis(batch: pa.Table, n_hashes: int = N_HASHES,
                        include_simhash: bool = True,
                        include_stats: bool = True) -> pa.Table:
    """(doc_id, text) -> (doc_id[, n_tokens, n_unique_tokens][, simhash],
    m0..m{n-1}). The include_* flags let single-purpose callers (e.g. the
    LSH band path, which only needs MinHash) skip the other sections'
    compute."""
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
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
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

    # ---- SimHash: per-row sum of (2*bit-1) per bit position of token hashes
    sim = np.zeros(n, dtype=np.uint64)
    if include_simhash and len(th):
        acc = np.zeros((n, 64), dtype=np.int64)
        for j in range(64):
            bit = ((th >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            acc[:, j] = np.bincount(row_idx, weights=2 * bit - 1,
                                    minlength=n).astype(np.int64)
        sim = ((acc > 0).astype(np.uint64)
               << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)

    # ---- MinHash over 3-gram shingle hashes
    with np.errstate(over="ignore"):
        if len(th) >= 3:
            same = (row_idx[:-2] == row_idx[2:])
            sh = (th[:-2] * _MIX1 + th[1:-1] * _MIX2 + th[2:])[same]
            srow = row_idx[:-2][same]
        else:
            sh = np.zeros(0, dtype=np.uint64)
            srow = np.zeros(0, dtype=np.int64)
        # short rows (< 3 tokens, >= 1 token): whole-row mix as one shingle
        short = (lengths > 0) & (lengths < 3)
        if short.any():
            extra = np.zeros(int(short.sum()), dtype=np.uint64)
            srt = np.flatnonzero(short)
            starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
            for i, row in enumerate(srt):
                seg = th[starts[row]:starts[row] + lengths[row]]
                v = np.uint64(0)
                for x in seg:
                    v = v * _MIX1 + x
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
                hk = sh * _A[k] + _B[k]
                mins[k, rows_present] = np.minimum.reduceat(hk, boundaries)
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


def minhash_lsh_pairs_fast(docs, bands: int = 2,
                           shuffle_partitions=None):
    """LSH candidate pairs over the fast u64 signatures (2 bands x 2 rows
    for the default 4 hashes) — same hot-bucket-prefilter shape as
    :func:`kg_gen_ray.functions.dedup.minhash_lsh_pairs`."""
    import ray
    from ray.data.aggregate import Count

    from kg_gen_ray.stages.common import coalesce
    from kg_gen_ray.stages.rewrite import distinct

    if bands < 1 or N_HASHES % bands != 0:
        raise ValueError(
            f"bands must be a positive divisor of {N_HASHES}, got {bands}")
    rows_per_band = N_HASHES // bands

    def band_rows(t: pa.Table) -> pa.Table:
        # MinHash only: skip the SimHash / token-stat sections
        sig = fused_text_analysis(t, include_simhash=False,
                                  include_stats=False)
        n = sig.num_rows
        with np.errstate(over="ignore"):
            doc = sig["doc_id"].to_numpy(zero_copy_only=False)
            out_band, out_key, out_doc = [], [], []
            for b in range(bands):
                key = np.zeros(n, dtype=np.uint64)
                for r in range(rows_per_band):
                    key = key * _MIX1 + \
                        sig[f"m{b * rows_per_band + r}"].to_numpy(
                            zero_copy_only=False).astype(np.uint64)
                key = key * _A[b % N_HASHES] + _B[b % N_HASHES]
                out_band.append(np.full(n, b, dtype=np.int32))
                out_key.append(key)
                out_doc.append(doc)
        return pa.table({
            "band": pa.array(np.concatenate(out_band), pa.int32()),
            "band_key": pa.array(np.concatenate(out_key), pa.uint64()),
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
        })

    rows = coalesce(docs.map_batches(band_rows, batch_format="pyarrow"),
                    shuffle_partitions).materialize()

    hot = rows.groupby(["band", "band_key"]).aggregate(
        Count(alias_name="n"))
    hot_keys = {(r["band"], r["band_key"]) for r in hot.take_all()
                if r["n"] >= 2}
    ref = ray.put(hot_keys)

    def only_hot(t: pa.Table, ref=ref) -> pa.Table:
        keys = ray.get(ref)
        mask = pa.array([(b, k) in keys
                         for b, k in zip(t["band"].to_pylist(),
                                         t["band_key"].to_pylist())])
        return t.filter(mask)

    import pandas as pd

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = rows.map_batches(only_hot, batch_format="pyarrow") \
        .groupby(["band", "band_key"]).map_groups(pair_up,
                                                  batch_format="pandas")
    return distinct(pairs, ["doc_a", "doc_b"], shuffle_partitions)
