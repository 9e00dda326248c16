"""Product quantization — the memory-scale path for similarity search.

At 10^12 documents a float32 embedding table (d=768 -> 3 KB/vector) is
~3 PB; PQ compresses each vector to ``m`` uint8 codes (one per subspace,
256 centroids each) — 8-96x smaller — and searches with asymmetric
distance computation (ADC): the query builds an (m, 256) lookup table
once, and a candidate's approximate dot product is ``m`` table lookups
summed, no float decode of the corpus anywhere. The standard IVF-PQ
recipe (Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS default) re-expressed Ray-Data-first:

* **train** on a driver-side SAMPLE (codebooks are (m, 256, d/m) — a few
  hundred KB; FAISS likewise trains on a sample, and shipping the sample
  beats an m*k-way distributed k-means for state this small),
* **encode** as a streaming ``map_batches`` (one matmul per subspace per
  batch, output a fixed-width binary column — Arrow-friendly, spillable),
* **search** with the same partial-top-k-per-block + driver-merge shape
  as :func:`kg_gen_ray.functions.ann.brute_force_topk` — only k rows
  leave each block.

Scores are inner products on L2-normalized inputs (= cosine); exactness
is bounded by quantization error, so recall is tested against the exact
path, not equality.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

# module-level (pickle-by-value compatibility)
from kg_gen_ray.functions.ann import _drop_null_vectors, _mat


def _nearest_centroid(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_j ||x - c_j||^2 per row, via the expansion trick (ties ->
    lowest centroid id, numpy argmin semantics). The ONE distance kernel
    shared by training, encoding and probe selection — assignment and
    search must rank lists by the same metric or probing systematically
    misses the lists that hold the true neighbors."""
    d2 = ((x ** 2).sum(1)[:, None] - 2.0 * (x @ cents.T)
          + (cents ** 2).sum(1)[None, :])
    return np.argmin(d2, axis=1)


def _codes_column(codes: np.ndarray) -> pa.Array:
    """(n, m) uint8 -> fixed_size_binary(m) column, one buffer copy, no
    per-row Python."""
    n, m = codes.shape
    return pa.Array.from_buffers(
        pa.binary(m), n, [None, pa.py_buffer(np.ascontiguousarray(codes)
                                             .tobytes())])


def _codes_matrix(col: "pa.ChunkedArray | pa.Array", m: int) -> np.ndarray:
    """fixed_size_binary(m) column -> (n, m) uint8 view, zero-copy off
    the Arrow data buffer."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    return data[arr.offset * m:(arr.offset + len(arr)) * m] \
        .reshape(len(arr), m)


def _lloyd(x: np.ndarray, k: int, n_iter: int, seed: int) -> np.ndarray:
    """Plain numpy Lloyd's over a sample -> (k, d) centroids,
    deterministic via the seeded generator."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(n_iter):
        assign = _nearest_centroid(x, cents)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def pq_train(embeddings: "ray.data.Dataset", m: int = 4,
             n_centroids: int = 256, sample_rows: int = 16384,
             n_iter: int = 10, seed: int = 0,
             col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks -> (m, n_centroids, d//m) float64.
    ``d`` must divide by ``m``. The sample is the dataset's leading rows
    (deterministic); pass a pre-shuffled/hash-sampled dataset when the
    leading rows aren't representative."""
    if n_centroids > 256:
        raise ValueError(
            f"n_centroids={n_centroids} > 256: codes are uint8 (one byte "
            "per subspace); encoding would silently wrap indices mod 256 "
            "and corrupt every search result")
    sample = _mat(pa.table({col: pa.array(
        [r[col] for r in _drop_null_vectors(embeddings, col)
         .limit(sample_rows).take_all()])}), col)
    n, d = sample.shape
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack([
        _lloyd(sample[:, i * sub:(i + 1) * sub], n_centroids,
               n_iter, seed + i)
        for i in range(m)])


def pq_encode(embeddings: "ray.data.Dataset", codebooks: np.ndarray,
              id_col: str = "vec_id", col: str = "embedding"
              ) -> "ray.data.Dataset":
    """(id, codes) with ``codes`` an m-byte binary column — each byte the
    nearest centroid of that subspace. One (n, 256) matmul per subspace
    per batch; codebooks broadcast once via ``ray.put``."""
    embeddings = _drop_null_vectors(embeddings, col)
    cb_ref = ray.put(codebooks)
    m, _k, sub = codebooks.shape

    def encode(t: pa.Table, cb_ref=cb_ref) -> pa.Table:
        cb = ray.get(cb_ref)
        x = _mat(t, col)
        if not x.shape[0]:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "codes": pa.array([], pa.binary(m))})
        codes = np.empty((x.shape[0], m), dtype=np.uint8)
        for i in range(m):
            codes[:, i] = _nearest_centroid(
                x[:, i * sub:(i + 1) * sub], cb[i]).astype(np.uint8)
        return pa.table({
            id_col: pa.array(
                t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            "codes": _codes_column(codes),
        })

    return embeddings.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes_ds: "ray.data.Dataset", codebooks: np.ndarray,
            query: np.ndarray, k: int = 10,
            id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k over encoded vectors: build the (m, 256) query-to-
    centroid inner-product table once, score each batch with vectorized
    table lookups (never decoding the corpus), keep k per block, merge on
    the driver. Deterministic (score desc, id asc) order."""
    m, n_cent, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    table = np.stack([codebooks[i] @ q[i * sub:(i + 1) * sub]
                      for i in range(m)])          # (m, n_cent)
    t_ref = ray.put(table)

    def partial(t: pa.Table, t_ref=t_ref) -> pa.Table:
        lut = ray.get(t_ref)
        if not t.num_rows:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        codes = _codes_matrix(t["codes"], m)
        scores = lut[np.arange(m)[None, :], codes].sum(axis=1)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            id_col: pa.array(ids[order].astype(np.int64)),
            "score": pa.array(scores[order], pa.float64()),
        })

    parts = codes_ds.map_batches(partial, batch_format="pyarrow").take_all()
    top = heapq.nsmallest(k, parts, key=lambda r: (-r["score"], r[id_col]))
    return pd.DataFrame({
        id_col: pd.Series([r[id_col] for r in top], dtype="int64"),
        "score": [r["score"] for r in top],
    })


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization
# ---------------------------------------------------------------------------
#
# The full Jegou/FAISS composition: a coarse k-means partitions the corpus
# into inverted lists; PQ quantizes the RESIDUAL (x - coarse centroid), which
# carries far less variance than x itself, so the same code budget yields a
# much finer cell grid. Search probes only the n_probe lists nearest the
# query, and the inner product decomposes exactly:
#
#   q . x  =  q . c[list]  +  q . residual
#
# The first term is one exact scalar per probed list; the second is the same
# (m, 256) ADC lookup table as flat PQ — and because the residual codebooks
# are global (not per-list), ONE table serves every probed list. At 10^12
# docs the probe filter is a partition prune (list_id as a partition column)
# and the scan touches n_probe/n_lists of the corpus, each row scored by m
# byte lookups.


def ivfpq_train(embeddings: "ray.data.Dataset", centroids: np.ndarray,
                m: int = 4, n_centroids: int = 256,
                sample_rows: int = 16384, n_iter: int = 10, seed: int = 0,
                col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks on coarse-assignment residuals ->
    (m, n_centroids, d//m). ``centroids`` is the coarse quantizer (e.g.
    :func:`kg_gen_ray.functions.ann.kmeans_centroids`); the sample is the
    dataset's leading rows, as in :func:`pq_train`."""
    if n_centroids > 256:
        raise ValueError(
            f"n_centroids={n_centroids} > 256: codes are uint8 (one byte "
            "per subspace)")
    cents = np.asarray(centroids, dtype=np.float64)
    sample = _mat(pa.table({col: pa.array(
        [r[col] for r in _drop_null_vectors(embeddings, col)
         .limit(sample_rows).take_all()])}), col)
    n, d = sample.shape
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    resid = sample - cents[_nearest_centroid(sample, cents)]
    sub = d // m
    return np.stack([
        _lloyd(resid[:, i * sub:(i + 1) * sub], n_centroids, n_iter,
               seed + i)
        for i in range(m)])


def ivfpq_encode(embeddings: "ray.data.Dataset", centroids: np.ndarray,
                 codebooks: np.ndarray, id_col: str = "vec_id",
                 col: str = "embedding") -> "ray.data.Dataset":
    """(id, list_id, codes): coarse-assign each vector, PQ-encode its
    residual. One streaming pass; coarse centroids + codebooks broadcast
    once together. ``list_id`` is the partition key a real deployment
    writes the codes table partitioned by."""
    embeddings = _drop_null_vectors(embeddings, col)
    ref = ray.put((np.asarray(centroids, dtype=np.float64), codebooks))
    m, _k, sub = codebooks.shape

    def encode(t: pa.Table, ref=ref) -> pa.Table:
        cents, cb = ray.get(ref)
        x = _mat(t, col)
        if not x.shape[0]:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "list_id": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.binary(m))})
        assign = _nearest_centroid(x, cents)
        resid = x - cents[assign]
        codes = np.empty((x.shape[0], m), dtype=np.uint8)
        for i in range(m):
            codes[:, i] = _nearest_centroid(
                resid[:, i * sub:(i + 1) * sub], cb[i]).astype(np.uint8)
        return pa.table({
            id_col: pa.array(
                t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            "list_id": pa.array(assign.astype(np.int64)),
            "codes": _codes_column(codes),
        })

    return embeddings.map_batches(encode, batch_format="pyarrow")


def ivfpq_topk(codes_ds: "ray.data.Dataset", centroids: np.ndarray,
               codebooks: np.ndarray, query: np.ndarray, k: int = 10,
               n_probe: int = 2, id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k over the ``n_probe`` inverted lists nearest the query.

    score = (q . c[list]) + sum_i LUT[i, code_i] — the list offset is an
    exact scalar, the residual table is built ONCE for all probed lists.
    Rows outside the probe set are filtered vectorized before any scoring
    (at scale: a partition prune on ``list_id``). Deterministic
    (score desc, id asc)."""
    cents = np.asarray(centroids, dtype=np.float64)
    m, n_cent, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    # probe by the SAME metric encoding assigned with (min L2 distance,
    # == argmin ||c||^2 - 2 q.c up to the constant ||q||^2) — ranking by
    # raw inner product diverges when centroid norms are unequal and the
    # probed lists then exclude the list holding the true neighbors
    probe = np.sort(np.argsort((cents ** 2).sum(1) - 2.0 * (cents @ q))
                    [:n_probe]).astype(np.int64)
    offsets = cents @ q                                  # (n_lists,)
    lut = np.stack([codebooks[i] @ q[i * sub:(i + 1) * sub]
                    for i in range(m)])                  # (m, n_cent)
    ref = ray.put((probe, offsets, lut))

    def partial(t: pa.Table, ref=ref) -> pa.Table:
        probe_ids, offs, table = ray.get(ref)
        lists = t["list_id"].to_numpy(zero_copy_only=False)
        sel = np.isin(lists, probe_ids)
        if not sel.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        t = t.filter(pa.array(sel))
        codes = _codes_matrix(t["codes"], m)
        scores = (offs[t["list_id"].to_numpy(zero_copy_only=False)]
                  + table[np.arange(m)[None, :], codes].sum(axis=1))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({
            id_col: pa.array(ids[order].astype(np.int64)),
            "score": pa.array(scores[order], pa.float64()),
        })

    parts = codes_ds.map_batches(partial, batch_format="pyarrow").take_all()
    top = heapq.nsmallest(k, parts, key=lambda r: (-r["score"], r[id_col]))
    return pd.DataFrame({
        id_col: pd.Series([r[id_col] for r in top], dtype="int64"),
        "score": [r["score"] for r in top],
    })
