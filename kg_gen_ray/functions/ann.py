"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — the exact baseline: per-block numpy matmul
  against a broadcast query matrix, per-block partial top-k, tiny driver
  merge. Scales linearly; no all-gather of the embedding table.
* IVF variant — broadcast centroids, assign each vector to its nearest
  centroid (one map_batches pass), search only the probed partitions.
* Random-hyperplane LSH bucketing — the shuffle-free near-dup scale path.

All cosine math is float64 over float32 inputs, matching the DuckDB oracle
(``list_cosine_similarity(CAST(... AS DOUBLE[]), ...)``).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from kg_gen_ray.stages.common import dual_limit


def _mat(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    n = len(batch)
    if n == 0:
        # reshape(0, -1) raises on empty input. Consumers that matmul or
        # broadcast against a (d,)-shaped side must short-circuit empty
        # batches BEFORE calling _mat — a (0, 0) matrix cannot align
        # with d columns
        return np.zeros((0, 0), dtype=np.float64)
    arr = batch[col]
    if arr.null_count:
        # a null list flattens to NOTHING, silently misaligning the
        # reshape against the id column — refuse loudly; operator entry
        # points drop null vectors first (_drop_null_vectors)
        raise ValueError(f"null {col!r} rows must be dropped before _mat")
    flat = np.asarray(arr.flatten().to_pylist() if not isinstance(arr, pa.ChunkedArray)
                      else arr.combine_chunks().flatten().to_pylist(),
                      dtype=np.float64)
    return flat.reshape(n, -1)


def _drop_null_vectors(embeddings: "ray.data.Dataset",
                       col: str = "embedding") -> "ray.data.Dataset":
    """A NULL vector carries no position in the space: drop such rows
    once at operator entry (shared kernel: ``common.drop_null_rows``)."""
    from kg_gen_ray.stages.common import drop_null_rows
    return drop_null_rows(embeddings, col)


def _cosine(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """block (n,d) x q (d,) -> (n,) cosine in float64."""
    bn = np.linalg.norm(block, axis=1)
    qn = np.linalg.norm(q)
    denom = np.maximum(bn * qn, 1e-300)
    return (block @ q) / denom


def brute_force_topk(embeddings: "ray.data.Dataset", query: np.ndarray,
                     k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """Exact cosine top-k -> DataFrame(vec_id, score), deterministic order
    (score desc, vec_id asc)."""
    embeddings = _drop_null_vectors(embeddings)
    q_ref = ray.put(np.asarray(query, dtype=np.float64))

    def partial(batch: pa.Table, q_ref=q_ref) -> pa.Table:
        if batch.num_rows == 0:
            # ivf_topk's probed filter legitimately empties blocks; the
            # (0,0) matrix from _mat cannot matmul a (d,) query
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        q = ray.get(q_ref)
        block = _mat(batch)
        sims = _cosine(block, q)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # per-block partial top-k: only k rows leave each block
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            id_col: pa.array(ids[order].astype(np.int64)),
            "score": pa.array(sims[order], pa.float64()),
        })

    parts = embeddings.map_batches(partial, batch_format="pyarrow").take_all()
    top = heapq.nsmallest(k, parts, key=lambda r: (-r["score"], r[id_col]))
    return pd.DataFrame({
        id_col: pd.Series([r[id_col] for r in top], dtype="int64"),
        "score": [r["score"] for r in top],
    })


def brute_force_topk_multi(embeddings: "ray.data.Dataset",
                           queries: np.ndarray, k: int = 10,
                           id_col: str = "vec_id",
                           query_ids: np.ndarray | None = None
                           ) -> pd.DataFrame:
    """Exact cosine top-k for a whole QUERY MATRIX in one pass — the
    serving batch shape: the (Q, d) matrix is broadcast once via
    ``ray.put``, each block scans ONCE for all queries, keeps a
    per-query partial top-k (Q x k rows leave each block), and the driver
    merges Q x k x n_blocks partials. Amortizes the corpus scan across
    queries instead of paying Q single-query passes.

    Returns DataFrame(query_id, vec_id, score), deterministic order
    (query_id asc, score desc, vec_id asc). ``query_ids`` labels the
    output rows (defaults to 0..Q-1). Per-pair cosine uses the same
    float64 formula as :func:`_cosine` (dot / (|a|·|b|)), keeping scores
    bit-identical to the single-query path and the SQL mirror."""
    embeddings = _drop_null_vectors(embeddings)
    q = np.asarray(queries, dtype=np.float64)
    qids = (np.arange(len(q), dtype=np.int64) if query_ids is None
            else np.asarray(query_ids, dtype=np.int64))
    qn = np.linalg.norm(q, axis=1)
    ref = ray.put((q, qn))

    def partial(batch: pa.Table, ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"qi": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qm, qnorm = ray.get(ref)
        block = _mat(batch)
        bn = np.linalg.norm(block, axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qm)):  # Q is small; per-query matvec keeps
            # every score BIT-identical to the single-query path (a
            # batched dgemm sums in a different order than Q dgemvs and
            # drifts by ulps, enough to flip near-tie ranks)
            sims = (block @ qm[qi]) / np.maximum(bn * qnorm[qi], 1e-300)
            order = np.lexsort((ids, -sims))[:k]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(sims[order])
        return pa.table({
            "qi": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    parts = embeddings.map_batches(partial, batch_format="pyarrow").take_all()
    rows = []
    for qi in range(len(q)):
        mine = [r for r in parts if r["qi"] == qi]
        top = heapq.nsmallest(k, mine,
                              key=lambda r: (-r["score"], r[id_col]))
        rows.extend((int(qids[qi]), r[id_col], r["score"]) for r in top)
    return pd.DataFrame({
        "query_id": pd.Series([r[0] for r in rows], dtype="int64"),
        id_col: pd.Series([r[1] for r in rows], dtype="int64"),
        "score": [r[2] for r in rows],
    })


def get_query_vector(embeddings: "ray.data.Dataset", vec_id: int,
                     id_col: str = "vec_id") -> np.ndarray:
    """Fetch one embedding row without materializing the table."""
    row = embeddings.filter(
        expr=f"{id_col} == {vec_id}").take(1)[0]
    return np.asarray(row["embedding"], dtype=np.float64)


# ---------------------------------------------------------------------------
# IVF (inverted-file) partitioned search
# ---------------------------------------------------------------------------

def ivf_assign(embeddings: "ray.data.Dataset", centroids: np.ndarray,
               id_col: str = "vec_id") -> "ray.data.Dataset":
    """Assign each vector to its max-cosine centroid (ties -> lowest id).

    Centroids are broadcast once via ``ray.put``; assignment is one numpy
    matmul per block — this is the partitioning step of the scalable
    canonicalization in the reference
    (``/root/reference/experiments/wikiqa/utils/cluster_and_deduplication.py:151-243``
    re-expressed without FAISS).
    """
    embeddings = _drop_null_vectors(embeddings)
    c = np.asarray(centroids, dtype=np.float64)
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    c_ref = ray.put(c_norm)

    def assign(batch: pa.Table, c_ref=c_ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "centroid_id": pa.array([], pa.int64())})
        cn = ray.get(c_ref)
        block = _mat(batch)
        bn = block / np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-300)
        sims = bn @ cn.T                      # (n, n_centroids)
        best = np.argmax(sims, axis=1)        # first max = lowest centroid id
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "centroid_id": pa.array(best.astype(np.int64)),
        })

    return embeddings.map_batches(assign, batch_format="pyarrow")


def ivf_topk(embeddings: "ray.data.Dataset", centroids: np.ndarray,
             query: np.ndarray, k: int = 10, n_probe: int = 2,
             id_col: str = "vec_id") -> pd.DataFrame:
    """Approximate top-k: search only the ``n_probe`` centroids nearest the
    query. The assignment is computed AND filtered inside one distributed
    ``map_batches`` pass (broadcast centroids + probe set) — no per-vector
    assignment map ever reaches the driver. In a real deployment the
    assignment would be a precomputed partition column and this filter a
    partition prune."""
    embeddings = _drop_null_vectors(embeddings)
    c = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    # stable argsort: a cosine tie keeps the LOWER centroid id in the
    # probe set — the same tie-break the SQL mirror's ORDER BY applies
    probe = np.sort(np.argsort(-_cosine(c, q),
                               kind="stable")[:n_probe]).astype(np.int64)

    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    ref = ray.put((c_norm, probe))

    def only_probed(t: pa.Table, ref=ref) -> pa.Table:
        cn, probe_ids = ray.get(ref)
        block = _mat(t)
        if not block.size:
            return t
        bn = block / np.maximum(
            np.linalg.norm(block, axis=1, keepdims=True), 1e-300)
        best = np.argmax(bn @ cn.T, axis=1)
        return t.filter(pa.array(np.isin(best, probe_ids)))

    subset = embeddings.map_batches(only_probed, batch_format="pyarrow")
    return brute_force_topk(subset, query, k, id_col)


def kmeans_centroids(embeddings: "ray.data.Dataset", n_centroids: int,
                     n_iter: int = 5, id_col: str = "vec_id") -> np.ndarray:
    """Distributed Lloyd's k-means (seeded from the lowest-id vectors).

    Seeding is a per-block partial top-k (each block keeps its
    ``n_centroids`` smallest ids), so the only sort in the plan runs over
    at most ``n_centroids x n_blocks`` partial rows — never a full-table
    sort shuffle of the embedding table (the round-2 plan paid one just to
    pick seeds). Per-iteration: broadcast centroids -> per-block partial
    sums per cluster (map_batches combiner) -> tiny driver reduce. Mirrors
    the reference's FAISS ``niter=20`` k-means partitioner, Ray-Data-first.
    """
    embeddings = _drop_null_vectors(embeddings)
    import pyarrow.compute as _pc

    def seed_partial(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "embedding"])
        if t.num_rows <= n_centroids:
            return t
        idx = _pc.sort_indices(t[id_col])
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        return t.take(idx.slice(0, n_centroids))

    first = embeddings.map_batches(seed_partial, batch_format="pyarrow") \
                      .sort(id_col).limit(n_centroids)
    cents = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                      for r in first.take_all()])
    for _ in range(n_iter):
        c_ref = ray.put(cents)

        def partial_sums(batch: pa.Table, c_ref=c_ref) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "count": pa.array([], pa.int64()),
                    "sum": pa.array([], pa.list_(pa.float64()))})
            c = ray.get(c_ref)
            block = _mat(batch)
            d = ((block[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            best = np.argmin(d, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, best, block)
            np.add.at(counts, best, 1)
            nz = counts > 0
            return pa.table({
                "cid": pa.array(np.arange(len(c))[nz].astype(np.int64)),
                "count": pa.array(counts[nz]),
                "sum": pa.array(sums[nz].tolist()),
            })

        parts = embeddings.map_batches(partial_sums,
                                       batch_format="pyarrow").take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["sum"])
            counts[r["cid"]] += r["count"]
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    return cents


# ---------------------------------------------------------------------------
# embedding near-dup (exact + LSH-bucketed scale path)
# ---------------------------------------------------------------------------

def _norm_block(t: pa.Table, id_col: str):
    ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
    m = _mat(t)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    return ids, mn


@ray.remote
def _block_pair_task(tab_i, tab_j, same: bool, threshold: float,
                     id_col: str) -> pa.Table:
    """Exact cosine pairs between two blocks (zero-copy Arrow from the
    object store). ``same=True`` -> upper triangle within one block."""
    ids_i, mi = _norm_block(tab_i, id_col)
    ids_j, mj = (ids_i, mi) if same else _norm_block(tab_j, id_col)
    sims = mi @ mj.T
    if same:
        mask = np.triu(sims >= threshold, k=1)
    else:
        mask = sims >= threshold
    ai, bj = np.where(mask)
    a = np.minimum(ids_i[ai], ids_j[bj])
    b = np.maximum(ids_i[ai], ids_j[bj])
    keep = a < b
    return pa.table({
        "id_a": pa.array(a[keep]),
        "id_b": pa.array(b[keep]),
    })


def cosine_near_dup_pairs(embeddings: "ray.data.Dataset", threshold: float,
                          id_col: str = "vec_id",
                          broadcast_limit: int = 64 * 1024 * 1024
                          ) -> "ray.data.Dataset":
    """Exact pairs (a < b) with cosine >= threshold — size-selected dual.

    Small table (fits ``broadcast_limit``): the normalized matrix is
    broadcast once and each block computes block x all similarities —
    O(n^2/B) per task, one pass. Large table: distributed block-pair
    tasks — every (i <= j) block pair is one raw Ray task reading both
    blocks zero-copy from the object store, so NOTHING is ever assembled
    on the driver and no worker holds more than two blocks. Still exact
    O(n^2) compute by definition; :func:`lsh_near_dup_pairs` is the
    sub-quadratic approximate path.
    """
    mat = _drop_null_vectors(embeddings).materialize()

    if (mat.size_bytes() or 0) <= dual_limit(broadcast_limit):
        rows = []
        for b in mat.iter_batches(batch_format="pyarrow", batch_size=None):
            ids = b[id_col].to_pylist()
            m = _mat(b)
            rows.append((ids, m))
        if not rows or not any(len(i) for i, _ in rows):
            return ray.data.from_arrow(pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64())}))
        all_ids = np.concatenate([np.asarray(i, dtype=np.int64)
                                  for i, _ in rows])
        all_m = np.vstack([m for _, m in rows])
        all_n = all_m / np.maximum(
            np.linalg.norm(all_m, axis=1, keepdims=True), 1e-300)
        ref = ray.put((all_ids, all_n))

        def block_pairs(t: pa.Table, ref=ref) -> pa.Table:
            ids_all, mat_all = ray.get(ref)
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            m = _mat(t)
            mn = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
            sims = mn @ mat_all.T
            ai, bj = np.where(sims >= threshold)
            a = ids[ai]
            b = ids_all[bj]
            keep = a < b
            return pa.table({
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
            })

        return mat.map_batches(block_pairs, batch_format="pyarrow")

    # distributed block-pair tasks over the materialized blocks
    refs = mat.to_arrow_refs()
    out_refs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            out_refs.append(_block_pair_task.remote(
                refs[i], refs[j], i == j, threshold, id_col))
    return ray.data.from_arrow_refs(out_refs)


def cosine_near_dup_canonical(embeddings: "ray.data.Dataset",
                              threshold: float, id_col: str = "vec_id",
                              broadcast_limit: int = 64 * 1024 * 1024,
                              max_label_iter: int = 20
                              ) -> "ray.data.Dataset":
    """End-to-end embedding near-dup dedup: cosine pairs >= threshold ->
    connected components -> keep each component's lowest id. Same
    size-selected composition as the text near-dup
    (:func:`kg_gen_ray.functions.dedup.near_dup_canonical`); swap the
    pair source for :func:`lsh_near_dup_pairs` at corpus sizes where the
    exact pair stage's broadcast matrix no longer fits."""
    from kg_gen_ray.functions.dedup import drop_ids, pair_graph_losers

    pairs = cosine_near_dup_pairs(embeddings, threshold, id_col,
                                  broadcast_limit=broadcast_limit)
    losers = pair_graph_losers(pairs, broadcast_limit,
                               a_col="id_a", b_col="id_b",
                               max_label_iter=max_label_iter)

    def ids_only(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pc.cast(t[id_col], pa.int64())})

    return drop_ids(embeddings.map_batches(ids_only, batch_format="pyarrow"),
                    losers, id_col, broadcast_limit)


def semdedup(embeddings: "ray.data.Dataset", centroids: np.ndarray,
             threshold: float, id_col: str = "vec_id",
             slice_rows: int = 1024,
             rank: str = "id") -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then look for semantic duplicates ONLY within a
    cluster — the pruning that takes embedding dedup from O(n^2) to
    O(n^2/k), since k grows with the corpus and cluster sizes stay
    bounded.

    One output row per non-null input vector: ``(id, centroid_id, keep)``
    with ``keep = 0`` iff some LOWER-id vector of the SAME cluster has
    cosine >= ``threshold`` (dominance against every lower id, kept or
    not — NOT-EXISTS semantics, so the result is order-free; "lower"
    means better-ranked under ``rank``). ``rank="id"`` (default) keeps
    the lowest id — a pure deterministic function of the input, matching
    the engine-wide keep-lowest-id convention and the SQL mirror.
    ``rank="centroid"`` is the paper's rule: within a duplicate group
    keep the example LEAST similar to its cluster centroid (ties by id)
    — most representative points go, the outlier stays.

    Scale shape: assignment is one broadcast-centroid matmul pass (no
    shuffle, same kernel as :func:`ivf_assign`); the only exchange is the
    ``groupby(centroid_id)``, whose payload is the embedding column
    itself — unavoidable, since the within-cluster sims need the vectors
    co-located. Each group runs sliced matmuls (``slice_rows`` x prefix)
    so worker memory stays O(cluster x dim + slice x cluster) no matter
    the cluster size; compute is the SemDeDup O(c^2) per cluster.
    """
    embeddings = _drop_null_vectors(embeddings)
    c = np.asarray(centroids, dtype=np.float64)
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    c_ref = ray.put(c_norm)

    def assign(batch: pa.Table, c_ref=c_ref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "centroid_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float64()))})
        cn = ray.get(c_ref)
        block = _mat(batch)
        bn = block / np.maximum(
            np.linalg.norm(block, axis=1, keepdims=True), 1e-300)
        best = np.argmax(bn @ cn.T, axis=1)  # first max = lowest centroid id
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "centroid_id": pa.array(best.astype(np.int64)),
            "embedding": batch["embedding"],
        })

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")

    if rank not in ("id", "centroid"):
        raise ValueError("rank must be 'id' or 'centroid'")

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.asarray(g[id_col], dtype=np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64)
                      for e in g["embedding"]])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        if rank == "id":
            order = np.argsort(ids, kind="stable")
        else:
            # paper rank: ascending similarity to the OWN centroid —
            # earlier rows (less centroid-like) dominate later ones
            cn = ray.get(c_ref)
            cid = int(g["centroid_id"].iloc[0])
            order = np.lexsort((ids, mn @ cn[cid]))
        ids, mn = ids[order], mn[order]
        n = len(ids)
        keep = np.ones(n, dtype=np.int64)
        # cap slice x cluster at ~32M f64 cells (~256 MB of sims) so the
        # promised memory bound holds even for a degenerate giant cluster
        step = max(1, min(slice_rows, (32 << 20) // max(1, n)))
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            hits = mn[lo:hi] @ mn[:hi].T >= threshold  # slice x (ids <= hi)
            # strict j < i: every column < lo is a lower id; within the
            # [lo, hi) square the strictly-lower triangle is
            dominated = hits[:, :lo].any(axis=1) if lo else \
                np.zeros(hi - lo, dtype=bool)
            dominated |= np.tril(hits[:, lo:hi], k=-1).any(axis=1)
            keep[lo:hi] = ~dominated
        cid = np.asarray(g["centroid_id"], dtype=np.int64)[order]
        return pd.DataFrame({id_col: ids, "centroid_id": cid, "keep": keep})

    return assigned.groupby("centroid_id").map_groups(
        per_cluster, batch_format="pandas")


def lsh_near_dup_pairs(embeddings: "ray.data.Dataset", threshold: float,
                       n_planes: int = 12, seed: int = 7,
                       id_col: str = "vec_id") -> "ray.data.Dataset":
    """Approximate near-dup pairs via random-hyperplane LSH buckets.

    Vectors land in a bucket keyed by the sign pattern of ``n_planes``
    seeded random projections; exact cosine verification runs only within
    buckets (groupby). Recall < 1 by design — the 100 TB path.
    """
    embeddings = _drop_null_vectors(embeddings)
    first = embeddings.take(1)
    if not first:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    dim = len(first[0]["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    p_ref = ray.put(planes)

    def bucketize(t: pa.Table, p_ref=p_ref) -> pa.Table:
        p = ray.get(p_ref)
        m = _mat(t)
        signs = (m @ p.T) > 0
        keys = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "bucket": pa.array(keys.astype(np.int64)),
            "embedding": t["embedding"],
        })

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.asarray(g[id_col], dtype=np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = mn @ mn.T
        ai, bj = np.where(np.triu(sims >= threshold, k=1))
        a = np.minimum(ids[ai], ids[bj])
        b = np.maximum(ids[ai], ids[bj])
        return pd.DataFrame({"id_a": a, "id_b": b})

    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
