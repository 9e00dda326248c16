"""Similarity search: brute-force top-k vs numpy oracle, IVF recall,
k-means, LSH near-dup recall vs exact."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.ann import (
    brute_force_topk, cosine_near_dup_pairs, get_query_vector, ivf_assign,
    ivf_topk, kmeans_centroids, lsh_near_dup_pairs)

SF = "/root/testdata/sf0.001"


def emb_ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet")


def emb_numpy():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def test_brute_force_topk_matches_numpy(ray_session):
    ids, m = emb_numpy()
    q = m[ids == 0][0]
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:10]
    expected = ids[order].tolist()
    got = brute_force_topk(emb_ds(), q, k=10)["vec_id"].tolist()
    assert got == expected


def test_get_query_vector(ray_session):
    ids, m = emb_numpy()
    q = get_query_vector(emb_ds(), 5)
    assert np.allclose(q, m[ids == 5][0])


def test_ivf_assign_matches_numpy(ray_session):
    ids, m = emb_numpy()
    cents = m[:8]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    expected = np.argmax(mn @ cn.T, axis=1)
    got = {r["vec_id"]: r["centroid_id"]
           for r in ivf_assign(emb_ds(), cents).take_all()}
    for i, vid in enumerate(ids):
        assert got[vid] == expected[i]


def test_ivf_topk_reasonable_recall(ray_session):
    ids, m = emb_numpy()
    q = m[ids == 3][0]
    exact = set(brute_force_topk(emb_ds(), q, k=10)["vec_id"])
    approx = set(ivf_topk(emb_ds(), m[:8], q, k=10, n_probe=4)["vec_id"])
    assert len(exact & approx) >= 5    # probing half the partitions
    assert 3 in approx                 # the query vector itself is found


def test_kmeans_centroids(ray_session):
    cents = kmeans_centroids(emb_ds(), n_centroids=4, n_iter=3)
    assert cents.shape == (4, 64)
    assert np.isfinite(cents).all()
    # deterministic
    again = kmeans_centroids(emb_ds(), n_centroids=4, n_iter=3)
    assert np.allclose(cents, again)


def test_lsh_near_dup_subset_of_exact(ray_session):
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_near_dup_pairs(emb_ds(), 0.3).take_all()}
    lsh = {(r["id_a"], r["id_b"])
           for r in lsh_near_dup_pairs(emb_ds(), 0.3).take_all()}
    assert lsh <= exact                # LSH verifies within buckets -> no FPs
    assert exact                       # dataset has near pairs at 0.3


def test_cosine_pairs_block_dual_matches_broadcast(ray_session):
    from kg_gen_ray.functions.ann import cosine_near_dup_pairs

    ds = emb_ds().repartition(5)   # force multiple blocks
    bcast = {(r["id_a"], r["id_b"])
             for r in cosine_near_dup_pairs(ds, 0.3).take_all()}
    dist = {(r["id_a"], r["id_b"])
            for r in cosine_near_dup_pairs(ds, 0.3,
                                           broadcast_limit=0).take_all()}
    assert dist == bcast and len(bcast) > 0


def test_cosine_near_dup_canonical_matches_numpy_cc(ray_session):
    """End-to-end embedding dedup vs a numpy/union-find oracle: exact
    cosine pairs -> connected components -> lowest-id survivor. Broadcast
    dual only: the forced-join dual's building blocks (pair join, label
    propagation, anti-join drop) each have their own forced-join tests,
    and the e2e join leg pays ~20 rounds of join overhead for no extra
    coverage."""
    from kg_gen_ray.functions.ann import cosine_near_dup_canonical

    ids, m = emb_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ai, bj = np.where(np.triu(sims >= 0.3, k=1))
    for a, b in zip(ids[ai], ids[bj]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i for i in parent if find(i) == i}

    kept = {r["vec_id"] for r in cosine_near_dup_canonical(
        emb_ds(), threshold=0.3).take_all()}
    assert kept == expected


def test_empty_blocks_from_probed_filter(ray_session):
    """ivf_topk's probe filter legitimately empties blocks; the partial
    top-k / assign / k-means kernels must short-circuit them instead of
    matmul-ing a (0,0) matrix against a (d,) query."""
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(12)), pa.int64()),
        "embedding": pa.array([[float(i), 1.0, 0.0, 0.0]
                               for i in range(12)],
                              pa.list_(pa.float32())),
    })).repartition(6)
    # a filter that empties most blocks
    few = emb.filter(expr="vec_id >= 10")
    q = np.asarray([1.0, 0.0, 0.0, 0.0], dtype=np.float64)
    top = brute_force_topk(few, q, k=3)
    assert len(top) == 2
    cents = np.eye(2, 4)
    assert ivf_assign(few, cents).count() == 2
    c = kmeans_centroids(few, n_centroids=2, n_iter=2)
    assert c.shape == (2, 4)


def _semdedup_serial(ids, m, cents, threshold):
    """Plain-numpy SemDeDup replay: argmax-cosine assignment, then
    per-cluster dominance against every lower id."""
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                            1e-300)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    assign = np.argmax(mn @ cn.T, axis=1)
    keep = {}
    for cid in np.unique(assign):
        sel = np.where(assign == cid)[0]
        sel = sel[np.argsort(ids[sel])]
        sub = mn[sel]
        sims = sub @ sub.T
        dominated = np.triu(sims.T >= threshold, k=1).any(axis=0)
        for pos, i in enumerate(sel):
            keep[int(ids[i])] = (int(cid), 0 if dominated[pos] else 1)
    return keep


def test_semdedup_matches_serial_replay(ray_session):
    from kg_gen_ray.functions.ann import semdedup
    ids, m = emb_numpy()
    cents = m[ids < 8][np.argsort(ids[ids < 8])]
    expected = _semdedup_serial(ids, m, cents, 0.3)
    rows = semdedup(emb_ds(), cents, threshold=0.3).take_all()
    assert len(rows) == len(ids)
    for r in rows:
        cid, k = expected[r["vec_id"]]
        assert (r["centroid_id"], r["keep"]) == (cid, k)


def test_semdedup_sliced_path_identical(ray_session):
    """slice_rows smaller than any cluster forces the sliced prefix
    matmuls; the mask must be identical to the one-shot path."""
    from kg_gen_ray.functions.ann import semdedup
    ids, m = emb_numpy()
    cents = m[ids < 8][np.argsort(ids[ids < 8])]
    one = sorted((r["vec_id"], r["centroid_id"], r["keep"]) for r in
                 semdedup(emb_ds(), cents, threshold=0.3).take_all())
    sliced = sorted((r["vec_id"], r["centroid_id"], r["keep"]) for r in
                    semdedup(emb_ds(), cents, threshold=0.3,
                             slice_rows=7).take_all())
    assert one == sliced


def test_semdedup_null_vectors_dropped(ray_session):
    from kg_gen_ray.functions.ann import semdedup
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], None, [1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
    }))
    cents = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    rows = {r["vec_id"]: (r["centroid_id"], r["keep"]) for r in
            semdedup(emb, cents, threshold=0.99).take_all()}
    # null row 1 dropped; 2 is a dup of 0 within cluster 0; 3 alone in 1
    assert rows == {0: (0, 1), 2: (0, 0), 3: (1, 1)}


def test_brute_force_topk_multi_matches_single(ray_session):
    """The batched query matrix must reproduce the single-query path
    exactly, per query, including score values and tie order."""
    from kg_gen_ray.functions.ann import brute_force_topk_multi
    ids, m = emb_numpy()
    qids = [0, 5, 9]
    qm = m[np.isin(ids, qids)]
    multi = brute_force_topk_multi(emb_ds(), qm, k=7,
                                   query_ids=np.asarray(qids))
    assert list(multi.columns) == ["query_id", "vec_id", "score"]
    for qi, qid in enumerate(qids):
        single = brute_force_topk(emb_ds(), qm[qi], k=7)
        mine = multi[multi["query_id"] == qid].reset_index(drop=True)
        assert mine["vec_id"].tolist() == single["vec_id"].tolist()
        assert mine["score"].tolist() == single["score"].tolist()


def test_brute_force_topk_multi_default_ids_and_empty_blocks(ray_session):
    from kg_gen_ray.functions.ann import brute_force_topk_multi
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(12)), pa.int64()),
        "embedding": pa.array([[float(i), 1.0, 0.0, 0.0]
                               for i in range(12)],
                              pa.list_(pa.float32())),
    })).repartition(6).filter(expr="vec_id >= 10")  # most blocks empty
    qm = np.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    out = brute_force_topk_multi(emb, qm, k=3)
    assert sorted(out["query_id"].unique().tolist()) == [0, 1]
    assert len(out) == 4  # only 2 rows survive the filter, per query


def test_semdedup_centroid_rank_serial_replay(ray_session):
    """rank='centroid' (the paper's rule): within a dup group the vector
    LEAST similar to its centroid survives. Serial replay with the
    ascending-centroid-similarity dominance order."""
    from kg_gen_ray.functions.ann import semdedup
    ids, m = emb_numpy()
    cents = m[ids < 8][np.argsort(ids[ids < 8])]
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    assign = np.argmax(mn @ cn.T, axis=1)
    expected = {}
    for cid in np.unique(assign):
        sel = np.where(assign == cid)[0]
        cs = mn[sel] @ cn[cid]
        order = sel[np.lexsort((ids[sel], cs))]
        sub = mn[order]
        dominated = np.triu((sub @ sub.T).T >= 0.3, k=1).any(axis=0)
        for pos, i in enumerate(order):
            expected[int(ids[i])] = (int(cid), 0 if dominated[pos] else 1)
    rows = semdedup(emb_ds(), cents, threshold=0.3,
                    rank="centroid").take_all()
    assert len(rows) == len(ids)
    for r in rows:
        assert (r["centroid_id"], r["keep"]) == expected[r["vec_id"]]
    # (no cross-rank count assertion: >= tau is not transitive, so
    # different dominance orders legitimately keep different COUNTS)


def test_semdedup_composes_with_trained_kmeans(ray_session):
    """The realistic composition: distributed-Lloyd's centroids feeding
    semdedup. The serial replay holds for ANY centroid matrix, so run it
    against the trained one."""
    from kg_gen_ray.functions.ann import kmeans_centroids, semdedup
    ids, m = emb_numpy()
    cents = kmeans_centroids(emb_ds(), n_centroids=6, n_iter=3)
    expected = _semdedup_serial(ids, m, cents, 0.3)
    rows = semdedup(emb_ds(), cents, threshold=0.3).take_all()
    assert len(rows) == len(ids)
    for r in rows:
        assert (r["centroid_id"], r["keep"]) == expected[r["vec_id"]]
