"""Product quantization: shape/determinism contracts and recall vs the
exact path on clustered data."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.pq import pq_encode, pq_topk, pq_train


def clustered(n=600, d=16, n_clusters=60, seed=7, sigma=0.05):
    """60 tight, well-separated clusters of 10: exact top-10 for a
    member query is its own cluster — the structure PQ must preserve
    (PQ cannot rank WITHIN a code cell, so near-tie data would make
    recall-vs-exact meaningless)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3.0
    x = centers[np.arange(n) % n_clusters] + rng.normal(size=(n, d)) * sigma
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def embeddings_ds(x):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in x]),
    }))


def test_encode_shape_and_determinism(ray_session):
    x = clustered()
    ds = embeddings_ds(x)
    cb = pq_train(ds, m=4, n_centroids=16, sample_rows=300)
    assert cb.shape == (4, 16, 4)
    rows1 = {r["vec_id"]: r["codes"]
             for r in pq_encode(ds, cb).take_all()}
    rows2 = {r["vec_id"]: r["codes"]
             for r in pq_encode(ds.repartition(5), cb).take_all()}
    assert rows1 == rows2                    # block layout can't matter
    assert all(len(c) == 4 for c in rows1.values())   # 16 floats -> 4 bytes


def test_recall_vs_exact(ray_session):
    from kg_gen_ray.functions.ann import brute_force_topk

    x = clustered()
    ds = embeddings_ds(x)
    cb = pq_train(ds, m=4, n_centroids=64, sample_rows=600)
    codes = pq_encode(ds, cb).materialize()

    recalls = []
    for qi in (0, 17, 101):
        q = x[qi]
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = set(pq_topk(codes, cb, q, k=10)["vec_id"])
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.6   # quantized, not exact


def test_dim_must_divide(ray_session):
    import pytest

    x = clustered(d=15)
    with pytest.raises(ValueError):
        pq_train(embeddings_ds(x), m=4, sample_rows=100)


def test_n_centroids_over_256_rejected(ray_session):
    import pytest

    x = clustered(n=100)
    with pytest.raises(ValueError):
        pq_train(embeddings_ds(x), m=4, n_centroids=512, sample_rows=100)


# ---------------------------------------------------------------------------
# IVF-PQ (coarse lists + residual PQ)
# ---------------------------------------------------------------------------

def test_ivfpq_encode_layout_and_determinism(ray_session):
    from kg_gen_ray.functions.ann import kmeans_centroids
    from kg_gen_ray.functions.pq import ivfpq_encode, ivfpq_train

    x = clustered()
    ds = embeddings_ds(x)
    cents = kmeans_centroids(ds, n_centroids=8, n_iter=4)
    cb = ivfpq_train(ds, cents, m=4, n_centroids=32, sample_rows=600)
    assert cb.shape == (4, 32, 4)
    rows1 = {r["vec_id"]: (r["list_id"], r["codes"])
             for r in ivfpq_encode(ds, cents, cb).take_all()}
    rows2 = {r["vec_id"]: (r["list_id"], r["codes"])
             for r in ivfpq_encode(ds.repartition(5), cents, cb).take_all()}
    assert rows1 == rows2                      # block layout can't matter
    assert all(0 <= lid < 8 and len(c) == 4
               for lid, c in rows1.values())


def test_ivfpq_recall_vs_exact(ray_session):
    from kg_gen_ray.functions.ann import brute_force_topk, kmeans_centroids
    from kg_gen_ray.functions.pq import (ivfpq_encode, ivfpq_topk,
                                         ivfpq_train)

    x = clustered()
    ds = embeddings_ds(x)
    cents = kmeans_centroids(ds, n_centroids=8, n_iter=4)
    cb = ivfpq_train(ds, cents, m=4, n_centroids=64, sample_rows=600)
    codes = ivfpq_encode(ds, cents, cb).materialize()

    recalls = []
    for qi in (0, 17, 101):
        q = x[qi]
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = set(ivfpq_topk(codes, cents, cb, q, k=10,
                                n_probe=4)["vec_id"])
        recalls.append(len(exact & approx) / 10)
    # residual PQ at the same code budget should not trail flat PQ
    assert sum(recalls) / len(recalls) >= 0.6


def test_ivfpq_probe_filters_lists(ray_session):
    """n_probe=1 must never return a row from outside the probed list."""
    import numpy as np

    from kg_gen_ray.functions.ann import kmeans_centroids
    from kg_gen_ray.functions.pq import (ivfpq_encode, ivfpq_topk,
                                         ivfpq_train)

    x = clustered()
    ds = embeddings_ds(x)
    cents = kmeans_centroids(ds, n_centroids=8, n_iter=4)
    cb = ivfpq_train(ds, cents, m=4, n_centroids=32, sample_rows=600)
    codes = ivfpq_encode(ds, cents, cb).materialize()
    assign = {r["vec_id"]: r["list_id"] for r in codes.take_all()}

    q = x[0]
    probe = int(np.argmax(np.asarray(cents, dtype=np.float64) @ q))
    got = ivfpq_topk(codes, cents, cb, q, k=10, n_probe=1)
    assert len(got) > 0
    assert all(assign[v] == probe for v in got["vec_id"])
