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
    c = np.asarray(cents, dtype=np.float64)
    # the probe rule is the ENCODER's metric: nearest list by L2
    probe = int(np.argmin(((c - q) ** 2).sum(1)))
    got = ivfpq_topk(codes, cents, cb, q, k=10, n_probe=1)
    assert len(got) > 0
    assert all(assign[v] == probe for v in got["vec_id"])


def test_ivfpq_probe_metric_matches_assignment(ray_session):
    """Unequal centroid norms: probing by raw inner product would pick a
    different list than L2 assignment and recall would collapse; the probe
    must rank lists exactly as the encoder assigned them."""
    import numpy as np

    from kg_gen_ray.functions.pq import ivfpq_encode, ivfpq_topk, ivfpq_train
    import ray.data as rd
    import pyarrow as pa

    rng = np.random.default_rng(3)
    # tight far cluster (large norm) + diffuse near cluster (small norm)
    near = rng.normal(0.0, 0.35, size=(80, 8)) + np.r_[[1.0], np.zeros(7)]
    far = rng.normal(0.0, 0.01, size=(80, 8)) + np.r_[[4.0], np.zeros(7)]
    x = np.vstack([near, far])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array(x.tolist()),
    }))
    cents = np.vstack([near.mean(0), far.mean(0)])
    # q sits inside the NEAR cluster but has larger inner product with the
    # far centroid (4.0 * q[0] > ...) — IP probing would scan list 1 only
    q = np.r_[[1.3], np.zeros(7)]
    assert (cents @ q).argmax() == 1          # the trap the fix avoids
    assert ((cents - q) ** 2).sum(1).argmin() == 0

    cb = ivfpq_train(ds, cents, m=4, n_centroids=16, sample_rows=160)
    codes = ivfpq_encode(ds, cents, cb).materialize()
    got = ivfpq_topk(codes, cents, cb, q, k=5, n_probe=1)
    assign = {r["vec_id"]: r["list_id"] for r in codes.take_all()}
    assert all(assign[v] == 0 for v in got["vec_id"])
