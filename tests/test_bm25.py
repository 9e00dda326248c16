"""BM25 / rank-fusion tests (SURVEY.md §2 X4, T2).

Parity target: rank_bm25.BM25Okapi semantics as used by the reference at
/root/reference/experiments/wikiqa/utils/cluster_and_deduplication.py:85-149.
"""
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.functions.bm25 import bm25_scores, corpus_stats, rank_fusion_topk

TEXTS = ["the cat sat", "the dog ran fast", "cat and dog", "fast cat"]


def okapi_reference(query, texts, k1=1.5, b=0.75, eps=0.25):
    toks = [t.lower().split() for t in texts]
    n = len(toks)
    dl = [len(x) for x in toks]
    avgdl = sum(dl) / n
    vocab = {w for x in toks for w in x}
    df = {w: sum(w in set(x) for x in toks) for w in vocab}
    idf = {w: math.log((n - d + 0.5) / (d + 0.5)) for w, d in df.items()}
    avg = sum(idf.values()) / len(idf)
    idf = {w: (v if v >= 0 else eps * avg) for w, v in idf.items()}
    out = []
    for x, d in zip(toks, dl):
        s = 0.0
        for t in query.lower().split():
            if t in idf:
                tf = x.count(t)
                if tf:
                    s += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * d / avgdl))
        out.append(s)
    return out


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(TEXTS))), "text": TEXTS}))


def test_corpus_stats_df_and_sentinel(ray_session):
    stats = {r["word"]: (r["df"], r["sum_dl"])
             for r in corpus_stats(_docs()).take_all()}
    assert stats[""] == (4, 12)            # n_docs, total tokens
    assert stats["cat"][0] == 3
    assert stats["the"][0] == 2
    assert stats["fast"][0] == 2


@pytest.mark.parametrize("query", ["fast cat", "dog", "the", "absentword cat"])
def test_bm25_matches_okapi_formula(ray_session, query):
    got = (bm25_scores(_docs(), query).to_pandas()
           .sort_values("doc_id")["score"].tolist())
    exp = okapi_reference(query, TEXTS)
    assert np.allclose(got, exp)


def test_bm25_empty_query(ray_session):
    got = bm25_scores(_docs(), "").to_pandas()["score"]
    assert (got == 0).all()


def test_rank_fusion_topk_deterministic_and_ranked(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(4, 8))
    emb = rd.from_arrow(pa.table({
        "vec_id": list(range(4)),
        "embedding": [list(map(float, v)) for v in vecs]}))
    q = vecs[0]
    top = rank_fusion_topk(_docs(), emb, "fast cat", q, k=3).to_pandas()
    assert len(top) == 3
    # fused = 0.5*bm25 + 0.5*cosine, computed by hand
    bm = okapi_reference("fast cat", TEXTS)
    cos = [float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
           for v in vecs]
    fused = sorted(range(4), key=lambda i: (-(0.5 * bm[i] + 0.5 * cos[i]), i))
    assert top["doc_id"].tolist() == fused[:3]
    assert np.all(np.diff(top["fused_score"]) <= 1e-12)
