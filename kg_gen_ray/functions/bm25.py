"""BM25 scoring and BM25+cosine rank fusion (SURVEY.md §2 X4 / T2).

Mirrors the reference's retrieval semantics exactly
(``/root/reference/experiments/wikiqa/utils/cluster_and_deduplication.py:85-149``):
``rank_bm25.BM25Okapi`` over ``text.lower().split()`` tokens — Okapi idf
``ln((N - df + 0.5) / (df + 0.5))`` with the negative-idf floor
``epsilon * average_idf`` (average over the whole vocabulary, negatives
included) — and equal-weight fusion ``0.5 * bm25 + 0.5 * cosine`` with
descending argsort top-k.

Distributed shape (two passes over the corpus — BM25 inherently needs
corpus statistics before it can score):

1. stats pass: one ``map_batches`` combiner emits per-batch-aggregated
   ``(word, df)`` partials plus a sentinel row carrying ``(n_docs,
   sum_dl)``; a single small ``groupby(word).sum`` yields the document
   frequencies. The vocabulary-average idf is a second tiny aggregate over
   that df table. Nothing here is proportional to corpus bytes after the
   combiner.
2. score pass: the per-query-term idf table (a handful of floats) and
   ``avgdl`` are broadcast into a vectorized ``map_batches`` that emits
   ``(doc_id, score)``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

# module-level (not lazy in worker-side fns): pickle-by-value compatibility
from kg_gen_ray.functions.ann import _drop_null_vectors, _mat

K1 = 1.5
B = 0.75
EPSILON = 0.25


def _tokens(text: str | None) -> list[str]:
    # null text -> 0 tokens (the engine-wide convention): the row still
    # counts toward n_docs but contributes no terms and zero doc length
    return text.lower().split() if text is not None else []


def okapi_scores(corpus_tokens: list, query_tokens: list,
                 k1: float = K1, b: float = B,
                 epsilon: float = EPSILON) -> np.ndarray:
    """Pure in-memory BM25Okapi over a small tokenized corpus — the
    group-local building block (used inside ``map_groups`` judges, where the
    corpus is one capacity-capped cluster; the distributed corpus-scale path
    is :func:`bm25_scores`)."""
    n = len(corpus_tokens)
    if n == 0:
        return np.zeros(0)
    dl = np.asarray([len(t) for t in corpus_tokens], dtype=np.float64)
    avgdl = dl.mean() if n else 0.0
    df: dict = {}
    for toks in corpus_tokens:
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    idf = {w: math.log((n - d + 0.5) / (d + 0.5)) for w, d in df.items()}
    if idf:
        avg = sum(idf.values()) / len(idf)
        idf = {w: (v if v >= 0 else epsilon * avg) for w, v in idf.items()}
    out = np.zeros(n)
    denom_norm = k1 * (1 - b + b * dl / avgdl) if avgdl else np.full(n, k1)
    for term in query_tokens:
        w = idf.get(term)
        if w is None:
            continue
        tf = np.asarray([t.count(term) for t in corpus_tokens],
                        dtype=np.float64)
        nz = tf > 0
        out[nz] += w * tf[nz] * (k1 + 1) / (tf[nz] + denom_norm[nz])
    return out


def corpus_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """docs(doc_id, text) -> (word, df) + one sentinel row
    ``word=''`` holding (n_docs, sum_dl) in the ``df``/``sum_dl`` columns."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        df: Counter = Counter()
        n_docs = 0
        sum_dl = 0
        for text in t["text"].to_pylist():
            toks = _tokens(text)
            n_docs += 1
            sum_dl += len(toks)
            df.update(set(toks))
        words = list(df.keys()) + [""]
        dfs = list(df.values()) + [n_docs]
        dls = [0] * len(df) + [sum_dl]
        return pa.table({
            "word": pa.array(words, pa.string()),
            "df": pa.array(dfs, pa.int64()),
            "sum_dl": pa.array(dls, pa.int64()),
        })

    from ray.data.aggregate import Sum
    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("df", alias_name="df"),
                       Sum("sum_dl", alias_name="sum_dl")))


def _idf_raw(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log((n_docs - df + 0.5) / (df + 0.5))


def bm25_scores(docs: "ray.data.Dataset", query: str,
                k1: float = K1, b: float = B, epsilon: float = EPSILON
                ) -> "ray.data.Dataset":
    """(doc_id, score) for every document — BM25Okapi-identical scoring of
    ``query`` against docs(doc_id, text)."""
    stats = corpus_stats(docs).materialize()

    sentinel_rows = stats.filter(expr="word == ''").take_all()
    if not sentinel_rows:      # empty corpus: no batches -> no sentinel
        n_docs, avgdl = 0, 0.0
    else:
        n_docs = int(sentinel_rows[0]["df"])
        avgdl = sentinel_rows[0]["sum_dl"] / n_docs if n_docs else 0.0

    # vocabulary-average idf (BM25Okapi averages raw idfs, negatives included)
    def idf_partial(t: pa.Table) -> pa.Table:
        mask = np.asarray([w != "" for w in t["word"].to_pylist()])
        df = t["df"].to_numpy(zero_copy_only=False)[mask]
        return pa.table({
            "idf_sum": pa.array([float(_idf_raw(df, n_docs).sum())]),
            "n": pa.array([int(mask.sum())], pa.int64()),
        })

    from ray.data.aggregate import Sum
    agg = (stats.map_batches(idf_partial, batch_format="pyarrow")
           .aggregate(Sum("idf_sum", alias_name="idf_sum"),
                      Sum("n", alias_name="n")))
    average_idf = agg["idf_sum"] / agg["n"] if agg["n"] else 0.0
    eps = epsilon * average_idf

    q_terms = list(dict.fromkeys(_tokens(query)))  # unique, order-stable
    q_set = set(q_terms)

    def keep_query_terms(t: pa.Table) -> pa.Table:
        mask = pa.array([w in q_set for w in t["word"].to_pylist()])
        return t.filter(mask)

    rows = (stats.map_batches(keep_query_terms, batch_format="pyarrow")
            .take_all()) if q_terms else []
    df_map = {r["word"]: r["df"] for r in rows}
    idf = {}
    for t in q_terms:
        d = df_map.get(t, 0)
        if d == 0:
            continue  # term absent from corpus: tf=0 everywhere, no score
        v = float(_idf_raw(np.asarray([d], dtype=np.float64), n_docs)[0])
        idf[t] = v if v >= 0 else eps

    import ray
    bcast = ray.put((idf, avgdl, k1, b))

    def score(t: pa.Table) -> pa.Table:
        idf_, avgdl_, k1_, b_ = ray.get(bcast)
        out = np.zeros(t.num_rows, dtype=np.float64)
        for i, text in enumerate(t["text"].to_pylist()):
            toks = _tokens(text)
            dl = len(toks)
            denom_norm = k1_ * (1 - b_ + b_ * dl / avgdl_) if avgdl_ else k1_
            s = 0.0
            for term, w in idf_.items():
                tf = toks.count(term)
                if tf:
                    s += w * tf * (k1_ + 1) / (tf + denom_norm)
            out[i] = s
        return pa.table({"doc_id": t["doc_id"], "score": pa.array(out)})

    return docs.map_batches(score, batch_format="pyarrow")


def rank_fusion_topk(docs: "ray.data.Dataset",
                     embeddings: "ray.data.Dataset",
                     query: str, query_vec: np.ndarray,
                     k: int = 50) -> "ray.data.Dataset":
    """Equal-weight BM25 + cosine fusion, top-k by fused score
    (ref ``get_relevant_items``, ``cluster_and_deduplication.py:128-149``).

    ``embeddings`` rows join ``docs`` on ``vec_id == doc_id`` (the id spaces
    are aligned in our corpus); the cosine side scores against the broadcast
    ``query_vec``. Ties broken by doc_id for deterministic output.
    """
    import ray

    bm25 = bm25_scores(docs, query)
    embeddings = _drop_null_vectors(embeddings)

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    bq = ray.put(qn)

    def cos(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        qv = ray.get(bq)
        mat = _mat(t)                       # shared flatten+reshape helper
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ qv
        return pa.table({
            "doc_id": pa.array(t["vec_id"].to_numpy(zero_copy_only=False),
                               pa.int64()),
            "cosine": pa.array(sims),
        })

    cosine = embeddings.map_batches(cos, batch_format="pyarrow")

    # join: both sides are (doc_id, score) — one row per doc on each side,
    # so a hash join on doc_id sized to the cluster
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    fused = bm25.join(cosine, join_type="inner", on=("doc_id",),
                      num_partitions=n_parts)

    def fuse(t: pa.Table) -> pa.Table:
        s = (0.5 * t["score"].to_numpy(zero_copy_only=False)
             + 0.5 * t["cosine"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t["doc_id"],
                         "fused_score": pa.array(s)})

    return (fused.map_batches(fuse, batch_format="pyarrow")
            .sort(["fused_score", "doc_id"], descending=[True, False])
            .limit(k))
