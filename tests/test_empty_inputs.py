"""Zero-row inputs flow through every operator family without error.

A resumable partitioned run can legitimately hand an operator an empty
partition (all pages filtered, an empty re-crawl shard); the engine
convention is the same as SQL's — zero rows in, zero rows out, schema
intact, no crash. These run in well under a second each; the point is
pinning the property, not the output.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _empty_docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))


def _empty_events():
    return rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())}))


def test_dedup_family_empty(ray_session):
    from kg_gen_ray.functions.dedup import (
        exact_dedup, minhash_signatures, near_dup_canonical)
    assert exact_dedup(_empty_docs()).take_all() == []
    assert _empty_docs().map_batches(
        minhash_signatures, batch_format="pyarrow").take_all() == []
    assert near_dup_canonical(_empty_docs()).take_all() == []


def test_text_family_empty(ray_session):
    from kg_gen_ray.functions.bm25 import bm25_scores
    from kg_gen_ray.functions.lm import lm_score
    from kg_gen_ray.functions.paragraphs import paragraph_dedup
    from kg_gen_ray.functions.text_analysis import tfidf_top_terms
    assert tfidf_top_terms(_empty_docs()).take_all() == []
    assert bm25_scores(_empty_docs(), "alpha").take_all() == []
    assert paragraph_dedup(_empty_docs()).take_all() == []
    assert lm_score(_empty_docs()).take_all() == []


def test_events_family_empty(ray_session):
    from kg_gen_ray.functions.sessions import (
        grouped_topk, hash_sample, sessionize)
    from kg_gen_ray.functions.windows import asof_join, multi_window
    assert multi_window(_empty_events(),
                        [("tumbling", 60, 60),
                         ("sliding", 300, 60)]).take_all() == []
    assert sessionize(_empty_events(), 1800).take_all() == []
    assert grouped_topk(_empty_events(), "user_id", "value", 3,
                        "event_id").take_all() == []
    assert asof_join(_empty_events(), _empty_events(), "user_id", "ts",
                     "ts", ["value"]).take_all() == []
    sampled = hash_sample(
        _empty_events().add_column(
            "text", lambda b: pa.array([], pa.string())), 3)
    assert sampled.take_all() == []


def test_ann_and_kg_empty(ray_session):
    from kg_gen_ray.functions.ann import brute_force_topk
    from kg_gen_ray.pipelines.kg_pipeline import build_kg
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert len(brute_force_topk(emb, np.zeros(8), k=3)) == 0
    pages = rd.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.int64()),
        "html": pa.array([], pa.binary()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string())}))
    assert build_kg(pages).triples.take_all() == []


def test_session10_ops_empty(ray_session):
    from kg_gen_ray.functions.ann import brute_force_topk_multi, semdedup
    from kg_gen_ray.functions.sessions import mix_sample
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    cents = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert semdedup(emb, cents, threshold=0.5).take_all() == []
    assert len(brute_force_topk_multi(emb, cents, k=3)) == 0
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string())}))
    assert mix_sample(docs, "lang", {"en": 0.5}).take_all() == []
