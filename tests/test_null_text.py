"""Null-text robustness across document-facing operators.

A NULL text/html cell is an expected condition in a real crawl (fetch
errors, truncated WARC records). Engine-wide convention: a null text row
still exists but contributes zero tokens / paragraphs / chunks — it must
never crash a kernel (the historical failure shape: Arrow null list
length -> float64 NaN -> ``astype(int64)`` -> negative ``np.repeat``).
"""

import pyarrow as pa
import ray.data as rd


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma alpha", None,
                          "beta delta epsilon"], pa.string())}))


def test_tfidf_top_terms_null_text(ray_session):
    from kg_gen_ray.functions.text_analysis import tfidf_top_terms
    rows = tfidf_top_terms(_docs(), k=2).take_all()
    by_doc = {r["doc_id"] for r in rows}
    assert 1 not in by_doc          # null doc emits no terms
    assert {0, 2} <= by_doc
    # dual agrees
    dual = tfidf_top_terms(_docs(), k=2, broadcast_limit=0).take_all()
    canon = lambda rs: sorted((r["doc_id"], r["term"], r["tfidf"])
                              for r in rs)
    assert canon(dual) == canon(rows)


def test_bm25_null_text_scores_floor(ray_session):
    from kg_gen_ray.functions.bm25 import bm25_scores
    rows = {r["doc_id"]: r["score"]
            for r in bm25_scores(_docs(), "alpha").take_all()}
    assert set(rows) == {0, 1, 2}   # null doc still a corpus member
    assert rows[0] > rows[1]        # and scores at/below the others


def test_chunk_stage_null_text_emits_no_chunks(ray_session):
    from kg_gen_ray.stages.chunker import chunk_stage
    pages = rd.from_arrow(pa.table({
        "url": ["u0", "u1"],
        "text": pa.array(["One sentence here. Another one.", None],
                         pa.string()),
        "lang": ["en", "en"]}))
    out = chunk_stage(pages).take_all()
    assert {r["url"] for r in out} == {"u0"}


def test_extract_text_stage_null_html(ray_session):
    from kg_gen_ray.stages.extract_text import extract_text_stage
    pages = rd.from_arrow(pa.table({
        "url": ["u0", "u1"],
        "warc_ts": pa.array([1, 2], pa.int64()),
        "html": pa.array([b"<html><body><p>hi there</p></body></html>",
                          None], pa.binary()),
        "lang": ["en", "en"]}))
    out = {r["url"]: r["text"] for r in extract_text_stage(pages).take_all()}
    assert out["u1"] == ""          # null html -> empty text, row kept
    assert "hi there" in out["u0"]


def test_minhash_families_null_text(ray_session):
    from kg_gen_ray.functions.dedup import (
        minhash_signatures, shingle_stats, simhash_batch)
    from kg_gen_ray.functions.fast_text import minhash_signatures_fast
    sig = _docs().map_batches(minhash_signatures,
                              batch_format="pyarrow").take_all()
    assert {r["doc_id"] for r in sig} == {0, 1, 2}
    null_sig = next(r for r in sig if r["doc_id"] == 1)
    assert null_sig["h0"] == ""     # empty shingle set sentinel
    fast = _docs().map_batches(minhash_signatures_fast,
                               batch_format="pyarrow").take_all()
    assert len(fast) == 3
    sh = {r["doc_id"]: r["n_shingles"] for r in
          _docs().map_batches(shingle_stats,
                              batch_format="pyarrow").take_all()}
    assert sh[1] == 0
    sim = {r["doc_id"]: r["simhash"] for r in
           _docs().map_batches(simhash_batch,
                               batch_format="pyarrow").take_all()}
    assert sim[1] == 0


def test_fingerprint_and_langid_null_text(ray_session):
    import hashlib

    from kg_gen_ray.functions.text_analysis import LangId, fingerprint
    fp = {r["doc_id"]: r["fp"] for r in
          _docs().map_batches(fingerprint, batch_format="pyarrow")
          .take_all()}
    assert fp[1] is None            # md5(NULL) IS NULL, DuckDB parity
    assert fp[0] == hashlib.md5(
        b"alpha beta gamma alpha").hexdigest()
    lang = {r["doc_id"]: r["pred_lang"] for r in
            _docs().map_batches(LangId, concurrency=1,
                                batch_format="pyarrow").take_all()}
    assert lang[1] == "unknown"


def test_simhash_all_null_batch(ray_session):
    from kg_gen_ray.functions.dedup import simhash_batch
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([None, ""], pa.string())}))
    sim = {r["doc_id"]: r["simhash"] for r in
           docs.map_batches(simhash_batch,
                            batch_format="pyarrow").take_all()}
    assert sim == {0: 0, 1: 0}


def test_paragraph_dedup_null_text(ray_session):
    from kg_gen_ray.functions.paragraphs import paragraph_dedup
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["keep me\n\nshared para", None,
                          "shared para\n\nother"], pa.string())}))
    out = {r["doc_id"]: r["text"] for r in
           paragraph_dedup(docs).take_all()}
    # a null text has no paragraphs -> the doc ends empty -> dropped
    # (the operator's documented left-empty contract)
    assert 1 not in out
    assert "shared para" in out[0]
    assert "shared para" not in out[2]      # doc 0 (lower id) keeps it


def _events_with_null_ts():
    return rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([1000, 2000, 1500, None], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "value": pa.array([1.0, None, 3.0, 4.0], pa.float64())}))


def test_null_ts_rows_excluded_from_time_operators(ray_session):
    from kg_gen_ray.functions.sessions import sessionize
    from kg_gen_ray.functions.windows import asof_join, multi_window
    win = multi_window(_events_with_null_ts(),
                       [("tumbling", 60, 60)]).take_all()
    # 3 timestamped events, all inside one 60s window per key
    assert sum(r["n_events"] for r in win) == 3
    # null value still counts the event; Arrow/SQL sum skips the null
    a_row = next(r for r in win if r["event_type"] == "a")
    assert a_row["n_events"] == 2 and a_row["sum_value"] == 1.0
    sess = sessionize(_events_with_null_ts(), 1800).take_all()
    assert sum(r["n_events"] for r in sess) == 3
    # asof is a LEFT join: the null-ts left row is KEPT with null
    # payload (test_asof_join_null_keys_and_ts pins the full matrix);
    # null-ts RIGHT rows match nothing.
    asof = asof_join(_events_with_null_ts(), _events_with_null_ts(),
                     "user_id", "ts", "ts", ["value"]).take_all()
    assert len(asof) == 4
    import pandas as pd
    null_row = next(r for r in asof if r["l_event_id"] == 4)
    assert pd.isna(null_row["r_value"])


def test_null_embedding_rows_excluded(ray_session):
    import numpy as np

    from kg_gen_ray.functions.ann import brute_force_topk, ivf_assign
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.5, 0.5], None],
                              pa.list_(pa.float32()))}))
    top = brute_force_topk(emb, np.array([1.0, 0.0]), k=3)
    assert list(top["vec_id"]) == [0, 1]    # null vector never scores
    assign = ivf_assign(emb, np.array([[1.0, 0.0], [0.0, 1.0]])).take_all()
    assert {r["vec_id"] for r in assign} == {0, 1}


def test_exact_dedup_keeps_every_null_text_row(ray_session):
    """Unknown content is not *equal* content (SQL NULL = NULL is NULL):
    null-text rows are never merged, each survives with fp NULL, while
    real duplicates still collapse to the min id."""
    from kg_gen_ray.functions.dedup import exact_dedup
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", None, "d e", None, "a b c"],
                         pa.string())}))
    out = {r["doc_id"]: r["fp"] for r in exact_dedup(docs).take_all()}
    assert sorted(out) == [0, 1, 2, 3]      # 4 deduped into 0; 1,3 kept
    assert out[1] is None and out[3] is None
    assert out[0] is not None and out[0] == out[0]


def test_hash_sample_and_pack_sequences_null_text(ray_session):
    """hash_sample: md5(NULL) fails the SQL WHERE -> row excluded.
    pack_sequences: null text packs as a 0-token document (no NaN
    crash in the greedy fold)."""
    from kg_gen_ray.functions.sessions import hash_sample, pack_sequences
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lang": pa.array(["en", "en", "en"], pa.string()),
        "text": pa.array(["w x y z", None, "p q"], pa.string())}))
    sampled = {r["doc_id"]
               for r in hash_sample(docs, keep_mod=10).take_all()}
    assert sampled == {0, 2}                # keep-all mod never keeps NULL
    packed = {r["doc_id"]: (r["seq_id"], r["n_tokens"])
              for r in pack_sequences(docs, max_tokens=4).take_all()}
    assert packed[1][1] == 0                # null text -> 0 tokens
    assert len(packed) == 3                 # the row itself survives


def test_multimodal_null_payload_rows_dropped(ray_session):
    """A NULL binary payload cannot be decoded: every codec stage drops
    such rows at entry instead of crashing md5/PIL on None."""
    from kg_gen_ray.stages.multimodal import (
        features_stage, frame_sample_stage, probe_stage)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "media_type": pa.array(["image/png", "image/png"], pa.string()),
        "content": pa.array([b"payload-bytes", None], pa.binary())}))
    assert [r["media_id"] for r in probe_stage(media).take_all()] == [0]
    assert [r["media_id"] for r in features_stage(media).take_all()] == [0]
    frames = frame_sample_stage(media, n_frames=3).take_all()
    assert {r["media_id"] for r in frames} == {0} and len(frames) == 3


def test_quality_and_tokens_null_text(ray_session):
    from kg_gen_ray.functions.text_analysis import (
        quality_score, token_stats)
    qs = _docs().map_batches(quality_score, batch_format="pyarrow") \
        .take_all()
    assert len(qs) == 3             # row preserved, guards held
    null_q = next(r for r in qs if r["doc_id"] == 1)
    assert null_q["n_chars"] == 0 and null_q["n_tokens"] == 0
    tc = {r["doc_id"]: r["n_tokens"] for r in
          _docs().map_batches(token_stats,
                              batch_format="pyarrow").take_all()}
    assert tc[1] == 0
