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
