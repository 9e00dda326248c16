"""Text-analysis operators: token stats, quality, fingerprint, lang-id."""

import hashlib

import pyarrow as pa

from kg_gen_ray.functions.text_analysis import (
    LangId, fingerprint, quality_score, token_stats)


def doc_batch(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_token_stats():
    out = token_stats(doc_batch(["a b a c", "x", "", "q q q"]))
    assert out["n_tokens"].to_pylist() == [4, 1, 1, 3]   # ''.split(' ') == ['']
    assert out["n_unique_tokens"].to_pylist() == [3, 1, 1, 1]


def test_quality_score():
    out = quality_score(doc_batch(["the cat sat on a mat", "nothing here"]))
    assert out["n_chars"].to_pylist() == [20, 12]
    assert out["n_tokens"].to_pylist() == [6, 2]
    assert out["stop_ratio"].to_pylist()[0] == 2 / 6   # 'the' and 'a'
    assert out["stop_ratio"].to_pylist()[1] == 0.0
    assert out["distinct_ratio"].to_pylist() == [1.0, 1.0]
    # all five bigrams distinct -> 1/5; "nothing here" -> 1/1
    assert out["top_bigram_frac"].to_pylist() == [1 / 5, 1.0]


def test_quality_score_repetition_signals():
    out = quality_score(doc_batch([
        "spam spam spam spam",       # one token repeated
        "buy now buy now buy now",   # repeated bigram
        "a b c d e",                 # all distinct
        "",                          # '' splits to [''], no bigrams
        "solo",                      # single token, no bigrams
    ]))
    assert out["distinct_ratio"].to_pylist() == [
        1 / 4, 2 / 6, 1.0, 1.0, 1.0]
    # "spam spam" x3 of 3 bigrams; "buy now" x3 of 5; max distinct 1/4
    assert out["top_bigram_frac"].to_pylist() == [
        1.0, 3 / 5, 1 / 4, 0.0, 0.0]


def test_fingerprint_is_md5():
    out = fingerprint(doc_batch(["hello"]))
    assert out["fp"].to_pylist() == [hashlib.md5(b"hello").hexdigest()]


def test_lang_id_heuristic():
    l = LangId()
    assert l.predict("the cat and the dog of the house") == "en"
    assert l.predict("der Hund und die Katze ist nicht da") == "de"
    assert l.predict("le chat est dans la maison et pas dehors") == "fr"
    assert l.predict("") == "unknown"
    assert l.predict("zzz qqq xxx") == "unknown"


def test_top_ngrams(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.text_analysis import top_ngrams

    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b c", "a b d", "a b c"]}))
    out = [(r["ngram"], r["n_occur"])
           for r in top_ngrams(docs, n=2, k=3).take_all()]
    assert out == [("a b", 3), ("b c", 2), ("b d", 1)]


def test_tfidf_top_terms(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.text_analysis import tfidf_top_terms

    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["common rare0 rare0", "common rare1"]}))
    rows = tfidf_top_terms(docs, k=1).take_all()
    top = {r["doc_id"]: r["term"] for r in rows}
    # the doc-specific term beats the corpus-common one
    assert top == {0: "rare0", 1: "rare1"}
    assert all(r["tfidf"] > 0 for r in rows)


def test_tfidf_join_dual_matches_broadcast(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.text_analysis import tfidf_top_terms

    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(6)),
        "text": ["alpha beta gamma", "alpha beta", "gamma delta epsilon",
                 "zeta zeta eta", "alpha eta theta", "beta gamma gamma"]}))

    def canon(rows):
        return sorted((r["doc_id"], r["term"], r["tfidf"]) for r in rows)

    bcast = canon(tfidf_top_terms(docs, k=2).take_all())
    joined = canon(tfidf_top_terms(docs, k=2,
                                   broadcast_limit=0).take_all())
    assert joined == bcast   # bit-identical scores, same tiebreak


def test_top_ngrams_trigrams_and_row_boundaries(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.text_analysis import top_ngrams

    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b c d", "a b c", ""]}))
    out = [(r["ngram"], r["n_occur"])
           for r in top_ngrams(docs, n=3, k=5).take_all()]
    # trigrams never cross document boundaries; empty doc contributes none
    assert out == [("a b c", 2), ("b c d", 1)]
