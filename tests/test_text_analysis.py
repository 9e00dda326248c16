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


def test_gopher_repetition_hand_cases():
    from kg_gen_ray.functions.text_analysis import gopher_repetition
    out = gopher_repetition(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # 21 one-char tokens; "a b" occurs 4x (8/21); "a b c d e"
            # windows at 4 and 12 cover tokens 4..19 (16/21)
            "a b a b a b c d e f g h a b c d e f g h x",
            "hello world hello world",
            "",
            "one two three four",       # < 5 tokens, no 5-gram
        ]),
        "line_text": pa.array([
            "foo\nbar\nfoo\nbaz",        # 1 repeat of 4; 3 of 12 chars
            "one",
            "",
            "x\nx\nx",                   # 2 repeats of 3; 2 of 3 chars
        ]),
    }), line_col="line_text")
    assert out["dup_line_frac"].to_pylist() == [1 / 4, 0.0, 0.0, 2 / 3]
    assert out["dup_line_char_frac"].to_pylist() == [
        3 / 12, 0.0, 0.0, 2 / 3]
    # doc3: all bigrams count 1, tie -> longest ("three four", 9 chars)
    assert out["top_2gram_char_frac"].to_pylist() == [
        8 / 21, 1.0, 0.0, 9 / 15]
    # doc1: "hello world hello" (15 chars) x ... each trigram once ->
    # count 1, longest trigram 15 chars of 20
    assert out["top_3gram_char_frac"].to_pylist()[1] == 15 / 20
    assert out["dup_5gram_char_frac"].to_pylist() == [
        16 / 21, 0.0, 0.0, 0.0]


def test_gopher_repetition_duckdb_oracle():
    """Random templated docs vs a DuckDB replay of every column."""
    import random

    import duckdb

    from kg_gen_ray.functions.text_analysis import gopher_repetition

    rng = random.Random(7)
    vocab = ["alpha", "b", "gamma", "dd", "ee", "zeta"]
    texts, lines = [], []
    for _ in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        texts.append(" ".join(toks))
        lines.append("\n".join(
            rng.choice(["l1", "l2", "longer line"])
            for _ in range(rng.randrange(1, 6))))
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "line_text": pa.array(lines, pa.string()),
    })
    got = gopher_repetition(docs, line_col="line_text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute("""
WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
              generate_subscripts(string_split(text,' '),1) AS pos
              FROM documents),
tc AS (SELECT doc_id, sum(length(w)) AS tot FROM toks GROUP BY doc_id),
g2 AS (SELECT a.doc_id, a.w AS w1, b.w AS w2,
              min(length(a.w)+length(b.w)) AS chars, count(*) AS c
       FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.pos=a.pos+1
       GROUP BY a.doc_id, a.w, b.w),
t2 AS (SELECT doc_id, max(c) AS maxc FROM g2 GROUP BY doc_id),
b2 AS (SELECT g2.doc_id, t2.maxc AS c, max(g2.chars) AS bch
       FROM g2 JOIN t2 ON g2.doc_id=t2.doc_id AND g2.c=t2.maxc
       GROUP BY g2.doc_id, t2.maxc),
g3 AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3,
              min(length(a.w)+length(b.w)+length(c.w)) AS chars,
              count(*) AS c
       FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.pos=a.pos+1
                   JOIN toks c ON a.doc_id=c.doc_id AND c.pos=a.pos+2
       GROUP BY a.doc_id, a.w, b.w, c.w),
t3 AS (SELECT doc_id, max(c) AS maxc FROM g3 GROUP BY doc_id),
b3 AS (SELECT g3.doc_id, t3.maxc AS c, max(g3.chars) AS bch
       FROM g3 JOIN t3 ON g3.doc_id=t3.doc_id AND g3.c=t3.maxc
       GROUP BY g3.doc_id, t3.maxc),
g5 AS (SELECT a.doc_id, a.pos, a.w AS w1,b.w AS w2,c.w AS w3,
              d.w AS w4,e.w AS w5
       FROM toks a JOIN toks b ON a.doc_id=b.doc_id AND b.pos=a.pos+1
                   JOIN toks c ON a.doc_id=c.doc_id AND c.pos=a.pos+2
                   JOIN toks d ON a.doc_id=d.doc_id AND d.pos=a.pos+3
                   JOIN toks e ON a.doc_id=e.doc_id AND e.pos=a.pos+4),
ds AS (SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           count(*) OVER (PARTITION BY doc_id,w1,w2,w3,w4,w5) AS c
    FROM g5) WHERE c >= 2),
cov AS (SELECT DISTINCT t.doc_id, t.pos
        FROM toks t JOIN ds s
          ON t.doc_id=s.doc_id AND t.pos BETWEEN s.pos AND s.pos+4),
c5 AS (SELECT cov.doc_id, sum(length(t.w)) AS chars
       FROM cov JOIN toks t ON cov.doc_id=t.doc_id AND cov.pos=t.pos
       GROUP BY cov.doc_id),
lines AS (SELECT doc_id, unnest(string_split(line_text, chr(10))) AS l
          FROM documents),
lc AS (SELECT doc_id, l, length(l) AS ll, count(*) AS c
       FROM lines GROUP BY doc_id, l),
ls AS (SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
              sum((c-1)*ll) AS dupchars, sum(c*ll) AS totchars
       FROM lc GROUP BY doc_id)
SELECT d.doc_id,
  (ls.n_lines-ls.n_distinct)::DOUBLE/greatest(ls.n_lines,1)
    AS dup_line_frac,
  ls.dupchars::DOUBLE/greatest(ls.totchars,1) AS dup_line_char_frac,
  coalesce(b2.c*b2.bch,0)::DOUBLE/greatest(tc.tot,1)
    AS top_2gram_char_frac,
  coalesce(b3.c*b3.bch,0)::DOUBLE/greatest(tc.tot,1)
    AS top_3gram_char_frac,
  coalesce(c5.chars,0)::DOUBLE/greatest(tc.tot,1) AS dup_5gram_char_frac
FROM documents d JOIN ls USING (doc_id) JOIN tc USING (doc_id)
LEFT JOIN b2 USING (doc_id) LEFT JOIN b3 USING (doc_id)
LEFT JOIN c5 USING (doc_id)
ORDER BY doc_id""").fetchdf().reset_index(drop=True)
    for col in want.columns:
        g = got[col].tolist()
        w = want[col].tolist()
        assert all(abs(a - b) < 1e-12 for a, b in zip(g, w)), col


def test_gopher_quality_hand_cases():
    from kg_gen_ray.functions.text_analysis import gopher_quality
    out = gopher_quality(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            # 6 tokens, 21 chars; 1 '#', 1 '...'; stopwords the+of
            "the #tag of doom wins...",
            "",
            "12 34 !!",                 # no alpha words
        ]),
        "line_text": pa.array([
            "- bullet\nplain\nends...",
            "",
            "• b\nx",
        ]),
    }), line_col="line_text")
    assert out["mean_word_len"].to_pylist() == [20 / 5, 0.0, 6 / 3]
    assert out["alpha_word_frac"].to_pylist() == [1.0, 0.0, 0.0]
    assert out["symbol_word_ratio"].to_pylist() == [2 / 5, 0.0, 0.0]
    assert out["stop_hits"].to_pylist() == [2, 0, 0]
    assert out["bullet_line_frac"].to_pylist() == [1 / 3, 0.0, 1 / 2]
    assert out["ellipsis_line_frac"].to_pylist() == [1 / 3, 0.0, 0.0]


def test_gopher_quality_duckdb_oracle():
    """Random docs vs a DuckDB replay of every gopher_quality column."""
    import random

    import duckdb

    from kg_gen_ray.functions.text_analysis import gopher_quality

    rng = random.Random(11)
    vocab = ["the", "be#", "zz", "...", "12", "with", "gamma...", "#"]
    texts, lines = [], []
    for _ in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        texts.append(" ".join(toks))
        lines.append("\n".join(
            rng.choice(["- b", "• b", "plain", "ends...", ""])
            for _ in range(rng.randrange(1, 6))))
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "line_text": pa.array(lines, pa.string()),
    })
    got = gopher_quality(docs, line_col="line_text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs.to_pandas())
    want = con.execute("""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
agg AS (SELECT doc_id, count(*) AS n, sum(length(w)) AS tot,
        sum(CASE WHEN regexp_matches(w, '[a-zA-Z]') THEN 1 ELSE 0 END)
          AS alpha_words,
        count(DISTINCT CASE WHEN lower(w) IN
            ('the','be','to','of','and','that','have','with')
            THEN lower(w) END) AS stop_hits
        FROM toks GROUP BY doc_id),
lines AS (SELECT doc_id, unnest(string_split(line_text, chr(10))) AS l
          FROM documents),
lq AS (SELECT doc_id, count(*) AS n,
       sum(CASE WHEN l LIKE '- %' OR l LIKE '• %' THEN 1 ELSE 0 END) AS nb,
       sum(CASE WHEN l LIKE '%...' THEN 1 ELSE 0 END) AS ne
       FROM lines GROUP BY doc_id)
SELECT d.doc_id,
  agg.tot::DOUBLE / greatest(agg.n, 1) AS mean_word_len,
  agg.alpha_words::DOUBLE / greatest(agg.n, 1) AS alpha_word_frac,
  ((length(d.text) - length(replace(d.text, '#', '')))
   + (length(d.text) - length(replace(d.text, '...', ''))) / 3
  )::DOUBLE / greatest(agg.n, 1) AS symbol_word_ratio,
  agg.stop_hits::BIGINT AS stop_hits,
  lq.nb::DOUBLE / greatest(lq.n, 1) AS bullet_line_frac,
  lq.ne::DOUBLE / greatest(lq.n, 1) AS ellipsis_line_frac
FROM documents d JOIN agg USING (doc_id) JOIN lq USING (doc_id)
ORDER BY doc_id""").fetchdf().reset_index(drop=True)
    for col in want.columns:
        g = got[col].tolist()
        w = want[col].tolist()
        assert all(abs(a - b) < 1e-12 for a, b in zip(g, w)), col


def test_ngram_groups_pack_matches_lexsort_fallback():
    """The radix-packed single-argsort path and the multi-key lexsort
    fallback must produce IDENTICAL groupings — adding a constant offset
    to every code preserves groups and order but inflates the vocabulary
    past the 62-bit capacity check, forcing the fallback."""
    import numpy as np

    from kg_gen_ray.functions.text_analysis import _ngram_groups

    rng = np.random.RandomState(7)
    for n in (2, 3, 4):
        for trial in range(20):
            n_rows = rng.randint(1, 6)
            lens = rng.randint(0, 12, size=n_rows)
            row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            codes = rng.randint(0, 9, size=lens.sum()).astype(np.int64)
            fast = _ngram_groups(codes, row_idx, n)
            # offset inflates vocab so vocab**n >= 2**62 -> lexsort path
            offset = (1 << 62) // 2
            slow = _ngram_groups(codes + offset, row_idx, n)
            for a, b in zip(fast, slow):
                assert np.array_equal(a, b), (n, trial)


def test_lang_id_vectorized_matches_serial_predict():
    """predict_batch (one RE2 split + per-lang is_in + segment sums) is
    row-for-row identical to the serial predict fold — fuzzed over
    marker mixes, ties, case, punctuation runs, null/empty/no-letter
    rows, and a sliced (non-zero offset) Arrow array."""
    import numpy as np
    import pyarrow as pa

    from kg_gen_ray.functions.text_analysis import _LANG_MARKERS, LangId

    rng = np.random.default_rng(77)
    vocab = sorted(set().union(*_LANG_MARKERS.values())) + [
        "zzz", "Quux", "123", "naive"]
    rows = [None, "", "   ", "!!! ??? 42", "THE Der le el",  # tie shapes
            "the und", "und the"]
    for _ in range(200):
        k = rng.integers(0, 12)
        words = rng.choice(vocab, size=k).tolist()
        if rng.random() < 0.3:
            words = [w.upper() for w in words]
        rows.append(" ,;".join(words) + rng.choice(["", " ...", "\t9"]))
    lid = LangId()
    arr = pa.array(rows, pa.string())
    got = lid.predict_batch(arr).to_pylist()
    assert got == [lid.predict(t) for t in rows]
    # sliced array (non-zero offset) takes the same path
    got_slice = lid.predict_batch(arr.slice(3, 50)).to_pylist()
    assert got_slice == [lid.predict(t) for t in rows[3:53]]
