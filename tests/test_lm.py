"""Bigram LM quality scoring (CCNet perplexity filter): oracle-exact
integer micro-nats, dual agreement, pre-trained-model reuse."""

import duckdb
import pyarrow as pa

import ray.data as rd

from kg_gen_ray.functions.lm import lm_counts, lm_score

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
    "text": pa.array([
        "the cat sat on the mat",
        "the cat sat",          # typical -> higher score than doc 2
        "zz qq",                # keyboard mash -> rare bigram
        "one",                  # single token: no bigrams
        None,                   # null text: no bigrams
    ]),
})

ORACLE_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
t AS (SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
      FROM toks),
bi AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
c1 AS (SELECT w AS w1, count(*) AS c1 FROM t GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS v FROM t),
s AS (SELECT bi.doc_id,
             CAST(floor(ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 1000000)
                  AS BIGINT) AS s
      FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT d.doc_id, COALESCE(sum(s.s), 0)::BIGINT AS lm_score_micro,
       count(s.s)::BIGINT AS n_bigrams
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
GROUP BY d.doc_id
"""


def oracle(docs: pa.Table):
    con = duckdb.connect()
    con.register("documents", docs)
    return {r[0]: (r[1], r[2]) for r in con.execute(ORACLE_SQL).fetchall()}


def test_matches_oracle_both_duals_any_layout(ray_session):
    want = oracle(DOCS)
    for parts in (1, 3):
        ds = rd.from_arrow(DOCS).repartition(parts)
        for kw in ({}, {"broadcast_limit": 0}):
            got = {r["doc_id"]: (r["lm_score_micro"], r["n_bigrams"])
                   for r in lm_score(ds, **kw).take_all()}
            assert got == want, (parts, kw)


def test_score_orders_quality(ray_session):
    got = {r["doc_id"]: r["lm_score_micro"] / max(r["n_bigrams"], 1)
           for r in lm_score(rd.from_arrow(DOCS)).take_all()}
    # per-bigram average: typical text beats the rare-bigram doc
    assert got[1] > got[2]
    assert got[3] == 0 and got[4] == 0


def test_pretrained_model_scores_other_corpus(ray_session):
    """CCNet deployment shape: train on a reference corpus, score new
    docs with the FROZEN model (scores reflect the reference counts)."""
    ref = rd.from_arrow(DOCS)
    model = lm_counts(ref)
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101, 102], pa.int64()),
        "text": pa.array(["the cat sat", "the cat sat",
                          "totally unseen words here"]),
    }))
    got = {}
    for kw in ({}, {"broadcast_limit": 0}):
        got[str(kw)] = {r["doc_id"]: (r["lm_score_micro"], r["n_bigrams"])
                        for r in lm_score(new, model=model,
                                          **kw).take_all()}
    # both duals agree, including the unseen-bigram backoff
    assert got["{}"] == got["{'broadcast_limit': 0}"]
    scores = got["{}"]
    # identical docs -> identical frozen-model scores
    assert scores[100] == scores[101]
    base = {r["doc_id"]: r["lm_score_micro"]
            for r in lm_score(ref).take_all()}
    assert scores[100][0] == base[1]   # same text, same model, same score
    # unseen text: every bigram backs off to 1/(0+V); finite, very low
    import math
    v = model[2]
    expect = 3 * math.floor(math.log(1.0 / v) * 1_000_000)
    assert scores[102] == (expect, 3)


def test_control_char_tokens_dual_agreement(ray_session):
    """Raw crawl text contains control characters; bigram keys must be
    exact (w1, w2) pairs — a separator-joined or numpy-U encoding
    collides on \\x1f and strips trailing NULs (reproduced divergence
    before the tuple-key fix)."""
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a\x1fb c", "a b\x1fc", "a q a r a s",
                          "a\x00 b"]),
    })
    ds = rd.from_arrow(docs).repartition(2)
    got = {}
    for kw in ({}, {"broadcast_limit": 0}):
        got[str(kw)] = {r["doc_id"]: (r["lm_score_micro"], r["n_bigrams"])
                        for r in lm_score(ds, **kw).take_all()}
    assert got["{}"] == got["{'broadcast_limit': 0}"]
    # the \x1f docs are distinct bigrams, never merged
    assert got["{}"][0] != got["{}"][2]


def test_perplexity_buckets_terciles_and_nulls(ray_session):
    """Per-language ascending terciles over mean micro-nats: within each
    language the bucket order follows the mean score; null/short text
    takes a NULL bucket; both lm_score duals agree."""
    from kg_gen_ray.functions.lm import perplexity_buckets
    texts, langs = [], []
    # 6 'en' docs with increasing repetition (higher mean log-prob),
    # 3 'de' docs, one null and one single-token doc
    for i in range(6):
        texts.append(" ".join(["common"] * (i + 1) + [f"rare{i}", "tail"]))
        langs.append("en")
    for i in range(3):
        texts.append(" ".join(["der"] * (i + 1) + [f"wort{i}"]))
        langs.append("de")
    texts += [None, "solo"]
    langs += ["en", "en"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())}))

    got = {}
    for kw in ({}, {"broadcast_limit": 0}):
        rows = perplexity_buckets(docs.repartition(3), **kw).take_all()
        got[str(kw)] = {r["doc_id"]: (r["mean_micro"], r["ppl_bucket"])
                        for r in rows}
    assert got["{}"] == got["{'broadcast_limit': 0}"]
    out = got["{}"]
    assert len(out) == len(texts)
    assert out[9][1] is None and out[10][1] is None   # no bigrams
    # every language shows all three buckets, tercile-sized
    en = [out[i][1] for i in range(6)]
    de = [out[i][1] for i in range(6, 9)]
    assert sorted(en) == ["head", "head", "middle", "middle",
                          "tail", "tail"]
    assert sorted(de) == ["head", "middle", "tail"]
    # ascending mean_micro never maps a later tercile before an earlier
    order = {"tail": 0, "middle": 1, "head": 2}
    for group in (range(6), range(6, 9)):
        pairs = sorted((out[i][0], order[out[i][1]]) for i in group)
        assert [b for _, b in pairs] == sorted(b for _, b in pairs)


def test_dsir_weights_orders_target_likeness(ray_session):
    """DSIR log-likelihood ratio: target-like documents weigh higher than
    off-domain ones; null/empty text yields (0, 0)/(x, 1); both duals
    agree exactly."""
    from kg_gen_ray.functions.lm import dsir_weights
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["cat sat mat", "the dog ran far",
                          "quantum flux capacitor array", None, "",
                          "cat cat sat"], pa.string())})).repartition(3)
    target = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array(["cat cat sat sat mat", "the cat sat"],
                         pa.string())}))
    got = {}
    for kw in ({}, {"broadcast_limit": 0}):
        got[str(kw)] = {r["doc_id"]: (r["dsir_micro"], r["n_tokens"])
                        for r in dsir_weights(docs, target,
                                              **kw).take_all()}
    assert got["{}"] == got["{'broadcast_limit': 0}"]
    out = got["{}"]
    assert len(out) == 6
    per_tok = {i: out[i][0] / out[i][1] for i in (0, 1, 2)}
    assert per_tok[0] > per_tok[1] > per_tok[2]   # cat-sat > dog > quantum
    assert out[3] == (0, 0)                       # null text
    assert out[4][1] == 1                         # "" is one empty token
