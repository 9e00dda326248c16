"""End-to-end hygiene pipeline: each stage's effect visible in the
counts, final packing well-formed, stage skips honored."""

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.pipelines.hygiene import prepare_training_data

BENCH_Q = ("what is the capital of france and when was it founded "
           "by the original settlers")


def corpus():
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, base, "en"),                          # dedup cluster {0,1}
        (1, base + " tail", "en"),
        (2, "email me at a@b.com " + " ".join(f"x{i}" for i in range(30)),
         "en"),                                   # PII, survives
        (3, "intro " + BENCH_Q + " outro", "en"), # contaminated
        (4, " ".join(f"y{i}" for i in range(40)), "de"),
        (5, " ".join(f"z{i}" for i in range(40)), "de"),
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string())}))


def bench():
    return rd.from_arrow(pa.table({
        "text": pa.array([BENCH_Q], pa.string())}))


def test_full_flow_counts_and_packing(ray_session):
    res = prepare_training_data(corpus(), bench(), k_contam=8,
                                per_group_cap=10, max_tokens=64)
    assert res.counts["input"] == 6
    assert res.counts["scrubbed"] == 6          # rewrite, not a filter
    assert res.counts["decontaminated"] == 5    # doc 3 leaked
    assert res.counts["deduped"] == 4           # doc 1 near-dups doc 0
    assert res.counts["capped"] == 4            # under the cap

    kept_ids = sorted(r["doc_id"] for r in res.clean_docs.take_all())
    assert kept_ids == [0, 2, 4, 5]
    # PII was scrubbed BEFORE anything hashed
    texts = {r["doc_id"]: r["text"] for r in res.clean_docs.take_all()}
    assert "<EMAIL>" in texts[2] and "a@b.com" not in texts[2]

    packed = res.packed.take_all()
    assert sorted(r["doc_id"] for r in packed) == kept_ids
    for r in packed:
        assert r["n_tokens"] > 0 and r["seq_id"] >= 0


def test_optional_stages_skip(ray_session):
    res = prepare_training_data(corpus(), benchmark=None,
                                per_group_cap=None, max_tokens=64)
    assert "decontaminated" not in res.counts
    assert "capped" not in res.counts
    assert res.counts["deduped"] == 5           # only the near-dup drops


def test_paragraph_and_lm_stages(ray_session):
    """The CCNet pair inside the composition: paragraph dedup rewrites
    boilerplate away before content hashing, and the LM filter drops the
    lowest-quality tail; the audit counts expose both cuts."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    import random

    footer = "all rights reserved forever and ever"
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(200)]
    bodies = [" ".join(rng.sample(vocab, 12)) for _ in range(6)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([b + "\n\n" + footer for b in bodies]),
        "lang": pa.array(["en"] * 6),
    }))
    res = prepare_training_data(docs, dedup_paragraphs=True,
                                min_lm_score_micro=None,
                                dedup_method="fast")
    rows = {r["doc_id"]: r["text"] for r in res.clean_docs.take_all()}
    assert res.counts["paragraph_deduped"] == 6
    assert rows[0].endswith(footer)          # first keeps the footer
    for i in range(1, 6):
        assert i in rows and footer not in rows[i]
    # schema survives the id-join re-attach
    assert set(res.clean_docs.schema().names) == {"doc_id", "text", "lang"}

    # LM filter: typical docs share a common phrase (high-count bigrams)
    # plus distinct filler (so near-dup cannot collapse them); the
    # keyboard-mash doc has only once-seen bigrams. Threshold is
    # self-calibrated from the scores the frozen pipeline would see.
    from kg_gen_ray.functions.lm import lm_score

    phrase = "the quick brown fox jumps over the lazy sleeping dog"
    texts = [phrase + " " + " ".join(rng.sample(vocab, 20))
             for _ in range(7)] + ["zq1 xv2 jk3 qz4 vx5 kj6 zq7 pm8"]
    docs2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 8),
    }))
    avgs = {r["doc_id"]: r["lm_score_micro"] / max(r["n_bigrams"], 1)
            for r in lm_score(docs2).take_all()}
    mash = avgs[7]
    typical_min = min(avgs[i] for i in range(7))
    assert mash < typical_min          # separation exists
    thresh = int((mash + typical_min) / 2)
    res2 = prepare_training_data(docs2, min_lm_score_micro=thresh,
                                 dedup_method="fast")
    kept = {r["doc_id"] for r in res2.clean_docs.take_all()}
    assert 7 not in kept and kept == set(range(7))
    assert res2.counts["lm_filtered"] == 7


def test_c4_stage_in_composition(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array([
            "Good first line stays here.\nGood second line stays put.\n"
            "Good third line stays around.",
            "no punctuation so it dies\nshort.\nalso nothing survives",
            "Lorem ipsum makes this page vanish.\nEven good lines go.\n"
            "All three of them do.",
        ]),
        "lang": pa.array(["en"] * 3),
    }))
    res = prepare_training_data(docs, c4_rules=True, dedup_method="fast")
    rows = {r["doc_id"]: r["text"] for r in res.clean_docs.take_all()}
    assert set(rows) == {0}
    assert len(rows[0].split("\n")) == 3
    assert res.counts["c4_cleaned"] == 1
    assert set(res.clean_docs.schema().names) == {"doc_id", "text", "lang"}


def test_gopher_stage_in_composition(ray_session):
    """Gopher cut drops rule-failing docs after scrub; unknown rule keys
    are rejected loudly."""
    import pytest

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps with energy",   # passes
            "zz1 zz2 zz3 zz4 zz5",                     # no stopwords
            "the extraordinarily sesquipedalian verbiage overwhelms",
        ], pa.string()),
        "lang": pa.array(["en", "en", "en"], pa.string())}))
    res = prepare_training_data(
        docs, benchmark=None, per_group_cap=10, max_tokens=64,
        gopher_rules={"min_stop_hits": 1, "max_mean_word_len": 6.0,
                      "max_ellipsis_line_frac": 1.0,
                      "max_bullet_line_frac": 1.0})
    assert res.counts["scrubbed"] == 3
    assert res.counts["gopher_filtered"] == 1   # docs 1 (stops) + 2 (mwl)
    kept = res.clean_docs.take_all()
    assert [r["doc_id"] for r in kept] == [0]

    with pytest.raises(ValueError, match="unknown gopher_rules"):
        prepare_training_data(docs, benchmark=None,
                              gopher_rules={"max_weird": 1.0},
                              count_stages=False)


def test_span_stage_in_composition(ray_session):
    """span_k removes a repeated 3-gram's second occurrence mid-doc and
    the count ledger records the stage."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta " + " ".join(f"a{i}" for i in range(10)),
            "intro alpha beta gamma outro " + " ".join(
                f"b{i}" for i in range(10)),
        ], pa.string()),
        "lang": pa.array(["en", "en"], pa.string())}))
    res = prepare_training_data(docs, benchmark=None, per_group_cap=10,
                                max_tokens=64, span_k=3)
    assert res.counts["span_deduped"] == 2
    kept = {r["doc_id"]: r["text"] for r in res.clean_docs.take_all()}
    assert kept[0].startswith("alpha beta gamma delta")
    assert "alpha" not in kept[1] and kept[1].startswith("intro")


def test_input_hint_shape_end_to_end(ray_session):
    """The switch-over path for a reference user: a Common-Crawl-style
    table in exactly the input_hint schema (url, warc_ts, html, text,
    lang) with NO integer key and one re-crawled url, driven through
    extract-text -> id minting -> the full hygiene flow."""
    import datetime as dt

    from kg_gen_ray.functions.ids import mint_doc_ids
    from kg_gen_ray.stages.extract_text import extract_text_stage

    def page(i, body):
        return ("<html><head><title>t</title></head><body>"
                f"<p>{body}</p></body></html>").encode()

    bodies = [
        " ".join(f"w{i}" for i in range(40)),          # near-dup pair {0,1}
        " ".join(f"w{i}" for i in range(40)) + " tail",
        "email me at a@b.com " + " ".join(f"x{i}" for i in range(30)),
        " ".join(f"y{i}" for i in range(40)),
        " ".join(f"z{i}" for i in range(40)),
    ]
    urls = [f"https://site-{i}.org/a" for i in range(5)]
    # re-crawl: url 4 captured twice; the later crawl must lose
    urls.append(urls[4])
    bodies.append(bodies[4] + " updated")
    ts = [dt.datetime(2026, 1, 1, 0, 0, i) for i in range(5)] \
        + [dt.datetime(2026, 1, 2)]
    langs = ["en", "en", "en", "de", "de", "de"]
    pages = rd.from_arrow(pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array([page(i, b) for i, b in enumerate(bodies)],
                         pa.binary()),
        "text": pa.array([""] * 6),
        "lang": pa.array(langs),
    })).repartition(3)

    docs = extract_text_stage(pages)          # html -> text, html dropped
    minted = mint_doc_ids(docs, key_col="url", tiebreak_col="warc_ts")
    res = prepare_training_data(minted, url_col="url", max_tokens=64)

    assert res.counts["input"] == 6
    assert res.counts["url_deduped"] == 5     # the re-crawl dropped
    assert res.counts["deduped"] == 4         # near-dup pair collapsed
    texts = {r["url"]: r["text"] for r in res.clean_docs.take_all()}
    assert len(texts) == 4
    # the re-crawled url survives via its EARLIEST crawl's text
    assert texts[urls[4]].startswith("z0 ") and "updated" not in texts[urls[4]]
    assert "<EMAIL>" in texts[urls[2]]
