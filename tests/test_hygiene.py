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
