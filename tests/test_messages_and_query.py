"""Conversation ingestion (reference flattening rules) and graph retrieval."""

import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.sources.messages import conversations_to_pages, flatten_messages


def test_flatten_rules():
    msgs = [
        {"role": "system", "content": "be nice"},
        {"role": "user", "content": "Linda is Josh's mother."},
        {"role": "assistant", "content": "Noted."},
    ]
    # system dropped, user/assistant flattened as "role: content" lines
    assert flatten_messages(msgs) == \
        "user: Linda is Josh's mother.\nassistant: Noted."


def test_flatten_invalid_message_raises():
    with pytest.raises(ValueError):
        flatten_messages([{"role": "user"}])          # missing content
    with pytest.raises(ValueError):
        flatten_messages(["not a dict"])


def test_conversations_to_pages_pipeline(ray_session):
    convs = rd.from_items([
        {"conv_id": 1, "messages": [
            {"role": "user", "content": "The capital of France is Paris."},
            {"role": "assistant", "content": "oak is a type of tree."},
        ]},
    ])
    pages = conversations_to_pages(convs)
    rows = pages.take_all()
    assert rows[0]["url"] == "conv://1"
    assert "user: The capital of France is Paris." in rows[0]["text"]

    # the full pages shape: extract_text_stage (build_kg's FIRST stage,
    # which reads html unconditionally) must round-trip the flattened
    # text byte-identically from the html wrapper
    from kg_gen_ray.stages.extract_text import extract_text_stage
    ext = extract_text_stage(pages).take_all()
    assert ext[0]["text"] == rows[0]["text"]

    # conversations flow through the extraction pipeline end to end,
    # html first — the docstring's 'same pipeline' promise
    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    from kg_gen_ray.pipelines.kg_pipeline import raw_triples
    cfg = PipelineConfig(chunk_size=500, extractor_concurrency=1)
    triples = raw_triples(pages, cfg).take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples}
    assert ("oak", "is a type of", "tree") in got


def test_neighborhood_and_context(ray_session):
    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "b", "c", "x"], pa.string()),
        "pred": pa.array(["r1", "r2", "r3", "r4"], pa.string()),
        "obj": pa.array(["b", "c", "d", "y"], pa.string()),
    }))
    from kg_gen_ray.pipelines.query import context_sentences, neighborhood
    # depth 1 from 'a': only a->b
    n1 = {(r["subj"], r["obj"]) for r in
          neighborhood(triples, {"a"}, depth=1).take_all()}
    assert n1 == {("a", "b")}
    # depth 2: a->b plus b->c
    n2 = {(r["subj"], r["obj"]) for r in
          neighborhood(triples, {"a"}, depth=2).take_all()}
    assert n2 == {("a", "b"), ("b", "c")}
    # x/y component untouched
    assert all(s != "x" for s, _ in n2)
    ctx = context_sentences(triples, {"a"}, depth=2)
    assert "a r1 b." in ctx and "b r2 c." in ctx


def test_relevant_nodes(ray_session):
    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["alpha", "beta"], pa.string()),
        "pred": pa.array(["p", "p"], pa.string()),
        "obj": pa.array(["gamma", "delta"], pa.string()),
    }))
    from kg_gen_ray.pipelines.query import relevant_nodes
    out = relevant_nodes(triples, "alpha", k=2)
    assert len(out) == 2
    assert out[0] == "alpha"   # identical label embeds identically -> top hit


def test_relevant_nodes_matches_driver_reference(ray_session):
    """The distributed path (minted vec_ids, per-block partial top-k,
    broadcast winner lookup — no entity-table take_all) must reproduce a
    plain driver-side cosine ranking over the same hash embeddings,
    ordered (score desc, member asc)."""
    import numpy as np

    from kg_gen_ray.pipelines.kg_pipeline import entity_labels
    from kg_gen_ray.pipelines.query import relevant_nodes
    from kg_gen_ray.stages.embed import HashEmbedder

    ents = [f"node{i:02d}" for i in range(30)] + ["query term", "querx"]
    triples = rd.from_arrow(pa.table({
        "subj": pa.array(ents, pa.string()),
        "pred": pa.array(["p"] * len(ents), pa.string()),
        "obj": pa.array(ents[1:] + ents[:1], pa.string()),
    }))
    he = HashEmbedder(dim=32)
    members = sorted({r["member"] for r in
                      entity_labels(triples).take_all()})
    q = he.embed_one("query term").astype(np.float64)

    def cos(m):
        v = he.embed_one(m).astype(np.float64)
        return float(np.dot(v, q) / max(np.linalg.norm(v)
                                        * np.linalg.norm(q), 1e-300))

    want = [m for m in sorted(members, key=lambda m: (-cos(m), m))][:5]
    got = relevant_nodes(triples, "query term", k=5, dim=32)
    assert got == want


def test_neighborhood_join_dual_equals_broadcast(ray_session):
    """broadcast_limit=0 forces the Bloom + left_semi join frontier dual;
    it must agree with the broadcast path exactly, including triples
    matched on BOTH endpoints (deduped) and seeds with no triples."""
    from kg_gen_ray.pipelines.query import neighborhood
    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "b", "c", "x", "b"], pa.string()),
        "pred": pa.array(["r1", "r2", "r3", "r4", "r5"], pa.string()),
        "obj": pa.array(["b", "c", "d", "y", "a"], pa.string()),
    })).materialize()
    for seeds in ({"a"}, {"a", "zzz-no-such-entity"}, {"zzz"}):
        want = sorted((r["subj"], r["pred"], r["obj"]) for r in
                      neighborhood(triples, seeds, depth=2).take_all())
        got = sorted((r["subj"], r["pred"], r["obj"]) for r in
                     neighborhood(triples, seeds, depth=2,
                                  broadcast_limit=0).take_all())
        assert got == want
