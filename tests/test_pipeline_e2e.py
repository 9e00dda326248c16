"""End-to-end pipeline conformance: P/R >= 0.95 vs closed-form truth,
graph invariants, no-cluster path, skew fixture, graph.json round-trip."""

import pytest
import os

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.pipelines.conformance import expected_canonical, precision_recall
from kg_gen_ray.pipelines.kg_pipeline import build_kg
from kg_gen_ray.sources.graph_json import read_graph_json, write_graph_json
from kg_gen_ray.sources.pages import synthetic_corpus, synthetic_pages_table


def run_corpus(n_pages=48, seed=11, cfg=None, **corpus_kw):
    tab = synthetic_pages_table(n_pages, seed, **corpus_kw)
    _, truth = synthetic_corpus(n_pages, seed, **corpus_kw)
    pages = rd.from_arrow(tab)
    res = build_kg(pages, cfg or PipelineConfig(
        chunk_size=300, extractor_concurrency=2, salt_buckets=4))
    actual = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    return res, actual, truth


def test_pr_gate(ray_session):
    res, actual, truth = run_corpus()
    pr = precision_recall(actual, expected_canonical(truth))
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_join_rewrite_equals_broadcast_rewrite(ray_session):
    # broadcast_alias_limit=0 forces the shuffle-join rewrite fallback
    # (the >broadcast-size alias-map path); results must be identical
    _, bcast, _ = run_corpus()
    _, joined, _ = run_corpus(cfg=PipelineConfig(
        chunk_size=300, extractor_concurrency=2, salt_buckets=4,
        broadcast_alias_limit=0))
    assert joined == bcast


def test_graph_invariants(ray_session):
    from kg_gen_ray.stages.materialize import (
        edge_types_table, nodes_table, top_entities)
    res, actual, _ = run_corpus()
    # ref invariant (kg_gen.py:238-242): edge set == distinct predicates
    edge_types = {r["pred"] for r in edge_types_table(res.triples).take_all()}
    assert edge_types == {p for _, p, _ in actual}
    # nodes == triple endpoints
    nodes = {r["entity"] for r in nodes_table(res.triples).take_all()}
    assert nodes == {s for s, _, _ in actual} | {o for _, _, o in actual}
    # degrees sum to 2 * n_triples
    degs = {r["entity"]: r["degree"] for r in nodes_table(res.triples).take_all()}
    assert sum(degs.values()) == 2 * len(actual)
    # top-k is the k max-degree entities
    top = top_entities(res.triples, 5).take_all()
    assert len(top) == 5
    top_set = [(r["entity"], r["degree"]) for r in top]
    assert top_set == sorted(degs.items(), key=lambda kv: (-kv[1], kv[0]))[:5]


def test_alias_map_invariants(ray_session):
    res, _, _ = run_corpus()
    rows = res.alias_map.take_all()
    members_by_rep = {}
    for r in rows:
        members_by_rep.setdefault((r["kind"], r["representative"]), set()).add(r["member"])
    # representative is a member of its own cluster (strict version of the
    # reference's "ideally from the cluster", _3_cluster_graph.py:16-22)
    for (kind, rep), members in members_by_rep.items():
        assert rep in members
    # canonical triples only use representatives
    ent_reps = {r["representative"] for r in rows if r["kind"] == "entity"}
    edge_reps = {r["representative"] for r in rows if r["kind"] == "edge"}
    for r in res.triples.take_all():
        assert r["subj"] in ent_reps and r["obj"] in ent_reps
        assert r["pred"] in edge_reps


def test_no_cluster_path(ray_session):
    cfg = PipelineConfig(chunk_size=300, cluster=False,
                         extractor_concurrency=2)
    res, actual, truth = run_corpus(cfg=cfg)
    # raw surface forms survive (no rewrite)
    assert actual == truth
    # alias map is the identity
    for r in res.alias_map.take_all():
        assert r["representative"] == r["member"]


def test_skew_fixture(ray_session):
    """Hot entity in ~30% of pages (FIXTURES.md §6): salted groupby still
    produces the correct merged clusters."""
    res, actual, truth = run_corpus(
        n_pages=64, seed=3, hot_entity="machine learning", hot_fraction=0.3)
    pr = precision_recall(actual, expected_canonical(truth))
    assert pr["f1"] >= 0.95, pr
    assert any(s == "machine learning" for s, _, _ in actual)


def test_chunk_size_independence(ray_session):
    """Canonical triples must not depend on the chunk size (facts are
    sentence-local; chunking never splits a sentence under the limit)."""
    _, a1, _ = run_corpus(cfg=PipelineConfig(chunk_size=200, extractor_concurrency=2))
    _, a2, _ = run_corpus(cfg=PipelineConfig(chunk_size=2000, extractor_concurrency=2))
    assert a1 == a2


def test_graph_json_roundtrip(tmp_path, ray_session):
    res, actual, _ = run_corpus(n_pages=16)
    ents = {s for s, _, _ in actual} | {o for _, _, o in actual}
    preds = {p for _, p, _ in actual}
    clusters = {}
    for r in res.alias_map.take_all():
        if r["kind"] == "entity":
            clusters.setdefault(r["representative"], set()).add(r["member"])
    path = str(tmp_path / "graph.json")
    write_graph_json(path, ents, actual, preds, entity_clusters=clusters)
    g = read_graph_json(path)
    assert g["entities"] == ents
    assert g["relations"] == actual
    assert g["edges"] == preds
    assert g["entity_clusters"] == clusters
    assert g["edge_clusters"] is None


def test_write_graph(tmp_path, ray_session):
    res, actual, _ = run_corpus(n_pages=16)
    counts = res.write(str(tmp_path / "out"))
    assert counts["triples"] == len(actual)
    assert os.path.isdir(tmp_path / "out" / "triples")
    t = rd.read_parquet(str(tmp_path / "out" / "triples")).take_all()
    assert {(r["subj"], r["pred"], r["obj"]) for r in t} == actual


def test_write_is_idempotent_on_rerun(tmp_path, ray_session):
    """Writing twice to the same --out must REPLACE the graph, not
    append part files that silently double every table."""
    res, actual, _ = run_corpus(n_pages=16)
    out = str(tmp_path / "out")
    res.write(out)
    counts = res.write(out)
    assert counts["triples"] == len(actual)
    t = rd.read_parquet(out + "/triples").take_all()
    assert len(t) == len(actual)


def test_rewrite_duals_pass_provenance_columns_through(ray_session):
    """Both rewrite duals must emit the SAME schema: the join dual used
    to project provenance (url, chunk_id) away while the broadcast dual
    passed it through, so crossing the broadcast threshold changed the
    result schema."""
    import pyarrow as pa

    from kg_gen_ray.stages.rewrite import rewrite_stage, rewrite_stage_join
    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["cats", "dog"]),
        "pred": pa.array(["is", "is"]),
        "obj": pa.array(["pet", "pet"]),
        "url": pa.array(["u1", "u2"]),
        "chunk_id": pa.array([0, 1], pa.int64()),
    }))
    amap = rd.from_arrow(pa.table({
        "kind": pa.array(["entity"]),
        "member": pa.array(["cats"]),
        "representative": pa.array(["cat"]),
    }))
    bcast = rewrite_stage(triples, {"cats": "cat"}, {})
    joined = rewrite_stage_join(triples, amap)
    assert bcast.schema().names == joined.schema().names
    want = {("cat", "is", "pet", "u1", 0), ("dog", "is", "pet", "u2", 1)}
    for out in (bcast, joined):
        got = {(r["subj"], r["pred"], r["obj"], r["url"], r["chunk_id"])
               for r in out.take_all()}
        assert got == want


def test_to_nx_export(ray_session):
    """Reference-parity DiGraph export (ref kg_gen.py:321-330): nodes =
    entities (incl. isolated), edges carry a relation attr, parallel
    edges collapse deterministically to the lexicographically greatest
    predicate, and the conformance graph round-trips edge-for-edge."""
    nx = pytest.importorskip("networkx")
    from kg_gen_ray.sources.graph_json import to_nx

    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "a", "b"]),
        "pred": pa.array(["likes", "knows", "sees"]),
        "obj": pa.array(["b", "b", "c"]),
    }))
    G = to_nx(triples, entities=["lonely"])
    assert isinstance(G, nx.DiGraph)
    assert set(G.nodes) == {"a", "b", "c", "lonely"}
    # (a, b) parallel edges collapse; sorted insertion -> greatest pred
    assert G.edges["a", "b"]["relation"] == "likes"
    assert G.edges["b", "c"]["relation"] == "sees"
    assert G.number_of_edges() == 2

    # conformance-pipeline graph: every canonical triple becomes an edge
    # (no parallel (s, o) pairs there, so nothing collapses)
    pages = synthetic_pages_table(n_pages=6, seed=7)
    out = build_kg(rd.from_arrow(pages), PipelineConfig())
    rows = [(r["subj"], r["pred"], r["obj"])
            for r in out.triples.take_all()]
    G2 = to_nx(out.triples)
    assert len({(s, o) for s, _, o in rows}) == G2.number_of_edges()
    for s, p, o in rows:
        if G2.edges[s, o]["relation"] == p:
            break
    else:
        pytest.fail("no triple survived as its own edge attribute")
