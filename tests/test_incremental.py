"""Aggregation / incremental-update tests (SURVEY.md §2 A3/D4/S5).

Reference: KGGen.aggregate (kg_gen.py:291-304) unions sets and drops
cluster maps; MCP add_memories (mcp/server.py:130-166) generates + merges +
persists. Key semantic: re-canonicalization after aggregate can merge
surface forms across the two inputs.
"""
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.pipelines.incremental import add_pages, aggregate_graphs, load_graph
from kg_gen_ray.sources.pages import synthetic_pages_table


def _triples(rows):
    s, p, o = zip(*rows)
    return rd.from_arrow(pa.table({"subj": list(s), "pred": list(p),
                                   "obj": list(o)}))


def test_aggregate_unions_and_dedups(ray_session):
    a = _triples([("x", "r", "y"), ("x", "r", "z")])
    b = _triples([("x", "r", "y"), ("w", "r", "x")])
    res = aggregate_graphs([a, b])
    got = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    assert got == {("x", "r", "y"), ("x", "r", "z"), ("w", "r", "x")}


def test_aggregate_recanonicalizes_across_inputs(ray_session):
    # "cats" appears only in graph A, "cat" only in graph B; after
    # aggregation both collapse to one node (the reference's
    # cluster-after-aggregate semantics)
    a = _triples([("cats", "eat", "fish")])
    b = _triples([("cat", "eat", "mice")])
    res = aggregate_graphs([a, b])
    got = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    assert got == {("cat", "eat", "fish"), ("cat", "eat", "mice")}


def test_add_pages_first_and_second_batch(ray_session, tmp_path):
    cfg = PipelineConfig(chunk_size=300, extractor_concurrency=2,
                         salt_buckets=4)
    pages1 = rd.from_arrow(synthetic_pages_table(8, seed=1))
    pages2 = rd.from_arrow(synthetic_pages_table(8, seed=99))

    res1 = add_pages(None, pages1, cfg)
    n1 = res1.triples.count()
    out = str(tmp_path / "graph")
    res1.write(out)

    # reload the persisted store (MCP restart flow) and add a second batch
    existing = load_graph(out)
    res2 = add_pages(existing, pages2, cfg)
    n2 = res2.triples.count()
    assert n1 > 0
    assert n2 >= n1  # adding pages never shrinks the graph

    # idempotence: re-adding the same pages adds nothing
    res3 = add_pages(res2.triples, pages2, cfg)
    assert res3.triples.count() == n2


def test_aggregate_requires_input(ray_session):
    import pytest
    with pytest.raises(ValueError):
        aggregate_graphs([])


def test_recrawl_delta_composition(ray_session):
    """crawl_delta drives the incremental recrawl: build from the old
    snapshot, add ONLY the pages the diff marks added/changed — the
    result equals the batch build over old + the FULL new snapshot,
    because unchanged pages re-derive identical triples (distinct drops
    them). This is the O(delta) recrawl story end to end."""
    import pyarrow.compute as pc

    from kg_gen_ray.functions.web import crawl_delta

    cfg = PipelineConfig(chunk_size=300, extractor_concurrency=2,
                         salt_buckets=4)
    old = rd.from_arrow(synthetic_pages_table(10, seed=1))

    old_tbl = synthetic_pages_table(10, seed=1)
    urls = old_tbl["url"].to_pylist()
    removed, changed = set(urls[:2]), set(urls[2:5])
    keep = pa.array([u not in removed for u in urls])
    kept = old_tbl.filter(keep)
    text = pc.cast(kept["text"], pa.string())
    amended = pc.binary_join_element_wise(
        text, " Paris is the capital of France.", "")
    is_chg = pa.array([u in changed for u in kept["url"].to_pylist()])
    new_tbl = kept.set_column(
        kept.schema.get_field_index("text"), "text",
        pc.if_else(is_chg, amended, text))
    extra = synthetic_pages_table(3, seed=50)
    # synthetic urls are index-keyed (seed varies text only) — re-key the
    # brand-new pages so they don't collide with the old snapshot's urls
    extra = extra.set_column(
        extra.schema.get_field_index("url"), "url",
        pc.binary_join_element_wise(
            "https://new.example.org/", pc.cast(extra["url"], pa.string()),
            ""))
    new = rd.from_arrow(new_tbl).union(rd.from_arrow(extra))

    delta = crawl_delta(old, new).to_pandas()
    assert set(delta[delta.status == "removed"]["url"]) == removed
    assert set(delta[delta.status == "changed"]["url"]) == changed
    assert set(delta[delta.status == "added"]["url"]) \
        == set(extra["url"].to_pylist())

    delta_urls = set(delta[delta.status != "removed"]["url"])
    delta_pages = new.filter(
        lambda r: r["url"] in delta_urls)

    incr = add_pages(add_pages(None, old, cfg).triples, delta_pages, cfg)
    batch = add_pages(None, old.union(new), cfg)
    gi = {(r["subj"], r["pred"], r["obj"])
          for r in incr.triples.take_all()}
    gb = {(r["subj"], r["pred"], r["obj"])
          for r in batch.triples.take_all()}
    assert gi == gb and len(gi) > 0


def test_aggregate_drops_null_triple_parts(ray_session):
    """An aggregated EXTERNAL graph can carry null triple components; a
    triple with any NULL part is invalid and drops at canonicalize entry
    (our extractors never emit one — a null label would otherwise crash
    the canonicalize sort shuffle)."""
    a = _triples([("cats", "eat", "fish")])
    b = rd.from_arrow(pa.table({
        "subj": ["dog", None], "pred": [None, "eat"],
        "obj": ["bone", "mice"]}))
    res = aggregate_graphs([a, b])
    got = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    assert got == {("cats", "eat", "fish")}
