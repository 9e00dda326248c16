"""Graph stats / view-model tests (SURVEY.md §2 A6, S6, F3).

Semantics target: /root/reference/src/kg_gen/utils/visualize_kg.py:97-234
(degree counters, BFS components, stats payload) and :16-23 (color hash).
"""
import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.stages.viz import (
    components_table,
    degree_table,
    extended_stats,
    string_to_color,
    top_relations,
    view_model,
)

# two components: {a,b,c} via a->b->c, {x,y}; self-loop on a
TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "likes", "a"),
    ("x", "knows", "y"),
]


def _triples():
    s, p, o = zip(*TRIPLES)
    return rd.from_arrow(pa.table({"subj": list(s), "pred": list(p),
                                   "obj": list(o)}))


def test_degree_table(ray_session):
    deg = {r["entity"]: (r["degree"], r["indegree"], r["outdegree"])
           for r in degree_table(_triples()).take_all()}
    assert deg["a"] == (3, 1, 2)     # self-loop counts twice in degree
    assert deg["b"] == (2, 1, 1)
    assert deg["c"] == (1, 1, 0)
    assert deg["x"] == (1, 0, 1)
    assert deg["y"] == (1, 1, 0)


def test_top_relations_order(ray_session):
    top = top_relations(_triples(), 10).take_all()
    assert [(r["pred"], r["n_triples"]) for r in top] == [
        ("knows", 3), ("likes", 1)]


def test_components(ray_session):
    comp = {r["node"]: r["component"]
            for r in components_table(_triples()).take_all()}
    assert comp["a"] == comp["b"] == comp["c"]
    assert comp["x"] == comp["y"]
    assert comp["a"] != comp["x"]


def test_extended_stats(ray_session):
    st = extended_stats(_triples())
    assert st["entities"] == 5
    assert st["relations"] == 4
    assert st["relationTypes"] == 2
    assert st["components"] == 2
    assert st["isolatedEntities"] == 0
    assert st["averageDegree"] == round(8 / 5, 2)
    assert st["density"] == round(4 / (5 * 4), 3)


def test_extended_stats_with_isolated_entities(ray_session):
    ents = rd.from_arrow(pa.table(
        {"entity": ["a", "b", "c", "x", "y", "lonely"]}))
    st = extended_stats(_triples(), entities=ents)
    assert st["entities"] == 6
    assert st["isolatedEntities"] == 1
    assert st["components"] == 3     # lonely is its own component


def test_view_model_shape_and_stats(ray_session):
    vm = view_model(_triples())
    assert {n["id"] for n in vm["nodes"]} == {"a", "b", "c", "x", "y"}
    assert len(vm["edges"]) == 4
    assert vm["stats"]["components"] == 2
    assert vm["components"][0]["size"] == 3
    assert vm["components"][0]["members"] == ["a", "b", "c"]
    assert vm["topEntities"][0]["label"] == "a"
    assert vm["topRelations"][0] == {"predicate": "knows", "count": 3}
    # every edge id unique, tooltip matches reference format
    ids = [e["id"] for e in vm["edges"]]
    assert len(set(ids)) == len(ids)
    assert vm["edges"][0]["tooltip"].count("—") == 1


def test_view_model_size_guard(ray_session):
    with pytest.raises(ValueError, match="small-graph"):
        view_model(_triples(), max_triples=2)


def test_color_hash_reference_parity():
    # values computed with the reference's _string_to_color implementation
    import colorsys
    import hashlib

    def ref_color(label):
        digest = hashlib.sha1(label.encode("utf-8")).hexdigest()
        hue = int(digest[:2], 16) / 255.0
        sat = 0.55 + (int(digest[2:4], 16) / 255.0) * 0.3
        light = 0.45 + (int(digest[4:6], 16) / 255.0) * 0.25
        r, g, b = colorsys.hls_to_rgb(hue, light, sat)
        return f"#{int(r * 255):02x}{int(g * 255):02x}{int(b * 255):02x}"

    for label in ["entity::alice", "predicate::knows", "äöü"]:
        assert string_to_color(label) == ref_color(label)


def test_html_sink_payload_equals_view_model(ray_session, tmp_path):
    """S6 parity: the JSON injected into the emitted HTML is exactly the
    view_model() payload (ref visualize_kg.py:279-283 mechanism)."""
    import json
    import re

    from kg_gen_ray.stages.viz import write_html

    path = str(tmp_path / "graph.html")
    write_html(_triples(), path)
    html = open(path, encoding="utf-8").read()
    m = re.search(r'<script type="application/json" id="viz-data">\n(.*?)\n</script>',
                  html, re.S)
    assert m, "payload script tag missing"
    payload = json.loads(m.group(1).replace("<\\/", "</"))
    assert payload == view_model(_triples())
    # self-contained: no external resources
    assert "http://" not in html.replace("http://www.w3.org/", "") \
        and "https://" not in html


def test_html_sink_rejects_empty_graph(ray_session, tmp_path):
    from kg_gen_ray.stages.viz import write_html

    empty = rd.from_arrow(pa.table({
        "subj": pa.array([], pa.string()),
        "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string())}))
    with pytest.raises(ValueError, match="empty graph"):
        write_html(empty, str(tmp_path / "x.html"))


def test_pagerank_deterministic_integer(ray_session):
    """Integer PageRank: duals agree exactly; a sink-heavy graph ranks
    the popular node first; dangling node keeps only the base share."""
    from kg_gen_ray.stages.viz import pagerank

    t = rd.from_arrow(pa.table({
        "subj": ["a", "b", "c", "d", "a"],
        "pred": ["r"] * 5,
        "obj": ["b", "c", "a", "a", "c"]}))
    pr = {r["entity"]: r["pr"] for r in pagerank(t).take_all()}
    pr_join = {r["entity"]: r["pr"]
               for r in pagerank(t, broadcast_limit=0).take_all()}
    assert pr == pr_join
    assert set(pr) == {"a", "b", "c", "d"}
    # a receives from c AND d -> outranks b (one in-edge); d has no
    # in-edges -> exactly the uniform base share after iteration 1
    assert pr["a"] > pr["b"]
    assert pr["d"] == (10 ** 12 * 15 // 100) // 4
    # repeated runs are bit-identical (order-independent integer sums)
    assert pr == {r["entity"]: r["pr"] for r in pagerank(t).take_all()}


def test_pagerank_duals_agree(ray_session):
    """Driver numpy dual == distributed path, bit-exact (integer
    arithmetic makes the recurrence order-free)."""
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.stages.viz import pagerank

    triples = rd.from_arrow(pa.table({
        "subj": pa.array(["a", "a", "b", "c", "d", "e"], pa.string()),
        "pred": pa.array(["r"] * 6, pa.string()),
        "obj": pa.array(["b", "c", "c", "a", "a", "e"], pa.string()),
    }))
    fast = {r["entity"]: r["pr"] for r in pagerank(triples).take_all()}
    slow = {r["entity"]: r["pr"]
            for r in pagerank(triples, driver_limit=0).take_all()}
    assert fast == slow
    assert len(fast) == 5 and all(v > 0 for v in fast.values())


def test_html_template_reads_view_model_keys(ray_session, tmp_path):
    """The JS template must read the keys view_model actually emits —
    topRelations rows are {predicate, count} (the template used to read
    r.label and rendered 'undefined (N)' for every relation)."""
    from kg_gen_ray.stages.viz import write_html
    path = str(tmp_path / "graph.html")
    write_html(_triples(), path)
    html = open(path, encoding="utf-8").read()
    assert "r.predicate" in html and "r.label" not in html
    assert "e.label" in html       # topEntities rows DO carry label
