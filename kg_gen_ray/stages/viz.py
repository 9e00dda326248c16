"""Graph statistics + visualization view-model (SURVEY.md §2 A6 / S6 / F3).

Distributed counterparts of everything the reference's visualizer computes
on the driver (``/root/reference/src/kg_gen/utils/visualize_kg.py:97-234``):
degree/in/out tables, predicate top-k, weakly-connected components, the
summary stats dict — and a driver-side small-graph view-model/JSON export
mirroring the reference's HTML payload shape (``visualize_kg.py:247-258``),
including its sha1-HSL deterministic label colors (``visualize_kg.py:16-23``).

The wide parts are grouped aggregations with per-batch combiners; the
view-model export is explicitly a SMALL-graph driver-side artifact (the
scalable representation is the Parquet tables from
:mod:`kg_gen_ray.stages.materialize`).
"""

from __future__ import annotations

import colorsys
import hashlib
import json
import os

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

# module-level (pickle-by-value compatibility)
from kg_gen_ray.stages.common import dual_limit  # noqa: E402


def string_to_color(label: str) -> str:
    """Deterministic pastel color (byte-identical to ref ``_string_to_color``)."""
    digest = hashlib.sha1(label.encode("utf-8")).hexdigest()
    hue = int(digest[:2], 16) / 255.0
    saturation = 0.55 + (int(digest[2:4], 16) / 255.0) * 0.3
    lightness = 0.45 + (int(digest[4:6], 16) / 255.0) * 0.25
    r, g, b = colorsys.hls_to_rgb(hue, lightness, saturation)
    return f"#{int(r * 255):02x}{int(g * 255):02x}{int(b * 255):02x}"


def degree_table(triples: "ray.data.Dataset",
                 shuffle_partitions=None) -> "ray.data.Dataset":
    """(entity, degree, indegree, outdegree) — degree counts every triple
    endpoint occurrence (self-loop counts twice), matching the reference's
    Counter loop (``visualize_kg.py:97-115``)."""

    def partial(t: pa.Table) -> pa.Table:
        subj = t["subj"].combine_chunks().cast(pa.string())
        obj = t["obj"].combine_chunks().cast(pa.string())
        n_s, n_o = len(subj), len(obj)
        ents = pa.concat_arrays([subj, obj])
        ones = [1] * n_s
        zeros = [0] * n_s
        tmp = pa.table({
            "entity": ents,
            "outdeg": pa.array(ones + [0] * n_o, pa.int64()),
            "indeg": pa.array(zeros + [1] * n_o, pa.int64()),
        })
        agg = tmp.group_by(["entity"]).aggregate(
            [("outdeg", "sum"), ("indeg", "sum"), ([], "count_all")])
        return agg.rename_columns(["entity", "outdeg", "indeg", "deg"])

    from kg_gen_ray.stages.common import coalesce
    part = coalesce(triples.map_batches(partial, batch_format="pyarrow"),
                    shuffle_partitions)
    return part.groupby("entity").aggregate(
        Sum("deg", alias_name="degree"),
        Sum("indeg", alias_name="indegree"),
        Sum("outdeg", alias_name="outdegree"))


def top_relations(triples: "ray.data.Dataset", k: int = 10,
                  shuffle_partitions=None) -> "ray.data.Dataset":
    """Top-k predicates by triple count, deterministic (-count, pred)
    ordering (ref shows top-10 relations, ``visualize_kg.py:210-216``)."""
    from kg_gen_ray.stages.materialize import edge_types_table
    et = edge_types_table(triples, shuffle_partitions)

    def neg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column("_neg", pc.negate(t["n_triples"]))

    return (et.map_batches(neg, batch_format="pyarrow")
            .sort(["_neg", "pred"]).limit(k)
            .select_columns(["pred", "n_triples"]))


def components_table(triples: "ray.data.Dataset",
                     max_label_iter: int = 20) -> "ray.data.Dataset":
    """(node, component) — weakly-connected components of the triple graph
    by distributed min-label propagation (the scalable re-expression of the
    reference's driver-side BFS, ``visualize_kg.py:143-169``).
    ``max_label_iter`` bounds the propagation (one hop per iteration);
    raise it for graphs with diameter above the default budget."""
    from kg_gen_ray.stages.canonicalize import label_propagation
    from kg_gen_ray.stages.rewrite import distinct

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t["subj"].combine_chunks().cast(pa.string()),
            "b": t["obj"].combine_chunks().cast(pa.string()),
        })

    edges = distinct(triples.map_batches(as_edges, batch_format="pyarrow"),
                     ["a", "b"])
    return label_propagation(edges, max_iter=max_label_iter)


def pagerank(triples: "ray.data.Dataset", n_iter: int = 5,
             scale: int = 10 ** 12,
             broadcast_limit: int = 64 * 1024 * 1024,
             driver_limit: int = 8 * 1024 * 1024,
             shuffle_partitions=None) -> "ray.data.Dataset":
    """Deterministic integer PageRank over the distinct (subj -> obj)
    edge graph -> (entity, pr) with pr in 1/``scale`` units.

    All arithmetic is integer (floor divisions, associative int64 sums),
    so the result is independent of summation order — the property that
    lets a distributed run match a serial SQL oracle bit-for-bit, which
    float PageRank cannot do (same lesson as the money sums in
    ``pipelines/relational.py``). Semantics: damping 0.85 as ``x*85//100``,
    uniform base ``(scale*15//100)//N``, dangling mass evaporates,
    multi-predicate edges collapse to one. Per iteration: one
    size-selected broadcast/join of the rank table onto the edge list and
    one integer groupby-Sum — the textbook distributed PageRank shape.
    """
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from kg_gen_ray.stages.common import coalesce, dict_lookup
    from kg_gen_ray.stages.rewrite import distinct

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t["subj"].combine_chunks().cast(pa.string()),
            "v": t["obj"].combine_chunks().cast(pa.string()),
        })

    edges = distinct(triples.map_batches(as_edges, batch_format="pyarrow"),
                     ["u", "v"], shuffle_partitions).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"entity": pa.concat_arrays([
            t["u"].combine_chunks(), t["v"].combine_chunks()])})

    nodes = distinct(edges.map_batches(endpoints, batch_format="pyarrow"),
                     ["entity"], shuffle_partitions).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "entity": pa.array([], pa.string()),
            "pr": pa.array([], pa.int64())}))
    base = (scale * 15 // 100) // n_nodes

    # attach out-degree to each edge once (degree table is node-sized)
    deg = edges.groupby("u").aggregate(Count(alias_name="od")).materialize()
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    edges_od = edges.repartition(n_parts).join(
        deg.repartition(n_parts), join_type="inner", on=("u",),
        num_partitions=n_parts)
    # normalize: the join emits schemaless empty partitions that a further
    # join cannot key on; engine-side Project + repartition stamps them
    edges_od = edges_od.select_columns(["u", "v", "od"]) \
        .repartition(n_parts).materialize()

    # tiniest dual: a node-scale graph that fits the driver runs the
    # IDENTICAL integer recurrence in numpy — same floor divisions, same
    # associative int64 sums, so the result is bit-equal to the
    # distributed path (pinned by test_pagerank_duals_agree) with zero
    # per-iteration Ray overhead. Crawl-scale graphs skip past this.
    if (edges_od.size_bytes() or 0) <= dual_limit(driver_limit):
        import numpy as np
        names = []
        for b in nodes.iter_batches(batch_format="pyarrow", batch_size=None):
            names.extend(b["entity"].to_pylist())
        names = sorted(names)
        idx = {e: i for i, e in enumerate(names)}
        us, vs, ods = [], [], []
        for b in edges_od.iter_batches(batch_format="pyarrow", batch_size=None):
            us.extend(b["u"].to_pylist())
            vs.extend(b["v"].to_pylist())
            ods.extend(b["od"].to_pylist())
        ui = np.array([idx[u] for u in us], dtype=np.int64)
        vi = np.array([idx[v] for v in vs], dtype=np.int64)
        od = np.array(ods, dtype=np.int64)
        ranks = np.full(len(names), scale // n_nodes, dtype=np.int64)
        for _ in range(n_iter):
            c = (ranks[ui] * 85 // 100) // od
            nxt = np.zeros(len(names), dtype=np.int64)
            np.add.at(nxt, vi, c)
            ranks = nxt + base
        return ray.data.from_arrow(pa.table({
            "entity": pa.array(names, pa.string()),
            "pr": pa.array(ranks, pa.int64()),
        }))

    pr = nodes.map_batches(
        lambda t: pa.table({"entity": t["entity"],
                            "pr": pa.array([scale // n_nodes] * t.num_rows,
                                           pa.int64())}),
        batch_format="pyarrow").materialize()

    zeros = nodes.map_batches(
        lambda t: pa.table({"v": t["entity"],
                            "c": pa.array([0] * t.num_rows, pa.int64())}),
        batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        if (pr.size_bytes() or 0) <= dual_limit(broadcast_limit):
            pr_map = {}
            for b in pr.iter_batches(batch_format="pyarrow", batch_size=None):
                pr_map.update(zip(b["entity"].to_pylist(),
                                  b["pr"].to_pylist()))
            ref = ray.put(pr_map)

            def contrib(t: pa.Table, ref=ref) -> pa.Table:
                m = ray.get(ref)
                pru = dict_lookup(t["u"], m, default=0,
                                  out_type=pa.int64())
                c = _pc.divide(_pc.divide(_pc.multiply(pru, 85), 100),
                               t["od"])
                return pa.table({"v": t["v"], "c": _pc.cast(c, pa.int64())})

            contribs = edges_od.map_batches(contrib, batch_format="pyarrow")
        else:
            # select_columns first: the engine-side Project stamps a
            # schema even on the aggregate's empty blocks, which the
            # join's key resolution needs (rename via map_batches alone
            # skips empties)
            pr_u = pr.select_columns(["entity", "pr"]) \
                .repartition(n_parts).map_batches(
                    lambda t: t.rename_columns(["u", "__pr"]),
                    batch_format="pyarrow")
            joined = edges_od.join(pr_u, join_type="inner", on=("u",),
                                   num_partitions=n_parts)

            def contrib_j(t: pa.Table) -> pa.Table:
                c = _pc.divide(_pc.divide(_pc.multiply(t["__pr"], 85), 100),
                               t["od"])
                return pa.table({"v": t["v"], "c": _pc.cast(c, pa.int64())})

            contribs = joined.map_batches(contrib_j, batch_format="pyarrow")

        summed = coalesce(contribs.union(zeros), shuffle_partitions or
                          "auto").groupby("v") \
            .aggregate(Sum("c", alias_name="c"))
        pr = summed.map_batches(
            lambda t: pa.table({
                "entity": t["v"],
                "pr": _pc.cast(_pc.add(t["c"], base), pa.int64())}),
            batch_format="pyarrow").materialize()
    return pr


def extended_stats(triples: "ray.data.Dataset",
                   entities: "ray.data.Dataset | None" = None,
                   shuffle_partitions=None) -> dict:
    """The reference's stats payload (``visualize_kg.py:218-234``), computed
    distributed. ``entities`` (optional, one ``entity`` column) supplies
    extracted-but-unconnected entities; isolated count is 0 without it
    (every endpoint entity has degree >= 1 by construction)."""
    deg = degree_table(triples, shuffle_partitions).materialize()
    n_triples = triples.count()
    n_connected = deg.count()
    degree_sum = deg.sum("degree") if n_connected else 0

    n_isolated = 0
    n_entities = n_connected
    if entities is not None:
        n_entities = entities.count()
        n_isolated = max(0, n_entities - n_connected)

    from ray.data.aggregate import Count

    from kg_gen_ray.stages.materialize import edge_types_table
    # edge_types_table pre-aggregates per batch (combiner) and honors the
    # width override — don't shuffle every triple row just to count preds
    n_preds = edge_types_table(triples, shuffle_partitions).count()
    n_components_connected = (components_table(triples)
                              .groupby("component").aggregate(Count()).count())
    n_components = n_components_connected + n_isolated

    return {
        "entities": n_entities,
        "relations": n_triples,
        "relationTypes": n_preds,
        "isolatedEntities": n_isolated,
        "components": n_components,
        "averageDegree": round(degree_sum / n_entities, 2) if n_entities else 0,
        "density": round(n_triples / (n_entities * (n_entities - 1)), 3)
        if n_entities > 1 else 0,
    }


def cluster_maps(alias_rows) -> "tuple[dict, dict]":
    """(entity_clusters, edge_clusters): representative -> set(members)
    from alias-map rows — the one place that knows the alias-map row
    shape (kind / representative / member), shared by the HTML view
    model and the CLI's graph.json export."""
    ent_clusters: dict = {}
    edge_clusters: dict = {}
    for r in alias_rows:
        tgt = ent_clusters if r["kind"] == "entity" else edge_clusters
        tgt.setdefault(r["representative"], set()).add(r["member"])
    return ent_clusters, edge_clusters


def view_model(triples: "ray.data.Dataset",
               alias_map: "ray.data.Dataset | None" = None,
               max_triples: int = 200_000) -> dict:
    """Driver-side SMALL-graph view-model in the reference's HTML-payload
    shape (nodes/edges/topEntities/topRelations/stats/components). Guarded:
    refuses graphs above ``max_triples`` — at scale, use the Parquet tables.
    """
    n = triples.count()
    if n > max_triples:
        raise ValueError(
            f"view_model is a small-graph export ({n} > {max_triples} "
            "triples); use materialize.write_graph for large graphs")

    rels = [(r["subj"], r["pred"], r["obj"])
            for r in triples.take_all()]

    ent_clusters, edge_clusters = cluster_maps(
        alias_map.take_all() if alias_map is not None else ())

    from collections import Counter, defaultdict, deque
    degree: Counter = Counter()
    indeg: Counter = Counter()
    outdeg: Counter = Counter()
    pred_counts: Counter = Counter()
    adjacency = defaultdict(set)
    entities_in_order: dict = {}

    edges_view = []
    member_to_cluster = {m: rep for rep, ms in ent_clusters.items() for m in ms}
    for i, (s, p, o) in enumerate(sorted(rels)):
        pred_counts[p] += 1
        degree[s] += 1
        degree[o] += 1
        outdeg[s] += 1
        indeg[o] += 1
        adjacency[s].add(o)
        adjacency[o].add(s)
        entities_in_order.setdefault(s, None)
        entities_in_order.setdefault(o, None)
        edges_view.append({
            "id": f"e{i}", "source": s, "target": o, "predicate": p,
            "color": string_to_color(f"predicate::{p}"),
            "tooltip": f"{s} —{p}→ {o}",
        })

    entities = list(entities_in_order)
    visited: set = set()
    components = []
    for node in entities:
        if node in visited:
            continue
        queue = deque([node])
        visited.add(node)
        members = []
        while queue:
            cur = queue.popleft()
            members.append(cur)
            for nbr in adjacency[cur]:
                if nbr not in visited:
                    visited.add(nbr)
                    queue.append(nbr)
        components.append({
            "size": len(members),
            "members": sorted(members, key=str.casefold),
        })
    components.sort(key=lambda c: (-c["size"], c["members"][0]))

    nodes_view = [{
        "id": e, "label": e,
        "cluster": member_to_cluster.get(e),
        "degree": degree[e], "indegree": indeg[e], "outdegree": outdeg[e],
        "color": string_to_color(f"entity::{member_to_cluster.get(e, e)}"),
    } for e in entities]

    top_entities = sorted(
        ({"label": n_["label"], "degree": n_["degree"],
          "indegree": n_["indegree"], "outdegree": n_["outdegree"]}
         for n_ in nodes_view),
        key=lambda it: (-it["degree"], it["label"].lower()))[:10]
    top_rels = sorted(
        ({"predicate": p, "count": c} for p, c in pred_counts.items()),
        key=lambda it: (-it["count"], it["predicate"].lower()))[:10]

    n_ent = len(entities)
    return {
        "nodes": nodes_view,
        "edges": edges_view,
        "clusters": [{"representative": r, "members": sorted(m)}
                     for r, m in sorted(ent_clusters.items())],
        "edgeClusters": [{"representative": r, "members": sorted(m)}
                         for r, m in sorted(edge_clusters.items())],
        "topEntities": top_entities,
        "topRelations": top_rels,
        "components": components,
        "stats": {
            "entities": n_ent,
            "relations": len(edges_view),
            "relationTypes": len(pred_counts),
            "entityClusters": len(ent_clusters),
            "edgeClusters": len(edge_clusters),
            "isolatedEntities": 0,
            "components": len(components),
            "averageDegree": round(sum(degree[e] for e in entities) / n_ent, 2)
            if n_ent else 0,
            "density": round(len(edges_view) / (n_ent * (n_ent - 1)), 3)
            if n_ent > 1 else 0,
        },
    }


def write_view_model(triples: "ray.data.Dataset", path: str,
                     alias_map: "ray.data.Dataset | None" = None) -> str:
    """Serialize the view-model JSON (the payload the reference injects into
    its HTML template, ``visualize_kg.py:264-304``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(view_model(triples, alias_map), f, indent=2)
    return path


# Self-contained dashboard template — OUR OWN markup (the reference ships a
# 1.3k-line app in template.html; only its INJECTION MECHANISM is parity:
# the view-model JSON replaces a <!--DATA--> marker inside a JSON script
# tag, ref visualize_kg.py:279-304). Rendering: stats tiles, top-k lists,
# cluster listing, and an SVG circle layout using the byte-identical
# string_to_color node colors.
HTML_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Knowledge Graph</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 1.5rem; color: #222; }
 .tiles { display: flex; gap: 1rem; flex-wrap: wrap; margin-bottom: 1rem; }
 .tile { border: 1px solid #ddd; border-radius: 8px; padding: .6rem 1rem; }
 .tile b { display: block; font-size: 1.4rem; }
 .cols { display: flex; gap: 2rem; flex-wrap: wrap; }
 ul { padding-left: 1.2rem; } svg { border: 1px solid #eee; }
 .muted { color: #777; font-size: .85rem; }
</style>
</head>
<body>
<h1>Knowledge Graph</h1>
<div class="tiles" id="tiles"></div>
<div class="cols">
  <svg id="graph" width="640" height="640"></svg>
  <div>
    <h3>Top entities</h3><ul id="top-entities"></ul>
    <h3>Top relations</h3><ul id="top-relations"></ul>
    <h3>Clusters</h3><ul id="clusters"></ul>
  </div>
</div>
<script type="application/json" id="viz-data">
<!--DATA-->
</script>
<script>
const data = JSON.parse(document.getElementById("viz-data").textContent);
const tiles = document.getElementById("tiles");
for (const [k, v] of Object.entries(data.stats)) {
  const d = document.createElement("div");
  d.className = "tile"; d.innerHTML = `<b>${v}</b><span class="muted">${k}</span>`;
  tiles.appendChild(d);
}
const fill = (id, items) => {
  const ul = document.getElementById(id);
  for (const it of items) {
    const li = document.createElement("li"); li.textContent = it;
    ul.appendChild(li);
  }
};
fill("top-entities", data.topEntities.map(e => `${e.label} (${e.degree})`));
fill("top-relations", data.topRelations.map(r => `${r.predicate} (${r.count})`));
fill("clusters", data.clusters.filter(c => c.members.length > 1)
  .map(c => `${c.representative} ← ${c.members.join(", ")}`));
const svg = document.getElementById("graph"), W = 640, R = 280;
const pos = {};
data.nodes.forEach((n, i) => {
  const a = 2 * Math.PI * i / data.nodes.length;
  pos[n.id] = [W / 2 + R * Math.cos(a), W / 2 + R * Math.sin(a)];
});
const NS = "http://www.w3.org/2000/svg";
for (const e of data.edges) {
  const [x1, y1] = pos[e.source] || [0, 0], [x2, y2] = pos[e.target] || [0, 0];
  const l = document.createElementNS(NS, "line");
  l.setAttribute("x1", x1); l.setAttribute("y1", y1);
  l.setAttribute("x2", x2); l.setAttribute("y2", y2);
  l.setAttribute("stroke", "#ccc"); svg.appendChild(l);
}
for (const n of data.nodes) {
  const [x, y] = pos[n.id];
  const c = document.createElementNS(NS, "circle");
  c.setAttribute("cx", x); c.setAttribute("cy", y);
  c.setAttribute("r", 4 + Math.sqrt(n.degree || 1));
  c.setAttribute("fill", n.color);
  const t = document.createElementNS(NS, "title");
  t.textContent = `${n.id} (degree ${n.degree})`;
  c.appendChild(t); svg.appendChild(c);
}
</script>
</body>
</html>
"""


def render_html(vm: dict) -> str:
    """Inject a view-model into the template (the reference's mechanism:
    JSON replaces the ``<!--DATA-->`` marker, ``visualize_kg.py:279-283``).
    ``</`` is escaped so labels cannot terminate the JSON script tag."""
    payload = json.dumps(vm, ensure_ascii=False, indent=2) \
        .replace("</", "<\\/")
    return HTML_TEMPLATE.replace("<!--DATA-->", payload)


def write_html(triples: "ray.data.Dataset", path: str,
               alias_map: "ray.data.Dataset | None" = None) -> str:
    """Self-contained HTML dashboard (SURVEY.md §2 S6; ref
    ``visualize_kg.py:264-304``). Raises on an empty graph like the
    reference (``visualize_kg.py:281-282``)."""
    vm = view_model(triples, alias_map)
    if not vm["nodes"]:
        raise ValueError("Cannot visualize an empty graph")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_html(vm))
    return path
