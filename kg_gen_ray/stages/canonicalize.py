"""Entity / edge canonicalization — the wide shuffle step.

Re-expresses the reference's LLM clustering loop
(``/root/reference/src/kg_gen/steps/_3_cluster_graph.py:16-276``: propose /
validate / choose-representative over the whole label set, sequentially on
the driver) and its scalable variant (k-means partition + per-cluster dedup,
``/root/reference/experiments/wikiqa/utils/cluster_and_deduplication.py:151-296``)
as a deterministic, distributed flow:

1. distinct labels -> ``(member, norm_key)`` via a pure normalization
   function (case-fold + NFKC + suffix stripping — stands in for the
   reference's "same in different tenses / plural forms / case" contract,
   ``_3_cluster_graph.py:37-39``),
2. **salted** partial representative choice inside the groupby
   (``key = (norm_key, crc32(member) % S)``) so a hot key ("the", a viral
   entity) never lands on one reducer — north_star's key-salted groupBy,
3. tiny second-pass merge per ``norm_key`` (representative choice is an
   associative min, so salting is exact, not approximate),
4. optional pluggable *judge* (LLM or rule) that can split a normalization
   group into finer clusters, with per-group size caps mirroring the
   reference's 128-label cluster capacity
   (``cluster_and_deduplication.py:153``),
5. alias map exploded to rows ``(kind, representative, member)`` — the
   Arrow-friendly form of the reference's ``entity_clusters`` dict-of-sets.

Representative rule: **shortest label, then lexicographic** — deterministic
version of the reference's "prefer shorter names" instruction
(``_3_cluster_graph.py:18``); always a member of the cluster (the reference
only guarantees "ideally", ``_3_cluster_graph.py:16-22``).
"""

from __future__ import annotations

import unicodedata
import zlib

import pandas as pd
import pyarrow as pa

import ray
import ray.data


# ---------------------------------------------------------------------------
# pure functions (unit-testable, also used by the conformance oracle)
# ---------------------------------------------------------------------------

def normalize_label(s: str) -> str:
    """Deterministic normalization key.

    Chain: NFKC -> casefold -> strip -> plural ``-s`` (len>3, not ``-ss``)
    -> ``-ing`` (len>5) -> trailing ``-e`` (len>3). The suffix rules merge the
    case/plural/tense surface variants the reference's clustering tests
    demand (``/root/reference/tests/test_clustering.py:12-158``:
    cat/Cat/CAT/cats -> one cluster; likes/like/liking -> one cluster) while
    keeping distinct items distinct (``test_clustering.py:203-242``).

    Mirrored exactly by the SQL in ``__ray_entry__.oracle_sql`` (DuckDB
    ``lower``/``substr`` chain) — keep the two in sync.
    """
    s = unicodedata.normalize("NFKC", s).casefold().strip()
    if len(s) > 3 and s.endswith("s") and not s.endswith("ss"):
        s = s[:-1]
    if len(s) > 5 and s.endswith("ing"):
        s = s[:-3]
    if len(s) > 3 and s.endswith("e"):
        s = s[:-1]
    return s


def choose_representative(members) -> str:
    """Shortest-then-lexicographic member; always in the member set."""
    return min(members, key=lambda m: (len(m), m))


def salt_of(member: str, buckets: int) -> int:
    """Process-stable salt (NOT Python ``hash``, which is seeded per run)."""
    return zlib.crc32(member.encode("utf-8")) % buckets


def connected_components(pairs) -> dict:
    """Driver-side union-find over alias pairs -> {label: component_root}.

    For cross-group merges (judge-emitted alias edges). Only safe when the
    pair set is provably small (distinct-label aliases, not corpus rows);
    the distributed path is :func:`label_propagation`.
    """
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the min root for determinism
            lo, hi = sorted((ra, rb), key=lambda m: (len(m), m))
            parent[hi] = lo
    return {x: find(x) for x in parent}


def label_propagation(edges_ds: "ray.data.Dataset", max_iter: int = 20
                      ) -> "ray.data.Dataset":
    """Distributed connected components by iterated min-label propagation.

    ``edges_ds``: columns ``(a, b)``. Returns ``(node, component)`` where
    component is the min label (by (len, lex)) reachable from node. Each
    iteration is one groupby-min shuffle; converges in O(diameter)
    iterations — alias clusters are shallow in practice (SURVEY.md §7.4).
    """
    def order_key(c: pa.Table, col: str) -> pd.Series:
        s = c[col].to_pandas()
        return s

    # undirected: both directions, plus self-edges so singletons survive
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()]),
        })

    edges = edges_ds.map_batches(both_dirs, batch_format="pyarrow")

    def min_by_rule(g: pd.DataFrame) -> pd.DataFrame:
        cands = pd.concat([g["nbr"], g["node"].head(1)])
        best = min(cands, key=lambda m: (len(m), m))
        return pd.DataFrame({"node": [g["node"].iloc[0]], "component": [best]})

    comp = edges.groupby("node").map_groups(min_by_rule, batch_format="pandas")

    for _ in range(max_iter):
        # re-propagate: neighbor components via broadcast of current comp
        comp_map = {r["node"]: r["component"] for r in comp.take_all()}
        ref = ray.put(comp_map)

        def relabel(t: pa.Table, ref=ref) -> pa.Table:
            m = ray.get(ref)
            nodes = t["node"].to_pylist()
            nbrs = t["nbr"].to_pylist()
            return pa.table({
                "node": pa.array(nodes, pa.string()),
                "nbr": pa.array([m.get(x, x) for x in nbrs], pa.string()),
            })

        new_comp = edges.map_batches(relabel, batch_format="pyarrow") \
                        .groupby("node").map_groups(min_by_rule,
                                                    batch_format="pandas")
        new_map = {r["node"]: r["component"] for r in new_comp.take_all()}
        if new_map == comp_map:
            break
        comp = new_comp
    return comp


# ---------------------------------------------------------------------------
# the distributed canonicalization stage
# ---------------------------------------------------------------------------

def _add_keys(buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        members = t["member"].to_pylist()
        kinds = (t["kind"].to_pylist() if "kind" in t.column_names
                 else ["entity"] * len(members))
        norm = [normalize_label(m) for m in members]
        salt = [salt_of(m, buckets) for m in members]
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "member": pa.array(members, pa.string()),
            "norm_key": pa.array(norm, pa.string()),
            "salt": pa.array(salt, pa.int32()),
            "rank_enc": pa.array([_encode_rank(m) for m in members],
                                 pa.string()),
        })
    return fn


def _encode_rank(member: str) -> str:
    """Order-preserving encoding of the (len, lex) representative rule:
    the plain string Min of ``{len:06d}|{member}`` IS the shortest-then-
    lexicographic member, so representative choice becomes a vectorized
    Arrow Min aggregate instead of per-group Python."""
    return f"{len(member):06d}|{member}"


def _decode_rank(enc: str) -> str:
    return enc[7:]


def canonicalize_label_table(labels: "ray.data.Dataset",
                             salt_buckets: int = 16,
                             judge=None, max_group_size: int = 128,
                             shuffle_partitions=None
                             ) -> "ray.data.Dataset":
    """distinct labels(kind, member) -> alias_map(kind, representative, member).

    The fused multi-kind flow (entity and edge labels canonicalize in ONE
    pair of shuffles, keyed by (kind, norm_key)). Two-shuffle salted flow
    per module docstring. With a ``judge`` (callable ``list[str] ->
    list[list[str]]`` partitioning a normalization group into clusters) the
    group is processed in capacity-capped chunks; without one,
    normalization groups are the clusters (deterministic default used for
    conformance).
    """
    from kg_gen_ray.stages.common import coalesce
    keyed = coalesce(labels.map_batches(_add_keys(salt_buckets),
                                        batch_format="pyarrow"),
                     shuffle_partitions)

    if judge is None:
        from ray.data.aggregate import Min
        keyed = keyed.materialize()   # consumed twice: rep choice + emit
        # salted partial min, then tiny global min per (kind, norm_key) —
        # both vectorized Arrow aggregates (see _encode_rank)
        partial = keyed.groupby(["kind", "norm_key", "salt"]).aggregate(
            Min("rank_enc", alias_name="rank_enc"))
        reps = partial.groupby(["kind", "norm_key"]).aggregate(
            Min("rank_enc", alias_name="rank_enc"))
        rep_map = {(r["kind"], r["norm_key"]): _decode_rank(r["rank_enc"])
                   for r in reps.take_all()}
        ref = ray.put(rep_map)

        def emit(t: pa.Table, ref=ref) -> pa.Table:
            m = ray.get(ref)
            kinds = t["kind"].to_pylist()
            members = t["member"].to_pylist()
            norms = t["norm_key"].to_pylist()
            return pa.table({
                "kind": pa.array(kinds, pa.string()),
                "representative": pa.array(
                    [m[(k, nk)] for k, nk in zip(kinds, norms)], pa.string()),
                "member": pa.array(members, pa.string()),
            })

        return keyed.map_batches(emit, batch_format="pyarrow")

    # judge path: full group per (kind, norm_key), size-capped chunks
    def judged(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].iloc[0]
        members = sorted(g["member"], key=lambda m: (len(m), m))
        reps, mems = [], []
        for lo in range(0, len(members), max_group_size):
            chunk = members[lo:lo + max_group_size]
            for cluster in judge(chunk):
                rep = choose_representative(cluster)
                for m in cluster:
                    reps.append(rep)
                    mems.append(m)
        return pd.DataFrame({
            "kind": [kind] * len(mems),
            "representative": reps,
            "member": mems,
        })

    return keyed.groupby(["kind", "norm_key"]).map_groups(
        judged, batch_format="pandas")


def canonicalize_labels(labels: "ray.data.Dataset", kind: str,
                        salt_buckets: int = 16,
                        judge=None, max_group_size: int = 128,
                        shuffle_partitions=None
                        ) -> "ray.data.Dataset":
    """Single-kind convenience wrapper over
    :func:`canonicalize_label_table` (adds a constant ``kind`` column)."""
    def add_kind(t: pa.Table) -> pa.Table:
        if "kind" in t.column_names:
            return t
        return t.append_column(
            "kind", pa.array([kind] * t.num_rows, pa.string()))

    with_kind = labels.map_batches(add_kind, batch_format="pyarrow")
    return canonicalize_label_table(with_kind, salt_buckets, judge,
                                    max_group_size, shuffle_partitions)
