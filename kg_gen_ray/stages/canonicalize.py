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

# module-level (pickle-by-value compatibility): worker-side UDF bodies
# must not lazily import kg_gen_ray
from kg_gen_ray.stages.common import (compact_if_small, dict_lookup,
                                      dual_limit)
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

    Mirrored by the SQL in ``__ray_entry__.oracle_sql`` (DuckDB
    ``lower``/``substr`` chain) **for ASCII labels** — the conformance
    corpus. On non-ASCII input the engine is deliberately stronger than
    the SQL mirror: NFKC folds ligatures/width variants ('ﬁle' -> 'file'),
    casefold handles ß/Σ-style case pairs lower() misses, and strip
    removes Unicode whitespace (NBSP) where the SQL trim only covers the
    six ASCII whitespace chars. Keep the two in sync on the ASCII subset.
    """
    s = unicodedata.normalize("NFKC", s).casefold().strip()
    if len(s) > 3 and s.endswith("s") and not s.endswith("ss"):
        s = s[:-1]
    if len(s) > 5 and s.endswith("ing"):
        s = s[:-3]
    if len(s) > 3 and s.endswith("e"):
        s = s[:-1]
    # final strip: suffix removal can expose internal whitespace at the
    # end ("00\re" -> "00\r"); without it the key is not idempotent
    return s.strip()


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


def label_propagation(edges_ds: "ray.data.Dataset", max_iter: int = 20,
                      broadcast_limit: int = 128 * 1024 * 1024,
                      driver_limit: int = 8 * 1024 * 1024
                      ) -> "ray.data.Dataset":
    """Distributed connected components by iterated min-label propagation.

    ``edges_ds``: columns ``(a, b)``. Returns ``(node, component)`` where
    component is the min label (by (len, lex)) reachable from node. Each
    iteration combines one-hop neighbor relabeling with POINTER JUMPING
    (each node also adopts its current label's label), so the reachable-
    min distance roughly doubles per round and convergence is
    O(log diameter) — a chain of 2^20 nodes converges inside the default
    ``max_iter=20`` budget that one-hop propagation alone would blow on
    a 21-node chain.

    Scale duals per iteration, chosen by the measured component-map size:
    small map -> broadcast dict relabel + in-dict jump (no shuffle);
    large map -> hash joins on ``nbr`` and on the label table itself.
    Convergence is checked distributed (count of changed labels), never
    by collecting the map.

    Tiniest dual first: when the MATERIALIZED edge set itself fits
    ``driver_limit``, the whole graph is driver-side union-find
    (:func:`connected_components` — same (len, lex) min-root semantics,
    proven by the shared tests) and zero distributed iterations run. A
    36-node viz graph paid ~10 s of per-round groupby overhead for a
    result the driver computes in microseconds; at crawl scale the edge
    set blows past the limit and the iterative path engages unchanged."""
    from ray.data.aggregate import Min

    # undirected: both directions, plus self-edges so singletons survive
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.string())
        b = t["b"].combine_chunks().cast(pa.string())
        return pa.table({
            "node": pa.concat_arrays([a, b]),
            "nbr": pa.concat_arrays([b, a]),
        })

    # compact: the loop below unions edges into every iteration's
    # aggregate, so edges' block count is a per-iteration multiplier
    edges = compact_if_small(
        edges_ds.map_batches(both_dirs, batch_format="pyarrow")
        .materialize())

    if (edges.size_bytes() or 0) <= dual_limit(driver_limit):
        pairs = []
        for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
            pairs.extend(zip(b["node"].to_pylist(), b["nbr"].to_pylist()))
        comp_map = connected_components(pairs)
        nodes = sorted(comp_map)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, pa.string()),
            "component": pa.array([comp_map[n] for n in nodes],
                                  pa.string()),
        }))

    def with_rank(t: pa.Table, col: str) -> pa.Table:
        return t.append_column(
            "rank_enc", _encode_rank_arr(t[col].combine_chunks()))

    def self_plus_nbr(t: pa.Table) -> pa.Table:
        # candidates for the initial min: every neighbor and the node itself
        return pa.table({
            "node": pa.concat_arrays([t["node"].combine_chunks(),
                                      t["node"].combine_chunks()]),
            "cand": pa.concat_arrays([t["nbr"].combine_chunks(),
                                      t["node"].combine_chunks()]),
        })

    def min_agg(ds: "ray.data.Dataset", cand_col: str) -> "ray.data.Dataset":
        ranked = ds.map_batches(lambda t: with_rank(t, cand_col),
                                batch_format="pyarrow")
        agg = ranked.groupby("node").aggregate(
            Min("rank_enc", alias_name="rank_enc"))
        return agg.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "component": _decode_rank_arr(
                    t["rank_enc"].combine_chunks()),
            }), batch_format="pyarrow")

    comp = compact_if_small(
        min_agg(edges.map_batches(self_plus_nbr, batch_format="pyarrow"),
                "cand").materialize())

    for _ in range(max_iter):
        comp_bytes = comp.size_bytes() or 0
        comp_r = None        # join path's shared repartitioned label table
        if comp_bytes <= broadcast_limit:
            comp_map = {}
            for b in comp.iter_batches(batch_format="pyarrow", batch_size=None):
                comp_map.update(zip(b["node"].to_pylist(),
                                    b["component"].to_pylist()))
            # pointer jumping, driver-side while the map is broadcastable:
            # each node's candidate includes label(label(node))
            jumped = {n: comp_map.get(c, c) for n, c in comp_map.items()}
            ref = ray.put(jumped)

            def relabel(t: pa.Table, ref=ref) -> pa.Table:
                # nbr -> JUMPED label of nbr: one lookup delivers both the
                # neighbor hop and the pointer jump
                m = ray.get(ref)
                return pa.table({
                    "node": t["node"],
                    "cand": dict_lookup(t["nbr"], m, identity=True,
                                        out_type=pa.string()),
                })

            candidates = edges.map_batches(relabel, batch_format="pyarrow")

            def self_jump(t: pa.Table, ref=ref) -> pa.Table:
                m = ray.get(ref)
                return pa.table({
                    "node": t["node"],
                    "cand": dict_lookup(t["component"], m, identity=True,
                                        out_type=pa.string()),
                })

            jump_ds = comp.map_batches(self_jump, batch_format="pyarrow")
            candidates = candidates.union(jump_ds)
        else:
            n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
            # ONE repartition+materialize of the label table per round,
            # shared by all four consumers below (neighbor join, pointer
            # jump's two sides, convergence check) — each used to pay its
            # own O(nodes) exchange of identical data. Repartition also
            # normalizes blocks before joining: aggregate outputs can
            # carry schemaless EMPTY blocks (map_batches skips empties,
            # so a rename never stamps a schema on them and the join's
            # pyarrow finalize then can't resolve the key field).
            comp_r = comp.repartition(n_parts).materialize()
            nbr_comp = comp_r.map_batches(
                lambda t: t.rename_columns(["nbr", "nbr_component"]),
                batch_format="pyarrow")
            joined = edges.join(nbr_comp, join_type="left_outer",
                                on=("nbr",), num_partitions=n_parts)

            def coalesce_cand(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return pa.table({
                    "node": t["node"],
                    "cand": pc.coalesce(t["nbr_component"], t["nbr"]),
                })

            candidates = joined.map_batches(coalesce_cand,
                                            batch_format="pyarrow")

            # pointer jump via label self-join: node adopts its current
            # label's label (halves the remaining hop distance)
            lab = comp_r.map_batches(
                lambda t: t.rename_columns(["component", "jump"]),
                batch_format="pyarrow")
            jump_joined = comp_r \
                .join(lab, join_type="left_outer", on=("component",),
                      num_partitions=n_parts)

            def jump_cand(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return pa.table({
                    "node": t["node"],
                    "cand": pc.coalesce(t["jump"], t["component"]),
                })

            candidates = candidates.union(
                jump_joined.map_batches(jump_cand, batch_format="pyarrow"))

        # keep the current label in the running too (min never regresses)
        cur = comp.map_batches(
            lambda t: t.rename_columns(["node", "cand"]),
            batch_format="pyarrow")
        # compact EVERY iteration: the aggregate's output block count
        # follows its input's (edges + 2x comp blocks), so an uncompacted
        # comp compounds ~3x blocks per round — at sf0.1 the broadcast
        # branch went 34 s -> 121 s -> native shuffle crash by iteration
        # 3 from thousands of near-empty blocks. compact_if_small bounds
        # the loop at ~cores/2 blocks while comp is small; the join
        # branch's own repartition(n_parts) bounds it once comp is big.
        new_comp = compact_if_small(
            min_agg(candidates.union(cur), "cand").materialize())

        # distributed convergence check: any changed labels? (reuses the
        # join path's already-repartitioned label table when it exists)
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        old_src = comp_r if comp_r is not None \
            else comp.repartition(n_parts)
        old = old_src.map_batches(
            lambda t: t.rename_columns(["node", "old_component"]),
            batch_format="pyarrow")
        changed = new_comp.repartition(n_parts) \
            .join(old, join_type="inner", on=("node",),
                  num_partitions=n_parts) \
            .map_batches(lambda t: t.filter(
                pa.compute.not_equal(t["component"], t["old_component"])),
                batch_format="pyarrow").count()
        comp = new_comp
        if changed == 0:
            break
    else:
        # fail LOUDLY: returning unconverged labels would silently emit
        # wrong components. With pointer jumping the reachable-min
        # distance ~doubles per round, so the default budget covers
        # diameters up to ~2^max_iter — hitting this means something is
        # structurally wrong, not merely a deep graph.
        raise RuntimeError(
            f"label propagation did not converge in {max_iter} iterations; "
            "raise max_iter (pointer jumping covers diameter ~2^max_iter)")
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
        member_arr = pa.array(members, pa.string())
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "member": member_arr,
            "norm_key": pa.array(norm, pa.string()),
            "salt": pa.array(salt, pa.int32()),
            "rank_enc": _encode_rank_arr(member_arr),
        })
    return fn


def _encode_rank(member: str) -> str:
    """Order-preserving encoding of the (len, lex) representative rule:
    the plain string Min of ``{len:06d}|{member}`` IS the shortest-then-
    lexicographic member, so representative choice becomes a vectorized
    Arrow Min aggregate instead of per-group Python."""
    if len(member) > 999_999:
        raise ValueError(
            "label longer than 999,999 characters cannot be rank-encoded "
            "(6-digit length field); truncate such labels upstream")
    return f"{len(member):06d}|{member}"


def _decode_rank(enc: str) -> str:
    return enc[7:]


def _encode_rank_arr(arr: "pa.Array") -> "pa.Array":
    """Vectorized :func:`_encode_rank` (Arrow kernels, no per-element
    Python — this runs on the hot path of label propagation)."""
    import pyarrow.compute as pc
    s = pc.cast(arr, pa.string())
    lens = pc.utf8_length(s)
    if len(s) and pc.max(lens).as_py() > 999_999:
        # utf8_lpad does NOT truncate: a 7-digit length field would sort
        # before 6-digit ones (wrong order) and the fixed decode slice
        # would emit a corrupted representative — fail loudly instead
        raise ValueError(
            "label longer than 999,999 characters cannot be rank-encoded "
            "(6-digit length field); truncate such labels upstream")
    ln = pc.utf8_lpad(pc.cast(lens, pa.string()), 6, "0")
    return pc.binary_join_element_wise(ln, s, "|")


def _decode_rank_arr(arr: "pa.Array") -> "pa.Array":
    import pyarrow.compute as pc
    return pc.utf8_slice_codeunits(pc.cast(arr, pa.string()), start=7)


def canonicalize_label_table(labels: "ray.data.Dataset",
                             salt_buckets: int = 16,
                             judge=None, max_group_size: int = 128,
                             shuffle_partitions=None,
                             broadcast_limit: int = 128 * 1024 * 1024,
                             adaptive_salt: bool = True,
                             hot_threshold: int = 1024
                             ) -> "ray.data.Dataset":
    """distinct labels(kind, member) -> alias_map(kind, representative, member).

    The fused multi-kind flow (entity and edge labels canonicalize in ONE
    pair of shuffles, keyed by (kind, norm_key)). Two-shuffle salted flow
    per module docstring. With a ``judge`` (callable ``list[str] ->
    list[list[str]]`` partitioning a normalization group into clusters) the
    group is processed in capacity-capped chunks; without one,
    normalization groups are the clusters (deterministic default used for
    conformance).

    ``adaptive_salt`` (judge path only): instead of salting EVERY key —
    which fragments ordinary groups across ``salt_buckets`` reducers and
    makes every multi-member key pay a level-2 merge — a single
    constant-memory Misra-Gries pass (``functions.sketch.heavy_hitters``)
    detects the keys that could actually melt a reducer, and only those
    keep their salt; everything else runs as one level-1 group. Detection
    is guarantee-backed: with capacity ``2n/hot_threshold`` the MG counter
    undercounts by at most ``n/capacity <= hot_threshold/2``, so every key
    with true frequency > ``hot_threshold`` clears the
    ``hot_threshold // 2`` counter cut — hot keys are never missed, and
    over-salting is bounded to keys above half the threshold. (The
    no-judge path keeps universal salting: its salted pass is a vectorized
    Min aggregate, so de-salting would cost more than it saves.)
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
            Min("rank_enc", alias_name="rank_enc")).materialize()

        # rep -> member assignment: broadcast dict while the rep table
        # fits, hash join on (kind, norm_key) above the limit (at 10^12
        # docs the cluster table is as unbroadcastable as the alias map —
        # same size-chosen dual as the rewrite stage)
        if (reps.size_bytes() or 0) <= dual_limit(broadcast_limit):
            rep_map = {}
            for b in reps.iter_batches(batch_format="pyarrow", batch_size=None):
                rep_map.update(zip(
                    zip(b["kind"].to_pylist(), b["norm_key"].to_pylist()),
                    _decode_rank_arr(b["rank_enc"].combine_chunks())
                    .to_pylist()))
            ref = ray.put(rep_map)

            def emit(t: pa.Table, ref=ref) -> pa.Table:
                m = ray.get(ref)
                kinds = t["kind"].to_pylist()
                norms = t["norm_key"].to_pylist()
                return pa.table({
                    "kind": pa.array(kinds, pa.string()),
                    "representative": pa.array(
                        [m[(k, nk)] for k, nk in zip(kinds, norms)],
                        pa.string()),
                    "member": t["member"],
                })

            return keyed.map_batches(emit, batch_format="pyarrow")

        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
        rep_tbl = reps.repartition(n_parts).map_batches(
            lambda t: pa.table({
                "kind": t["kind"], "norm_key": t["norm_key"],
                "representative": _decode_rank_arr(
                    t["rank_enc"].combine_chunks())}),
            batch_format="pyarrow")
        joined = keyed.select_columns(["kind", "norm_key", "member"]) \
            .join(rep_tbl, join_type="inner", on=("kind", "norm_key"),
                  num_partitions=n_parts)
        return joined.select_columns(["kind", "representative", "member"])

    # judge path: TWO-LEVEL hierarchical judging so a hot norm_key never
    # lands whole on one reducer (the no-judge path's salt, applied to the
    # judge flow). Level 1 groups by (kind, norm_key, SALT) — per-reducer
    # rows are bounded by the salt fan-out — and judges each salt bucket
    # into sub-clusters. Level 2 then judges only the level-1
    # REPRESENTATIVES per (kind, norm_key): one row per sub-cluster, a
    # set that is smaller than the member set by the judge's own merge
    # factor, with the same max_group_size capacity cap. Because
    # choose_representative is an associative min (len, lex), the global
    # min member survives level 1 and wins level 2, so a judge that always
    # merges reproduces the unsalted result exactly; a judge that never
    # merges is unaffected by bucketing. (Chunk composition seen by a
    # content-sensitive judge differs from the unsalted order — the same
    # approximation the pre-existing max_group_size chunking already made.)
    if adaptive_salt:
        import pyarrow.compute as pc
        from kg_gen_ray.functions.sketch import heavy_hitters
        from kg_gen_ray.stages.common import in_set_mask
        keyed = keyed.materialize()   # consumed twice: sketch + level 1
        n_tot = keyed.count()
        # ceil division so the undercount bound n/capacity stays strictly
        # <= hot_threshold/2 whenever the 2^20-counter cap doesn't bind
        capacity = max(256, min(1 << 20,
                                -(-2 * n_tot // max(1, hot_threshold))))
        # when the cap DOES bind (n_tot > ~hot_threshold * 2^19), the MG
        # bound coarsens; raising the effective threshold to 2*(n/cap)
        # keeps the no-missed-hot-keys guarantee TRUE at the coarser
        # granularity instead of silently broken — a key the sketch can
        # no longer certify as below-threshold simply keeps its salt
        # evidence bar honest. (freq > eff  =>  counter >= freq - n/cap
        # > eff/2, so the cut below never misses it.)
        eff_threshold = max(hot_threshold, 2 * (n_tot // capacity))
        hot = [v for v, cmin, _cmax in heavy_hitters(
            keyed.select_columns(["norm_key"]), "norm_key", capacity)
            if cmin > eff_threshold // 2]
        hot_ref = ray.put(set(hot))

        def desalt(t: pa.Table, hot_ref=hot_ref) -> pa.Table:
            keep_salt = in_set_mask(t["norm_key"], hot_ref)
            salt = pc.if_else(keep_salt, t["salt"],
                              pa.scalar(0, pa.int32()))
            return t.set_column(t.column_names.index("salt"), "salt", salt)

        keyed = keyed.map_batches(desalt, batch_format="pyarrow")

    def run_judge(members: list) -> list[tuple[str, str]]:
        members = sorted(members, key=lambda m: (len(m), m))
        out = []
        for lo in range(0, len(members), max_group_size):
            for cluster in judge(members[lo:lo + max_group_size]):
                rep = choose_representative(cluster)
                out.extend((rep, m) for m in cluster)
        # enforce the partition contract HERE, where a violation happens:
        # an LLM judge that drops a member (or invents one) would
        # otherwise silently delete/corrupt alias-map rows. The count
        # check is load-bearing alongside the set check: a member
        # assigned to TWO clusters still covers the set, but the two
        # alias rows would make the broadcast and join rewrite duals
        # disagree (last-wins dict vs duplicated join rows)
        emitted = {m for _, m in out}
        if emitted != set(members) or len(out) != len(members):
            missing = sorted(set(members) - emitted)[:3]
            invented = sorted(emitted - set(members))[:3]
            raise ValueError(
                "judge violated the partition contract: the returned "
                "clusters must cover every input member exactly once "
                f"(missing={missing!r}, invented={invented!r}, "
                f"{len(out)} assignments for {len(members)} members)")
        return out

    # Per-key-group Ray map_groups pays ~ms-scale per-group overhead — at
    # hundreds of thousands of mostly-singleton norm_keys that dwarfs the
    # judge work itself. Instead, both levels group by a HASH BUCKET of
    # their grouping key (4 x cores buckets), so one Ray group holds many
    # key-groups, and the per-key iteration happens inside the bucket with
    # pandas' C-level groupby. A key-group is always fully inside one
    # bucket (the bucket is a function of the grouping key), so semantics
    # are identical to grouping by the key directly.
    n_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def with_bucket(cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            import polars as pl
            import pyarrow.compute as pc
            parts = [pc.cast(t[c], pa.string()) for c in cols]
            joined = (parts[0] if len(parts) == 1
                      else pc.binary_join_element_wise(*parts, "|"))
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
            # vectorized 64-bit hash (polars/Rust, same family fast_text
            # uses) — run-stable, which is all a partitioning key needs
            h = pl.from_arrow(joined).hash(seed=0) % n_buckets
            bucket = pc.cast(h.to_arrow(), pa.int32())
            return t.append_column("bucket", bucket)
        return fn

    def judged_local(g: pd.DataFrame) -> pd.DataFrame:
        kinds, nks, l1s, mems = [], [], [], []
        for (kind, nk, _s), sub in g.groupby(["kind", "norm_key", "salt"],
                                             sort=False):
            members = list(sub["member"])
            if len(members) == 1:
                # singleton bypass: the only partition of one member is
                # itself — never spend a judge (LLM) call on it. In a
                # vocabulary-heavy corpus most norm_keys are singletons,
                # so this is the dominant judge-cost cut (the reference's
                # clustering loop likewise only judges multi-member
                # candidate sets, _3_cluster_graph.py:116-176).
                pairs = [(members[0], members[0])]
            else:
                pairs = run_judge(members)
            for rep, m in pairs:
                kinds.append(kind); nks.append(nk)
                l1s.append(rep); mems.append(m)
        return pd.DataFrame({"kind": kinds, "norm_key": nks,
                             "l1_rep": l1s, "member": mems})

    l1 = keyed.map_batches(with_bucket(["kind", "norm_key", "salt"]),
                           batch_format="pyarrow") \
        .groupby("bucket").map_groups(judged_local, batch_format="pandas") \
        .materialize()

    def judged_global(g: pd.DataFrame) -> pd.DataFrame:
        kinds, nks, reps, l1s = [], [], [], []
        for (kind, nk), sub in g.groupby(["kind", "norm_key"], sort=False):
            members = list(sub["l1_rep"])
            pairs = ([(members[0], members[0])] if len(members) == 1
                     else run_judge(members))   # singleton bypass (above)
            for rep, m in pairs:
                kinds.append(kind); nks.append(nk)
                reps.append(rep); l1s.append(m)
        return pd.DataFrame({"kind": kinds, "norm_key": nks,
                             "representative": reps, "l1_rep": l1s})

    from kg_gen_ray.stages.rewrite import distinct as _distinct
    l1_reps = _distinct(l1.select_columns(["kind", "norm_key", "l1_rep"]),
                        ["kind", "norm_key", "l1_rep"])
    l2 = l1_reps.map_batches(with_bucket(["kind", "norm_key"]),
                             batch_format="pyarrow") \
        .groupby("bucket").map_groups(judged_global, batch_format="pandas") \
        .materialize()

    # compose member -> l1_rep -> representative (size-selected dual, same
    # rule as the no-judge rep assignment above)
    if (l2.size_bytes() or 0) <= dual_limit(broadcast_limit):
        rep_map = {}
        for b in l2.iter_batches(batch_format="pyarrow", batch_size=None):
            rep_map.update(zip(
                zip(b["kind"].to_pylist(), b["norm_key"].to_pylist(),
                    b["l1_rep"].to_pylist()),
                b["representative"].to_pylist()))
        ref = ray.put(rep_map)

        def emit_l2(t: pa.Table, ref=ref) -> pa.Table:
            m = ray.get(ref)
            keys = zip(t["kind"].to_pylist(), t["norm_key"].to_pylist(),
                       t["l1_rep"].to_pylist())
            reps = []
            for k in keys:
                try:
                    reps.append(m[k])
                except KeyError:
                    raise ValueError(
                        f"judge violated the partition contract: level-1 "
                        f"representative {k!r} missing from the level-2 "
                        "clustering (the judge must place every input in "
                        "some cluster)") from None
            return pa.table({
                "kind": t["kind"],
                "representative": pa.array(reps, pa.string()),
                "member": t["member"],
            })

        return l1.map_batches(emit_l2, batch_format="pyarrow")

    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    # left_outer + loud null check, NOT an inner join: an inner join would
    # silently DELETE members whose l1_rep the judge dropped — the same
    # contract violation the broadcast dual raises on must raise here too
    joined = l1.repartition(n_parts).join(
        l2.repartition(n_parts), join_type="left_outer",
        on=("kind", "norm_key", "l1_rep"), num_partitions=n_parts)

    def check_covered(t: pa.Table) -> pa.Table:
        if t["representative"].null_count:
            import pyarrow.compute as _pc
            missing = t.filter(_pc.is_null(t["representative"]))
            k = (missing["kind"][0].as_py(), missing["norm_key"][0].as_py(),
                 missing["l1_rep"][0].as_py())
            raise ValueError(
                f"judge violated the partition contract: level-1 "
                f"representative {k!r} missing from the level-2 "
                "clustering (the judge must place every input in some "
                "cluster)")
        return t

    return joined.map_batches(check_covered, batch_format="pyarrow") \
                 .select_columns(["kind", "representative", "member"])


def canonicalize_labels(labels: "ray.data.Dataset", kind: str,
                        salt_buckets: int = 16,
                        judge=None, max_group_size: int = 128,
                        shuffle_partitions=None, **kw
                        ) -> "ray.data.Dataset":
    """Single-kind convenience wrapper over
    :func:`canonicalize_label_table` (adds a constant ``kind`` column);
    extra keywords (broadcast_limit, adaptive_salt, hot_threshold) pass
    through."""
    def add_kind(t: pa.Table) -> pa.Table:
        if "kind" in t.column_names:
            return t
        return t.append_column(
            "kind", pa.array([kind] * t.num_rows, pa.string()))

    with_kind = labels.map_batches(add_kind, batch_format="pyarrow")
    return canonicalize_label_table(with_kind, salt_buckets, judge,
                                    max_group_size, shuffle_partitions,
                                    **kw)
