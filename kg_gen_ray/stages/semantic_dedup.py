"""Scalable semantic canonicalization — the reference's wikiqa variant
(SURVEY.md §2 A5 / X5 / X6), Ray-Data-first.

Reference flow (``/root/reference/experiments/wikiqa/utils/
cluster_and_deduplication.py:151-296``): embed all distinct labels
(all-mpnet-base-v2), FAISS k-means into ~``n/128`` capacity-bounded
clusters, then per cluster a sequential dedup loop — for each remaining
item retrieve the 16 most similar labels by 0.5*BM25 + 0.5*cosine rank
fusion and ask an LLM judge which are duplicates; merge into global
``entities``/``entity_clusters``.

Ours: embed via the pluggable actor-pool :mod:`kg_gen_ray.stages.embed`
stage → distributed Lloyd's k-means (:func:`kg_gen_ray.functions.ann.
kmeans_centroids`: broadcast centroids, per-block partial sums) → cosine
cluster assignment in ``map_batches`` → ``groupby(cluster).map_groups``
running the same retrieve-then-judge loop with a pluggable judge
(deterministic ``normalize_label`` equality by default; an LLM judge is a
drop-in callable). Like the reference, merges happen only *within* an
embedding cluster — canonicalization quality depends on k-means locality,
which is the documented trade of this scale path (the exact-by-key path is
:func:`kg_gen_ray.stages.canonicalize.canonicalize_label_table`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# module-level, not lazy inside the worker-side functions below: workers
# that receive this module by value (__ray_entry__ pickle-by-value
# fallback) must not re-import kg_gen_ray at call time
from kg_gen_ray.functions.bm25 import okapi_scores
from kg_gen_ray.stages.canonicalize import choose_representative, normalize_label

from kg_gen_ray.stages.common import dual_limit

CLUSTER_CAPACITY = 128   # ref: cluster_and_deduplication.py:153
RETRIEVAL_K = 16         # ref: cluster_and_deduplication.py:262


def norm_equality_judge(item: str, candidates: list) -> list:
    """Deterministic stand-in for the reference's LLM duplicate judge
    (``deduplicate_cluster``, ``cluster_and_deduplication.py:245-296``):
    duplicates = candidates sharing the item's normalization key."""
    key = normalize_label(item)
    return [c for c in candidates if normalize_label(c) == key]


class LLMDedupJudge:
    """Production LLM duplicate judge over a ``transport(prompt) -> str``
    callable (e.g. :class:`kg_gen_ray.stages.transport.LiteLLMTransport`),
    with the reference's ``context`` prompt steering
    (``kg_gen.py:270-289``; judge loop ``cluster_and_deduplication.py:
    245-296``). Wire format: candidates one per line; the response lists
    the duplicates one per line — anything not among the candidates is
    discarded (the same hard post-filter discipline as the extractor)."""

    def __init__(self, transport, context: str = ""):
        if transport is None:
            raise NotImplementedError(
                "LLMDedupJudge requires a transport callable")
        self.transport = transport
        self.context = context

    @staticmethod
    def _esc(s: str) -> str:
        # the wire format is line-oriented; labels extracted from raw web
        # text can themselves contain newlines, so escape for transport
        # and unescape responses before the candidate post-filter
        return s.replace("\\", "\\\\").replace("\n", "\\n")

    @staticmethod
    def _unesc(s: str) -> str:
        # left-to-right scanner: sequential str.replace would mangle a
        # literal backslash followed by 'n' ("a\\nb" -> esc "a\\\\nb" must
        # round-trip, but replace("\\n") would eat the wrong pair)
        out = []
        i = 0
        while i < len(s):
            if s[i] == "\\" and i + 1 < len(s):
                nxt = s[i + 1]
                if nxt == "n":
                    out.append("\n")
                    i += 2
                    continue
                if nxt == "\\":
                    out.append("\\")
                    i += 2
                    continue
            out.append(s[i])
            i += 1
        return "".join(out)

    def __call__(self, item: str, candidates: list) -> list:
        if not candidates:
            return []
        resp = self.transport(
            f"DEDUP\n{self._esc(self.context)}\n{self._esc(item)}\n---\n"
            + "\n".join(self._esc(c) for c in candidates))
        allowed = set(candidates)
        # strip only line ENDINGS: a candidate with leading/trailing
        # spaces (crawl text) must round-trip, and _esc protects only
        # newlines/backslashes, not edge whitespace
        return [self._unesc(ln) for ln in resp.splitlines()
                if self._unesc(ln) in allowed]


def dedup_cluster(members: list, embeddings: np.ndarray,
                  judge=norm_equality_judge,
                  retrieval_k: int = RETRIEVAL_K) -> list:
    """The per-cluster sequential loop: returns (representative, member)
    pairs. ``members`` sorted deterministically by the caller."""

    tokens = [m.lower().split() for m in members]
    norms = np.linalg.norm(embeddings, axis=1)
    norms[norms == 0] = 1.0
    unit = embeddings / norms[:, None]

    remaining = list(range(len(members)))
    out = []
    while remaining:
        i = remaining[0]
        rest = remaining[1:]
        if rest:
            # rank fusion over the cluster (ref get_relevant_items)
            bm = okapi_scores([tokens[j] for j in rest], tokens[i])
            cos = unit[rest] @ unit[i]
            fused = 0.5 * bm + 0.5 * cos
            order = sorted(range(len(rest)),
                           key=lambda r: (-fused[r], members[rest[r]]))
            cand_idx = [rest[r] for r in order[:retrieval_k]]
        else:
            cand_idx = []
        dup_names = set(judge(members[i], [members[j] for j in cand_idx]))
        cluster = [i] + [j for j in cand_idx if members[j] in dup_names]
        rep = choose_representative([members[j] for j in cluster])
        for j in cluster:
            out.append((rep, members[j]))
        taken = set(cluster)
        remaining = [j for j in remaining if j not in taken]
    return out


def semantic_canonicalize(labels: "ray.data.Dataset",
                          embed_backend: str = "hash", dim: int = 64,
                          cluster_capacity: int = CLUSTER_CAPACITY,
                          retrieval_k: int = RETRIEVAL_K,
                          judge=norm_equality_judge,
                          embed_concurrency=None,
                          kmeans_iter: int = 5,
                          assign_broadcast_limit: int = 128 * 1024 * 1024
                          ) -> "ray.data.Dataset":
    """distinct labels(kind, member) -> alias_map(kind, representative, member).

    ``n_clusters = max(1, n // cluster_capacity)`` mirrors the reference's
    ``num_clusters = n // 128``; per-group work is additionally chunked to
    ``cluster_capacity`` so a skewed k-means cell cannot produce an
    unbounded group (same bound the reference enforces by capacity-aware
    assignment).
    """
    from kg_gen_ray.functions.ann import ivf_assign, kmeans_centroids
    from kg_gen_ray.stages.embed import embed_stage

    def ensure_kind(t: pa.Table) -> pa.Table:
        if "kind" not in t.column_names:
            t = t.append_column("kind",
                                pa.array(["entity"] * t.num_rows, pa.string()))
        return t.select(["kind", "member"])

    emb = embed_stage(labels.map_batches(ensure_kind, batch_format="pyarrow"),
                      backend=embed_backend, dim=dim,
                      concurrency=embed_concurrency)

    # stable 64-bit id per label for k-means seeding / assignment (md5
    # truncation: 32-bit crc would collide with high probability at
    # ~100k+ labels and silently misroute a label's cluster)
    def with_id(t: pa.Table) -> pa.Table:
        import hashlib
        ids = [int.from_bytes(
                   hashlib.md5(f"{k}\x00{m}".encode("utf-8")).digest()[:8],
                   "big") & ((1 << 63) - 1)
               for k, m in zip(t["kind"].to_pylist(),
                               t["member"].to_pylist())]
        return t.append_column("lid", pa.array(ids, pa.int64()))

    emb = emb.map_batches(with_id, batch_format="pyarrow").materialize()
    n = emb.count()
    n_clusters = max(1, n // cluster_capacity)

    if n_clusters == 1:
        assigned = emb.map_batches(
            lambda t: t.append_column(
                "centroid_id", pa.array([0] * t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        import ray
        cents = kmeans_centroids(emb, n_clusters, n_iter=kmeans_iter,
                                 id_col="lid")
        cmap = ivf_assign(emb, cents, id_col="lid").materialize()
        # broadcast/join dual by measured size (same pattern as the
        # alias rewrite): a driver dict of the whole assignment map is
        # O(distinct labels) head-node memory — fine when small, a hash
        # join on lid otherwise
        if (cmap.size_bytes() or 0) <= dual_limit(assign_broadcast_limit):
            id_to_cid = {}
            for b in cmap.iter_batches(batch_format="pyarrow", batch_size=None):
                id_to_cid.update(zip(b["lid"].to_pylist(),
                                     b["centroid_id"].to_pylist()))
            ref = ray.put(id_to_cid)

            def attach(t: pa.Table, ref=ref) -> pa.Table:
                m = ray.get(ref)
                cids = [m[i] for i in t["lid"].to_pylist()]
                return t.append_column("centroid_id",
                                       pa.array(cids, pa.int64()))

            assigned = emb.map_batches(attach, batch_format="pyarrow")
        else:
            n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))

            # pyarrow hash joins reject list<float> payload columns:
            # re-encode the embedding as float32 bytes for the join
            # (per_cluster decodes either form)
            def enc(t: pa.Table) -> pa.Table:
                vecs = [np.asarray(v, dtype=np.float32).tobytes()
                        for v in t["embedding"].to_pylist()]
                t = t.drop_columns(["embedding"])
                return t.append_column("embedding",
                                       pa.array(vecs, pa.binary()))

            assigned = emb.map_batches(enc, batch_format="pyarrow") \
                .join(cmap.repartition(n_parts), join_type="inner",
                      on=("lid",), num_partitions=n_parts)

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].iloc[0]
        order = sorted(range(len(g)),
                       key=lambda i: ((len(g["member"].iloc[i]),
                                       g["member"].iloc[i])))
        members = [g["member"].iloc[i] for i in order]

        def as_vec(v):
            if isinstance(v, (bytes, bytearray)):  # join-path binary form
                return np.frombuffer(v, dtype=np.float32).astype(np.float64)
            return np.asarray(v, dtype=np.float64)

        vecs = np.asarray([as_vec(g["embedding"].iloc[i]) for i in order])
        reps, mems = [], []
        for lo in range(0, len(members), cluster_capacity):
            chunk = members[lo:lo + cluster_capacity]
            cvecs = vecs[lo:lo + cluster_capacity]
            for rep, m in dedup_cluster(chunk, cvecs, judge, retrieval_k):
                reps.append(rep)
                mems.append(m)
        return pd.DataFrame({"kind": [kind] * len(mems),
                             "representative": reps, "member": mems})

    return assigned.groupby(["kind", "centroid_id"]).map_groups(
        per_cluster, batch_format="pandas")
