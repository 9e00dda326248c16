"""Streaming near-duplicate index — the shared MUTABLE index case.

This is the one place the engine drops to raw Ray actors, per the
custom-operator strategy: deduplicating a NEW crawl increment against an
ever-growing corpus index is not expressible as a pure ``Dataset``
transform, because the state must mutate mid-stream (a doc admitted by
batch 1 must collide with a near-dup in batch 2 of the same run) and
persist across pipeline runs. The batch path
(:func:`kg_gen_ray.functions.dedup.near_dup_canonical`) remains the right
tool for whole-corpus dedup; this index serves the incremental-ingest
loop (the Ray-native analogue of the reference MCP memory-store's
accumulate-then-extend flow, ``/root/reference/src/kg_gen/mcp.py``).

Shape: the LSH band space is hash-partitioned over ``n_shards``
``BandIndexShard`` actors (each a plain dict band_key -> first owner
doc_id). A streaming ``map_batches`` stage computes the SAME u64
signatures and band keys as the batch LSH path
(:func:`kg_gen_ray.functions.fast_text.band_keys_from_sig` — bit-for-bit
agreement, so streamed increments collide with exactly the buckets a
batch run would), routes each band row to its shard, and performs an
atomic check-and-add: the first doc to present a band key owns it, every
later doc presenting the same key is flagged a duplicate. Actor method
calls serialize per shard, so no two docs sharing a band key can both
survive — regardless of batch concurrency.

Semantics notes (inherent to streaming dedup, documented not hidden):

* Keep-lowest semantics: a doc is flagged only when a band owner has a
  LOWER id, and ownership migrates to the minimum id seen (see
  ``check_add``) — so the rule works for hash-derived ids arriving in
  any order, not just monotonic streams. Concurrent races between
  near-dups can only degrade to keeping both (a missed dedup a later
  batch pass or re-stream can catch, since the recorded owner has
  converged to the cluster minimum), never to dropping every copy.
* A doc flagged dup via one band may already have registered its other
  bands; later matches on those bands attribute to the dropped doc.
  That is the standard transitive-closure semantics of LSH dedup — the
  match still flags the newcomer as a duplicate, which is the contract.

Scale: shard count bounds per-actor memory (keys are 8-byte band hashes
+ 8-byte owners in a dict); at 10^12 docs pin shard actors across nodes
and raise ``n_shards`` so each holds ~10^8 keys. Calls ship O(batch)
numpy arrays, not Python lists. ``save``/``load`` checkpoint each shard
to its own Parquet file (the per-partition resumability pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

# module-level import (pickle-by-value compatibility): worker-side UDF
# bodies must not lazily import kg_gen_ray
from kg_gen_ray.functions.fast_text import (
    band_keys_from_sig, minhash_signatures_fast)


@ray.remote(num_cpus=0.25)
class BandIndexShard:
    """One shard of the band index: dict band_key -> owner doc_id.
    ``num_cpus=0.25`` — shards are lookup tables, not compute stages;
    four co-locate per core without starving the mapper pool."""

    def __init__(self):
        self._owners: dict[int, int] = {}

    def check_add(self, keys: np.ndarray, docs: np.ndarray) -> np.ndarray:
        """Atomic batched check-and-add with MIN-ID ownership: for each
        (key, doc) row return the currently recorded owner (-1 if the
        key is new), then set the owner to min(prev, doc). The migration
        is what keeps the index effective for ids that do NOT arrive in
        order (hash-derived ids): without it, a high-id doc that arrives
        first would shield its band forever — every later lower-id
        near-dup would be admitted against the high owner and never
        register, silently disabling dedup for that cluster. With
        migration the recorded owner converges to the cluster minimum,
        so future arrivals always compare against it. Calls serialize on
        the actor."""
        out = np.empty(len(keys), dtype=np.int64)
        owners = self._owners
        for i, (k, d) in enumerate(zip(keys.tolist(), docs.tolist())):
            prev = owners.get(k)
            if prev is None:
                owners[k] = d
                out[i] = -1
            else:
                out[i] = prev
                if d < prev:
                    owners[k] = d
        return out

    def n_keys(self) -> int:
        return len(self._owners)

    def snapshot(self) -> "pa.Table":
        return pa.table({
            "band_key": pa.array(list(self._owners.keys()), pa.uint64()),
            "owner": pa.array(list(self._owners.values()), pa.int64()),
        })

    def restore(self, t: "pa.Table") -> int:
        self._owners = dict(zip(
            (int(k) for k in t["band_key"].to_pylist()),
            t["owner"].to_pylist()))
        return len(self._owners)


def _route(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Band key -> shard id. The band keys are already well-mixed u64
    hashes, so a plain modulo spreads them evenly."""
    return (keys % np.uint64(n_shards)).astype(np.int64)


class StreamingDedupIndex:
    """Driver-side handle over the shard actors. Picklable into
    ``map_batches`` closures (actor handles travel by reference)."""

    def __init__(self, n_shards: int = 8, signatures=None):
        self.n_shards = n_shards
        self.signatures = signatures or minhash_signatures_fast
        self.shards = [BandIndexShard.remote() for _ in range(n_shards)]

    # -- streaming filter --------------------------------------------------

    def filter_new(self, docs: "ray.data.Dataset") -> "ray.data.Dataset":
        """Keep only rows that are NOT near-duplicates of anything already
        in the index (or earlier in this stream); admitted rows register
        their bands as they pass. A lazy, backpressured Dataset stage —
        the index calls happen inside the tasks, so the stream never
        collects on the driver."""
        shards, n_shards, signatures = \
            self.shards, self.n_shards, self.signatures

        def fn(t: pa.Table) -> pa.Table:
            # sort the batch by id so lower ids register their bands
            # first WITHIN a call — in-batch dedup is then deterministic
            # keep-lowest regardless of the input's row order
            if "doc_id" in t.column_names:
                t = t.sort_by([("doc_id", "ascending")])
            sig = signatures(t)
            rows = band_keys_from_sig(sig)
            keys = rows["band_key"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            row_doc = rows["doc_id"].to_numpy(zero_copy_only=False)
            shard_of = _route(keys, n_shards)
            owner = np.full(len(keys), -1, dtype=np.int64)
            pending = []
            for s in range(n_shards):
                m = shard_of == s
                if m.any():
                    pending.append(
                        (m, shards[s].check_add.remote(keys[m],
                                                       row_doc[m])))
            for m, fut in pending:
                owner[m] = ray.get(fut)
            # doc is a dup ONLY if a band hit an owner with a LOWER id.
            # The strict inequality is load-bearing: two near-dups racing
            # in concurrent tasks can each win a band on a different
            # shard; an unconditional any-hit rule then flags BOTH and
            # silently loses every copy of the content. With owner < doc,
            # the lower id is never flagged by the higher one, so a race
            # degrades to keeping both (a missed dedup the next batch
            # pass can still catch) — never to data loss.
            hit_docs = np.unique(row_doc[(owner >= 0) & (owner < row_doc)])
            doc_ids = sig["doc_id"].to_numpy(zero_copy_only=False)
            keep = ~np.isin(doc_ids, hit_docs)
            return t.filter(pa.array(keep))

        return docs.map_batches(fn, batch_format="pyarrow")

    # -- checkpoint --------------------------------------------------------

    def n_keys(self) -> int:
        return sum(ray.get([s.n_keys.remote() for s in self.shards]))

    def save(self, path: str) -> None:
        """One Parquet file per shard under ``path`` plus a manifest —
        the partitioned, resumable checkpoint layout. The manifest pins
        the shard count: routing is ``key % n_shards``, so restoring
        with a different count would silently send keys away from the
        entries that hold them.

        The write is ATOMIC (temp dir + rename, the same contract as
        ``lineage.atomic_output_dir``): a crash mid-save leaves the
        previous checkpoint untouched rather than a mixed-generation
        directory that ``load`` would validate and silently restore,
        and re-saving with a different shard count replaces the whole
        directory instead of leaving stale shard files behind."""
        import json
        import os

        from kg_gen_ray.state.lineage import atomic_output_dir
        tables = ray.get([s.snapshot.remote() for s in self.shards])
        with atomic_output_dir(path) as tmp:
            for i, t in enumerate(tables):
                pq.write_table(t, os.path.join(tmp,
                                               f"shard-{i:05d}.parquet"))
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump({"n_shards": self.n_shards,
                           "signatures": getattr(self.signatures,
                                                 "__name__",
                                                 str(self.signatures))}, f)

    @classmethod
    def load(cls, path: str, signatures=None) -> "StreamingDedupIndex":
        """Restore a saved index. Raises on a missing/empty checkpoint or
        a shard-file/manifest mismatch — a silently empty or misrouted
        index admits every duplicate, which must never happen quietly.
        Pass the SAME ``signatures`` family the index was built with
        (band keys from different families never collide)."""
        import glob
        import json
        import os
        files = sorted(glob.glob(os.path.join(path, "shard-*.parquet")))
        if not files:
            raise FileNotFoundError(
                f"no band-index checkpoint at {path!r}")
        mpath = os.path.join(path, "manifest.json")
        if not os.path.exists(mpath):
            # a manifest-less dir can't be validated (shard count,
            # signature family) — loading it anyway is exactly the
            # silent-misroute this method promises to refuse
            raise FileNotFoundError(
                f"checkpoint at {path!r} has shard files but no "
                "manifest.json — cannot verify shard count or signature "
                "family; refusing to restore an unverifiable index")
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest["n_shards"] != len(files):
            raise ValueError(
                f"checkpoint at {path!r} has {len(files)} shard "
                f"files but the manifest says "
                f"{manifest['n_shards']} — refusing to restore a "
                "misrouted index")
        resolved = signatures or minhash_signatures_fast
        got_family = getattr(resolved, "__name__", str(resolved))
        saved_family = manifest.get("signatures")
        if saved_family is not None and saved_family != got_family:
            raise ValueError(
                f"checkpoint at {path!r} was built with signature "
                f"family {saved_family!r} but this load would use "
                f"{got_family!r} — band keys from different families "
                "never collide, so the restored index would silently "
                "admit every duplicate; pass the matching "
                "signatures=")
        idx = cls(n_shards=len(files), signatures=signatures)
        ray.get([s.restore.remote(pq.read_table(f))
                 for s, f in zip(idx.shards, files)])
        return idx
