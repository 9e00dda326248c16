"""Deterministic integer id minting for string-keyed corpora.

The input_hint table (Common-Crawl-style pages: url, warc_ts, html,
text, lang) has no integer key, but every packed-key operator in this
engine — paragraph dedup's (doc_id, para_idx) int64 enc, span removal's
(doc_id, pos), ``drop_ids``'s sorted-id broadcasts — wants a dense
int64 ``doc_id``. ``mint_doc_ids`` bridges the two shapes: a
deterministic, collision-FREE int64 id per distinct key,

    bucket = md5_u32(key) mod 2**bucket_bits      (the engine's
             oracle-parity token-hash family, fast_text._md5_u32_hashes)
    rank   = position of key in its bucket's ascending key order
    id     = bucket * 2**rank_bits + rank

Unlike a raw 64-bit key hash — which at 10^12 documents saturates the
41-bit id budget the packed-key operators allow (doc_id < 2^41 keeps
both span removal's 21 position bits and paragraph dedup's 20 index
bits packable) and WILL collide — the bucket+rank scheme is exact at
any scale: collisions inside a bucket are resolved by rank, and the
only failure mode is a bucket exceeding ``2**rank_bits`` keys, which
raises loudly (raise ``bucket_bits`` — the defaults 20+21 hold ~2
billion keys per unit of average bucket skew).

Distributed shape (the 100 TB story): the exchange never carries
text — only the key column shuffles (one bucketed groupby over
(key, bucket) pairs, ranks assigned vectorized per bucket). Attaching
ids back to the corpus is the engine's standard size-selected dual:
below ``broadcast_limit`` the (key -> id) table ships once via
``ray.put`` and each batch resolves ids with a zero-copy Arrow hash
lookup (``pc.index_in``); above it, a hash join carries the corpus
through one partitioned exchange.

Determinism: ids are a pure function of the key SET — block order,
partitioning and cluster size never change them, so re-runs and
resumed runs agree. Duplicate keys raise (re-crawls should be dropped
first — ``functions.web.url_dedup`` is the operator for that).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level imports (pickle-by-value compatibility): worker-side UDF
# bodies must not lazily import kg_gen_ray
from kg_gen_ray.functions.fast_text import _md5_u32_hashes
from kg_gen_ray.stages.common import coalesce, default_buckets, dual_limit

_DUP_KEY_MSG = ("duplicate key: mint_doc_ids requires unique keys (one id "
                "per distinct key would alias the rows); drop re-crawls "
                "first, e.g. with functions.web.url_dedup")


def mint_doc_ids(docs: "ray.data.Dataset", key_col: str = "url",
                 id_col: str = "doc_id", bucket_bits: int = 20,
                 rank_bits: int = 21,
                 broadcast_limit: int = 64 * 1024 * 1024,
                 shuffle_partitions=None) -> "ray.data.Dataset":
    """The input dataset with a deterministic int64 ``id_col`` appended,
    minted from the unique string ``key_col`` (see module docstring for
    the id layout and scale shape). Ids are < ``2**(bucket_bits +
    rank_bits)``; the defaults stay under 2^41, inside every packed-key
    operator's doc-id budget."""
    if bucket_bits < 1 or rank_bits < 1 or bucket_bits + rank_bits > 62:
        raise ValueError("bucket_bits and rank_bits must be >= 1 and sum "
                         "to <= 62 (int64 ids)")
    if id_col in docs.schema().names:
        raise ValueError(f"column {id_col!r} already exists; minting "
                         "would shadow it")
    n_buckets = 1 << bucket_bits
    n_outer = default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = pc.cast(t[key_col], pa.string())
        if keys.null_count:
            raise ValueError(f"null {key_col}: every row needs a key "
                             "to mint an id from")
        h = _md5_u32_hashes(keys)
        inner = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            key_col: keys,
            "__ib": pa.array(inner, pa.int64()),
            # outer group is a pure function of the inner bucket, so one
            # inner bucket is complete inside its group
            "__ob": pa.array(inner % n_outer, pa.int64()),
        })

    def assign(g: pd.DataFrame) -> pa.Table:
        ks = g[key_col].to_numpy()
        ib = g["__ib"].to_numpy(dtype=np.int64)
        order = np.lexsort((ks, ib))
        ks_s, ib_s = ks[order], ib[order]
        if len(ks_s) > 1 and bool(
                ((ks_s[1:] == ks_s[:-1]) & (ib_s[1:] == ib_s[:-1])).any()):
            raise ValueError(_DUP_KEY_MSG)
        first = np.ones(len(ks_s), dtype=bool)
        first[1:] = ib_s[1:] != ib_s[:-1]
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.concatenate([starts, [len(ks_s)]]))
        if len(sizes) and int(sizes.max()) > (1 << rank_bits):
            raise ValueError(
                f"bucket with {int(sizes.max())} keys exceeds "
                f"2**rank_bits={1 << rank_bits}; raise bucket_bits")
        rank = np.arange(len(ks_s), dtype=np.int64) \
            - np.repeat(starts, sizes)
        ids = ib_s * np.int64(1 << rank_bits) + rank
        return pa.table({key_col: pa.array(ks_s, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    id_table = coalesce(docs.select_columns([key_col])
                        .map_batches(add_bucket, batch_format="pyarrow"),
                        shuffle_partitions) \
        .groupby("__ob").map_groups(assign, batch_format="pandas") \
        .materialize()

    in_names = list(docs.schema().names)
    lim = dual_limit(broadcast_limit)
    if (id_table.size_bytes() or 0) <= lim:
        parts = list(id_table.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
        tbl = (pa.concat_tables(parts) if parts
               else pa.table({key_col: pa.array([], pa.string()),
                              id_col: pa.array([], pa.int64())}))
        vset = pc.cast(tbl[key_col], pa.string()).combine_chunks()
        ids_np = tbl[id_col].to_numpy(zero_copy_only=False)
        ref = ray.put((vset, ids_np))

        def attach(t: pa.Table, ref=ref) -> pa.Table:
            vset, ids_np = ray.get(ref)
            idx = pc.index_in(pc.cast(t[key_col], pa.string()),
                              value_set=vset)
            # every key was minted from this same dataset, so a miss is
            # impossible; guard anyway (it would silently alias ids)
            if idx.null_count:
                raise ValueError(f"unminted {key_col} in attach phase")
            take = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(
                id_col, pa.array(ids_np[take], pa.int64()))

        return docs.map_batches(attach, batch_format="pyarrow")

    # join dual: one partitioned hash join carries the corpus; normalize
    # both sides first (schemaless empty blocks from the groupby lineage
    # break the join's key FieldRef)
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    joined = docs.repartition(n_parts).join(
        id_table.select_columns([key_col, id_col]).repartition(n_parts),
        join_type="inner", on=(key_col,), num_partitions=n_parts)
    return joined.select_columns(in_names + [id_col])
