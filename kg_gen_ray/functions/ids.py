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
resumed runs agree.

Re-crawl corpora (the same url captured at several ``warc_ts``) would
otherwise hit a chicken-and-egg: duplicate keys cannot mint, but
``functions.web.url_dedup`` — the operator that drops re-crawls —
itself needs an integer id. ``tiebreak_col="warc_ts"`` resolves it:
(key, tiebreak) becomes the unique key, the bucket still hashes the
key ALONE, and ranks sort (key, tiebreak) — so the earliest rendering
of each url gets the smallest id and a later ``url_dedup`` (min-id per
normalized url) keeps the first crawl. Plain duplicate keys (no
tiebreak) raise.
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
                "first, e.g. with functions.web.url_dedup, or pass "
                "tiebreak_col (e.g. warc_ts) to key on (url, timestamp)")


def mint_doc_ids(docs: "ray.data.Dataset", key_col: str = "url",
                 id_col: str = "doc_id", bucket_bits: int = 20,
                 rank_bits: int = 21, tiebreak_col: "str | None" = None,
                 broadcast_limit: int = 64 * 1024 * 1024,
                 shuffle_partitions=None) -> "ray.data.Dataset":
    """The input dataset with a deterministic int64 ``id_col`` appended,
    minted from the unique string ``key_col`` — or from the unique
    (``key_col``, ``tiebreak_col``) pair for re-crawl corpora (see
    module docstring for the id layout, tiebreak semantics and scale
    shape). Ids are < ``2**(bucket_bits + rank_bits)``; the defaults
    stay under 2^41, inside every packed-key operator's doc-id
    budget."""
    if bucket_bits < 1 or rank_bits < 1 or bucket_bits + rank_bits > 62:
        raise ValueError("bucket_bits and rank_bits must be >= 1 and sum "
                         "to <= 62 (int64 ids)")
    if id_col in docs.schema().names:
        raise ValueError(f"column {id_col!r} already exists; minting "
                         "would shadow it")
    n_buckets = 1 << bucket_bits
    n_outer = default_buckets()
    mint_cols = ([key_col] if tiebreak_col is None
                 else [key_col, tiebreak_col])
    if tiebreak_col is not None:
        tb_names = list(docs.schema().names)
        tb_type = docs.schema().types[tb_names.index(tiebreak_col)]
        tb_numeric = (pa.types.is_integer(tb_type)
                      or pa.types.is_timestamp(tb_type)
                      or pa.types.is_date(tb_type)
                      or pa.types.is_time(tb_type))
        if not (tb_numeric or pa.types.is_string(tb_type)
                or pa.types.is_large_string(tb_type)):
            raise ValueError(
                f"tiebreak_col {tiebreak_col!r} has type {tb_type} — "
                "only integer/timestamp/date/time (rendered as "
                "zero-padded int64) and string tiebreaks order-preserve "
                "through the composite key")

    def minted_key(t: pa.Table) -> pa.Array:
        """The unique-key rendering: the key itself, or key + NUL +
        rendered tiebreak. NUL sorts before every printable byte, so the
        composite order is (key, tiebreak) and stays prefix-free; the
        same kernel runs on the mining AND attach sides, so the exact
        rendering never needs to round-trip. Numeric/timestamp
        tiebreaks render as ZERO-PADDED int64 so lexicographic order ==
        numeric order ('earliest crawl gets the smallest id' holds for
        epoch-integer warc_ts, not just fixed-width ISO strings)."""
        keys = pc.cast(t[key_col], pa.string())
        if keys.null_count:
            raise ValueError(f"null {key_col}: every row needs a key "
                             "to mint an id from")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if tiebreak_col is None:
            return keys
        if tb_numeric:
            tb64 = pc.cast(t[tiebreak_col], pa.int64())
            if tb64.null_count:
                raise ValueError(f"null {tiebreak_col}: tiebreak values "
                                 "are part of the minting key")
            if len(tb64) and pc.min(tb64).as_py() < 0:
                raise ValueError(
                    f"negative {tiebreak_col} cannot be rendered "
                    "order-preserving; shift to a non-negative epoch")
            tb = pc.utf8_lpad(pc.cast(tb64, pa.string()), 19, "0")
        else:
            tb = pc.cast(t[tiebreak_col], pa.string())
            if tb.null_count:
                raise ValueError(f"null {tiebreak_col}: tiebreak values "
                                 "are part of the minting key")
        out = pc.binary_join_element_wise(keys, tb, "\x00")
        return (out.combine_chunks()
                if isinstance(out, pa.ChunkedArray) else out)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = pc.cast(t[key_col], pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        mk = minted_key(t)
        # bucket hashes the KEY alone (not the composite): all renderings
        # of one url share a bucket, so in-bucket rank order is
        # (url, tiebreak) and the earliest crawl takes the smallest id
        h = _md5_u32_hashes(keys)
        inner = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "__mk": mk,
            "__ib": pa.array(inner, pa.int64()),
            # outer group is a pure function of the inner bucket, so one
            # inner bucket is complete inside its group
            "__ob": pa.array(inner % n_outer, pa.int64()),
        })

    def assign(g: pd.DataFrame) -> pa.Table:
        mks = g["__mk"].to_numpy()
        ib = g["__ib"].to_numpy(dtype=np.int64)
        order = np.lexsort((mks, ib))
        mk_s, ib_s = mks[order], ib[order]
        if len(mk_s) > 1 and bool(
                ((mk_s[1:] == mk_s[:-1]) & (ib_s[1:] == ib_s[:-1])).any()):
            raise ValueError(_DUP_KEY_MSG)
        first = np.ones(len(mk_s), dtype=bool)
        first[1:] = ib_s[1:] != ib_s[:-1]
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.concatenate([starts, [len(mk_s)]]))
        if len(sizes) and int(sizes.max()) > (1 << rank_bits):
            raise ValueError(
                f"bucket with {int(sizes.max())} keys exceeds "
                f"2**rank_bits={1 << rank_bits}; raise bucket_bits")
        rank = np.arange(len(mk_s), dtype=np.int64) \
            - np.repeat(starts, sizes)
        ids = ib_s * np.int64(1 << rank_bits) + rank
        return pa.table({"__mk": pa.array(mk_s, pa.string()),
                         id_col: pa.array(ids, pa.int64())})

    id_table = coalesce(docs.select_columns(mint_cols)
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
               else pa.table({"__mk": pa.array([], pa.string()),
                              id_col: pa.array([], pa.int64())}))
        vset = pc.cast(tbl["__mk"], pa.string()).combine_chunks()
        ids_np = tbl[id_col].to_numpy(zero_copy_only=False)
        ref = ray.put((vset, ids_np))

        def attach(t: pa.Table, ref=ref) -> pa.Table:
            vset, ids_np = ray.get(ref)
            idx = pc.index_in(minted_key(t), value_set=vset)
            # every key was minted from this same dataset, so a miss is
            # impossible; guard anyway (it would silently alias ids)
            if idx.null_count:
                raise ValueError(f"unminted {key_col} in attach phase")
            take = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(
                id_col, pa.array(ids_np[take], pa.int64()))

        return docs.map_batches(attach, batch_format="pyarrow")

    # join dual: one partitioned hash join carries the corpus; both
    # sides key on the composite __mk (normalize first — schemaless
    # empty blocks from the groupby lineage break the join's FieldRef)
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def with_mk(t: pa.Table) -> pa.Table:
        return t.append_column("__mk", minted_key(t))

    joined = docs.map_batches(with_mk, batch_format="pyarrow") \
        .repartition(n_parts).join(
            id_table.select_columns(["__mk", id_col])
            .repartition(n_parts),
            join_type="inner", on=("__mk",), num_partitions=n_parts)
    return joined.select_columns(in_names + [id_col])
