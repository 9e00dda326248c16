"""Windowed aggregates and as-of joins — custom operators Ray Data lacks.

The reference is strictly batch with no time logic (SURVEY.md §2.9), but a
large-scale training-data pipeline needs time-windowed statistics (burst
detection, rate features) and as-of alignment (joining each event to the
latest preceding reference row). Both are expressed as compositions of
``map_batches`` + ``groupby`` per the (a)-strategy in the build rules:

* tumbling window: floor the timestamp to the window — one groupby.
* sliding window: each row belongs to ``window/slide`` windows — a
  vectorized row-expansion ``map_batches`` (emit one (window_start, ...)
  row per covering window) followed by one groupby. Window count per row
  is a small constant, so the expansion is bounded.
* as-of join: partition both sides by key, ``map_groups`` sorts the
  (small) per-key group and runs a vectorized ``searchsorted``. The
  partitioning assumption: one key's rows fit in one group (true for
  per-user event streams; a globally-sorted merge join would replace this
  at extreme per-key cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

# module-level (pickle-by-value compatibility): worker-side UDF bodies
# must not lazily import kg_gen_ray
from kg_gen_ray.functions.sessions import _arrow_group_key

US = 1_000_000


def _encode_key(t: pa.Table, key_col: str) -> pa.Table:
    """Swap ``key_col`` for its null-free string surrogate before a
    groupby: Ray's sort-based shuffle cannot order null keys across
    blocks (TypeError on None < str), and silently dropping the null
    group would diverge from SQL GROUP BY. Same surrogate as every
    grouped op (``sessions._arrow_group_key``)."""
    idx = t.schema.get_field_index(key_col)
    return t.set_column(idx, "__gk", _arrow_group_key(t[key_col]))


def _decode_key(ds: "ray.data.Dataset", key_col: str,
                key_type) -> "ray.data.Dataset":
    """Undo ``_encode_key`` after the aggregate: 'n' -> null, 'v:x' -> x,
    cast back to the input column's Arrow type."""

    def dec(t: pa.Table) -> pa.Table:
        gk = pc.cast(t["__gk"], pa.string())
        key = pc.if_else(
            pc.equal(gk, pa.scalar("n")), pa.scalar(None, pa.string()),
            pc.utf8_slice_codeunits(gk, 2, 1 << 30))
        return t.set_column(t.schema.get_field_index("__gk"), key_col,
                            pc.cast(key, key_type))

    return ds.map_batches(dec, batch_format="pyarrow")


def _key_type(events: "ray.data.Dataset", key_col: str):
    schema = events.schema()
    if schema is None:          # schemaless empty input: no rows will
        return pa.string()      # reach decode, any type works
    return schema.base_schema.field(key_col).type


def _ts_us(arr: "pa.ChunkedArray") -> np.ndarray:
    return pc.cast(arr, pa.timestamp("us")).cast(pa.int64()) \
             .to_numpy(zero_copy_only=False)


def _drop_null_ts(events: "ray.data.Dataset",
                  ts_col: str) -> "ray.data.Dataset":
    """An event with an unknown timestamp cannot be assigned a window,
    session, or as-of match: drop such rows at operator entry — the
    streaming-engine convention for invalid event time (shared kernel:
    ``common.drop_null_rows``)."""
    from kg_gen_ray.stages.common import drop_null_rows
    return drop_null_rows(events, ts_col)


def tumbling_window(events: "ray.data.Dataset", window_sec: int,
                    ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value") -> "ray.data.Dataset":
    """(key, window_start, n_events, sum_<value_col>) — fixed windows."""
    # key type from the RAW input (parquet metadata — free) before the
    # _drop_null_ts map_batches is appended; schema() on the mapped
    # dataset would trigger partial plan execution (cf. asof_join)
    ktype = _key_type(events, key_col)
    events = _drop_null_ts(events, ts_col)
    w_us = window_sec * US

    def bucket(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_col])
        start = (ts // w_us) * w_us
        return _encode_key(pa.table({
            key_col: t[key_col],
            "window_start": pa.array(start).cast(pa.timestamp("us")),
            value_col: t[value_col],
        }), key_col)

    agg = (events.map_batches(bucket, batch_format="pyarrow")
           .groupby(["__gk", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum(value_col, alias_name=f"sum_{value_col}")))
    return _decode_key(agg, key_col, ktype)


def sliding_window(events: "ray.data.Dataset", window_sec: int,
                   slide_sec: int, ts_col: str = "ts",
                   key_col: str = "event_type",
                   value_col: str = "value") -> "ray.data.Dataset":
    """(key, window_start, n_events, sum_<value_col>) over windows of
    ``window_sec`` advancing every ``slide_sec``. A row at time t belongs
    to every window with start in (t - window, t], start ≡ 0 mod slide."""
    if window_sec % slide_sec != 0:
        raise ValueError("window_sec must be a multiple of slide_sec")
    ktype = _key_type(events, key_col)   # before _drop_null_ts: metadata-only
    events = _drop_null_ts(events, ts_col)
    w_us, s_us = window_sec * US, slide_sec * US
    k = window_sec // slide_sec   # windows covering each row

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = _ts_us(t[ts_col])
        last = (ts // s_us) * s_us                 # latest covering start
        # starts: last, last - s, ..., last - (k-1) s. Every one covers
        # the row: the smallest is last - w + s > (ts - s) - w + s =
        # ts - w (floor property last > ts - s), so no range filter is
        # needed — exactly k windows per row, by construction.
        starts = last[:, None] - np.arange(k)[None, :] * s_us   # (n, k)
        row_idx = np.repeat(np.arange(n), k)
        keys = t[key_col].combine_chunks().take(pa.array(row_idx))
        vals = t[value_col].combine_chunks().take(pa.array(row_idx))
        return _encode_key(pa.table({
            key_col: keys,
            "window_start": pa.array(starts.ravel())
                              .cast(pa.timestamp("us")),
            value_col: vals,
        }), key_col)

    agg = (events.map_batches(explode, batch_format="pyarrow")
           .groupby(["__gk", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum(value_col, alias_name=f"sum_{value_col}")))
    return _decode_key(agg, key_col, ktype)


def multi_window(events: "ray.data.Dataset",
                 specs: list, ts_col: str = "ts",
                 key_col: str = "event_type",
                 value_col: str = "value") -> "ray.data.Dataset":
    """Several window families over one input in ONE shuffle.

    ``specs``: list of ``(window_kind, window_sec, slide_sec)`` — a
    tumbling window is simply ``slide_sec == window_sec`` (each row covers
    exactly one window). One row-expansion ``map_batches`` emits every
    (window_kind, window_start) assignment for every family, then a single
    ``groupby(window_kind, key, window_start)`` aggregates them all —
    n families share one all-to-all exchange (and one pass over the
    input) instead of paying a shuffle each.
    Output: (window_kind, key, window_start, n_events, sum_<value_col>).
    """
    for kind, w_sec, s_sec in specs:
        if w_sec % s_sec != 0:
            raise ValueError(
                f"window_sec must be a multiple of slide_sec ({kind})")
    ktype = _key_type(events, key_col)   # before _drop_null_ts: metadata-only
    events = _drop_null_ts(events, ts_col)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = _ts_us(t[ts_col])
        kinds, rows, starts_all = [], [], []
        for kind, w_sec, s_sec in specs:
            s_us = s_sec * US
            k = w_sec // s_sec
            last = (ts // s_us) * s_us
            # every generated start covers the row (see sliding_window:
            # min start = last - w + s > ts - w), so it's exactly k
            # windows per row with no range filter
            starts = last[:, None] - np.arange(k)[None, :] * s_us
            ridx = np.repeat(np.arange(n), k)
            kinds.append(np.full(len(ridx), kind, dtype=object))
            rows.append(ridx)
            starts_all.append(starts.ravel())
        row_idx = pa.array(np.concatenate(rows) if rows else [], pa.int64())
        return _encode_key(pa.table({
            "window_kind": pa.array(
                np.concatenate(kinds) if kinds else [], pa.string()),
            key_col: t[key_col].combine_chunks().take(row_idx),
            "window_start": pa.array(
                np.concatenate(starts_all) if starts_all
                else np.array([], dtype=np.int64)).cast(pa.timestamp("us")),
            value_col: t[value_col].combine_chunks().take(row_idx),
        }), key_col)

    agg = (events.map_batches(explode, batch_format="pyarrow")
           .groupby(["window_kind", "__gk", "window_start"])
           .aggregate(Count(alias_name="n_events"),
                      Sum(value_col, alias_name=f"sum_{value_col}")))
    return _decode_key(agg, key_col, ktype)


def range_join(left: "ray.data.Dataset", intervals: "ray.data.Dataset",
               key_col: str, ts_col: str,
               start_col: str, end_col: str,
               payload_cols: list,
               interval_key_col: str | None = None,
               n_buckets: int | None = None) -> "ray.data.Dataset":
    """For each left row, attach the interval with the same key whose
    ``[start_col, end_col]`` contains ``ts_col`` (inclusive both ends).
    Missing match -> nulls. The third custom temporal operator next to
    the windowed aggregates and the as-of join: Ray Data has no native
    range join, so it composes as union-tag -> key-hash buckets ->
    per-bucket vectorized ``searchsorted`` over each key's
    start-sorted intervals.

    Partitioning assumptions (documented like :func:`asof_join`): one
    key's rows fit a bucket, and a key's intervals are NON-OVERLAPPING
    (e.g. sessions) — with overlaps the interval with the greatest start
    <= ts wins, which is the as-of containment rule."""
    from kg_gen_ray.stages.common import default_buckets, hash_bucket_array

    ikey = interval_key_col or key_col
    # inputs are lazy here, so volume isn't knowable without executing;
    # callers that know their scale pass n_buckets (one bucket should
    # stay under common.TARGET_BUCKET_BYTES of union rows)
    n_buckets = n_buckets or default_buckets()

    iv_schema = intervals.schema()
    ptypes = {c: iv_schema.types[iv_schema.names.index(c)]
              for c in payload_cols}
    left_schema = left.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))
    # an interval with a null bound can't satisfy the containment
    # predicate: dropping it is output-equivalent and keeps nulls out of
    # the per-bucket start-sorted searchsorted. Applied AFTER the schema
    # reads so plain reads still resolve from file metadata. Left rows
    # are NOT dropped — left-join semantics keep a null-ts row with null
    # payload (handled in the bucket kernel). One fused pass over both
    # bound columns (not two chained drops).
    def drop_null_bounds(t: pa.Table) -> pa.Table:
        if t[start_col].null_count or t[end_col].null_count:
            return t.filter(pc.and_(pc.is_valid(t[start_col]),
                                    pc.is_valid(t[end_col])))
        return t
    intervals = intervals.map_batches(drop_null_bounds,
                                      batch_format="pyarrow")

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[key_col],
            "__ts": pc.cast(t[ts_col], pa.timestamp("us")),
            "__end": pa.nulls(t.num_rows, pa.timestamp("us")),
            "__side": pa.array([0] * t.num_rows, pa.int8()),
        }
        for c in t.column_names:
            cols[f"l_{c}"] = t[c]
        for c in payload_cols:
            cols[f"p_{c}"] = pa.nulls(t.num_rows, type=ptypes[c])
        return pa.table(cols)

    def tag_iv(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "__key": t[ikey],
            "__ts": pc.cast(t[start_col], pa.timestamp("us")),
            "__end": pc.cast(t[end_col], pa.timestamp("us")),
            "__side": pa.array([1] * n, pa.int8()),
        }
        for c, typ in ltypes.items():
            cols[f"l_{c}"] = pa.nulls(n, type=typ)
        for c in payload_cols:
            cols[f"p_{c}"] = t[c]
        return pa.table(cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["__key"], n_buckets))

    lt = left.map_batches(tag_left, batch_format="pyarrow") \
             .map_batches(add_bucket, batch_format="pyarrow")
    it = intervals.map_batches(tag_iv, batch_format="pyarrow") \
                  .map_batches(add_bucket, batch_format="pyarrow")

    left_cols = [f"l_{c}" for c in left_schema.names]
    p_cols = [f"p_{c}" for c in payload_cols]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = g[g["__side"] == 0]
        ivs = g[g["__side"] == 1].sort_values(["__key", "__ts"],
                                              kind="stable")
        out = rows[left_cols].copy()
        if not len(ivs) or not len(rows):
            for c in p_cols:
                out[c] = pd.Series(None, index=out.index,
                                   dtype=g[c].dtype)
            return out
        # per key: searchsorted over start times, then containment check
        matched = np.full(len(rows), -1, dtype=np.int64)
        iv_by_key = {k: sub for k, sub in ivs.groupby("__key", sort=False)}
        for k, sub_idx in rows.groupby("__key", sort=False).groups.items():
            sub = iv_by_key.get(k)
            if sub is None:
                continue
            starts = sub["__ts"].to_numpy()
            ends = sub["__end"].to_numpy()
            ts = rows.loc[sub_idx, "__ts"].to_numpy()
            pos = np.searchsorted(starts, ts, side="right") - 1
            ok = (pos >= 0) & (ts <= ends[np.clip(pos, 0, None)])
            rowpos = rows.index.get_indexer(sub_idx)
            matched[rowpos[ok]] = sub.index.to_numpy()[pos[ok]]
        for c in p_cols:
            vals = pd.Series(None, index=out.index, dtype=g[c].dtype)
            hit = matched >= 0
            vals.iloc[hit] = ivs.loc[matched[hit], c].to_numpy()
            out[c] = vals
        return out

    return lt.union(it).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key_col: str, ts_col: str, right_ts_col: str,
              right_value_cols: list, right_key_col: str | None = None,
              right_reduce=None,
              direction: str = "backward",
              directions: tuple | None = None,
              n_buckets: int | None = None) -> "ray.data.Dataset":
    """For each left row, attach the right row with the same key and the
    greatest ``right_ts_col`` <= left ``ts_col`` (``direction="backward"``,
    the default) or the smallest ``right_ts_col`` >= left ``ts_col``
    (``direction="forward"``). Missing match -> nulls. Composition: union
    both sides tagged, group into key-hash buckets, vectorized
    ``pandas.merge_asof(by=key)`` per bucket.

    ``directions`` (optional): compute SEVERAL directions from the one
    shuffle — the sorted per-bucket frames are reused for one
    ``merge_asof`` per direction and the output gains a ``direction``
    column. Each extra direction is one extra vectorized pass inside the
    already-shuffled bucket instead of a whole second all-to-all exchange
    over both inputs.

    ``right_reduce`` (optional): pandas function applied to each bucket's
    reference rows (columns ``__key, __ts, r_*``) before the as-of match —
    e.g. a per-(key, ts) max to disambiguate duplicate timestamps. Doing
    this inside the bucket avoids a whole Ray pre-aggregation pass over the
    right side (and the extra execution its ``schema()`` would trigger);
    keep ``right`` a plain read so its schema comes from file metadata."""
    tag_direction = directions is not None
    dirs = tuple(directions) if tag_direction else (direction,)
    for d in dirs:
        if d not in ("backward", "forward"):
            raise ValueError("direction must be 'backward' or 'forward'")
    # the union below needs one schema: type the left side's (all-null)
    # right-payload columns from the right schema, and vice versa for the
    # right side's left-payload columns
    right_schema = right.schema()
    rtypes = {c: right_schema.types[right_schema.names.index(c)]
              for c in right_value_cols}
    left_schema = left.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))
    # null handling is INTERNAL here (left-join semantics: a null-ts /
    # null-key left row is kept with null payload; null right rows match
    # nothing) — pinned by test_asof_join_null_keys_and_ts. No entry
    # drop: it would delete left rows a LEFT join must keep, and a
    # right-side drop would change right_reduce's input.

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[key_col],
            "__ts": pc.cast(t[ts_col], pa.timestamp("us")),
            "__side": pa.array([0] * t.num_rows, pa.int8()),
        }
        for c in t.column_names:
            cols[f"l_{c}"] = t[c]
        for c in right_value_cols:
            cols[f"r_{c}"] = pa.nulls(t.num_rows, type=rtypes[c])
        return pa.table(cols)

    rkey = right_key_col or key_col

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "__key": t[rkey],
            "__ts": pc.cast(t[right_ts_col], pa.timestamp("us")),
            "__side": pa.array([1] * n, pa.int8()),
        }
        for c, typ in ltypes.items():
            cols[f"l_{c}"] = pa.nulls(n, type=typ)
        for c in right_value_cols:
            cols[f"r_{c}"] = t[c]
        return pa.table(cols)

    # bucket keys instead of grouping per key: thousands of tiny per-key
    # pandas groups pay Python overhead per group; ~2x-cores buckets keep
    # the shuffle narrow and the per-bucket work one vectorized
    # pandas.merge_asof(by=key) call. Inputs are lazy, so volume isn't
    # knowable here; callers that know their scale pass n_buckets (one
    # bucket should stay under common.TARGET_BUCKET_BYTES of union rows)
    from kg_gen_ray.stages.common import default_buckets, hash_bucket_array
    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["__key"], n_buckets))

    lt = left.map_batches(tag_left, batch_format="pyarrow") \
             .map_batches(add_bucket, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow") \
              .map_batches(add_bucket, batch_format="pyarrow")

    left_cols = [f"l_{c}" for c in left_schema.names]
    r_cols = [f"r_{c}" for c in right_value_cols]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        all_rows = g[g["__side"] == 0].sort_values("__ts", kind="stable")
        # a null left ts/key can match nothing -> null payload (the
        # operator's documented missing-match semantics); feeding it to
        # pandas.merge_asof instead raises 'Merge keys contain null
        # values'. Null right rows likewise match nothing: drop them.
        unmatchable = all_rows["__ts"].isna() | all_rows["__key"].isna()
        rows = all_rows[~unmatchable]
        refs = g[(g["__side"] == 1) & g["__ts"].notna()
                 & g["__key"].notna()]
        if right_reduce is not None and len(refs):
            refs = right_reduce(refs[["__key", "__ts", *r_cols]])
        refs = refs.sort_values("__ts", kind="stable")

        def null_payload(sub: pd.DataFrame) -> pd.DataFrame:
            out = sub[left_cols].copy()
            for c in r_cols:
                # typed placeholders: plain None would make an
                # object-dtype (null-typed Arrow) column whose schema
                # can't unify with float-typed blocks from buckets
                # that DID have refs
                out[c] = pd.Series(None, index=out.index,
                                   dtype=g[c].dtype)
            return out

        def one_direction(d: str) -> pd.DataFrame:
            # empty `rows` (right-only bucket) keeps dtypes via the same
            # path
            if not len(refs):
                out = null_payload(rows)
            else:
                merged = pd.merge_asof(
                    rows[["__key", "__ts", *left_cols]],
                    refs[["__key", "__ts", *r_cols]],
                    on="__ts", by="__key", direction=d)
                out = merged[[*left_cols, *r_cols]]
            if unmatchable.any():
                out = pd.concat([out, null_payload(all_rows[unmatchable])],
                                ignore_index=True)
            if tag_direction:
                out = out.copy()
                out["direction"] = d
            return out

        outs = [one_direction(d) for d in dirs]
        return outs[0] if len(outs) == 1 else pd.concat(
            outs, ignore_index=True)

    return lt.union(rt).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")
