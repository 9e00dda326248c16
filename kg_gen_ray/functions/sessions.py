"""Event sessionization — gap-based session assignment (a standard
training-data/event-pipeline operator the reference lacks; composed per the
custom-operator strategy as bucketed groupby + vectorized per-bucket
pandas, like :func:`kg_gen_ray.functions.windows.asof_join`).

A session = maximal run of a user's events where consecutive gaps are
<= ``gap_sec``. Deterministic ordering inside a user: (ts, event_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level (pickle-by-value compatibility): worker-side UDF bodies
# must not lazily import kg_gen_ray
from kg_gen_ray.stages.common import md5_hex_memo as _md5_hex_memo


def sessionize(events: "ray.data.Dataset", gap_sec: int,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               n_buckets: int | None = None) -> "ray.data.Dataset":
    """(user_id, session_id, session_start, session_end, n_events).

    ``session_id`` is the user's 0-based session ordinal. Partitioning
    assumption: one user's events fit in one hash bucket (per-user event
    counts are bounded in practice; a timestamp-range repartition would
    replace this for pathological users)."""
    from kg_gen_ray.functions.windows import _drop_null_ts
    from kg_gen_ray.stages.common import (default_buckets, drop_null_rows,
                                          hash_bucket_array)
    events = _drop_null_ts(events, ts_col)  # unknown time -> no session
    # unknown user -> no session either (the SQL mirror's inner join on
    # user_id can never match NULL); dropping here also keeps the int64
    # uid column null-free through the numpy session fold
    events = drop_null_rows(events, user_col)
    gap_us = gap_sec * 1_000_000
    # lazy input: callers that know their scale pass n_buckets (one
    # bucket should stay under common.TARGET_BUCKET_BYTES of event rows)
    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t[user_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "__bucket": hash_bucket_array(t[user_col], n_buckets),
            "uid": pa.array(uid, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "eid": pc.cast(t[id_col], pa.int64()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["uid", "ts_us", "eid"], kind="stable")
        uid = g["uid"].to_numpy()
        ts = g["ts_us"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.zeros(len(g), dtype=bool)
        gap_break[1:] = ts[1:] - ts[:-1] > gap_us
        new_session = new_user | gap_break
        # global session index, then rebase per user to a 0-based ordinal
        sess = np.cumsum(new_session) - 1
        first_sess_of_user = np.where(new_user, sess, 0)
        np.maximum.accumulate(first_sess_of_user, out=first_sess_of_user)
        sid = sess - first_sess_of_user
        out = pd.DataFrame({"user_id": uid, "session_id": sid, "ts_us": ts})
        agg = out.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"))
        return agg

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "session_id": pc.cast(t["session_id"], pa.int64()),
            "session_start": pc.cast(t["session_start_us"],
                                     pa.timestamp("us")),
            "session_end": pc.cast(t["session_end_us"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
        })

    return (events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket,
                                            batch_format="pandas")
            .map_batches(finish, batch_format="pyarrow"))


def hash_sample(ds: "ray.data.Dataset", keep_mod: int, mod: int = 10,
                text_col: str = "text") -> "ray.data.Dataset":
    """Deterministic content-hash sampling: keep rows where the first
    md5 hex digit of ``text_col`` mod ``mod`` < ``keep_mod`` (SQL-mirrored
    by DuckDB md5). Reproducible across engines and runs — the property a
    training-data sampler needs (`random_shuffle`-based sampling is not
    replayable). NULL text is excluded: md5(NULL) is NULL and a NULL
    predicate fails the SQL WHERE — same as the mirror."""
    def keep(t: pa.Table) -> pa.Table:
        hexes = _md5_hex_memo(t[text_col]).to_pylist()
        mask = pa.array([
            h is not None and int(h[0], 16) % mod < keep_mod
            for h in hexes])
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_sample(ds: "ray.data.Dataset", group_col: str,
               rates: dict, seed: str = "mix",
               text_col: str = "text") -> "ray.data.Dataset":
    """Deterministic data-MIXTURE sampling — the per-source reweighting
    step of a training-data pipeline (the Pile / LLaMA "mixture weights"
    pass): keep a row of group ``g`` iff the first 8 md5 hex chars of
    ``seed || ':' || text``, read as a u32, fall below
    ``floor(rates[g] * 2**32)``. Group-level keep probability equals the
    requested rate, the decision is a pure per-row function (replayable
    across engines, runs, and retries — unlike ``random_shuffle``
    sampling), and changing ``seed`` redraws the sample.

    Groups absent from ``rates`` (and NULL groups) are DROPPED — a source
    not in the mix contributes nothing. NULL text is dropped like
    :func:`hash_sample` (md5(NULL) is NULL; the SQL mirror's WHERE fails).

    Scale shape: a pure streaming ``map_batches`` filter — zero shuffle,
    zero driver materialization. ``rates`` is per-SOURCE (languages,
    domains, crawl snapshots), i.e. bounded small, so it rides the
    closure; if a mix ever keyed on an unbounded column, switch to the
    broadcast/join dual pattern of ``lm_score``. md5 is the oracle
    family, memoized per distinct text (``_md5_hex_memo``); a polars-u64
    fast family (see ``fast_text.minhash_signatures_fast``) is the
    drop-in when sampling dominates a profile."""
    # quantize driver-side so engine and mirror compare the SAME integer
    thresholds = {str(g): int(r * 4294967296) for g, r in rates.items()}

    def keep(t: pa.Table) -> pa.Table:
        hexes = _md5_hex_memo(t[text_col], prefix=seed + ":").to_pylist()
        groups = pc.cast(t[group_col], pa.string()).to_pylist()
        mask = []
        for h, g in zip(hexes, groups):
            thr = thresholds.get(g, 0) if g is not None else 0
            mask.append(h is not None and thr > 0 and int(h[:8], 16) < thr)
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def _arrow_group_key(col) -> pa.Array:
    """Null-free string surrogate of a group-key column, computed on the
    ARROW values: Ray's ``map_groups`` sort-partitioning cannot order null
    keys across blocks, so exchanges group on ``"v:" + cast(key, string)``
    with null mapped to the disjoint sentinel ``"n"`` — the null group
    survives, matching SQL PARTITION BY.

    Arrow-side on purpose: a pandas-side ``str()`` rendering is
    dtype-UNSTABLE for integer keys — an int64 batch containing a null is
    promoted to float64 by the Arrow->pandas conversion, so key 10 renders
    ``'v:10.0'`` there but ``'v:10'`` in null-free batches, splitting one
    group across two surrogates. ``pc.cast`` renders a value identically
    regardless of what else the batch contains. The prefixes are disjoint
    (``'v:'`` vs ``'n'``) so no genuine key (e.g. the literal string
    ``'\\x00'``) can collide with the null sentinel."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    tagged = pc.binary_join_element_wise(
        pa.scalar("v:", pa.string()), s, pa.scalar("", pa.string()))
    return pc.coalesce(tagged, pa.scalar("n", pa.string()))


def grouped_quantiles(ds: "ray.data.Dataset", group_col: str,
                      value_col: str, qs: tuple = (0.5, 0.9, 0.99)
                      ) -> "ray.data.Dataset":
    """Exact discrete per-group quantiles (DuckDB ``quantile_disc``
    semantics: the value at ceil(q*n)-1 of the sorted group). Per-group
    numpy sort inside ``map_groups`` — groups are assumed to fit a worker
    (for corpus-wide quantiles at extreme cardinality, switch to a
    t-digest/Greenwald-Khanna sketch combiner)."""

    def per_group(t: pa.Table) -> pa.Table:
        # arrow in, arrow out: a pandas round-trip would promote an
        # int64-with-null group column to float64 and emit mixed-dtype
        # blocks (the null group float, the rest int)
        vals = np.sort(t[value_col].to_numpy(zero_copy_only=False))
        n = len(vals)
        cols = {group_col: t[group_col].slice(0, 1)}
        for q in qs:
            idx = max(0, int(np.ceil(q * n)) - 1)
            cols[f"p{int(q * 100)}"] = pa.array([vals[idx]])
        return pa.table(cols)

    return ds.map_batches(lambda t: t.append_column(
                              "__gk", _arrow_group_key(t[group_col])),
                          batch_format="pyarrow") \
             .groupby("__gk").map_groups(per_group, batch_format="pyarrow")


def grouped_quantiles_sketch(ds: "ray.data.Dataset", group_col: str,
                             value_col: str, qs: tuple = (0.5, 0.9, 0.99),
                             points_per_batch: int = 256
                             ) -> "ray.data.Dataset":
    """Approximate per-group quantiles via a mergeable weighted-summary
    sketch — the 100 TB path for :func:`grouped_quantiles` (whose exact
    per-group sort assumes a group fits one worker).

    Combiner (``map_batches``): each batch compresses every group's values
    to at most ``points_per_batch`` evenly-spaced order statistics, each
    carrying ``n/k`` weight — O(groups x k) rows leave each batch
    regardless of batch size. Reduce (one small groupby): merge the
    weighted points by sorting and read quantiles off the cumulative
    weight. Rank error is bounded by ~1/k per merge level (here: one
    level), so with the default k=256 a quantile lands within ~0.4% of its
    true rank. Output schema matches the exact operator (p50/p90/...).
    """

    def compress(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], t.schema.field(group_col).type),
                "__gk": pa.array([], pa.string()),
                "__v": pa.array([], pa.float64()),
                "__w": pa.array([], pa.float64()),
            })
        # group on the Arrow-side surrogate (stable rendering; see
        # _arrow_group_key) and carry group VALUES by row index back into
        # the original Arrow column — a pandas round-trip of an int64
        # key column with nulls would promote to float64 and emit a
        # wrongly-typed (and wrongly-rendered) group column
        gk = _arrow_group_key(t[group_col])
        df = pd.DataFrame({
            "__i": np.arange(t.num_rows, dtype=np.int64),
            "__gk": gk.to_pandas(),
            "v": pc.cast(t[value_col], pa.float64()).to_pandas(),
        })
        out_i, out_k, out_v, out_w = [], [], [], []
        for skey, sub in df.groupby("__gk", sort=False):
            vals = np.sort(sub["v"].to_numpy())
            n = len(vals)
            k = min(points_per_batch, n)
            idx = np.minimum((np.floor((np.arange(k) + 0.5) * n / k))
                             .astype(np.int64), n - 1)
            out_i.extend([int(sub["__i"].iloc[0])] * k)
            out_k.extend([skey] * k)
            out_v.extend(vals[idx].tolist())
            out_w.extend([n / k] * k)
        gvals = t[group_col].take(pa.array(out_i, pa.int64()))
        if isinstance(gvals, pa.ChunkedArray):
            gvals = gvals.combine_chunks()
        return pa.table({
            group_col: gvals,
            "__gk": pa.array(out_k, pa.string()),
            "__v": pa.array(out_v, pa.float64()),
            "__w": pa.array(out_w, pa.float64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        # arrow in, arrow out (dtype-exact group column; see per_group in
        # grouped_quantiles)
        vs = t["__v"].to_numpy(zero_copy_only=False)
        ws = t["__w"].to_numpy(zero_copy_only=False)
        order = np.argsort(vs, kind="stable")
        v = vs[order]
        cum = np.cumsum(ws[order])
        total = cum[-1]
        cols = {group_col: t[group_col].slice(0, 1)}
        for q in qs:
            i = int(np.searchsorted(cum, q * total, side="left"))
            cols[f"p{int(q * 100)}"] = pa.array([v[min(i, len(v) - 1)]],
                                                pa.float64())
        return pa.table(cols)

    return (ds.map_batches(compress, batch_format="pyarrow")
            .groupby("__gk").map_groups(merge, batch_format="pyarrow"))


def _grouped_head(ds: "ray.data.Dataset", group_col: str, by: list,
                  ascending: list, k: int) -> "ray.data.Dataset":
    """Exact per-group top-k with a PER-BLOCK COMBINER: each block first
    keeps only its own k best rows per group (top-k is a monoid — the
    global best k of a group always survive every local cut), so the
    groupby exchange moves O(blocks x groups x k) rows instead of the
    whole table. The final per-group head runs on the pruned survivors."""

    # arrow sort keys; Arrow's null_placement default ("at end") matches
    # the pandas na_position='last' semantics this operator documents
    order_keys = [(c, "ascending" if a else "descending")
                  for c, a in zip(by, ascending)]

    def add_gk(t: pa.Table) -> pa.Table:
        # the exchange groups on a null-free string surrogate (``__gk``)
        # because Ray's map_groups sort-partitioning cannot order null
        # keys across blocks; computed Arrow-side so the rendering of a
        # key never depends on whether THIS batch happens to contain a
        # null (see _arrow_group_key). A null key keeps its own group —
        # SQL PARTITION BY semantics — via the disjoint 'n' sentinel.
        return t.append_column("__gk", _arrow_group_key(t[group_col]))

    def prune(t: pa.Table) -> pa.Table:
        # fully Arrow (no pandas round-trip): a pandas conversion would
        # promote int64-with-null columns to float64 and the combiner
        # would emit mixed-dtype blocks. Sort by (__gk, order cols), then
        # keep each group run's first k rows with one vectorized
        # run-position mask.
        if t.num_rows == 0:
            return t
        t = t.take(pc.sort_indices(
            t, sort_keys=[("__gk", "ascending")] + order_keys))
        gk = t["__gk"].to_numpy(zero_copy_only=False)
        n = len(gk)
        starts = np.ones(n, dtype=bool)
        starts[1:] = gk[1:] != gk[:-1]
        start_idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(start_idx, n))
        pos = np.arange(n) - np.repeat(start_idx, run_len)
        return t.filter(pa.array(pos < k))

    def final(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=order_keys))
        return t.slice(0, min(k, t.num_rows)).drop_columns(["__gk"])

    return ds.map_batches(add_gk, batch_format="pyarrow") \
             .map_batches(prune, batch_format="pyarrow") \
             .groupby("__gk").map_groups(final, batch_format="pyarrow")


def grouped_topk(ds: "ray.data.Dataset", group_col: str, order_col: str,
                 k: int, tiebreak_col: str) -> "ray.data.Dataset":
    """Top-k rows per group by (order_col desc, tiebreak asc) — the
    window-function ROW_NUMBER pattern, combiner-pruned before the
    shuffle (see :func:`_grouped_head`)."""
    return _grouped_head(ds, group_col, [order_col, tiebreak_col],
                         [False, True], k)


def stratified_sample(ds: "ray.data.Dataset", group_col: str, cap: int,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> "ray.data.Dataset":
    """Deterministic stratified downsampling: at most ``cap`` rows per
    group, chosen as the rows with the SMALLEST md5(text) hex digest
    (ties by id). The per-domain/per-language document cap every
    training-data pipeline needs, made replayable across engines and
    runs — DuckDB mirrors it exactly with ``ROW_NUMBER() OVER (PARTITION
    BY g ORDER BY md5(text), id)`` (unlike ``random_shuffle``-based
    sampling, which is not). Same combiner-pruned exchange as
    :func:`grouped_topk`."""

    def with_hash(t: pa.Table) -> pa.Table:
        # md5(NULL) is NULL (the DuckDB mirror's semantics; the memo
        # propagates it); pandas na_position='last' then ranks null-text
        # rows after every hashed row, like ORDER BY md5(text) NULLS LAST
        return t.append_column("__h", _md5_hex_memo(t[text_col]))

    ranked = ds.map_batches(with_hash, batch_format="pyarrow")
    out = _grouped_head(ranked, group_col, ["__h", id_col],
                        [True, True], cap)
    return out.map_batches(lambda t: t.drop_columns(["__h"]),
                           batch_format="pyarrow")


def greedy_pack(ns, max_tokens: int) -> "np.ndarray":
    """The greedy packing fold itself (0-based sequence id per doc, in
    the given order): a doc joins the running sequence while
    run + n <= max_tokens, else opens the next; an oversize doc gets a
    sequence of its own. Module-level so the property tests pin the
    PRODUCT fold, not a reimplementation."""
    seq = np.empty(len(ns), dtype=np.int64)
    s, run = 0, 0
    for i, n in enumerate(ns):
        if run and run + n > max_tokens:
            s, run = s + 1, 0
        run += int(n)
        seq[i] = s
    return seq


def pack_sequences(ds: "ray.data.Dataset", max_tokens: int,
                   group_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text", token_col: str | None = None
                   ) -> "ray.data.Dataset":
    """Greedy sequence packing — the LLM-training sample-prep operator:
    within each group (shard/language), documents in ``id_col`` order are
    packed whole into sequences; a document joins the current sequence
    while ``run + n_tokens <= max_tokens``, else starts the next one (an
    oversize document gets a sequence of its own). Same packing fold as
    the reference chunker (``/root/reference/src/kg_gen/utils/
    chunk_text.py:38-57``), lifted from sentences-in-a-page to
    documents-in-a-shard, and DuckDB-replayable as a recursive CTE
    (see tests/test_sessions.py) because the fold is deterministic.

    Output: ``(group_col, id_col, seq_id, n_tokens)`` with ``seq_id``
    0-based per group. Token counts are whitespace tokens computed
    vectorized (pass ``token_col`` to use a precomputed count instead).
    Scale shape: the token-count map streams; the fold itself is
    sequential PER GROUP (inherent to greedy packing), so groups are the
    parallelism unit and one group's (id, n_tokens) pairs must fit a
    worker — at web scale, group by SHARD, not by a global key (same
    documented assumption as :func:`grouped_quantiles`)."""

    if token_col is None:
        def with_tokens(t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
            # null text -> 0 tokens (engine convention); an unfilled NULL
            # count would become pandas NaN and crash greedy_pack's int()
            n = pc.cast(pc.fill_null(pc.list_value_length(toks), 0),
                        pa.int64())
            return pa.table({
                group_col: t[group_col], id_col: t[id_col],
                "n_tokens": n})
        counted = ds.map_batches(with_tokens, batch_format="pyarrow")
    else:
        def rename(t: pa.Table) -> pa.Table:
            return pa.table({
                group_col: t[group_col], id_col: t[id_col],
                "n_tokens": pc.fill_null(           # null count -> 0 tokens
                    pc.cast(t[token_col], pa.int64()), 0)})
        counted = ds.map_batches(rename, batch_format="pyarrow")

    def add_gk(t: pa.Table) -> pa.Table:
        # group on the null-free surrogate (Ray's sort shuffle cannot
        # order null keys); the original group VALUE rides along and is
        # what the output carries — a null group packs like any other
        return t.append_column("__gk", _arrow_group_key(t[group_col]))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        out = g.copy()
        out["seq_id"] = greedy_pack(g["n_tokens"].to_numpy(), max_tokens)
        return out[[group_col, id_col, "seq_id", "n_tokens"]]

    return counted.map_batches(add_gk, batch_format="pyarrow") \
                  .groupby("__gk").map_groups(per_group,
                                              batch_format="pandas")


def seeded_shuffle(ds: "ray.data.Dataset", n_shards: int,
                   seed: str = "epoch0", id_col: str = "doc_id"
                   ) -> "ray.data.Dataset":
    """Deterministic sharded shuffle — the epoch-shuffle write of a
    training-data pipeline: every row gets ``(shard, pos)`` where
    ``shard`` is the first 8 md5 hex chars of ``seed || ':' || id`` read
    as a u32 mod ``n_shards``, and ``pos`` is the row's 0-based rank
    within its shard ordered by (md5 hex digest, id). The permutation is
    a pure function of (seed, id): the SAME seed replays bit-identically
    across engines, runs and retries (resumable epochs — a crashed epoch
    write restarts from the finished shards), and a NEW seed draws a
    fresh epoch order, which ``random_shuffle`` can give you only by
    materializing and persisting the permutation. DuckDB mirrors it as
    ``row_number() OVER (PARTITION BY shard ORDER BY md5(...), id)``.

    Output: ``(id_col, shard, pos)`` — a shuffle MANIFEST, not the moved
    payload. Scale shape: the hash map streams; the exchange groups only
    the slim (id, 16-byte key) projection, never document text, so the
    all-to-all moves O(rows x 24B). One shard must fit a worker: at web
    scale pick ``n_shards = total_bytes / target_file_bytes`` (~1M
    shards of 100 MB for 100 TB) so each group IS one output file's
    row order, and the sink joins payload to manifest shard-by-shard.
    NULL ids are dropped (md5(NULL) is NULL; a NULL row has no
    replayable position). The md5 loop is the oracle family; swap in the
    polars-u64 family (``fast_text.minhash_signatures_fast``'s pattern)
    when shuffling dominates a profile."""
    import hashlib

    def key_shard(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        slim = pa.table({id_col: ids}).filter(pc.is_valid(ids))
        hs = [hashlib.md5((seed + ":" + str(i)).encode("utf-8")).hexdigest()
              for i in slim[id_col].to_pylist()]
        shard = pa.array([int(h[:8], 16) % n_shards for h in hs],
                         pa.int64())
        return slim.append_column("shard", shard) \
                   .append_column("__k", pa.array(hs, pa.string()))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__k", id_col], kind="stable")
        out = g[[id_col, "shard"]].copy()
        out["pos"] = np.arange(len(g), dtype=np.int64)
        return out

    keyed = ds.map_batches(key_shard, batch_format="pyarrow")
    return keyed.groupby("shard").map_groups(rank, batch_format="pandas")
