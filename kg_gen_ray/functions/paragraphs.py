"""Paragraph-level exact dedup — the CCNet pass.

Web crawls repeat BOILERPLATE, not just whole pages: navigation blocks,
cookie banners, license footers appear verbatim across millions of
otherwise-distinct documents. CCNet (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020)
deduplicates at PARAGRAPH granularity for exactly this reason; document-
level dedup (exact or near) cannot remove a footer shared by distinct
pages. The reference engine has no equivalent (its dedup is label-level,
SURVEY.md §2.7) — this is one of the training-data operators the brief
adds beyond it.

Semantics (deterministic, DuckDB-replayable): split ``text`` on
``"\\n\\n"``; across the whole corpus, for every distinct paragraph keep
only its first occurrence (min ``(doc_id, paragraph_index)``); reassemble
each document from its surviving paragraphs in original order; documents
with no surviving paragraph are dropped. PRECONDITION: ``doc_id`` is
unique per document — a duplicated id makes "first occurrence" ill-posed
(two occurrences share an enc key, so membership predicates that are
equivalent on legal input — ``enc ∈ winners`` vs ``enc ∉ losers`` —
give different answers). The mining pass raises on every duplicate it
can see cheaply (same paragraph under the same enc, in-batch or in the
exchange) rather than diverging silently. The SQL mirror is
string_split + ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY
doc_id, i) + string_agg (see ``__ray_entry__.oracle_sql['paragraph_dedup']``).

Distributed shape (two passes over the corpus, one narrow exchange):

1. **Loser mining** — explode to (fp, enc) where ``enc`` packs
   (doc_id, para_idx) into one int64 and ``fp`` is md5(paragraph); a
   per-batch combiner keeps only each fp's in-batch minimum (in-batch
   duplicate occurrences are emitted as losers directly, never shuffled),
   and one hash-bucketed groupby picks the global winner per fp. The
   exchange carries one row per (batch, distinct paragraph) — never the
   paragraph text.
2. **Rebuild** — a streaming ``map_batches`` re-splits each document,
   drops its losing paragraphs, and joins the survivors back with
   ``"\\n\\n"`` entirely inside the batch (vectorized: Arrow ListArray
   offsets + ``binary_join``). Duals for the loser membership: the loser
   enc-set broadcasts via ``ray.put`` as a sorted numpy array
   (``searchsorted`` membership) while it fits ``broadcast_limit``; above
   it, the rebuild switches to an exploded left_anti join + bucketed
   regroup — exact at any loser volume, at the price of shuffling the
   paragraph text once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level (pickle-by-value compatibility)
from kg_gen_ray.stages.common import dual_limit  # noqa: E402

# enc = doc_id * 2^20 + para_idx: loud bounds, no silent wraparound
_IDX_BITS = 20
_MAX_IDX = (1 << _IDX_BITS) - 1
_MAX_DOC = (1 << (62 - _IDX_BITS)) - 1
_SEP = "\n\n"


def _explode(t: pa.Table, text_col: str, id_col: str):
    """Batch -> (doc_ids, para_idx, paras, enc, list_lengths) numpy/Arrow
    views, fully vectorized. Null texts contribute no paragraphs (the SQL
    mirror's lateral range over a NULL list emits no rows)."""
    ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    if len(ids) and (ids.max() > _MAX_DOC or ids.min() < 0):
        raise ValueError(f"doc ids must be in [0, {_MAX_DOC}] to pack "
                         "(doc_id, para_idx) into one int64 key")
    lists = pc.split_pattern(pc.cast(t[text_col], pa.string()), _SEP)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)  # null text -> 0
    if len(lens) and lens.max() > _MAX_IDX + 1:
        raise ValueError(f"document with more than {_MAX_IDX + 1} "
                         "paragraphs cannot be packed; raise _IDX_BITS")
    paras = lists.flatten()
    doc_rep = np.repeat(ids, lens)
    # per-list 0-based positions: global arange minus each list's offset
    offsets = np.concatenate([[0], np.cumsum(lens)])[:-1]
    idx = np.arange(int(lens.sum()), dtype=np.int64) \
        - np.repeat(offsets, lens)
    enc = doc_rep * (_MAX_IDX + 1) + idx
    return ids, lens, paras, doc_rep, idx, enc


# per-worker md5 memo: boilerplate paragraphs repeat ACROSS batches (a
# crawl's footer appears once per page), so each worker process hashes a
# distinct paragraph once for its lifetime. Bounded by TOTAL cached key
# bytes (not entry count: 2^18 entries x 4 KB keys would pin ~1 GiB of
# paragraph strings per worker) so a corpus-sized tail of unique
# paragraphs cannot grow worker heap — boilerplate shows up early and
# often, so it wins the budget.
_MD5_CACHE: dict = {}
_MD5_CACHE_MAX_BYTES = 48 * 1024 * 1024
_MD5_CACHE_MAX_LEN = 4096
_md5_cache_bytes = 0


def _md5_arr(paras: pa.Array) -> np.ndarray:
    """md5 hex per paragraph occurrence, hashed once per DISTINCT value:
    dictionary-encode the batch (boilerplate repeats in-batch), then
    consult the per-worker memo (it repeats across batches too) — the
    same memoization the fast MinHash family applies to token hashes
    (``fast_text.py``). md5 is the oracle-parity family (mirrors DuckDB
    ``md5()``), same choice as ``text_analysis.fingerprint``."""
    if isinstance(paras, pa.ChunkedArray):
        paras = paras.combine_chunks()
    global _md5_cache_bytes
    d = paras.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    out_u = np.empty(len(uniq), dtype=object)
    cache = _MD5_CACHE
    for i, s in enumerate(uniq):
        h = cache.get(s)
        if h is None:
            b = s.encode("utf-8")
            h = hashlib.md5(b).hexdigest()
            if (len(s) <= _MD5_CACHE_MAX_LEN
                    and _md5_cache_bytes < _MD5_CACHE_MAX_BYTES):
                cache[s] = h
                # charge UTF-8 bytes, not code points: a CJK paragraph
                # costs ~3x its len() on the heap
                _md5_cache_bytes += len(b) + 48  # str + digest overhead
        out_u[i] = h
    if not len(out_u):
        return np.array([], dtype=object)
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return out_u[idx]


def _mark_occurrences(docs: "ray.data.Dataset", text_col: str,
                      id_col: str, shuffle_partitions=None):
    """Shared mining pass: returns ``(local_losers, global_marked)``
    where ``local_losers`` is (enc,) for occurrences that lose INSIDE
    their own batch (they never enter the exchange) and ``global_marked``
    is (enc, is_win) over the per-batch minima after the global per-fp
    min — exactly one ``is_win`` row per distinct paragraph. Two-level
    min, same shape as ``web.url_dedup_losers``."""
    from kg_gen_ray.stages.common import (coalesce, default_buckets,
                                          hash_bucket_array)

    def local(t: pa.Table) -> pa.Table:
        _ids, _lens, paras, _doc, _idx, enc = _explode(t, text_col, id_col)
        fps = _md5_arr(paras)
        order = np.lexsort((enc, fps))
        first = np.ones(len(order), dtype=bool)
        sf = fps[order]
        first[1:] = sf[1:] != sf[:-1]
        se = enc[order]
        if len(se) and bool((~first[1:] & (se[1:] == se[:-1])).any()):
            raise ValueError(
                "duplicate doc_id: the same paragraph occurs twice under "
                "one (doc_id, paragraph_index) key; paragraph dedup "
                "requires unique document ids")
        return pa.table({
            "fp": pa.array(np.concatenate([sf[first], sf[~first]]),
                           pa.string()),
            "enc": pa.array(np.concatenate([enc[order][first],
                                            enc[order][~first]]),
                            pa.int64()),
            "is_min": pa.array(np.concatenate(
                [np.ones(int(first.sum()), dtype=bool),
                 np.zeros(int((~first).sum()), dtype=bool)])),
        })

    # materialize before branching: the two filters below are separate
    # lineage consumers, and without the checkpoint the corpus-wide
    # explode + per-paragraph md5 kernel would execute twice. The marked
    # table is fp+enc+flag (~48 B/paragraph — smaller than the text it
    # summarizes) and spills if it must.
    marked = docs.map_batches(local, batch_format="pyarrow").materialize()
    local_losers = marked.filter(expr="is_min == False") \
                         .select_columns(["enc"])
    # slim the exchange: is_min is constant-true after the filter
    minima = coalesce(marked.filter(expr="is_min == True")
                      .select_columns(["fp", "enc"]),
                      shuffle_partitions)

    # bucket-hash the fp key so one Ray group holds many fp-groups (a
    # per-key map_groups would pay ms-scale overhead per distinct
    # paragraph). marked is materialized, so its known size lets the
    # bucket count grow with exchange volume
    n_buckets = default_buckets(marked.size_bytes())

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["fp"], n_buckets))

    def mark_min(t: pa.Table) -> pa.Table:
        # Arrow C++ end to end (fp is a 32-char hex string — a numpy or
        # pandas sort would compare Python objects): sort by (fp, enc),
        # first-of-group is the winner, duplicates are adjacent. Output
        # order within the bucket is free — downstream only filters.
        if t.num_rows == 0:
            return pa.table({"enc": pa.array([], pa.int64()),
                             "is_win": pa.array([], pa.bool_())})
        s = t.sort_by([("fp", "ascending"), ("enc", "ascending")])
        fp = s["fp"].combine_chunks()
        enc = s["enc"].combine_chunks()
        n = len(fp)
        same_fp = pc.equal(fp.slice(1), fp.slice(0, n - 1))
        if n > 1 and pc.any(pc.and_(
                same_fp, pc.equal(enc.slice(1),
                                  enc.slice(0, n - 1)))).as_py():
            raise ValueError(
                "duplicate doc_id: the same paragraph occurs twice under "
                "one (doc_id, paragraph_index) key; paragraph dedup "
                "requires unique document ids")
        is_win = pa.concat_arrays(
            [pa.array([True]), pc.invert(same_fp)]) if n > 1 \
            else pa.array([True])
        return pa.table({"enc": enc, "is_win": is_win})

    global_marked = minima.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(mark_min, batch_format="pyarrow")
    return local_losers, global_marked


def paragraph_losers(docs: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id",
                     shuffle_partitions=None) -> "ray.data.Dataset":
    """(enc,) int64 keys of every paragraph occurrence that LOSES the
    first-occurrence rule — the small side on a healthy corpus (only
    repeated boilerplate pays)."""
    local_losers, global_marked = _mark_occurrences(
        docs, text_col, id_col, shuffle_partitions)
    return local_losers.union(
        global_marked.filter(expr="is_win == False").select_columns(["enc"]))


def paragraph_dedup(docs: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id",
                    broadcast_limit: int = 64 * 1024 * 1024,
                    shuffle_partitions=None) -> "ray.data.Dataset":
    """The input dataset with corpus-wide duplicate paragraphs removed
    from ``text_col`` (first occurrence wins); documents left empty are
    dropped. Text is replaced IN PLACE: every other input column passes
    through (directly on the broadcast duals, via an internal id-join on
    the exploded dual), so the operator composes without a caller-side
    reattach join.

    THREE-way size-selected dual on the membership set the rebuild needs:

    1. losers broadcast (healthy corpus: only repeated boilerplate pays),
    2. winners broadcast (boilerplate-EXTREME corpus: nearly every
       occurrence loses, so the loser set is corpus-sized — but the
       winner set is one enc per DISTINCT paragraph, i.e. vocabulary-
       sized, and ships instead; keep = enc ∈ winners is the same
       predicate as enc ∉ losers),
    3. exploded left_anti join (both sides beyond any broadcast):
       shuffles the paragraph text once, exact at any volume.
    """
    from kg_gen_ray.stages.common import (default_buckets, dual_limit,
                                          hash_bucket_array)

    local_losers, global_marked = _mark_occurrences(
        docs, text_col, id_col, shuffle_partitions)
    global_marked = global_marked.materialize()
    losers = local_losers.union(
        global_marked.filter(expr="is_win == False")
        .select_columns(["enc"])).materialize()

    def rebuild(t: pa.Table, keep_mask_fn) -> pa.Table:
        ids, lens, paras, doc_rep, _idx, enc = _explode(t, text_col, id_col)
        keep = keep_mask_fn(enc)
        # survivors per document -> new list offsets -> vectorized join
        pos = np.repeat(np.arange(len(ids)), lens)[keep]
        counts = np.bincount(pos, minlength=len(ids))
        # loud int32 construction: pa.array raises on overflow where
        # astype would silently wrap past 2^31 entries
        offsets = np.concatenate([[0], np.cumsum(counts)])
        kept = paras.filter(pa.array(keep))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept), _SEP)
        # in-place text replace + row filter: other columns pass through
        nonempty = pa.array(counts > 0)
        return t.set_column(t.schema.get_field_index(text_col), text_col,
                            joined).filter(nonempty)

    def _sorted_encs(ds) -> np.ndarray:
        encs = [b["enc"].to_numpy(zero_copy_only=False)
                for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
        return np.sort(np.concatenate(encs)) if encs \
            else np.array([], dtype=np.int64)

    lim = dual_limit(broadcast_limit)
    if (losers.size_bytes() or 0) <= lim:
        ref = ray.put(_sorted_encs(losers))

        def keep_mask(enc, ref=ref):
            ls = ray.get(ref)
            pos = np.searchsorted(ls, enc)
            pos = np.minimum(pos, max(0, len(ls) - 1))
            return (ls[pos] != enc) if len(ls) else \
                np.ones(len(enc), dtype=bool)

        return docs.map_batches(
            lambda t: rebuild(t, keep_mask), batch_format="pyarrow")

    winners = global_marked.filter(expr="is_win == True") \
                           .select_columns(["enc"]).materialize()
    if (winners.size_bytes() or 0) <= lim:
        ref = ray.put(_sorted_encs(winners))

        def keep_mask_w(enc, ref=ref):
            ws = ray.get(ref)
            if not len(ws) or not len(enc):
                return np.zeros(len(enc), dtype=bool)
            pos = np.searchsorted(ws, enc)
            pos = np.minimum(pos, len(ws) - 1)
            return ws[pos] == enc

        return docs.map_batches(
            lambda t: rebuild(t, keep_mask_w), batch_format="pyarrow")

    # join dual (boilerplate-heavy corpus: the loser set itself is too big
    # to ship): explode WITH text, left_anti join away the losers, regroup
    # by doc in hash buckets, join paragraphs back in order
    import ray as _ray
    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)))

    def explode_rows(t: pa.Table) -> pa.Table:
        _ids, _lens, paras, doc_rep, idx, enc = _explode(t, text_col, id_col)
        return pa.table({
            "enc": pa.array(enc, pa.int64()),
            id_col: pa.array(doc_rep, pa.int64()),
            "__pidx": pa.array(idx, pa.int64()),
            "__para": paras,
        })

    exploded = docs.map_batches(explode_rows, batch_format="pyarrow")
    survivors = exploded.repartition(n_parts).join(
        losers.repartition(n_parts), join_type="left_anti", on=("enc",),
        num_partitions=n_parts)

    n_buckets = default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t[id_col], n_buckets))

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "__pidx"], kind="stable")
        out = g.groupby(id_col, sort=False)["__para"] \
               .agg(lambda ps: _SEP.join(ps)).reset_index()
        out.columns = [id_col, text_col]
        return out

    # stamp schema on post-join blocks before the groupby (empty-block
    # gotcha), then one bucketed exchange rebuilds the documents
    out = survivors.select_columns(["enc", id_col, "__pidx", "__para"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(regroup, batch_format="pandas")
    in_names = list(docs.schema().names)
    id_type = docs.schema().types[in_names.index(id_col)]

    # the regroup rebuilt ids through pandas as int64; cast back to the
    # caller's dtype so the join key matches and the output schema is
    # identical to the broadcast duals' pass-through
    def restore_id(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(id_col)
        return t.set_column(i, id_col, pc.cast(t[id_col], id_type))

    out = out.map_batches(restore_id, batch_format="pyarrow")
    other_cols = [c for c in in_names if c not in (id_col, text_col)]
    if not other_cols:
        return out.select_columns(in_names)
    # the regroup rebuilt docs from exploded paragraph rows, so the other
    # columns rejoin by id here (the broadcast duals never pay this join)
    rest = docs.map_batches(
        lambda t, keep=[id_col] + other_cols: t.select(list(keep)),
        batch_format="pyarrow")
    return out.select_columns([id_col, text_col]).repartition(n_parts) \
        .join(rest.repartition(n_parts), join_type="inner", on=(id_col,),
              num_partitions=n_parts) \
        .select_columns(in_names)
