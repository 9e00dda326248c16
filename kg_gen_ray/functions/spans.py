"""Cross-document duplicated-SPAN removal (exact-substring dedup).

Token-k-gram variant of Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better" (arXiv:2107.06499): any k-token span whose
hash occurs >= 2 times CORPUS-WIDE keeps only its first occurrence
(minimum ``(doc_id, pos)``); the k tokens under every other occurrence
are removed and documents are rebuilt from the surviving tokens. This is
the family that paragraph/near-dup dedup cannot reach — boilerplate
sentences embedded mid-document, licence blocks, quoted chains — and the
reference pipeline has no counterpart (it is part of the training-data
operator families this engine adds; see COVERAGE.md).

Deliberate divergences from the paper, documented for honesty:

* spans are whitespace TOKEN k-grams, not byte suffixes — the paper's
  suffix array finds arbitrary-length byte repeats; the k-gram grid is
  the standard approximation when the corpus will not fit one machine's
  suffix array (their own Appendix discusses the sharded equivalent);
* removal is per duplicated k-gram occurrence: overlapping duplicated
  k-grams within one doc merge into one covered span (a diff-array
  union, overlaps counted once), and a surviving "winner" occurrence can
  still lose tokens to a DIFFERENT overlapping duplicated k-gram — the
  same greedy behavior as removing every duplicated range independently;
* duplicate detection is on the 64-bit rolling hash (md5-u32 token
  hashes folded with a Horner polynomial — the exact family the fast
  MinHash oracle replays in DuckDB), so a 2^-64-scale collision merges
  two spans; both engine and oracle share the hash, so results agree
  bit-for-bit regardless.

Distributed shape (the 100 TB story):

* mining is the paragraph-dedup two-level min: in-batch losers (a
  k-gram repeated INSIDE one batch is globally duplicated, so its
  non-minimum occurrences drop locally) never enter the exchange; only
  per-batch minima — one 16-byte (hash, enc) row per distinct k-gram per
  batch — shuffle into a bucket-hashed groupby where pandas' C groupby
  marks the global minimum per hash. The exchange never carries text.
* the rebuild streams the corpus once, with a THREE-way size-selected
  dual on the membership set it needs: the loser enc set broadcasts as
  ONE sorted int64 array (healthy corpus — two searchsorted calls per
  batch); on a boilerplate-extreme corpus the loser set is
  occurrence-sized but the winner map is one (sh, enc) per DISTINCT
  duplicated k-gram — vocabulary-sized — so it broadcasts instead and
  each batch re-derives loser status locally (measured 3.2x over the
  join dual at 400k templated pages); with both beyond any broadcast,
  losers pack into per-doc binary position blobs LEFT-OUTER-joined onto
  the corpus, an O(duplicated occurrences) exchange, never O(corpus
  text).
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
from kg_gen_ray.stages.common import (coalesce, default_buckets, dual_limit,
                                      hash_bucket_array)

SPAN_K = 8                              # matches decontaminate's k-gram k
_SC = np.uint64(0x100000001B3)          # Horner multiplier (FNV-ish, odd)
_POS_BITS = 21                          # up to 2M tokens per document
_MAX_POS = (1 << _POS_BITS) - 1


def span_hash_coeffs(k: int) -> list:
    """C^(k-1), .., C^0 mod 2^64 — the closed form of the Horner fold,
    for oracle replay (term j of the k-gram multiplies coeff[j])."""
    return [pow(int(_SC), k - 1 - j, 1 << 64) for j in range(k)]


def _doc_tokens(t: pa.Table, text_col: str, id_col: str):
    """(ids, flat tokens, lengths, row offsets) with the enc-packing
    bounds checked loudly."""
    ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    # null text -> null length -> NaN; treat as 0 tokens (the
    # paragraphs/_explode convention) instead of letting astype wrap NaN
    # to -2^63 and crash np.repeat with a nameless error
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    if len(lengths):
        if int(lengths.max()) > _MAX_POS + 1:
            raise ValueError(
                f"document with more than {_MAX_POS + 1} tokens cannot "
                "be packed; raise _POS_BITS")
        if len(ids) and int(ids.max()) >= 1 << (62 - _POS_BITS):
            raise ValueError("doc_id too large for (doc_id, pos) packing")
        if len(ids) and int(ids.min()) < 0:
            raise ValueError("negative doc_id cannot be packed")
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    return ids, toks.flatten(), lengths, offsets


def _explode_from_parts(ids, flat, lengths, offsets, n_rows: int, k: int):
    """(sh, enc, srow, pos) per k-gram occurrence from pre-tokenized
    parts: int64 bit-view of the u64 rolling hash, the packed
    (doc_id << POS_BITS) + pos occurrence key, the batch row index and
    the within-doc position."""
    e = np.zeros(0, dtype=np.int64)
    empty = (e, e, e, e)
    th = _md5_u32_hashes(flat)
    n_out = len(th) - (k - 1)
    if n_out <= 0:
        return empty
    row_idx = np.repeat(np.arange(n_rows), lengths)
    with np.errstate(over="ignore"):
        acc = np.zeros(n_out, dtype=np.uint64)
        for j in range(k):
            acc = acc * _SC + th[j:j + n_out]
    same = row_idx[:n_out] == row_idx[k - 1:]
    base = np.nonzero(same)[0]
    if not len(base):
        return empty
    sh = acc[base].view(np.int64)
    srow = row_idx[base]
    pos = base - offsets[srow]
    enc = ids[srow] * (_MAX_POS + 1) + pos
    return sh, enc, srow, pos


def _explode_kgrams(t: pa.Table, text_col: str, id_col: str, k: int):
    """(sh, enc) per k-gram occurrence (see ``_explode_from_parts``)."""
    e = np.zeros(0, dtype=np.int64)
    if t.num_rows == 0:
        return e, e
    ids, flat, lengths, offsets = _doc_tokens(t, text_col, id_col)
    sh, enc, _srow, _pos = _explode_from_parts(
        ids, flat, lengths, offsets, t.num_rows, k)
    return sh, enc


_DUP_DOC_MSG = ("duplicate doc_id: the same k-gram occurs twice under one "
                "(doc_id, pos) key; span dedup requires unique document ids")


def _mine(docs: "ray.data.Dataset", k: int, text_col: str, id_col: str,
          shuffle_partitions=None):
    """Two-level-min mining pass (same shape as
    ``paragraphs._mark_occurrences``). Returns ``(local_losers,
    global_marked)``: ``local_losers`` is (enc,) for occurrences losing
    INSIDE their own batch (an in-batch repeat is globally duplicated, so
    they never enter the exchange); ``global_marked`` is
    (sh, enc, is_win, is_dup) over the per-batch minima — exactly one row
    per (k-gram, batch), each carrying its in-batch occurrence count
    (capped at 2 — the global stage only asks "total >= 2") so it can
    tell a sole-in-batch occurrence of a duplicated k-gram (is_dup) from
    a globally-unique one."""

    def local(t: pa.Table) -> pa.Table:
        sh, enc = _explode_kgrams(t, text_col, id_col, k)
        order = np.lexsort((enc, sh))
        ss = sh[order]
        se = enc[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = ss[1:] != ss[:-1]
        if len(se) and bool((~first[1:] & (se[1:] == se[:-1])).any()):
            raise ValueError(_DUP_DOC_MSG)
        grp = np.cumsum(first) - 1
        sizes = np.bincount(grp) if len(grp) else np.zeros(0, np.int64)
        return pa.table({
            "sh": pa.array(np.concatenate([ss[first], ss[~first]]),
                           pa.int64()),
            "enc": pa.array(np.concatenate([se[first], se[~first]]),
                            pa.int64()),
            "is_min": pa.array(np.concatenate(
                [np.ones(int(first.sum()), dtype=bool),
                 np.zeros(int((~first).sum()), dtype=bool)])),
            # capped at 2: downstream only asks "total occurrences >= 2"
            # (is_dup), and capped addition preserves that predicate —
            # int8 instead of int64 cuts the minima exchange row by 7 B
            "n_local": pa.array(np.concatenate(
                [np.minimum(sizes, 2).astype(np.int8),
                 np.ones(int((~first).sum()), dtype=np.int8)])),
        })

    # checkpoint before branching: the two filters below are separate
    # lineage consumers of the corpus-wide explode
    marked = docs.map_batches(local, batch_format="pyarrow").materialize()
    local_losers = marked.filter(expr="is_min == False") \
                         .select_columns(["enc"])
    # slim the exchange: is_min is constant-true after the filter, so only
    # (sh, enc, n_local) ride the shuffle
    minima = coalesce(marked.filter(expr="is_min == True")
                      .select_columns(["sh", "enc", "n_local"]),
                      shuffle_partitions)
    # marked is materialized, so its size is known: let the bucket count
    # grow with exchange volume (marked bounds minima from above)
    n_buckets = default_buckets(marked.size_bytes())

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["sh"], n_buckets))

    def mark_min(t: pa.Table) -> pa.Table:
        # bucketing is by sh, so a hash group is complete inside its
        # bucket: the minimum occurrence per sh is the global winner
        # (including the sole occurrence of a globally-unique k-gram —
        # it wins and nothing drops). Pure numpy on the Arrow columns —
        # a pandas conversion would cost a copy and slower group kernels.
        sh = t["sh"].to_numpy(zero_copy_only=False)
        enc = t["enc"].to_numpy(zero_copy_only=False)
        # int64 BEFORE reduceat: summing the capped int8 column in its
        # own dtype would wrap at 128 batches and could zero a true dup
        nl = t["n_local"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((enc, sh))
        ss, se = sh[order], enc[order]
        first = np.ones(len(order), dtype=bool)
        if len(first) > 1:
            first[1:] = ss[1:] != ss[:-1]
            if bool((~first[1:] & (se[1:] == se[:-1])).any()):
                raise ValueError(_DUP_DOC_MSG)
        starts = np.nonzero(first)[0]
        totals = (np.add.reduceat(nl[order], starts) if len(starts)
                  else nl[:0])
        grp = np.cumsum(first) - 1
        # scatter verdicts back to input order (output rows align with t)
        is_win = np.zeros(len(order), dtype=bool)
        is_win[order[starts]] = True
        is_dup = np.empty(len(order), dtype=bool)
        is_dup[order] = (totals >= 2)[grp]
        return pa.table({
            "sh": pa.array(sh, pa.int64()),
            "enc": pa.array(enc, pa.int64()),
            "is_win": pa.array(is_win),
            "is_dup": pa.array(is_dup),
        })

    global_marked = minima.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(mark_min, batch_format="pyarrow")
    return local_losers, global_marked


def span_losers(docs: "ray.data.Dataset", k: int = SPAN_K,
                text_col: str = "text", id_col: str = "doc_id",
                shuffle_partitions=None) -> "ray.data.Dataset":
    """(enc,) packed (doc_id, pos) keys of every k-gram occurrence that
    LOSES the first-occurrence rule — i.e. its hash occurs >= 2 times
    corpus-wide and it is not the global minimum occurrence."""
    local_losers, global_marked = _mine(docs, k, text_col, id_col,
                                        shuffle_partitions)
    return local_losers.union(
        global_marked.filter(expr="is_win == False")
        .select_columns(["enc"]))


def _rebuild_batch(t: pa.Table, text_col: str, id_col: str, k: int,
                   loser_pos_per_row: "list[np.ndarray] | None",
                   sorted_encs: "np.ndarray | None") -> pa.Table:
    """Rebuild each doc's text from tokens not covered by any loser span.
    Exactly one of ``loser_pos_per_row`` (join dual) / ``sorted_encs``
    (broadcast dual) is given."""
    ids, flat, lengths, offsets = _doc_tokens(t, text_col, id_col)
    if sorted_encs is not None:
        lo = np.searchsorted(sorted_encs, ids * (_MAX_POS + 1))
        hi = np.searchsorted(sorted_encs, ids * (_MAX_POS + 1) + lengths)
        counts = hi - lo
        n_losers = int(counts.sum())
        row_of = np.repeat(np.arange(t.num_rows), counts)
        # flat indices into sorted_encs: lo[row] + within-row rank
        excl = np.concatenate([[0], np.cumsum(counts)])[:-1]
        take = np.repeat(lo, counts) \
            + (np.arange(n_losers) - np.repeat(excl, counts))
        pos = sorted_encs[take] - ids[row_of] * (_MAX_POS + 1)
    else:
        counts = np.array([len(p) for p in loser_pos_per_row],
                          dtype=np.int64)
        row_of = np.repeat(np.arange(t.num_rows), counts)
        pos = (np.concatenate(loser_pos_per_row)
               if len(loser_pos_per_row) else np.zeros(0, dtype=np.int64))
    start = offsets[row_of] + pos if len(pos) else pos
    return _rebuild_from_starts(t, flat, lengths, k, start, text_col)


def _rebuild_from_starts(t: pa.Table, flat, lengths, k: int,
                         start: np.ndarray, text_col: str) -> pa.Table:
    """Shared rebuild tail: drop every token under a loser span starting
    at the given flat indices, re-join each row's survivors, and replace
    ``text_col`` IN PLACE — every other input column (ids in their
    original dtype, metadata) passes through untouched, so the operator
    composes without a reattach join."""
    n_rows = t.num_rows
    total = int(lengths.sum())
    keep = np.ones(total, dtype=bool)
    if len(start):
        # bincount beats np.add.at by ~10x on multi-million index arrays
        inc = np.bincount(start, minlength=total + k)
        dec = np.bincount(start + k, minlength=total + k)
        # pos + k <= row end by mining, so spans never cross rows
        keep = np.cumsum(inc[:total] - dec[:total]) <= 0
    kept = flat.filter(pa.array(keep))
    if total:
        new_lengths = np.bincount(
            np.repeat(np.arange(n_rows), lengths)[keep],
            minlength=n_rows)
    else:
        new_lengths = np.zeros(n_rows, dtype=np.int64)
    new_offsets = np.concatenate([[0], np.cumsum(new_lengths)])
    lst = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), kept)
    return t.set_column(t.schema.get_field_index(text_col), text_col,
                        pc.binary_join(lst, " "))


def dedup_spans(docs: "ray.data.Dataset", k: int = SPAN_K,
                text_col: str = "text", id_col: str = "doc_id",
                broadcast_limit: int = 64 * 1024 * 1024,
                shuffle_partitions=None,
                rebuild: str = "auto") -> "ray.data.Dataset":
    """The input dataset with every duplicated k-token span removed from
    ``text_col`` except its corpus-wide first occurrence; all OTHER
    columns pass through untouched (text is replaced in place, so the
    operator composes without a reattach join). Documents are all kept
    (a fully covered doc becomes the empty string — the caller decides
    whether to drop it); untouched docs round-trip bit-identically
    (split/join on single spaces is lossless).

    THREE-way size-selected dual on the membership set the rebuild needs
    (mirrors ``paragraph_dedup``; force one with ``rebuild=``):

    1. ``"losers"`` — the loser enc set broadcasts as ONE sorted array,
       each batch finds its rows' losers with two searchsorted calls
       (healthy corpus: only repeated spans pay; cheapest rebuild — no
       re-hashing);
    2. ``"winners"`` — boilerplate-EXTREME corpus: the loser set is
       occurrence-sized but the winner map is one (sh, enc) per DISTINCT
       duplicated k-gram, i.e. vocabulary-sized. It broadcasts instead
       and each batch re-derives its own occurrences' loser status
       locally (sh in map and enc != map[sh] — the mining predicate
       verbatim, so results are identical);
    3. ``"join"`` — both beyond any broadcast: per-doc binary position
       blobs left-outer-joined onto the corpus, O(duplicated
       occurrences) exchange."""
    if rebuild not in ("auto", "losers", "winners", "join"):
        raise ValueError(f"unknown rebuild mode: {rebuild!r}")
    local_losers, global_marked = _mine(docs, k, text_col, id_col,
                                        shuffle_partitions)
    global_marked = global_marked.materialize()

    # each forced mode materializes ONLY the membership set it uses (the
    # winners dual exists to avoid paying for the occurrence-sized loser
    # set, so it must not build it)
    losers = None
    if rebuild in ("auto", "losers", "join"):
        losers = local_losers.union(
            global_marked.filter(expr="is_win == False")
            .select_columns(["enc"])).materialize()

    if rebuild == "losers" or (
            rebuild == "auto"
            and (losers.size_bytes() or 0) <= dual_limit(broadcast_limit)):
        encs = np.sort(np.concatenate(
            [b["enc"].to_numpy(zero_copy_only=False)
             for b in losers.iter_batches(batch_format="pyarrow",
                                          batch_size=None)]
            or [np.zeros(0, dtype=np.int64)]))
        ref = ray.put(encs)

        def rebuild_l(t: pa.Table, ref=ref) -> pa.Table:
            return _rebuild_batch(t, text_col, id_col, k,
                                  None, ray.get(ref))

        return docs.map_batches(rebuild_l, batch_format="pyarrow")

    if rebuild == "join" and losers.count() == 0:
        # nothing to remove: an all-empty blob side would carry
        # schemaless blocks the left-outer join cannot key on (the
        # Project does NOT stamp schemas onto a groupby lineage's empty
        # blocks) — rebuild against the empty loser set directly, which
        # is exact
        empty = np.zeros(0, dtype=np.int64)
        return docs.map_batches(
            lambda t: _rebuild_batch(t, text_col, id_col, k, None, empty),
            batch_format="pyarrow")

    if rebuild in ("auto", "winners"):
        dupw = global_marked \
            .filter(expr="is_win == True").filter(expr="is_dup == True") \
            .select_columns(["sh", "enc"]).materialize()
    if rebuild == "winners" or (
            rebuild == "auto"
            and (dupw.size_bytes() or 0) <= dual_limit(broadcast_limit)):
        shs, wenc = [], []
        for b in dupw.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            shs.append(b["sh"].to_numpy(zero_copy_only=False))
            wenc.append(b["enc"].to_numpy(zero_copy_only=False))
        shs = np.concatenate(shs) if shs else np.zeros(0, np.int64)
        wenc = np.concatenate(wenc) if wenc else np.zeros(0, np.int64)
        order = np.argsort(shs, kind="stable")
        ref = ray.put((shs[order], wenc[order]))

        def rebuild_w(t: pa.Table, ref=ref) -> pa.Table:
            ids, flat, lengths, offsets = _doc_tokens(t, text_col, id_col)
            sh, enc, srow, pos = _explode_from_parts(
                ids, flat, lengths, offsets, t.num_rows, k)
            shs, wenc = ray.get(ref)
            if len(shs) and len(sh):
                idx = np.searchsorted(shs, sh)
                idx_c = np.minimum(idx, len(shs) - 1)
                lose = (shs[idx_c] == sh) & (enc != wenc[idx_c])
            else:
                lose = np.zeros(len(sh), dtype=bool)
            start = offsets[srow[lose]] + pos[lose]
            return _rebuild_from_starts(t, flat, lengths, k, start,
                                        text_col)

        return docs.map_batches(rebuild_w, batch_format="pyarrow")

    # join dual: pack each affected doc's loser positions into ONE binary
    # blob (pyarrow Dataset.join rejects list columns; int64 tobytes is
    # the documented workaround), left-outer join onto the corpus
    n_buckets = default_buckets()
    id_names = list(docs.schema().names)
    id_type = docs.schema().types[id_names.index(id_col)]

    def add_doc(t: pa.Table) -> pa.Table:
        enc = t["enc"].to_numpy(zero_copy_only=False)
        did = enc // (_MAX_POS + 1)
        out = pa.table({id_col: pa.array(did, pa.int64()),
                        "enc": t["enc"]})
        return out.append_column(
            "__bucket", hash_bucket_array(out[id_col], n_buckets))

    def to_blob(g: pd.DataFrame) -> pa.Table:
        blobs = []
        dids = []
        for did, grp in g.groupby(id_col, sort=False):
            pos = np.sort(grp["enc"].to_numpy(dtype=np.int64)
                          % (_MAX_POS + 1))
            dids.append(int(did))
            blobs.append(pos.tobytes())
        # cast back to the caller's id dtype so the left-outer join key
        # matches docs (ids were re-derived from the packed int64 enc)
        return pa.table({id_col: pa.array(dids, pa.int64()).cast(id_type),
                         "__posblob": pa.array(blobs, pa.binary())})

    blobs = losers.map_batches(add_doc, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(to_blob, batch_format="pandas") \
        .select_columns([id_col, "__posblob"])
    # ^ engine-side Project stamps the schema onto the groupby lineage's
    # empty blocks so the join below can resolve its key FieldRef
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    joined = docs.repartition(n_parts) \
        .join(blobs.repartition(n_parts), join_type="left_outer",
              on=(id_col,), num_partitions=n_parts)

    def rebuild_joined(t: pa.Table) -> pa.Table:
        per_row = [
            (np.frombuffer(b, dtype=np.int64) if b is not None
             else np.zeros(0, dtype=np.int64))
            for b in t["__posblob"].to_pylist()]
        return _rebuild_batch(t.drop_columns(["__posblob"]),
                              text_col, id_col, k, per_row, None)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")
