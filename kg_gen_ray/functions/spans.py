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
* the rebuild streams the corpus once, with a size-selected dual on the
  loser set: losers broadcast as ONE sorted int64 array (healthy corpus:
  only repeated spans pay) and each batch finds its rows' losers with
  two searchsorted calls; above the broadcast budget the losers are
  packed into per-doc binary position blobs (16-byte rows -> one blob
  per affected doc) and LEFT-OUTER-joined onto the corpus, so the
  exchange is O(duplicated occurrences), never O(corpus text).
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
    lengths = pc.list_value_length(toks) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
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


def _explode_kgrams(t: pa.Table, text_col: str, id_col: str, k: int):
    """(sh, enc) per k-gram occurrence: int64 bit-view of the u64 rolling
    hash, and the packed (doc_id << POS_BITS) + pos occurrence key."""
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    if t.num_rows == 0:
        return empty
    ids, flat, lengths, offsets = _doc_tokens(t, text_col, id_col)
    th = _md5_u32_hashes(flat)
    n_out = len(th) - (k - 1)
    if n_out <= 0:
        return empty
    row_idx = np.repeat(np.arange(t.num_rows), lengths)
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
    return sh, enc


_DUP_DOC_MSG = ("duplicate doc_id: the same k-gram occurs twice under one "
                "(doc_id, pos) key; span dedup requires unique document ids")


def span_losers(docs: "ray.data.Dataset", k: int = SPAN_K,
                text_col: str = "text", id_col: str = "doc_id",
                shuffle_partitions=None) -> "ray.data.Dataset":
    """(enc,) packed (doc_id, pos) keys of every k-gram occurrence that
    LOSES the first-occurrence rule — i.e. its hash occurs >= 2 times
    corpus-wide and it is not the global minimum occurrence. Two-level
    min, same mining shape as ``paragraphs._mark_occurrences``."""

    def local(t: pa.Table) -> pa.Table:
        sh, enc = _explode_kgrams(t, text_col, id_col, k)
        order = np.lexsort((enc, sh))
        ss = sh[order]
        se = enc[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = ss[1:] != ss[:-1]
        if len(se) and bool((~first[1:] & (se[1:] == se[:-1])).any()):
            raise ValueError(_DUP_DOC_MSG)
        return pa.table({
            "sh": pa.array(np.concatenate([ss[first], ss[~first]]),
                           pa.int64()),
            "enc": pa.array(np.concatenate([se[first], se[~first]]),
                            pa.int64()),
            "is_min": pa.array(np.concatenate(
                [np.ones(int(first.sum()), dtype=bool),
                 np.zeros(int((~first).sum()), dtype=bool)])),
        })

    # checkpoint before branching: the two filters below are separate
    # lineage consumers of the corpus-wide explode
    marked = docs.map_batches(local, batch_format="pyarrow").materialize()
    local_losers = marked.filter(expr="is_min == False") \
                         .select_columns(["enc"])
    minima = coalesce(marked.filter(expr="is_min == True"),
                      shuffle_partitions)
    n_buckets = default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["sh"], n_buckets))

    def mark_min(g: pd.DataFrame) -> pa.Table:
        if bool(g.duplicated(["sh", "enc"]).any()):
            raise ValueError(_DUP_DOC_MSG)
        # bucketing is by sh, so a hash group is complete inside its
        # bucket: the minimum occurrence per sh is the global winner
        # (including the sole occurrence of a globally-unique k-gram —
        # it wins and nothing drops)
        win = (g.sort_values("enc", kind="stable")
                .groupby("sh", sort=False).cumcount() == 0).reindex(g.index)
        return pa.table({
            "enc": pa.array(g["enc"].to_numpy(dtype=np.int64), pa.int64()),
            "is_win": pa.array(win.to_numpy(dtype=bool)),
        })

    global_losers = minima.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(mark_min, batch_format="pandas") \
        .filter(expr="is_win == False").select_columns(["enc"])
    return local_losers.union(global_losers)


def _rebuild_batch(t: pa.Table, text_col: str, id_col: str, k: int,
                   loser_pos_per_row: "list[np.ndarray] | None",
                   sorted_encs: "np.ndarray | None") -> pa.Table:
    """Rebuild each doc's text from tokens not covered by any loser span.
    Exactly one of ``loser_pos_per_row`` (join dual) / ``sorted_encs``
    (broadcast dual) is given."""
    ids, flat, lengths, offsets = _doc_tokens(t, text_col, id_col)
    total = int(lengths.sum())
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
    keep = np.ones(total, dtype=bool)
    if len(pos):
        start = offsets[row_of] + pos
        # bincount beats np.add.at by ~10x on multi-million index arrays
        inc = np.bincount(start, minlength=total + k)
        dec = np.bincount(start + k, minlength=total + k)
        # pos + k <= row end by mining, so spans never cross rows
        keep = np.cumsum(inc[:total] - dec[:total]) <= 0
    kept = flat.filter(pa.array(keep))
    if total:
        new_lengths = np.bincount(
            np.repeat(np.arange(t.num_rows), lengths)[keep],
            minlength=t.num_rows)
    else:
        new_lengths = np.zeros(t.num_rows, dtype=np.int64)
    new_offsets = np.concatenate([[0], np.cumsum(new_lengths)])
    lst = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), kept)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        text_col: pc.binary_join(lst, " "),
    })


def dedup_spans(docs: "ray.data.Dataset", k: int = SPAN_K,
                text_col: str = "text", id_col: str = "doc_id",
                broadcast_limit: int = 64 * 1024 * 1024,
                shuffle_partitions=None) -> "ray.data.Dataset":
    """(doc_id, text) with every duplicated k-token span removed except
    its corpus-wide first occurrence. Documents are all kept (a fully
    covered doc becomes the empty string — the caller decides whether to
    drop it); untouched docs round-trip bit-identically (split/join on
    single spaces is lossless).

    Size-selected dual on the loser set (see module docstring): one
    sorted broadcast array + per-batch searchsorted under the limit,
    per-doc binary position blobs + left-outer join above it."""
    losers = span_losers(docs, k, text_col, id_col, shuffle_partitions) \
        .materialize()

    if (losers.size_bytes() or 0) <= dual_limit(broadcast_limit):
        encs = np.sort(np.concatenate(
            [b["enc"].to_numpy(zero_copy_only=False)
             for b in losers.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.zeros(0, dtype=np.int64)]))
        ref = ray.put(encs)

        def rebuild(t: pa.Table, ref=ref) -> pa.Table:
            return _rebuild_batch(t, text_col, id_col, k,
                                  None, ray.get(ref))

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # join dual: pack each affected doc's loser positions into ONE binary
    # blob (pyarrow Dataset.join rejects list columns; int64 tobytes is
    # the documented workaround), left-outer join onto the corpus
    n_buckets = default_buckets()

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
        return pa.table({id_col: pa.array(dids, pa.int64()),
                         "__posblob": pa.array(blobs, pa.binary())})

    blobs = losers.map_batches(add_doc, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(to_blob, batch_format="pandas") \
        .select_columns([id_col, "__posblob"])
    # ^ engine-side Project stamps the schema onto the groupby lineage's
    # empty blocks so the join below can resolve its key FieldRef
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    joined = docs.repartition(n_parts) \
        .join(blobs.repartition(n_parts), join_type="left_outer",
              on=(id_col,), num_partitions=n_parts) \
        .select_columns([id_col, text_col, "__posblob"]) \
        .repartition(n_parts)

    def rebuild_joined(t: pa.Table) -> pa.Table:
        per_row = [
            (np.frombuffer(b, dtype=np.int64) if b is not None
             else np.zeros(0, dtype=np.int64))
            for b in t["__posblob"].to_pylist()]
        return _rebuild_batch(t.drop_columns(["__posblob"]),
                              text_col, id_col, k, per_row, None)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")
