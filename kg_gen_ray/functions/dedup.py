"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All deterministic and hash-based (md5, shared with the DuckDB oracle).
The distributed shapes follow the standard scale patterns:

* exact: content-hash in ``map_batches`` -> hash-partition groupby -> first
  (SURVEY.md §2.7 D1 — the reference's implicit set semantics, done as a
  shuffle).
* MinHash+LSH: shingle -> minhash signature per doc (map_batches) -> explode
  to (band, band_key, doc_id) rows -> groupby(band_key) -> candidate pairs
  -> optional exact-Jaccard verify. No all-pairs comparison anywhere.
* SimHash: 64-bit signature from token hashes; near-dup candidates share a
  16-bit prefix bucket (groupby), verified by Hamming distance within the
  bucket.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# module-level (pickle-by-value compatibility): worker-side
# filter closures must not lazily import kg_gen_ray
from kg_gen_ray.stages.common import dual_limit, in_set_mask, \
    md5_hex_memo

import ray.data

N_HASHES = 4          # minhash signature length
BANDS = 2             # bands of 2 rows each -> candidate if either band matches
SHINGLE_K = 3         # words per shingle


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id",
                shuffle_partitions=None) -> "ray.data.Dataset":
    """Keep the min-id row per distinct content hash -> (doc_id, fp).

    Partial min per batch (combiner) before the groupby shrinks the shuffle
    to one row per (batch, fp).

    NULL text is NOT deduplicated: unknown content is not *equal* content
    (SQL ``NULL = NULL`` is NULL), so every null-text row survives with a
    NULL ``fp`` — collapsing a corpus's fetch-error rows into one would be
    silent data loss. Mechanically, each null row gets a UNIQUE surrogate
    exchange key (``'n:'+id``) so neither the per-batch combiner nor the
    global groupby (both of which group NULLs together, the GROUP BY
    convention) can merge them; real hashes ride under ``'v:'+fp``.
    """
    from kg_gen_ray.functions.text_analysis import fingerprint
    from kg_gen_ray.stages.common import coalesce

    def local_min(t: pa.Table) -> pa.Table:
        fp = fingerprint(t, text_col, id_col)
        col = fp["fp"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        key = pc.if_else(
            pc.is_valid(col),
            pc.binary_join_element_wise(
                pa.scalar("v:", pa.string()), col, pa.scalar("")),
            pc.binary_join_element_wise(
                pa.scalar("n:", pa.string()),
                pc.cast(fp[id_col], pa.string()), pa.scalar("")))
        keyed = pa.table({"__k": key, id_col: fp[id_col]})
        return keyed.group_by(["__k"]).aggregate([(id_col, "min")]) \
                    .rename_columns(["__k", id_col])

    partial = coalesce(docs.map_batches(local_min, batch_format="pyarrow"),
                       shuffle_partitions)
    from ray.data.aggregate import Min
    out = partial.groupby("__k").aggregate(Min(id_col, alias_name=id_col))

    def finish(t: pa.Table) -> pa.Table:
        k = pc.cast(t["__k"], pa.string())
        fp = pc.if_else(pc.starts_with(k, "v:"),
                        pc.utf8_slice_codeunits(k, 2),
                        pa.scalar(None, pa.string()))
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()), "fp": fp})

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_set(text: str | None, k: int = SHINGLE_K) -> set:
    if text is None:        # null text -> 0 shingles (engine convention)
        return set()
    toks = text.split(" ")
    if len(toks) < k:
        return {text} if text else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _shingle_id_arrays(doc_ids, texts, vocab: dict | None = None,
                       k: int = SHINGLE_K) -> dict:
    """doc_id -> sorted int64 array of dense shingle ids.

    Shingle strings map bijectively onto dense ints via ``vocab`` (fresh
    per call unless shared across batches), so Jaccard over the id
    arrays is EXACTLY Jaccard over the string sets, while intersections
    run as C merges on sorted int64 arrays instead of Python set algebra
    over k-word strings. As a broadcast payload the arrays are also ~10x
    smaller than the string sets (8 bytes per shingle occurrence)."""
    if vocab is None:
        vocab = {}
    out = {}
    # candidate docs are duplicates BY CONSTRUCTION: share one sorted
    # id array per distinct text instead of re-shingling every copy
    # (read-only downstream, so aliasing is safe)
    by_text: dict = {}
    for did, text in zip(doc_ids, texts):
        ids = by_text.get(text)
        if ids is None:
            ids = np.fromiter(
                (vocab.setdefault(sh, len(vocab))
                 for sh in shingle_set(text, k)),
                dtype=np.int64)
            ids.sort()
            by_text[text] = ids
        out[did] = ids
    return out


def _verify_pairs(doc_a, doc_b, sh_map: dict, threshold: float) -> pa.Table:
    """Exact Jaccard >= threshold filter over candidate pairs, given the
    per-doc sorted shingle-id arrays from :func:`_shingle_id_arrays`."""
    keep_a, keep_b, sims = [], [], []
    empty = np.empty(0, dtype=np.int64)
    for a, b in zip(doc_a, doc_b):
        ia = sh_map.get(a, empty)
        ib = sh_map.get(b, empty)
        inter = np.intersect1d(ia, ib, assume_unique=True).size
        denom = ia.size + ib.size - inter
        j = (inter / denom) if denom else 0.0
        if j >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            sims.append(j)
    return pa.table({
        "doc_a": pa.array(keep_a, pa.int64()),
        "doc_b": pa.array(keep_b, pa.int64()),
        "jaccard": pa.array(sims, pa.float64()),
    })


def _distinct_texts(batch: pa.Table, col: str = "text"):
    """Dictionary-encode the text column so per-doc Python work runs once
    per DISTINCT text in the batch — a dup-heavy crawl repeats whole
    documents, not just shingles. NULL folds to "" first: both shingle
    to the empty set, so the fold is semantics-preserving and keeps
    ``pc.take`` from emitting nulls for null indices."""
    arr = pc.fill_null(pc.cast(batch[col], pa.string()), "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    return d.dictionary.to_pylist(), d.indices


def shingle_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_shingles) — distinct k-word shingles per doc."""
    uniq, idx = _distinct_texts(batch)
    ns = pa.array([len(shingle_set(t)) for t in uniq], pa.int64())
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_shingles": pc.take(ns, idx),
    })


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# per-worker shingle -> (h0..h{n-1}) memo: boilerplate shingles repeat
# across documents and batches, so each distinct shingle pays its
# n_hashes md5 calls once per worker lifetime. Clears at cap (like
# fast_text's token memo) so late-arriving hot shingles still memoize,
# and skips oversized keys — shingle_set falls back to the WHOLE
# document text below SHINGLE_K tokens (CJK / no-whitespace docs), which
# must never pin worker heap.
_SIG_MEMO: dict = {}
_SIG_MEMO_CAP = 1 << 18                 # ~600 B/entry -> ~150 MB worst case
_SIG_MEMO_MAX_LEN = 256


def _shingle_sig(s: str, n_hashes: int) -> tuple:
    v = _SIG_MEMO.get(s)
    if v is None or len(v) < n_hashes:
        v = tuple(_md5(f"{k}:{s}") for k in range(n_hashes))
        if len(s) <= _SIG_MEMO_MAX_LEN:
            if len(_SIG_MEMO) >= _SIG_MEMO_CAP:
                _SIG_MEMO.clear()
            _SIG_MEMO[s] = v
    return v


def minhash_signature(text: str, n_hashes: int = N_HASHES) -> list:
    """Signature h_k = min over shingles of md5("{k}:{shingle}") (hex-string
    min — identical to DuckDB ``min(md5(k || ':' || shingle))``)."""
    sh = shingle_set(text)
    if not sh:
        return [""] * n_hashes
    sigs = [_shingle_sig(s, n_hashes) for s in sh]
    return [min(t[k] for t in sigs) for k in range(n_hashes)]


def minhash_signatures(batch: pa.Table) -> pa.Table:
    """(doc_id, h0..h{n-1}) minhash signature columns — computed once
    per distinct text (see :func:`_distinct_texts`; duplicate docs take
    their signature by index, ~8x on a dup-heavy batch)."""
    uniq, idx = _distinct_texts(batch)
    sigs = [minhash_signature(t) for t in uniq]
    cols = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
    for k in range(N_HASHES):
        cols[f"h{k}"] = pc.take(
            pa.array([s[k] for s in sigs], pa.string()), idx)
    return pa.table(cols)


def band_rows(batch: pa.Table) -> pa.Table:
    """Explode signatures to (band, band_key, doc_id) LSH rows.

    band_key = md5("{band}:{h_i}:{h_j}") over the band's rows —
    composed per band with one vectorized Arrow join and hashed via the
    dictionary-encoding md5 memo (duplicate docs share identical
    signatures, so each distinct band string pays md5 once per batch);
    the per-cell ``as_py`` loop this replaces was ~20x slower on a
    dup-heavy batch. Output is band-major; every consumer groups on
    band_key, so row order is free."""
    sig_tab = minhash_signatures(batch)
    rows_per_band = N_HASHES // BANDS
    n = sig_tab.num_rows
    dids = pc.cast(sig_tab["doc_id"], pa.int64())
    parts = []
    for b in range(BANDS):
        cols = [pc.cast(sig_tab[f"h{b * rows_per_band + r}"], pa.string())
                for r in range(rows_per_band)]
        joined = pc.binary_join_element_wise(*cols, ":")
        parts.append(pa.table({
            "band": pa.array(np.full(n, b, np.int32)),
            "band_key": md5_hex_memo(joined, prefix=f"{b}:"),
            "doc_id": dids,
        }))
    return pa.concat_tables(parts)


def minhash_lsh_pairs(docs: "ray.data.Dataset",
                      shuffle_partitions=None,
                      pair_mode: str = "all",
                      broadcast_limit: int = 64 * 1024 * 1024
                      ) -> "ray.data.Dataset":
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Almost every bucket holds exactly one doc, so pairing work is gated by
    a *hot-bucket prefilter*: a vectorized Count aggregate finds buckets
    with >= 2 docs, and only matching band rows reach the per-bucket
    pairing groupby. The hot-key restriction is size-selected: on a
    healthy corpus the set is tiny and ships once via ``ray.put``; on a
    dup-heavy crawl it is O(duplicated-doc clusters) — exactly what
    near-dup dedup exists for — so above the broadcast budget the band
    rows are restricted by a hash semi-join against the hot-key dataset
    instead (same dual as ``jaccard_verify``'s candidate restriction;
    ``KG_FORCE_JOIN_DUALS=1`` exercises it at test scale).
    Output distinct (doc_a, doc_b), doc_a < doc_b.

    ``pair_mode="chain"`` links consecutive sorted ids per bucket instead
    of all O(b^2) combinations — identical connected components at O(b)
    pairs, the right mode for any consumer that feeds a components pass
    (a template-dominated corpus turns one bucket into 10^5 docs, where
    "all" is billions of pairs; see the fast-family docstring).
    """
    import ray
    from ray.data.aggregate import Count

    from kg_gen_ray.stages.common import coalesce
    from kg_gen_ray.stages.rewrite import distinct

    rows = coalesce(docs.map_batches(band_rows, batch_format="pyarrow"),
                    shuffle_partitions).materialize()

    # distributed n>=2 filter FIRST; the full one-row-per-doc
    # bucket-count table never reaches the driver
    hot_ds = rows.groupby("band_key").aggregate(Count(alias_name="n")) \
                 .filter(expr="n >= 2").select_columns(["band_key"]) \
                 .materialize()
    if (hot_ds.size_bytes() or 0) <= dual_limit(broadcast_limit):
        # broadcast dual: tiny hot set -> one driver collection + ray.put
        # (the empty set stays on this side: 0 bytes <= any limit)
        hot = {r["band_key"] for r in hot_ds.take_all()}
        if not hot:
            import pyarrow as _pa
            return ray.data.from_arrow(_pa.table({
                "doc_a": _pa.array([], _pa.int64()),
                "doc_b": _pa.array([], _pa.int64())}))
        hot_ref = ray.put(hot)

        def only_hot(t: pa.Table, hot_ref=hot_ref) -> pa.Table:
            return t.filter(in_set_mask(t["band_key"], hot_ref))

        rows = rows.map_batches(only_hot, batch_format="pyarrow")
    else:
        # semi-join dual: hot keys stay distributed; band rows shuffle
        # once on band_key (they were about to shuffle for the pairing
        # groupby anyway). repartition normalizes the aggregate lineage's
        # schemaless empty partitions before the pyarrow join.
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
        rows = rows.select_columns(["band_key", "doc_id"]) \
                   .repartition(n_parts) \
                   .join(hot_ds.repartition(n_parts), join_type="inner",
                         on=("band_key",), num_partitions=n_parts)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if pair_mode == "chain":
            return pd.DataFrame({"doc_a": ids[:-1], "doc_b": ids[1:]})
        combos = list(itertools.combinations(ids, 2))
        return pd.DataFrame({
            "doc_a": [a for a, _ in combos],
            "doc_b": [b for _, b in combos],
        })

    cand = rows.groupby("band_key").map_groups(pairs, batch_format="pandas")
    return distinct(cand, ["doc_a", "doc_b"], shuffle_partitions)


def jaccard_verify(docs: "ray.data.Dataset", pairs: "ray.data.Dataset",
                   threshold: float = 0.8,
                   broadcast_limit: int = 64 * 1024 * 1024
                   ) -> "ray.data.Dataset":
    """Exact n-gram Jaccard over candidate pairs.

    The candidate-id restriction of the docs table is itself a
    size-selected dual on the PAIR set: while the pairs fit the broadcast
    budget the id set ships once via ``ray.put`` and docs are filtered
    distributed; on a dup-heavy corpus (pair bytes above the limit — O(#
    duplicates) rows that must never stream through the driver) the ids are
    exploded/distinct-ed distributed and a hash semi-join restricts docs.
    The surviving candidate rows then go through the second size-selected
    dual: small -> driver builds the doc->shingles map once and broadcasts
    it; large -> two hash joins attach text_a/text_b to each pair and
    Jaccard runs per batch with no driver state at all."""
    import ray

    from kg_gen_ray.stages.rewrite import distinct as _distinct

    pairs = pairs.materialize()
    if (pairs.size_bytes() or 0) <= dual_limit(broadcast_limit):
        cand_ids = set()
        for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None):
            cand_ids.update(b["doc_a"].to_pylist())
            cand_ids.update(b["doc_b"].to_pylist())
        cid_ref = ray.put(cand_ids)

        def only_cands(t: pa.Table, cid_ref=cid_ref) -> pa.Table:
            return t.select(["doc_id", "text"]).filter(
                in_set_mask(t["doc_id"], cid_ref))

        cands = docs.map_batches(only_cands, batch_format="pyarrow") \
                    .materialize()
    else:
        def explode_ids(t: pa.Table) -> pa.Table:
            # keep the pairs' own id type (int or string): the ids came
            # FROM docs, so the semi-join key types line up without a
            # cast — same type-agnosticism as the broadcast dual's
            # in_set_mask
            return pa.table({"doc_id": pa.concat_arrays([
                t["doc_a"].combine_chunks(),
                t["doc_b"].combine_chunks()])})

        ids = _distinct(
            pairs.map_batches(explode_ids, batch_format="pyarrow"),
            ["doc_id"])
        n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
        # bloom prefilter: only bloom-positive docs (candidates + ~1% false
        # positives) enter the semi-join shuffle; the inner join removes
        # the false positives, so the restriction stays exact while the
        # docs-side exchange shrinks from O(corpus) to O(candidates)
        from kg_gen_ray.functions.sketch import bloom_build
        bloom = bloom_build(ids, "doc_id")
        cands = docs.map_batches(
            lambda t, bloom=bloom: t.select(["doc_id", "text"]).filter(
                bloom.contains_mask(t["doc_id"])),
            batch_format="pyarrow") \
            .repartition(n_parts) \
            .join(ids.repartition(n_parts), join_type="inner",
                  on=("doc_id",), num_partitions=n_parts) \
            .select_columns(["doc_id", "text"]).materialize()

    if (cands.size_bytes() or 0) <= dual_limit(broadcast_limit):
        sh_map, vocab = {}, {}
        for b in cands.iter_batches(batch_format="pyarrow", batch_size=None):
            sh_map.update(_shingle_id_arrays(
                b["doc_id"].to_pylist(), b["text"].to_pylist(), vocab))
        ref = ray.put(sh_map)

        def verify(t: pa.Table, ref=ref) -> pa.Table:
            return _verify_pairs(t["doc_a"].to_pylist(),
                                 t["doc_b"].to_pylist(),
                                 ray.get(ref), threshold)

        return pairs.map_batches(verify, batch_format="pyarrow")

    # join dual: co-locate each pair with both texts, no driver map
    import ray as _ray
    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)))
    pairs_n = pairs.repartition(n_parts)
    keep_cols = ["doc_a", "doc_b"]
    for side in ("a", "b"):
        txt = cands.repartition(n_parts).map_batches(
            lambda t, s=side: t.rename_columns([f"doc_{s}", f"text_{s}"]),
            batch_format="pyarrow")
        pairs_n = pairs_n.join(txt, join_type="inner", on=(f"doc_{side}",),
                               num_partitions=n_parts)
        keep_cols.append(f"text_{side}")
        # normalize between joins: join outputs carry schemaless empty
        # blocks that the next join's key resolution chokes on. NOTE the
        # list COPY — select_columns is lazy and would otherwise see the
        # next iteration's mutation.
        pairs_n = pairs_n.select_columns(list(keep_cols)) \
                         .repartition(n_parts)

    def verify_joined(t: pa.Table) -> pa.Table:
        doc_a = t["doc_a"].to_pylist()
        doc_b = t["doc_b"].to_pylist()
        # doc texts repeat across pairs; shingle each unique doc once
        texts: dict = {}
        for ids, col in ((doc_a, "text_a"), (doc_b, "text_b")):
            for did, txt in zip(ids, t[col].to_pylist()):
                texts.setdefault(did, txt)
        sh_map = _shingle_id_arrays(texts.keys(), texts.values())
        return _verify_pairs(doc_a, doc_b, sh_map, threshold)

    return pairs_n.map_batches(verify_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_pack(acc: np.ndarray) -> int:
    """Sign-threshold a 64-wide accumulator row into a packed uint64."""
    bits = (acc > 0).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def simhash64(text: str | None) -> int:
    """64-bit SimHash over whitespace tokens (md5-derived bit vectors)."""
    toks = text.split(" ") if text is not None else []
    if not toks or toks == [""]:
        return 0
    acc = _simhash_accumulate(toks, np.zeros(64, dtype=np.int64))
    return _simhash_pack(acc)


_SHIFTS = np.arange(64, dtype=np.uint64)


def _token_bits(unique_tokens) -> np.ndarray:
    """(n_uniq, 64) ±1 contribution matrix; md5 runs once per UNIQUE token
    (the vocabulary is far smaller than the token stream)."""
    hs = np.array([int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                   for t in unique_tokens], dtype=np.uint64)
    bits = ((hs[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    return 2 * bits - 1


def _simhash_accumulate(toks, acc):
    uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
    contrib = _token_bits(uniq)
    counts = np.bincount(inv, minlength=len(uniq))
    acc += (contrib * counts[:, None]).sum(axis=0)
    return acc


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Vectorized batch SimHash: one md5 per unique token in the batch,
    one matrix accumulate per DISTINCT text (duplicate docs take their
    hash by index — see :func:`_distinct_texts`; null text folds to "",
    both hash to 0)."""
    texts, idx = _distinct_texts(batch)
    tok_lists = [t.split(" ") if t else [] for t in texts]
    flat = [w for toks in tok_lists for w in toks]
    hs = []
    if flat:
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        contrib = _token_bits(uniq)          # (n_uniq, 64)
        pos = 0
        for toks, text in zip(tok_lists, texts):
            n = len(toks)
            if not text:
                hs.append(0)
            else:
                counts = np.bincount(inv[pos:pos + n], minlength=len(uniq))
                nz = counts.nonzero()[0]
                acc = (contrib[nz] * counts[nz, None]).sum(axis=0)
                hs.append(_simhash_pack(acc))
            pos += n
    else:
        hs = [0] * len(texts)   # all-null/empty batch: rows still emitted
    sim = pa.array([np.uint64(h) for h in hs], pa.uint64())
    buck = pa.array([h >> 48 for h in hs], pa.int64())
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "simhash": pc.take(sim, idx),
        "bucket": pc.take(buck, idx),
    })


def simhash_near_dups(docs: "ray.data.Dataset", max_hamming: int = 3,
                      shuffle_partitions=None) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: bucket on the 16-bit prefix, hot-bucket
    prefilter (same pattern as :func:`minhash_lsh_pairs`), verify Hamming
    distance within buckets holding >= 2 docs."""
    import ray
    from ray.data.aggregate import Count

    from kg_gen_ray.stages.common import coalesce

    sigs = coalesce(docs.map_batches(simhash_batch, batch_format="pyarrow"),
                    shuffle_partitions).materialize()
    hot_ds = sigs.groupby("bucket").aggregate(Count(alias_name="n")) \
                 .filter(expr="n >= 2").select_columns(["bucket"])
    hot = {r["bucket"] for r in hot_ds.take_all()}
    if not hot:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64())}))
    hot_ref = ray.put(hot)

    def only_hot(t: pa.Table, hot_ref=hot_ref) -> pa.Table:
        return t.filter(in_set_mask(t["bucket"], hot_ref))

    sigs = sigs.map_batches(only_hot, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = list(g["doc_id"])
        hs = [int(h) for h in g["simhash"]]
        out_a, out_b, dist = [], [], []
        for (i, j) in itertools.combinations(range(len(ids)), 2):
            d = bin(hs[i] ^ hs[j]).count("1")
            if d <= max_hamming:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a); out_b.append(b); dist.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                             "hamming": dist})

    return sigs.groupby("bucket").map_groups(pairs, batch_format="pandas")


def near_dup_losers(docs: "ray.data.Dataset",
                    shuffle_partitions=None, method: str = "fast",
                    broadcast_limit: int = 64 * 1024 * 1024,
                    max_label_iter: int = 20) -> "ray.data.Dataset":
    """(doc_id) rows to DROP — the loser side of
    :func:`near_dup_canonical`, exposed for callers anti-filtering a
    wide table: on a healthy corpus losers are a small fraction, so
    ``drop_ids(wide, losers)`` broadcasts and the filter is one
    streaming pass with no shuffle (filtering by the SURVIVOR side
    instead materializes an O(corpus) id set and forces the join dual).

    Chain pairing throughout: this consumer only needs the components,
    and chain pairs give identical components at O(bucket) instead of
    O(bucket^2) — the difference between minutes and never-finishes on
    a template-dominated crawl."""
    from kg_gen_ray.functions.fast_text import minhash_lsh_pairs_fast

    if method == "md5":
        pairs = minhash_lsh_pairs(docs, shuffle_partitions,
                                  pair_mode="chain")
    else:
        pairs = minhash_lsh_pairs_fast(docs, shuffle_partitions,
                                       broadcast_limit=broadcast_limit,
                                       pair_mode="chain")
    return pair_graph_losers(pairs, broadcast_limit,
                             max_label_iter=max_label_iter)


def near_dup_canonical(docs: "ray.data.Dataset",
                       shuffle_partitions=None, method: str = "fast",
                       broadcast_limit: int = 64 * 1024 * 1024,
                       max_label_iter: int = 20) -> "ray.data.Dataset":
    """End-to-end near-duplicate document dedup: MinHash-LSH candidate
    pairs -> connected components (distributed min-label propagation) ->
    keep the lowest doc_id of each component (singletons keep themselves).

    The canonical training-data dedup composition: shingle -> minhash ->
    band-bucket groupby -> transitive closure -> one representative per
    duplicate cluster. Returns (doc_id) of survivors.

    ``method="fast"`` (default) composes on the vectorized u64 MinHash
    family (:func:`kg_gen_ray.functions.fast_text.minhash_lsh_pairs_fast`
    — still DuckDB-reproducible); ``method="md5"`` keeps the md5
    hex-string family for parity with the reference-shaped oracle chain.

    Size-selected duals at both scale-sensitive points (see
    :func:`pair_graph_losers` and :func:`drop_ids`): no O(corpus) or
    unconditional O(duplicates) driver collection anywhere."""
    losers = near_dup_losers(docs, shuffle_partitions, method,
                             broadcast_limit, max_label_iter)
    return drop_ids(docs.select_columns(["doc_id"]), losers, "doc_id",
                    broadcast_limit)


def pair_graph_losers(pairs: "ray.data.Dataset",
                      broadcast_limit: int = 64 * 1024 * 1024,
                      a_col: str = "doc_a", b_col: str = "doc_b",
                      max_label_iter: int = 20) -> "ray.data.Dataset":
    """(a, b) duplicate pairs -> (doc_id) of every node that is NOT its
    connected component's minimum — the ids to drop in a keep-the-lowest
    dedup. Size-selected dual: a small pair graph (the common case — LSH
    pairs are rare by construction) runs one driver union-find pass; a
    large one (dup-heavy crawl) runs distributed min-label propagation."""
    from kg_gen_ray.stages.canonicalize import label_propagation

    pairs = pairs.materialize()

    if (pairs.size_bytes() or 0) <= dual_limit(broadcast_limit):
        parent: dict = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None):
            for a_, b_ in zip(b[a_col].to_pylist(), b[b_col].to_pylist()):
                parent.setdefault(a_, a_)
                parent.setdefault(b_, b_)
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
        loser_ids = [x for x in parent if find(x) != x]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(loser_ids, pa.int64())}))

    # label propagation orders labels by (len, lex): zero-pad ids so that
    # order coincides with numeric order
    def pad(t: pa.Table) -> pa.Table:
        def z(col):
            s = pc.cast(pc.cast(col, pa.int64()), pa.string())
            return pc.utf8_lpad(s, 20, "0")
        return pa.table({"a": z(t[a_col]), "b": z(t[b_col])})

    comp = label_propagation(pairs.map_batches(pad, batch_format="pyarrow"),
                             max_iter=max_label_iter)

    def losers_only(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["component"])
        sub = t.filter(keep)
        return pa.table({"doc_id": pc.cast(sub["node"], pa.int64())})

    return comp.map_batches(losers_only, batch_format="pyarrow")


def _with_null_key_sentinel(ds: "ray.data.Dataset",
                            schema: pa.Schema) -> "ray.data.Dataset":
    """Union one all-null sentinel row (flagged ``__s``) into a join's
    probe side. Ray's hash join cannot finalize an ALL-EMPTY side (its
    empty partitions carry no schema to key on) — and a Bloom prefilter
    can legitimately leave zero rows. A NULL join key never matches (SQL
    semantics, verified for Ray's pyarrow join), so the sentinel is
    dropped by a semi join and flag-filtered after an anti join."""
    import ray.data as _rd
    cols = {f.name: pa.nulls(1, f.type) for f in schema}
    cols["__s"] = pa.array([True])
    sentinel = _rd.from_arrow(pa.table(cols))
    tagged = ds.map_batches(
        lambda t: t.append_column(
            "__s", pa.array(np.zeros(t.num_rows, dtype=bool))),
        batch_format="pyarrow")
    return tagged.union(sentinel)


def _strip_sentinel(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["__s"], False))
                   .drop_columns(["__s"]),
        batch_format="pyarrow")


def drop_ids(ds: "ray.data.Dataset", losers: "ray.data.Dataset",
             id_col: str, broadcast_limit: int = 64 * 1024 * 1024,
             bloom_prefilter: bool = True) -> "ray.data.Dataset":
    """Anti-filter ``ds`` by the loser id set. Size-selected dual: small ->
    one broadcast anti-membership filter (no shuffle); large -> a
    distributed left-anti hash join, Bloom-prefiltered.

    The Bloom prefilter (``functions.sketch.bloom_build``) is what keeps
    the large dual from shuffling the WHOLE table: a compact bitset over
    the loser ids ships once per node, bloom-NEGATIVE rows (guaranteed
    non-losers — no false negatives) bypass the exchange entirely, and
    only bloom-positive rows (true losers + ~1% false positives) pay the
    anti-join, which then resolves the false positives — the result is
    exact. On a dup-heavy crawl this cuts anti-join input from O(corpus)
    to O(losers). ``ds``'s lineage executes twice (negative pass +
    positive pass); callers pass column-pruned lineage (an id projection),
    which re-reads far cheaper than one full-table shuffle."""
    import ray as _ray

    losers = losers.materialize()
    if losers.count() == 0:
        # nothing to drop — and an all-empty join side would carry
        # schemaless blocks the hash join cannot key on
        return ds
    if (losers.size_bytes() or 0) <= dual_limit(broadcast_limit):
        dropped = set()
        for b in losers.iter_batches(batch_format="pyarrow", batch_size=None):
            dropped.update(b["doc_id"].to_pylist())
        ref = _ray.put(dropped)

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(in_set_mask(t[id_col], ref, invert=True))

        return ds.map_batches(keep, batch_format="pyarrow")

    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)))
    arrow_schema = pa.schema(zip(ds.schema().names, ds.schema().types))
    id_type = arrow_schema.field(id_col).type
    if bloom_prefilter:
        from kg_gen_ray.functions.sketch import bloom_build
        in_cols = list(arrow_schema.names)
        bloom = bloom_build(losers, "doc_id")

        def bloom_split(t: pa.Table, positive: bool,
                        bloom=bloom) -> pa.Table:
            mask = bloom.contains_mask(t[id_col])
            return t.filter(mask if positive else pc.invert(mask))

        definite_keep = ds.map_batches(
            lambda t: bloom_split(t, positive=False),
            batch_format="pyarrow")
        ds = ds.map_batches(lambda t: bloom_split(t, positive=True),
                            batch_format="pyarrow")

    # left_anti join: exact set semantics (duplicate loser ids cannot
    # multiply anything), output schema is ds's own. The loser ids are
    # cast to ds's id dtype so crossing the size threshold never changes
    # join-key types. The probe side carries a null-key sentinel (the
    # bloom-positive subset can be empty; see _with_null_key_sentinel).
    marked = losers.repartition(n_parts).map_batches(
        lambda t, c=id_col, ty=id_type: pa.table({
            c: pc.cast(t["doc_id"], ty)}),
        batch_format="pyarrow")
    survivors = _strip_sentinel(
        _with_null_key_sentinel(ds, arrow_schema).repartition(n_parts)
        .join(marked, join_type="left_anti", on=(id_col,),
              num_partitions=n_parts))
    if bloom_prefilter:
        # join outputs carry schemaless empty blocks; stamp the schema
        # engine-side before the union (verify-skill gotcha)
        survivors = survivors.select_columns(in_cols)
        return definite_keep.union(survivors)
    return survivors


def keep_ids(ds: "ray.data.Dataset", keepers: "ray.data.Dataset",
             id_col: str, broadcast_limit: int = 64 * 1024 * 1024,
             bloom_prefilter: bool = True) -> "ray.data.Dataset":
    """Semi-filter ``ds`` to the keeper id set — the positive twin of
    :func:`drop_ids`, same size-selected duals. ``keepers`` must carry a
    ``doc_id`` column. Large dual: a Bloom bitset drops definite
    non-keepers without any exchange (no false negatives, so no keeper
    is ever lost) and only bloom-positive rows — keepers + ~1% false
    positives, which the inner join then removes — are shuffled. One
    pass over ``ds`` either way."""
    import ray as _ray

    keepers = keepers.materialize()
    if keepers.count() == 0:
        # nothing survives — limit(0) keeps the lineage schema (so the
        # result stays join/union-safe) while letting the executor
        # short-circuit instead of computing every block of ds just to
        # slice it empty
        return ds.limit(0)
    if (keepers.size_bytes() or 0) <= dual_limit(broadcast_limit):
        kept = set()
        for b in keepers.iter_batches(batch_format="pyarrow", batch_size=None):
            kept.update(b["doc_id"].to_pylist())
        ref = _ray.put(kept)

        def f(t: pa.Table) -> pa.Table:
            return t.filter(in_set_mask(t[id_col], ref))

        return ds.map_batches(f, batch_format="pyarrow")

    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)))
    arrow_schema = pa.schema(zip(ds.schema().names, ds.schema().types))
    id_type = arrow_schema.field(id_col).type
    if bloom_prefilter:
        from kg_gen_ray.functions.sketch import bloom_build
        bloom = bloom_build(keepers, "doc_id")
        ds = ds.map_batches(
            lambda t, bloom=bloom: t.filter(bloom.contains_mask(t[id_col])),
            batch_format="pyarrow")
    # left_semi join: exact set semantics — a duplicated keeper id cannot
    # multiply output rows (the broadcast dual is a set; the join dual
    # must agree). Keeper ids are cast to ds's id dtype so crossing the
    # size threshold never changes join-key types. The probe side carries
    # a null-key sentinel (the bloom-positive subset can be empty; see
    # _with_null_key_sentinel) — the semi join drops it itself (a null
    # key matches nothing) and _strip_sentinel drops the flag column.
    keyed = keepers.repartition(n_parts).map_batches(
        lambda t, c=id_col, ty=id_type: pa.table({
            c: pc.cast(t["doc_id"], ty)}),
        batch_format="pyarrow")
    return _strip_sentinel(
        _with_null_key_sentinel(ds, arrow_schema).repartition(n_parts)
        .join(keyed, join_type="left_semi", on=(id_col,),
              num_partitions=n_parts))
