"""Benchmark decontamination — drop training docs that leak eval data.

The standard training-data hygiene operator (GPT-3 appendix C / Gopher
section A.5 style): a document is CONTAMINATED if it shares any k-word
shingle with the benchmark corpus. Distributed shape:

* benchmark -> distinct k-gram hashes (tiny vs the corpus — benchmarks
  are MBs, corpora are TBs), materialized once;
* small benchmark (the normal case): the sorted hash array broadcasts via
  ``ray.put`` and every doc batch checks its own k-grams with one
  ``np.searchsorted`` — NO shuffle at all, the corpus streams;
* oversized benchmark: a Bloom bitset ships per node, only bloom-positive
  (doc_id, shingle) rows enter a semi-join against the benchmark hashes,
  and the exact join clears the ~1% false positives — exact flags at
  O(matches) exchange volume.

Hashes are the engine's u64 token-hash family folded with a Horner rolling
combine (constant odd multiplier, uint64 wraparound), shared-seed with the
MinHash/winnowing machinery in :mod:`kg_gen_ray.functions.fast_text`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level imports (pickle-by-value compatibility): worker-side UDF
# bodies must not lazily import kg_gen_ray. Token hashes use the
# polars/Rust family (~10x the md5 family): contamination only needs doc
# and benchmark hashes to AGREE, not to replay in an external oracle.
from kg_gen_ray.functions.fast_text import _token_hashes

from kg_gen_ray.stages.common import dual_limit

_KC = np.uint64(0x100000001B3)          # FNV-ish odd multiplier


def _kgram_hashes(th: np.ndarray, row_idx: np.ndarray, k: int):
    """Token hashes -> within-row k-gram Horner hashes + their row ids.
    Vectorized over all tokens; the only loop is over the k window
    offsets (a small constant)."""
    n_out = len(th) - (k - 1)
    if n_out <= 0:
        return (np.zeros(0, dtype=np.uint64),
                np.zeros(0, dtype=np.int64))
    with np.errstate(over="ignore"):
        acc = np.zeros(n_out, dtype=np.uint64)
        for j in range(k):
            acc = acc * _KC + th[j:j + n_out]
    same = row_idx[:n_out] == row_idx[k - 1:]
    return acc[same], row_idx[:n_out][same]


def _batch_kgrams(t: pa.Table, text_col: str, k: int):
    """One batch -> (u64 k-gram hashes, int64 source-row indices).

    The single tokenize+hash+shingle kernel behind both the exploded
    (id, sh) rows and the fused broadcast probe — fixes land once. NULL
    text contributes no k-grams (``fill_null(0)`` keeps the repeat
    lengths aligned with ``flatten()``, which skips null list slots)."""
    toks = pc.split_pattern(pc.cast(t[text_col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(toks), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    th = _token_hashes(toks.flatten())
    row_idx = np.repeat(np.arange(t.num_rows), lengths)
    return _kgram_hashes(th, row_idx, k)


def doc_kgram_rows(ds: "ray.data.Dataset", k: int = 8,
                   id_col: str = "doc_id", text_col: str = "text"
                   ) -> "ray.data.Dataset":
    """(id, sh) exploded k-gram hash rows, fully vectorized per batch."""

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "sh": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        sh, srow = _batch_kgrams(t, text_col, k)
        if not len(sh):
            return empty
        ids = pc.cast(t[id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[srow]
        # int64 BIT-CAST of the u64 hash: Ray's groupby/aggregate path
        # pickles uint64 >= 2^63 into object columns (the pa.uint64
        # gotcha); every consumer (distinct, join, bloom, searchsorted)
        # only needs a consistent view, not unsigned order
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "sh": pa.array(sh.view(np.int64), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def contaminated_ids(docs: "ray.data.Dataset",
                     benchmark: "ray.data.Dataset", k: int = 8,
                     id_col: str = "doc_id", text_col: str = "text",
                     broadcast_limit: int = 64 * 1024 * 1024
                     ) -> "ray.data.Dataset":
    """doc ids sharing >= 1 k-gram with the benchmark. Size-selected
    dual per the module docstring."""
    from kg_gen_ray.stages.rewrite import distinct as _distinct

    def bench_ids(t: pa.Table) -> pa.Table:
        return t.append_column(
            id_col, pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    bench = benchmark if id_col in benchmark.schema().names \
        else benchmark.map_batches(bench_ids, batch_format="pyarrow")
    bench_sh = _distinct(
        doc_kgram_rows(bench, k, id_col, text_col)
        .select_columns(["sh"]), ["sh"]).materialize()

    if (bench_sh.size_bytes() or 0) <= dual_limit(broadcast_limit):
        arr = np.sort(np.concatenate(
            [b["sh"].to_numpy(zero_copy_only=False)
             for b in bench_sh.iter_batches(batch_format="pyarrow", batch_size=None)]
            or [np.zeros(0, dtype=np.uint64)]))
        ref = ray.put(arr)

        def explode_flag(t: pa.Table, ref=ref) -> pa.Table:
            # fused explode + probe: the per-doc k-gram hashes stay a
            # numpy scratch array inside this task — a ~370-rows-per-doc
            # exploded Arrow table never gets built just to be flagged
            empty = pa.table({id_col: pa.array([], pa.int64())})
            bench_sorted = ray.get(ref)
            if t.num_rows == 0 or not len(bench_sorted):
                return empty
            sh, srow = _batch_kgrams(t, text_col, k)
            if not len(sh):
                return empty
            sh = sh.view(np.int64)
            pos = np.searchsorted(bench_sorted, sh)
            pos[pos == len(bench_sorted)] = 0
            hit = bench_sorted[pos] == sh
            ids = np.unique(pc.cast(t[id_col], pa.int64())
                            .to_numpy(zero_copy_only=False)[srow[hit]])
            return pa.table({id_col: pa.array(ids, pa.int64())})

        return _distinct(
            docs.map_batches(explode_flag, batch_format="pyarrow"),
            [id_col])

    # oversized benchmark: bloom prefilter, then exact semi-join
    from kg_gen_ray.functions.sketch import bloom_build
    bloom = bloom_build(bench_sh, "sh")
    doc_rows = doc_kgram_rows(docs, k, id_col, text_col)
    maybe = doc_rows.map_batches(
        lambda t, bloom=bloom: t.filter(bloom.contains_mask(t["sh"])),
        batch_format="pyarrow")
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    joined = maybe.repartition(n_parts).join(
        bench_sh.repartition(n_parts), join_type="inner", on=("sh",),
        num_partitions=n_parts)
    return _distinct(joined.select_columns([id_col]), [id_col])


def decontaminate(docs: "ray.data.Dataset",
                  benchmark: "ray.data.Dataset", k: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_limit: int = 64 * 1024 * 1024
                  ) -> "ray.data.Dataset":
    """docs minus every contaminated row (exact — see module note).

    Size-selected on the FLAGGED side: normally a benchmark leaks into
    a tiny fraction of the corpus, so the flagged set broadcasts and
    the anti-filter is one streaming pass with no shuffle at all. Only
    when the flagged set outgrows the broadcast budget (a
    benchmark-saturated corpus) does the two-step route run: survivor
    ids derived on an id-only projection (cheap to re-execute inside
    drop_ids' bloom dual), then one ``keep_ids`` pass over the full
    rows — full-text lineage executes exactly once either way."""
    from kg_gen_ray.functions.dedup import drop_ids, keep_ids
    flagged = contaminated_ids(docs, benchmark, k, id_col, text_col,
                               broadcast_limit)
    if id_col != "doc_id":   # drop_ids/keep_ids key their small side this way
        flagged = flagged.map_batches(
            lambda t: t.rename_columns(["doc_id"]),
            batch_format="pyarrow")
    flagged = flagged.materialize()
    if (flagged.size_bytes() or 0) <= dual_limit(broadcast_limit):
        return drop_ids(docs, flagged, id_col, broadcast_limit)
    ids_only = docs.map_batches(
        lambda t, c=id_col: t.select([c]), batch_format="pyarrow")
    survivors = drop_ids(ids_only, flagged, id_col, broadcast_limit)
    if id_col != "doc_id":
        survivors = survivors.map_batches(
            lambda t: t.rename_columns(["doc_id"]),
            batch_format="pyarrow")
    return keep_ids(docs, survivors, id_col, broadcast_limit)
