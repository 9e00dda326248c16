"""Corpus-trained bigram LM quality scoring — the CCNet perplexity filter.

CCNet's quality stage scores every document with a language-model
log-likelihood and keeps the head of the distribution (Wenzek et al.,
LREC 2020 — there a KenLM 5-gram; the filtering mechanics are identical).
This module is that stage with the engine's own corpus-trained bigram
model: no external model file, fully deterministic, DuckDB-replayable.

Model: add-one-smoothed bigram LM over whitespace tokens.

    p(w2 | w1) = (C2(w1, w2) + 1) / (C1(w1) + V)

with C2/C1 corpus bigram/unigram occurrence counts and V the vocabulary
size. A document's score is the sum of its bigrams' log-probs — higher
(closer to 0) = more typical text; boilerplate scores high, keyboard
mash scores low.

**Oracle-exact arithmetic.** Float SUMs are order-dependent, so the
per-bigram log-prob is quantized FIRST: ``floor(ln(p) * 1e6)`` as int64
micro-nats (floor, not round — SQL round() is half-away-from-zero while
Python's is banker's), and the per-doc aggregate is an integer sum,
exact under any execution order. The quantization itself is evaluated
by DuckDB (``_ln_micro``): ``floor(x*1e6)`` sits on a quantization
boundary, so a 1-ulp ``ln`` divergence between CPython's libm and a
different DuckDB build's vectorized ln would flip the integer score —
running the engine's ln through the SAME duckdb module the correctness
oracle uses makes the two sides bit-identical by construction on any
host. The division ``(c2+1.0)/(c1+V)`` is exact-input IEEE division
(small ints in doubles), identical everywhere.

Distributed shape: two vocabulary-sized count exchanges (per-batch Arrow
``group_by`` combiner -> one global groupby each), then one streaming
scoring pass. The per-bigram score table rides a size-selected dual:
``ray.put`` dict + per-batch unique-bigram lookup while it fits the
broadcast budget, hash join on (w1, w2) + integer groupby-sum above it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# module-level (pickle-by-value compatibility)
from kg_gen_ray.stages.common import dual_limit  # noqa: E402

_SCALE = 1_000_000

# per-worker backoff-score memo, keyed (v, c1). Plain ints only — this
# module rides cloudpickle by-value when the repo isn't on the workers'
# sys.path, so module globals must stay picklable (NO cached duckdb
# connection here: DuckDBPyConnection can't pickle).
_BO_MEMO: dict = {}


def _ln_micro(num, den) -> np.ndarray:
    """``CAST(floor(ln(num/den) * 1e6) AS BIGINT)`` per element, evaluated
    by DuckDB — the same ln kernel the correctness oracle runs, so the
    quantized micro-nat can never diverge engine-vs-oracle across libm or
    DuckDB builds (round-3 advice). Vocabulary-scale inputs only: called
    once per DISTINCT bigram / backoff denominator, never per occurrence,
    so the per-call connect (~1 ms) is noise."""
    import duckdb
    t = pa.table({
        "i": pa.array(np.arange(len(num)), pa.int64()),
        "n": pa.array(np.asarray(num, dtype=np.float64), pa.float64()),
        "d": pa.array(np.asarray(den, dtype=np.float64), pa.float64()),
    })
    con = duckdb.connect()
    try:
        out = con.execute(
            "SELECT CAST(floor(ln(n / d) * 1000000) AS BIGINT) AS s "
            "FROM t ORDER BY i").fetch_arrow_table()
    finally:
        con.close()
    return out["s"].to_numpy(zero_copy_only=False).astype(np.int64)


def _tokens(batch: pa.Table, text_col: str):
    toks = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    return toks.flatten(), lens


def _bigrams(flat, lens):
    """(w1_idx, w2_idx) positions of within-row consecutive token pairs
    plus each pair's row id — the k=2 sibling of fast_text._shingle_rows."""
    row_idx = np.repeat(np.arange(len(lens)), lens)
    if len(row_idx) < 2:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    same = row_idx[:-1] == row_idx[1:]
    pos = np.flatnonzero(same)
    return pos, row_idx[pos]


def lm_counts(docs: "ray.data.Dataset", text_col: str = "text",
              shuffle_partitions=None):
    """-> (bigram_counts(w1, w2, c2), unigram_counts(w1, c1), V) — the
    trained model, materialized (vocabulary-sized, reused per query)."""
    from kg_gen_ray.stages.common import coalesce

    def local2(t: pa.Table) -> pa.Table:
        flat, lens = _tokens(t, text_col)
        pos, _rows = _bigrams(flat, lens)
        part = pa.table({
            "w1": flat.take(pa.array(pos)),
            "w2": flat.take(pa.array(pos + 1)),
        })
        out = part.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return out.rename_columns(["w1", "w2", "c2"])

    def local1(t: pa.Table) -> pa.Table:
        flat, _lens = _tokens(t, text_col)
        out = pa.table({"w1": flat}).group_by(["w1"]) \
                .aggregate([([], "count_all")])
        return out.rename_columns(["w1", "c1"])

    from ray.data.aggregate import Sum
    bi = coalesce(docs.map_batches(local2, batch_format="pyarrow"),
                  shuffle_partitions) \
        .groupby(["w1", "w2"]).aggregate(Sum("c2", alias_name="c2")) \
        .materialize()
    uni = coalesce(docs.map_batches(local1, batch_format="pyarrow"),
                   shuffle_partitions) \
        .groupby("w1").aggregate(Sum("c1", alias_name="c1")) \
        .materialize()
    v = uni.count()
    return bi, uni, v


def _score_micro(c2: np.ndarray, c1: np.ndarray, v: int) -> np.ndarray:
    """floor(ln((c2+1)/(c1+V)) * 1e6) per element — quantized BEFORE any
    sum so the aggregate is integer-exact, via DuckDB's own ln."""
    return _ln_micro(np.asarray(c2, np.float64) + 1.0,
                     np.asarray(c1, np.float64) + float(v))


def _backoff_scores(c1_vals, v: int) -> dict:
    """{c1: floor(ln(1/(c1+V))*1e6)} for the given c1 values, through the
    per-worker memo (few distinct small ints per corpus). Memo entries are
    keyed (v, c1): one reused worker can score several models, and the
    same c1 backs off differently under a different vocabulary size."""
    want = sorted({int(c) for c in c1_vals})
    fresh = [c for c in want if (v, c) not in _BO_MEMO]
    if fresh:
        bo = _ln_micro(np.ones(len(fresh)),
                       np.asarray(fresh, np.float64) + float(v))
        _BO_MEMO.update(zip(((v, c) for c in fresh), bo.tolist()))
    return {c: _BO_MEMO[(v, c)] for c in want}


def lm_score(docs: "ray.data.Dataset", text_col: str = "text",
             id_col: str = "doc_id", model=None,
             broadcast_limit: int = 64 * 1024 * 1024,
             shuffle_partitions=None) -> "ray.data.Dataset":
    """(doc_id, lm_score_micro, n_bigrams) — per-document bigram LM
    log-likelihood in integer micro-nats. ``model`` (optional) is a
    pre-trained ``lm_counts`` result, so one trained model can score many
    datasets (the CCNet deployment shape: train on a clean reference
    corpus, score the crawl)."""
    bi, uni, v = model if model is not None else lm_counts(
        docs, text_col, shuffle_partitions)

    # unseen-bigram backoff (a frozen model scoring NEW text — the CCNet
    # deployment shape): add-one gives p = 1/(C1(w1)+V), and an unseen
    # w1 has C1 = 0. Both duals below implement it identically via
    # _backoff_scores (batched DuckDB-ln per distinct c1).

    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))

    if (bi.size_bytes() or 0) <= dual_limit(broadcast_limit):
        # small model -> the per-bigram score table is built DRIVER-side
        # (the bigram and unigram tables are vocabulary-scale and already
        # materialized; a distributed join of a few-thousand-row table
        # pays seconds of 32-partition aggregator startup for microseconds
        # of work). Keys are (w1, w2) TUPLES of exact Python strings: any
        # separator-joined or numpy-U encoding of the pair is lossy on
        # raw crawl text (U-dtype strips trailing NULs; a separator char
        # can occur inside a token), which would silently mis-score.
        m1 = {}
        for b in uni.iter_batches(batch_format="pyarrow", batch_size=None):
            m1.update(zip(b["w1"].to_pylist(), b["c1"].to_pylist()))
        keys, c2s, c1s = [], [], []
        for b in bi.iter_batches(batch_format="pyarrow", batch_size=None):
            for w1, w2, c2 in zip(b["w1"].to_pylist(),
                                  b["w2"].to_pylist(),
                                  b["c2"].to_pylist()):
                keys.append((w1, w2))
                c2s.append(c2)
                c1s.append(m1[w1])
        m = dict(zip(keys, _score_micro(
            np.asarray(c2s, np.int64), np.asarray(c1s, np.int64),
            v).tolist()))
        ref = ray.put((m, m1))

        def score_batch(t: pa.Table, ref=ref, v=v) -> pa.Table:
            mm, mm1 = ray.get(ref)
            flat, lens = _tokens(t, text_col)
            pos, rows = _bigrams(flat, lens)
            w1l = flat.take(pa.array(pos)).to_pylist()
            w2l = flat.take(pa.array(pos + 1)).to_pylist()
            # per-batch memo keeps dict probes ~one per distinct bigram;
            # unseen bigrams resolve in ONE batched DuckDB-ln call at the
            # end (per-worker memoized by (v, c1))
            s = np.empty(len(w1l), dtype=np.int64)
            cache: dict = {}
            miss_i, miss_c1 = [], []
            for i, key in enumerate(zip(w1l, w2l)):
                got = cache.get(key)
                if got is None:
                    got = mm.get(key)
                    if got is None:
                        miss_i.append(i)
                        miss_c1.append(mm1.get(key[0], 0))
                        continue
                    cache[key] = got
                s[i] = got
            if miss_i:
                bo = _backoff_scores(miss_c1, v)
                s[np.asarray(miss_i, dtype=np.int64)] = \
                    [bo[c] for c in miss_c1]
            n = t.num_rows
            total = np.zeros(n, dtype=np.int64)
            cnt = np.zeros(n, dtype=np.int64)
            np.add.at(total, rows, s)
            np.add.at(cnt, rows, 1)
            return pa.table({
                id_col: pc.cast(t[id_col], pa.int64()),
                "lm_score_micro": pa.array(total, pa.int64()),
                "n_bigrams": pa.array(cnt, pa.int64()),
            })

        return docs.map_batches(score_batch, batch_format="pyarrow")

    # join dual: build the per-bigram score table distributed (ln() once
    # per DISTINCT bigram), explode (doc_id, w1, w2), join, integer
    # groupby-sum — exact at any vocabulary size
    from ray.data.aggregate import Count, Sum

    scored = bi.repartition(n_parts).join(
        uni.repartition(n_parts), join_type="inner", on=("w1",),
        num_partitions=n_parts)

    def add_score(t: pa.Table, v=v) -> pa.Table:
        s = _score_micro(
            pc.cast(t["c2"], pa.int64()).to_numpy(zero_copy_only=False),
            pc.cast(t["c1"], pa.int64()).to_numpy(zero_copy_only=False), v)
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "s": pa.array(s, pa.int64())})

    table = scored.map_batches(add_score,
                               batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        flat, lens = _tokens(t, text_col)
        pos, rows = _bigrams(flat, lens)
        ids = pc.cast(t[id_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[rows], pa.int64()),
            "w1": flat.take(pa.array(pos)),
            "w2": flat.take(pa.array(pos + 1)),
        })

    joined = docs.map_batches(explode, batch_format="pyarrow") \
        .repartition(n_parts) \
        .join(table.repartition(n_parts), join_type="left_outer",
              on=("w1", "w2"), num_partitions=n_parts)
    # unseen bigrams (null s): attach c1 and back off — normalize between
    # the chained joins (schemaless-empty-block gotcha)
    with_c1 = joined.select_columns([id_col, "w1", "s"]) \
        .repartition(n_parts) \
        .join(uni.repartition(n_parts), join_type="left_outer",
              on=("w1",), num_partitions=n_parts)

    def fill_backoff(t: pa.Table, v=v) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        c1 = pc.fill_null(pc.cast(t["c1"], pa.int64()), 0) \
               .to_numpy(zero_copy_only=False)
        miss = np.isnan(s.astype(np.float64)) if s.dtype != np.int64 \
            else np.zeros(len(s), dtype=bool)
        if miss.any():
            # one DuckDB-ln call per UNIQUE missing c1 value
            uniq, inv = np.unique(c1[miss], return_inverse=True)
            bo_map = _backoff_scores(uniq.tolist(), v)
            bo = np.asarray([bo_map[int(u)] for u in uniq],
                            dtype=np.int64)
            s = s.copy()
            s[miss] = bo[inv]
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "s": pa.array(s.astype(np.int64), pa.int64()),
        })

    agg = with_c1.map_batches(fill_backoff, batch_format="pyarrow") \
        .repartition(n_parts) \
        .groupby(id_col).aggregate(
            Sum("s", alias_name="lm_score_micro"),
            Count(alias_name="n_bigrams"))
    # docs with <2 tokens have no bigram rows: union their zero rows back
    scored_ids = agg

    def zeros_for_short(t: pa.Table) -> pa.Table:
        _flat, lens = _tokens(t, text_col)
        short = lens < 2
        ids = pc.cast(t[id_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)[short]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "lm_score_micro": pa.array(np.zeros(len(ids), np.int64())),
            "n_bigrams": pa.array(np.zeros(len(ids), np.int64())),
        })

    shorts = docs.map_batches(zeros_for_short, batch_format="pyarrow")
    return scored_ids.select_columns(
        [id_col, "lm_score_micro", "n_bigrams"]).union(shorts)


def perplexity_buckets(docs: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id", group_col: str = "lang",
                       model=None,
                       broadcast_limit: int = 64 * 1024 * 1024,
                       shuffle_partitions=None) -> "ray.data.Dataset":
    """(doc_id, lang, mean_micro, ppl_bucket) — CCNet's head/middle/tail
    corpus split (Wenzek et al. 2020 §4.3: per-language perplexity
    terciles over the LM score; the reference deployment trains the LM on
    a clean corpus via ``model=`` and buckets the crawl).

    ``mean_micro`` is the per-bigram mean of :func:`lm_score`'s integer
    micro-nats, as an exact integer ``floor(total / n_bigrams)`` —
    identical in numpy (``floor_divide``) and the DuckDB mirror
    (``floor(total / (nb * 1.0))``; the double quotient is floor-exact
    while ``n_bigrams < 2**52 / |total|``, i.e. any real document).
    NULL for a doc with no bigrams, and such docs take a NULL bucket.
    Higher mean log-prob = lower perplexity, so ascending terciles read
    ``tail`` (m <= t33), ``middle`` (m <= t66), ``head``.

    Scale shape: the score->lang attach is a hash join of two NARROW
    tables (ids + two ints / id + lang); thresholds are ONE ROW PER
    LANGUAGE — driver-collected and broadcast, never a per-doc
    structure. ``id_col`` must be unique (the engine-wide keying
    assumption — mint with :func:`kg_gen_ray.functions.ids.mint_doc_ids`
    on url-keyed crawls): duplicate ids would multiply through the
    attach join like any SQL join on a non-key. The tercile pass is :func:`~kg_gen_ray.functions.
    sessions.grouped_quantiles` (exact, one language's means fit a
    worker — at 100 TB swap in ``grouped_quantiles_sketch``, the same
    trade documented on the quantile operators themselves)."""
    from kg_gen_ray.functions.sessions import grouped_quantiles

    scores = lm_score(docs, text_col, id_col, model, broadcast_limit,
                      shuffle_partitions)
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def lang_of(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         group_col: pc.cast(t[group_col], pa.string())})

    joined = scores.repartition(n_parts).join(
        docs.map_batches(lang_of, batch_format="pyarrow")
            .repartition(n_parts),
        join_type="inner", on=(id_col,), num_partitions=n_parts)

    def add_mean(t: pa.Table) -> pa.Table:
        a = pc.cast(t["lm_score_micro"], pa.int64()) \
              .to_numpy(zero_copy_only=False)
        b = pc.cast(t["n_bigrams"], pa.int64()) \
              .to_numpy(zero_copy_only=False)
        m = np.floor_divide(a, np.maximum(b, 1))
        mean = pc.if_else(pa.array(b > 0), pa.array(m, pa.int64()),
                          pa.scalar(None, pa.int64()))
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         group_col: t[group_col],
                         "mean_micro": mean})

    with_mean = joined.map_batches(add_mean,
                                   batch_format="pyarrow").materialize()

    from kg_gen_ray.stages.common import drop_null_rows
    th_rows = grouped_quantiles(
        drop_null_rows(with_mean, "mean_micro")
        .select_columns([group_col, "mean_micro"]),
        group_col, "mean_micro", qs=(1 / 3, 2 / 3)).take_all()
    th = {r[group_col]: (r["p33"], r["p66"]) for r in th_rows}
    ref = ray.put(th)

    def assign(t: pa.Table, ref=ref) -> pa.Table:
        th = ray.get(ref)
        col = t["mean_micro"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        m = col.fill_null(0).to_numpy(zero_copy_only=False)
        # dictionary-encode the language column: the per-language masks
        # below are then int-code comparisons, with Python touched once
        # per DISTINCT language in the batch (DESIGN.md §5)
        lg_col = t[group_col]
        if isinstance(lg_col, pa.ChunkedArray):
            lg_col = lg_col.combine_chunks()
        enc = pc.dictionary_encode(lg_col)
        codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        out = np.full(t.num_rows, None, dtype=object)
        # null lang is a GROUP (SQL PARTITION BY semantics — the tercile
        # table carries a None row); its rows sit at code -1 after the
        # fill, which no dictionary index can match, so pair them up here
        buckets = [(idx, lg) for idx, lg in
                   enumerate(enc.dictionary.to_pylist())] + [(-1, None)]
        for idx, lg in buckets:
            if lg not in th:
                continue
            t33, t66 = th[lg]
            sel = (codes == idx) & valid
            out[sel & (m <= t33)] = "tail"
            out[sel & (m > t33) & (m <= t66)] = "middle"
            out[sel & (m > t66)] = "head"
        return t.append_column("ppl_bucket", pa.array(out, pa.string()))

    return with_mean.map_batches(assign, batch_format="pyarrow")


def unigram_counts(docs: "ray.data.Dataset", text_col: str = "text",
                   shuffle_partitions=None):
    """-> (unigram table (w, c) materialized, N total token occurrences).
    Combiner-first like :func:`lm_counts`; one vocabulary-sized exchange."""
    from ray.data.aggregate import Sum

    from kg_gen_ray.stages.common import coalesce

    def local(t: pa.Table) -> pa.Table:
        flat, _lens = _tokens(t, text_col)
        out = pa.table({"w": flat}).group_by(["w"]) \
                .aggregate([([], "count_all")])
        return out.rename_columns(["w", "c"])

    uni = coalesce(docs.map_batches(local, batch_format="pyarrow"),
                   shuffle_partitions) \
        .groupby("w").aggregate(Sum("c", alias_name="c")).materialize()
    return uni, int(uni.sum("c") or 0)


def dsir_weights(docs: "ray.data.Dataset", target: "ray.data.Dataset",
                 text_col: str = "text", id_col: str = "doc_id",
                 broadcast_limit: int = 64 * 1024 * 1024,
                 shuffle_partitions=None) -> "ray.data.Dataset":
    """(doc_id, dsir_micro, n_tokens) — DSIR importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): per-document log-likelihood ratio between a TARGET
    corpus model and the SOURCE (docs) model, here over add-one unigram
    bag models. Select with the existing machinery (``grouped_topk`` by
    weight, or ``hash_sample`` within weight buckets).

    Oracle-exact integer arithmetic, same discipline as :func:`lm_score`:
    each per-token term is ``ln_micro(c_t+1, N_t+V) - ln_micro(c_s+1,
    N_s+V)`` with BOTH logs floor-quantized to micro-nats through
    DuckDB's own ln kernel before the (order-independent) sum; ``V`` is
    the shared source∪target vocabulary. Tokens outside the source vocab
    (possible only when a frozen source model scores a new corpus) take
    the ``c=0`` add-one backoff on both sides.

    Scale shape: two vocabulary-sized count exchanges + one streaming
    scoring pass; the per-token delta table rides the size-selected
    broadcast/join dual (driver dict under ``broadcast_limit``, exploded
    (doc, w) hash join + integer groupby-sum above it)."""
    from kg_gen_ray.stages.rewrite import distinct as _distinct

    uni_s, n_s = unigram_counts(docs, text_col, shuffle_partitions)
    uni_t, n_t = unigram_counts(target, text_col, shuffle_partitions)
    v = _distinct(
        uni_s.select_columns(["w"]).union(uni_t.select_columns(["w"])),
        ["w"], shuffle_partitions).count()
    den_s, den_t = n_s + v, n_t + v
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))

    if (uni_s.size_bytes() or 0) + (uni_t.size_bytes() or 0) \
            <= dual_limit(broadcast_limit):
        ms, mt = {}, {}
        for b in uni_s.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            ms.update(zip(b["w"].to_pylist(), b["c"].to_pylist()))
        for b in uni_t.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            mt.update(zip(b["w"].to_pylist(), b["c"].to_pylist()))
        words = list(ms.keys() | mt.keys())
        ct = np.asarray([mt.get(w, 0) for w in words], np.int64) + 1
        cs = np.asarray([ms.get(w, 0) for w in words], np.int64) + 1
        delta = (_ln_micro(ct, np.full(len(words), den_t, np.int64))
                 - _ln_micro(cs, np.full(len(words), den_s, np.int64)))
        table = dict(zip(words, delta.tolist()))
        backoff = int(_ln_micro([1.0], [float(den_t)])[0]
                      - _ln_micro([1.0], [float(den_s)])[0])
        ref = ray.put((table, backoff))

        def score_batch(t: pa.Table, ref=ref) -> pa.Table:
            table, backoff = ray.get(ref)
            flat, lens = _tokens(t, text_col)
            rows = np.repeat(np.arange(t.num_rows), lens)
            s = np.empty(len(rows), dtype=np.int64)
            cache: dict = {}
            for i, w in enumerate(flat.to_pylist()):
                got = cache.get(w)
                if got is None:
                    got = table.get(w, backoff)
                    cache[w] = got
                s[i] = got
            total = np.zeros(t.num_rows, dtype=np.int64)
            np.add.at(total, rows, s)
            return pa.table({
                id_col: pc.cast(t[id_col], pa.int64()),
                "dsir_micro": pa.array(total, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
            })

        return docs.map_batches(score_batch, batch_format="pyarrow")

    # join dual: per-token delta table built distributed (ln once per
    # DISTINCT token), docs exploded to (doc_id, w), hash join, integer
    # groupby-sum — exact at any vocabulary size
    from ray.data.aggregate import Count, Sum

    with_t = uni_s.repartition(n_parts).join(
        uni_t.repartition(n_parts), join_type="left_outer", on=("w",),
        num_partitions=n_parts, right_suffix="_t")

    def add_delta(t: pa.Table) -> pa.Table:
        cs = pc.cast(t["c"], pa.int64()).to_numpy(zero_copy_only=False) + 1
        # "c_t" is the join's right_suffix name — a KeyError here means a
        # Ray upgrade changed suffix semantics; fail loudly, silently
        # reading the source count would corrupt every weight
        ct = pc.cast(pc.fill_null(t["c_t"], 0), pa.int64()) \
               .to_numpy(zero_copy_only=False) + 1
        d = (_ln_micro(ct, np.full(len(cs), den_t, np.int64))
             - _ln_micro(cs, np.full(len(cs), den_s, np.int64)))
        return pa.table({"w": t["w"], "d": pa.array(d, pa.int64())})

    table = with_t.map_batches(add_delta,
                               batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        flat, lens = _tokens(t, text_col)
        ids = pc.cast(t[id_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, lens), pa.int64()),
            "w": flat,
        })

    pairs = docs.map_batches(explode, batch_format="pyarrow") \
        .repartition(n_parts).join(
            table.repartition(n_parts), join_type="left_outer", on=("w",),
            num_partitions=n_parts)
    backoff = int(_ln_micro([1.0], [float(den_t)])[0]
                  - _ln_micro([1.0], [float(den_s)])[0])

    def fill_backoff(t: pa.Table, backoff=backoff) -> pa.Table:
        # a token outside the source vocab joins nothing: add-one c=0
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "s": pc.fill_null(pc.cast(t["d"], pa.int64()), backoff),
        })

    agg = pairs.map_batches(fill_backoff, batch_format="pyarrow") \
        .repartition(n_parts) \
        .groupby(id_col).aggregate(
            Sum("s", alias_name="dsir_micro"),
            Count(alias_name="n_tokens"))

    def zeros_for_empty(t: pa.Table) -> pa.Table:
        _flat, lens = _tokens(t, text_col)
        empty = lens < 1
        ids = pc.cast(t[id_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)[empty]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "dsir_micro": pa.array(np.zeros(len(ids), np.int64())),
            "n_tokens": pa.array(np.zeros(len(ids), np.int64())),
        })

    empties = docs.map_batches(zeros_for_empty, batch_format="pyarrow")
    return agg.select_columns(
        [id_col, "dsir_micro", "n_tokens"]).union(empties)
