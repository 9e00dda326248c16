"""Text-analysis operators for large-scale training-data pipelines.

Token counting, quality scoring, document fingerprinting, language ID —
each a vectorized ``map_batches`` stage over the ``documents``/pages text
column. Tokenization is a single-space split, chosen to be bit-identical to
DuckDB ``string_split(text, ' ')`` so every op here is oracle-checkable.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# module-level (pickle-by-value compatibility)
from kg_gen_ray.stages.common import dual_limit  # noqa: E402

STOPWORDS = ("the", "a")  # fixed tiny list shared with the SQL oracle


def _tok_lists(batch: pa.Table, col: str = "text"):
    toks = pc.split_pattern(pc.cast(batch[col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
    return toks, lengths, flat


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_unique_tokens) — vectorized per batch."""
    toks, lengths, flat = _tok_lists(batch)
    row_idx = np.repeat(np.arange(batch.num_rows), lengths)
    # unique per row: sort (row, token) pairs and count boundaries
    n_unique = np.zeros(batch.num_rows, dtype=np.int64)
    if len(flat):
        order = np.lexsort((flat.astype(str), row_idx))
        r = row_idx[order]
        f = flat[order]
        new = np.ones(len(f), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
        np.add.at(n_unique, r[new], 1)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_tokens": pa.array(lengths.astype(np.int64)),
        "n_unique_tokens": pa.array(n_unique),
    })


def quality_score(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_tokens, stop_ratio, distinct_ratio,
    top_bigram_frac) — cheap quality heuristics: length + stopword density
    (the punct/ratio family from the task brief) plus the Gopher-style
    repetition signals (fraction of distinct tokens; fraction of token
    bigrams taken by the single most frequent bigram — high values flag
    boilerplate/spam pages). All sort-and-boundary-count vectorized; no
    per-row Python.
    """
    toks, lengths, flat = _tok_lists(batch)
    n_rows = batch.num_rows
    row_idx = np.repeat(np.arange(n_rows), lengths)
    stops = np.zeros(n_rows, dtype=np.int64)
    n_unique = np.zeros(n_rows, dtype=np.int64)
    top_bigram = np.zeros(n_rows, dtype=np.int64)
    if len(flat):
        strs = flat.astype(str)
        is_stop = np.isin(strs, STOPWORDS)
        np.add.at(stops, row_idx[is_stop], 1)
        # distinct tokens per row: sort (row, token), count boundaries
        order = np.lexsort((strs, row_idx))
        r = row_idx[order]
        f = strs[order]
        new = np.ones(len(f), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
        np.add.at(n_unique, r[new], 1)
        # top bigram per row: drop each row's last token, pair with the
        # successor, sort (row, w1, w2), run-length count, max per row
        keep = np.ones(len(strs), dtype=bool)
        ends = np.cumsum(lengths) - 1
        keep[ends[lengths > 0]] = False
        i = np.nonzero(keep)[0]
        if len(i):
            bg_row = row_idx[i]
            w1 = strs[i]
            w2 = strs[i + 1]
            order = np.lexsort((w2, w1, bg_row))
            r2, a, b = bg_row[order], w1[order], w2[order]
            new = np.ones(len(r2), dtype=bool)
            new[1:] = ((r2[1:] != r2[:-1]) | (a[1:] != a[:-1])
                       | (b[1:] != b[:-1]))
            grp = np.cumsum(new) - 1
            counts = np.bincount(grp)
            np.maximum.at(top_bigram, r2[new], counts)
    n_chars = pc.utf8_length(pc.cast(batch["text"], pa.string())) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(lengths.astype(np.int64)),
        "stop_ratio": pa.array(stops / np.maximum(lengths, 1), pa.float64()),
        "distinct_ratio": pa.array(n_unique / np.maximum(lengths, 1),
                                   pa.float64()),
        "top_bigram_frac": pa.array(
            top_bigram / np.maximum(lengths - 1, 1), pa.float64()),
    })


def fingerprint(batch: pa.Table, col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(doc_id, fp) — md5 content fingerprint (mirrors DuckDB ``md5``)."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch[col].to_pylist()]
    return pa.table({
        id_col: pc.cast(batch[id_col], pa.int64()),
        "fp": pa.array(fps, pa.string()),
    })


# BPE-ish tokenization: letter runs, digit runs, single non-space symbols
# (the shape of GPT-style pre-tokenizers, restricted to RE2-compatible
# classes so DuckDB regexp_extract_all mirrors it exactly)
_RE_TOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def regex_token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_re_tokens) — BPE-ish regex token counts. Arrow's RE2
    kernel does the scan (``count_substring_regex``); no Python loop."""
    counts = pc.count_substring_regex(
        pc.cast(batch["text"], pa.string()), pattern=_RE_TOKEN.pattern)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_re_tokens": pc.cast(counts, pa.int64()),
    })


# --- language ID: n-gram/stopword heuristic -------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "in", "it", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "pas"},
    "es": {"el", "los", "las", "es", "una", "para", "con", "por"},
}


class LangId:
    """Actor-pool language identifier: marker tables built once per actor.

    Heuristic marker-word voting with an ``unknown`` fallback — determinism
    over accuracy (the engine contract is routing, not NLP quality).
    """

    def __init__(self):
        self.markers = {lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()}
        self.word_re = re.compile(r"[a-zA-Z]+")

    def predict(self, text: str) -> str:
        toks = [w.lower() for w in self.word_re.findall(text)]
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang in sorted(self.markers):
            hits = sum(t in self.markers[lang] for t in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "pred_lang": pa.array(preds, pa.string()),
        })


def lang_id_stage(docs: "ray.data.Dataset", concurrency: int = 2
                  ) -> "ray.data.Dataset":
    return docs.map_batches(LangId, batch_format="pyarrow",
                            concurrency=concurrency)


def top_ngrams(docs: "ray.data.Dataset", n: int = 2, k: int = 20,
               shuffle_partitions=None) -> "ray.data.Dataset":
    """Corpus-wide top-k n-grams by occurrence count (single-space
    tokenization). Per-batch partials run entirely in Arrow C++: one
    tokenize pass, n-gram strings via vectorized ``binary_join_element_
    wise`` over shifted token slices, and a pyarrow hash-aggregate as the
    combiner — no Python loop over tokens. Then one small groupby-sum ->
    deterministic (count desc, ngram asc) top-k."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from kg_gen_ray.stages.common import coalesce, dual_limit

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks = _pc.split_pattern(_pc.cast(t["text"], pa.string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = _pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        total = len(flat)
        if total < n:
            return empty
        row_idx = np.repeat(np.arange(t.num_rows), lengths)
        valid = pa.array(row_idx[:total - n + 1] == row_idx[n - 1:])
        span = total - n + 1
        parts = [flat.slice(i, span) for i in range(n)]
        grams = _pc.binary_join_element_wise(*parts, " ").filter(valid)
        agg = pa.table({"ngram": grams}).group_by(["ngram"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "ngram": agg["ngram"],
            "cnt": pc.cast(agg["count_all"], pa.int64()),
        })

    agg = (coalesce(docs.map_batches(partial, batch_format="pyarrow"),
                    shuffle_partitions)
           .groupby("ngram").aggregate(Sum("cnt", alias_name="n_occur")))

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("_neg", _pc.negate(t["n_occur"]))

    return (agg.map_batches(neg, batch_format="pyarrow")
            .sort(["_neg", "ngram"]).limit(k)
            .select_columns(["ngram", "n_occur"]))


def tfidf_top_terms(docs: "ray.data.Dataset", k: int = 3,
                    shuffle_partitions=None,
                    broadcast_limit: int = 64 * 1024 * 1024
                    ) -> "ray.data.Dataset":
    """Per-document top-k terms by tf-idf (idf = ln(N/df), lowercase
    whitespace tokens — shares :func:`kg_gen_ray.functions.bm25.
    corpus_stats`'s combiner for the df table). Size-selected idf dual:
    a broadcastable vocabulary ships once as a dict; an extreme vocabulary
    (df table larger than ``broadcast_limit``) goes through a distributed
    hash join of the per-doc term-frequency table against the df table —
    the whole-vocab dict is never built on the driver in that case.
    Deterministic (score desc, term asc) tiebreak in both paths."""
    import math

    import ray as _ray

    from kg_gen_ray.functions.bm25 import corpus_stats

    stats = corpus_stats(docs).materialize()
    sentinel = stats.filter(expr="word == ''").take_all()
    n_docs = int(sentinel[0]["df"]) if sentinel else 0

    def tf_rows(t: pa.Table) -> pa.Table:
        """Vectorized per-batch (doc_id, word, tf): Arrow whitespace split
        (same tokens as Python ``str.split()``: runs of whitespace, no
        empties) + an Arrow C++ hash-aggregate — no Python loop over
        tokens (the round-2 per-doc ``Counter`` is gone)."""
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        texts = pc.utf8_lower(pc.cast(t["text"], pa.string()))
        toks = pc.utf8_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        if not len(flat):
            return empty
        dids = np.repeat(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False),
            lengths)
        pairs = pa.table({"doc_id": pa.array(dids, pa.int64()),
                          "word": flat})
        pairs = pairs.filter(pc.not_equal(pairs["word"], ""))
        agg = pairs.group_by(["doc_id", "word"]).aggregate([([], "count_all")])
        return pa.table({
            "doc_id": agg["doc_id"],
            "word": agg["word"],
            "tf": pc.cast(agg["count_all"], pa.int64()),
        })

    if (stats.size_bytes() or 0) <= dual_limit(broadcast_limit):
        from kg_gen_ray.stages.common import dict_lookup

        idf = {}
        for b in stats.iter_batches(batch_format="pyarrow"):
            for w, df in zip(b["word"].to_pylist(), b["df"].to_pylist()):
                if w:
                    idf[w] = math.log(n_docs / df)
        ref = _ray.put(idf)

        def per_doc(t: pa.Table, ref=ref) -> pa.Table:
            # tf per (doc, word) in Arrow, idf via the dictionary-encoded
            # broadcast lookup (one dict probe per UNIQUE word), then a
            # C-level per-doc top-k — docs are whole rows, so a batch
            # always holds every (doc, word) pair of its docs
            m = _ray.get(ref)
            tf = tf_rows(t)
            idf_col = dict_lookup(tf["word"], m, default=0.0,
                                  out_type=pa.float64())
            scored = pa.table({
                "doc_id": tf["doc_id"],
                "term": tf["word"],
                "tfidf": pc.multiply(pc.cast(tf["tf"], pa.float64()),
                                     idf_col),
            }).to_pandas()
            top = (scored.sort_values(["doc_id", "tfidf", "term"],
                                      ascending=[True, False, True],
                                      kind="stable")
                   .groupby("doc_id", sort=False).head(k))
            return pa.Table.from_pandas(top, preserve_index=False).cast(
                pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                           ("tfidf", pa.float64())]))

        return docs.map_batches(per_doc, batch_format="pyarrow")

    # join dual: (doc_id, word, tf) ⋈ (word, idf) -> per-doc top-k
    import pandas as _pd

    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)))

    def to_idf(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.not_equal(t["word"], ""))
        df = pc.cast(sub["df"], pa.float64())
        # ln(n/df) with the division FIRST — the same IEEE double ops as
        # the broadcast path's math.log(n_docs/df), so the duals are
        # bit-identical
        ratio = pc.divide(pa.scalar(float(n_docs)), df)
        return pa.table({
            "word": sub["word"],
            "idf": pc.ln(ratio),
        })

    idf_ds = stats.repartition(n_parts).map_batches(
        to_idf, batch_format="pyarrow")
    tf_ds = docs.map_batches(tf_rows, batch_format="pyarrow") \
                .repartition(n_parts)
    joined = tf_ds.join(idf_ds, join_type="inner", on=("word",),
                        num_partitions=n_parts)

    def score(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "term": t["word"],
            "tfidf": pc.multiply(pc.cast(t["tf"], pa.float64()),
                                 t["idf"]),
        })

    def topk(g: _pd.DataFrame) -> _pd.DataFrame:
        g = g.sort_values(["tfidf", "term"], ascending=[False, True],
                          kind="stable").head(k)
        return g[["doc_id", "term", "tfidf"]]

    return joined.map_batches(score, batch_format="pyarrow") \
        .groupby("doc_id").map_groups(topk, batch_format="pandas")
