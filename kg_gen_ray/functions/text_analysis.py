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


def _tok_codes(batch: pa.Table, col: str = "text"):
    """Whitespace-split tokens as (flat Arrow array, per-row lengths,
    int64 dictionary codes) — identity grouping runs on the codes, so no
    token ever becomes a Python object."""
    toks = pc.split_pattern(pc.cast(batch[col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = np.nan_to_num(pc.list_value_length(toks)
                            .to_numpy(zero_copy_only=False),
                            nan=0).astype(np.int64)  # null text -> 0 tokens
    flat = toks.flatten()
    codes = flat.dictionary_encode().indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, lengths, codes


def _row_uniques(codes: np.ndarray, row_idx: np.ndarray,
                 n_rows: int) -> np.ndarray:
    """Distinct tokens per row: sort (row, code) pairs, count group
    boundaries."""
    n_unique = np.zeros(n_rows, dtype=np.int64)
    if len(codes):
        order = np.lexsort((codes, row_idx))
        r = row_idx[order]
        f = codes[order]
        new = np.ones(len(f), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
        np.add.at(n_unique, r[new], 1)
    return n_unique


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_unique_tokens) — vectorized per batch."""
    _flat, lengths, codes = _tok_codes(batch)
    row_idx = np.repeat(np.arange(batch.num_rows), lengths)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_tokens": pa.array(lengths.astype(np.int64)),
        "n_unique_tokens": pa.array(
            _row_uniques(codes, row_idx, batch.num_rows)),
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
    flat, lengths, codes = _tok_codes(batch)
    n_rows = batch.num_rows
    row_idx = np.repeat(np.arange(n_rows), lengths)
    stops = np.zeros(n_rows, dtype=np.int64)
    top_bigram = np.zeros(n_rows, dtype=np.int64)
    n_unique = _row_uniques(codes, row_idx, n_rows)
    if len(codes):
        is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))) \
            .to_numpy(zero_copy_only=False)
        np.add.at(stops, row_idx[is_stop], 1)
        # top bigram per row: group identical within-row bigrams, max
        # group count per row
        so, grp, counts, new = _ngram_groups(codes, row_idx, 2)
        if len(so):
            np.maximum.at(top_bigram, row_idx[so[new]], counts)
    n_chars = pc.fill_null(    # null text -> 0 chars (not a NaN cast)
        pc.utf8_length(pc.cast(batch["text"], pa.string())), 0) \
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


def _ngram_groups(codes: np.ndarray, row_idx: np.ndarray, n: int):
    """Group identical within-row token n-grams.

    ``codes`` are integer token ids (Arrow dictionary indices — identity
    grouping needs equality only, so the code order is irrelevant and the
    lexsorts run on ints instead of Python strings). Returns
    ``(starts_sorted, grp, counts, new)`` where ``starts_sorted`` are
    flat-token start indices grouped by (row, w1..wn), ``grp`` maps each
    occurrence to its group id, ``counts[g]`` is the group's occurrence
    count and ``new`` marks the first occurrence of each group. Empty
    result tuples when no n-gram fits.
    """
    if len(codes) < n:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, np.empty(0, dtype=bool)
    base = np.arange(len(codes) - (n - 1))
    ok = row_idx[base] == row_idx[base + n - 1]
    starts = base[ok]
    if not len(starts):
        e = np.empty(0, dtype=np.int64)
        return e, e, e, np.empty(0, dtype=bool)
    vocab = int(codes.max()) + 1
    n_rows = int(row_idx.max()) + 1
    # (row, w1, .., wn) packs into ONE int64 whenever rows * vocab^n
    # fits 62 bits (each code < vocab, so the radix pack preserves the
    # exact lexicographic order): one argsort instead of n+1 stable
    # lexsort passes — the dominant cost of this kernel. n=2 fits for
    # any realistic batch; n>=4 on a huge-vocabulary batch falls back.
    if n_rows * vocab ** n < (1 << 62):
        key = row_idx[starts]
        for j in range(n):
            key = key * vocab + codes[starts + j]
        order = np.argsort(key, kind="stable")
        sk = key[order]
        so = starts[order]
        new = np.ones(len(so), dtype=bool)
        new[1:] = sk[1:] != sk[:-1]
    else:
        # np.lexsort: LAST key is primary -> (row, w1, .., wn) ordering
        keys = tuple(codes[starts + j] for j in reversed(range(n))) \
            + (row_idx[starts],)
        order = np.lexsort(keys)
        so = starts[order]
        diff = row_idx[so[1:]] != row_idx[so[:-1]]
        for j in range(n):
            diff = diff | (codes[so[1:] + j] != codes[so[:-1] + j])
        new = np.ones(len(so), dtype=bool)
        new[1:] = diff
    grp = np.cumsum(new) - 1
    counts = np.bincount(grp)
    return so, grp, counts, new


def _flat_codes(flat: pa.Array):
    """(codes, lengths) for a flat Arrow string array: dictionary ids for
    identity grouping (C hash pass, no Python-object conversion) and
    per-token code-point lengths (mirrors DuckDB ``length``)."""
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return codes, tlen


def gopher_signals(batch: pa.Table, text_col: str = "text",
                   line_col: str | None = None,
                   quality: bool = True,
                   repetition: bool = True) -> tuple:
    """(quality_table, repetition_table) with the token/line splits done
    ONCE and shared across both kernels — the splits are the dominant
    cost of the streaming pass, so callers needing both families (the
    hygiene Gopher cut, the combined text-quality query) should use this
    instead of calling the kernels separately. Either element is None
    when its flag is off. The ``_toks``/``_lines`` kwargs on the kernels
    are private to this wrapper: it is the only safe sharer, because it
    derives both arrays from the same batch/columns it passes down."""
    toks = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
    lines = pc.split_pattern(
        pc.cast(batch[line_col or text_col], pa.string()), "\n")
    q = gopher_quality(batch, text_col, line_col,
                       _toks=toks, _lines=lines) if quality else None
    r = gopher_repetition(batch, text_col, line_col,
                          _toks=toks, _lines=lines) if repetition else None
    return q, r


def gopher_repetition(batch: pa.Table, text_col: str = "text",
                      line_col: str | None = None,
                      _toks: pa.Array | None = None,
                      _lines: pa.Array | None = None) -> pa.Table:
    """Within-document repetition signals from the Gopher (Rae et al.
    2021, arXiv:2112.11446 §A1.1) web-curation rules, one row per doc:

    - ``dup_line_frac`` — repeat line occurrences / total lines
      (lines split on ``\\n`` from ``line_col`` or ``text_col``);
    - ``dup_line_char_frac`` — chars in those repeat occurrences /
      total line chars;
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac`` — chars covered
      by the single most frequent token n-gram (count x its char
      length; count ties broken toward the longer n-gram, which is the
      fraction-maximizing and hence deterministic choice) / total token
      chars;
    - ``dup_5gram_char_frac`` — chars of tokens covered by ANY 5-gram
      that occurs more than once in the doc (overlaps counted once) /
      total token chars.

    All sort-and-boundary-count vectorized (no per-row Python), the same
    kernel family as :func:`quality_score`; char lengths are code-point
    counts so DuckDB ``length()`` mirrors them exactly. 100 TB story:
    pure streaming map over doc batches — repetition is a within-doc
    property, so there is no shuffle and no state; compose with
    ``Dataset.filter`` on the emitted fractions for the Gopher cut
    (dup_line_frac > 0.30 etc.).
    """
    toks = _toks if _toks is not None else pc.split_pattern(
        pc.cast(batch[text_col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = np.nan_to_num(pc.list_value_length(toks)
                            .to_numpy(zero_copy_only=False),
                            nan=0).astype(np.int64)  # null text -> 0 tokens
    n_rows = batch.num_rows
    codes, tlen = _flat_codes(toks.flatten())
    row_idx = np.repeat(np.arange(n_rows), lengths)
    tot_chars = np.zeros(n_rows, dtype=np.int64)
    np.add.at(tot_chars, row_idx, tlen)
    denom_chars = np.maximum(tot_chars, 1)

    # top n-gram char coverage (n = 2, 3)
    top_fracs = {}
    for n in (2, 3):
        so, grp, counts, new = _ngram_groups(codes, row_idx, n)
        frac = np.zeros(n_rows, dtype=np.float64)
        if len(so):
            first_idx = so[new]
            grow = row_idx[first_idx]
            gchars = np.zeros(len(first_idx), dtype=np.int64)
            for j in range(n):
                gchars += tlen[first_idx + j]
            gcount = counts
            maxc = np.zeros(n_rows, dtype=np.int64)
            np.maximum.at(maxc, grow, gcount)
            sel = gcount == maxc[grow]
            best_chars = np.zeros(n_rows, dtype=np.int64)
            np.maximum.at(best_chars, grow[sel], gchars[sel])
            frac = (maxc * best_chars) / denom_chars
        top_fracs[n] = frac

    # duplicated 5-gram coverage: spans never cross rows (groups are
    # within-row), so one global difference array marks covered tokens
    so, grp, counts, _new = _ngram_groups(codes, row_idx, 5)
    frac5 = np.zeros(n_rows, dtype=np.float64)
    if len(so):
        dup_starts = so[counts[grp] >= 2]
        if len(dup_starts):
            cov = np.zeros(len(codes) + 5, dtype=np.int64)
            np.add.at(cov, dup_starts, 1)
            np.add.at(cov, dup_starts + 5, -1)
            covered = np.cumsum(cov[:len(codes)]) > 0
            cov_chars = np.zeros(n_rows, dtype=np.int64)
            np.add.at(cov_chars, row_idx[covered], tlen[covered])
            frac5 = cov_chars / denom_chars

    # duplicate lines
    lines = _lines if _lines is not None else pc.split_pattern(
        pc.cast(batch[line_col or text_col], pa.string()), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = np.nan_to_num(pc.list_value_length(lines)
                            .to_numpy(zero_copy_only=False),
                            nan=0).astype(np.int64)  # null text -> 0 lines
    lcodes, llen = _flat_codes(lines.flatten())
    lrow = np.repeat(np.arange(n_rows), n_lines)
    n_distinct = np.zeros(n_rows, dtype=np.int64)
    dup_chars = np.zeros(n_rows, dtype=np.int64)
    tot_lchars = np.zeros(n_rows, dtype=np.int64)
    np.add.at(tot_lchars, lrow, llen)
    if len(lcodes):
        order = np.lexsort((lcodes, lrow))
        r = lrow[order]
        f = lcodes[order]
        new = np.ones(len(f), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
        np.add.at(n_distinct, r[new], 1)
        # repeat occurrences carry their line's chars
        np.add.at(dup_chars, r[~new], llen[order][~new])
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "dup_line_frac": pa.array(
            (n_lines - n_distinct) / np.maximum(n_lines, 1), pa.float64()),
        "dup_line_char_frac": pa.array(
            dup_chars / np.maximum(tot_lchars, 1), pa.float64()),
        "top_2gram_char_frac": pa.array(top_fracs[2], pa.float64()),
        "top_3gram_char_frac": pa.array(top_fracs[3], pa.float64()),
        "dup_5gram_char_frac": pa.array(frac5, pa.float64()),
    })


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(batch: pa.Table, text_col: str = "text",
                   line_col: str | None = None,
                   _toks: pa.Array | None = None,
                   _lines: pa.Array | None = None) -> pa.Table:
    """Non-repetition Gopher quality signals (Rae et al. 2021,
    arXiv:2112.11446 §A1.1), one row per doc:

    - ``mean_word_len`` — mean token length in chars (rule: 3..10);
    - ``alpha_word_frac`` — fraction of tokens containing at least one
      ASCII letter (rule: >= 0.80);
    - ``symbol_word_ratio`` — (# of ``#`` + # of ``...`` occurrences,
      non-overlapping) / tokens (rule: <= 0.10);
    - ``stop_hits`` — how many of the eight required English stop words
      appear at least once, case-insensitive (rule: >= 2);
    - ``bullet_line_frac`` — lines starting with ``- `` or a bullet
      glyph (rule: <= 0.90 must NOT start with one);
    - ``ellipsis_line_frac`` — lines ending with ``...`` (rule: <= 0.30).

    Same contract as :func:`gopher_repetition`: vectorized streaming map
    (Arrow RE2 for the letter test, numpy boundary counts for the rest),
    no shuffle and no state, so at 100 TB this composes into the hygiene
    flow as a pure filter stage. Word counts themselves are already
    emitted by :func:`quality_score` (``n_tokens``)."""
    toks = _toks if _toks is not None else pc.split_pattern(
        pc.cast(batch[text_col], pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = np.nan_to_num(pc.list_value_length(toks)
                            .to_numpy(zero_copy_only=False),
                            nan=0).astype(np.int64)  # null text -> 0 tokens
    n_rows = batch.num_rows
    row_idx = np.repeat(np.arange(n_rows), lengths)
    flat_arrow = toks.flatten()
    tlen = pc.utf8_length(flat_arrow).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_tok = np.maximum(lengths.astype(np.int64), 1)
    tot_chars = np.zeros(n_rows, dtype=np.int64)
    np.add.at(tot_chars, row_idx, tlen)

    alpha = pc.match_substring_regex(flat_arrow, "[a-zA-Z]") \
        .to_numpy(zero_copy_only=False)
    alpha_cnt = np.zeros(n_rows, dtype=np.int64)
    if len(tlen):
        np.add.at(alpha_cnt, row_idx[alpha], 1)

    text_arr = pc.cast(batch[text_col], pa.string())
    n_sym = pc.fill_null(pc.count_substring(text_arr, "#"), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_sym = n_sym + pc.fill_null(pc.count_substring(text_arr, "..."), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)

    stop_hits = np.zeros(n_rows, dtype=np.int64)
    if len(tlen):
        low = pc.utf8_lower(flat_arrow)
        for w in GOPHER_STOPWORDS:
            m = pc.equal(low, w).to_numpy(zero_copy_only=False)
            present = np.zeros(n_rows, dtype=bool)
            present[row_idx[m]] = True
            stop_hits += present

    lines = _lines if _lines is not None else pc.split_pattern(
        pc.cast(batch[line_col or text_col], pa.string()), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = np.nan_to_num(pc.list_value_length(lines)
                            .to_numpy(zero_copy_only=False),
                            nan=0).astype(np.int64)  # null text -> 0 lines
    lflat = lines.flatten()
    lrow = np.repeat(np.arange(n_rows), n_lines)
    bullet = pc.or_(pc.starts_with(lflat, "- "),
                    pc.starts_with(lflat, "• ")) \
        .to_numpy(zero_copy_only=False)
    ellip = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    n_bullet = np.zeros(n_rows, dtype=np.int64)
    n_ellip = np.zeros(n_rows, dtype=np.int64)
    if len(lrow):
        np.add.at(n_bullet, lrow[bullet], 1)
        np.add.at(n_ellip, lrow[ellip], 1)
    denom_lines = np.maximum(n_lines, 1)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "mean_word_len": pa.array(tot_chars / n_tok, pa.float64()),
        "alpha_word_frac": pa.array(alpha_cnt / n_tok, pa.float64()),
        "symbol_word_ratio": pa.array(n_sym / n_tok, pa.float64()),
        "stop_hits": pa.array(stop_hits, pa.int64()),
        "bullet_line_frac": pa.array(n_bullet / denom_lines, pa.float64()),
        "ellipsis_line_frac": pa.array(n_ellip / denom_lines, pa.float64()),
    })


def fingerprint(batch: pa.Table, col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(doc_id, fp) — md5 content fingerprint (mirrors DuckDB ``md5``)."""
    # md5(NULL) IS NULL in the DuckDB mirror — propagate, don't coerce
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None
           else None for t in batch[col].to_pylist()]
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
        # value_sets built ONCE (the class's whole point): predict_batch
        # must not re-sort/re-materialize 4 marker arrays per batch
        self._value_sets = [(lang, pa.array(sorted(self.markers[lang])))
                            for lang in sorted(self.markers)]

    def predict(self, text: str | None) -> str:
        toks = ([w.lower() for w in self.word_re.findall(text)]
                if text is not None else [])
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang in sorted(self.markers):
            hits = sum(t in self.markers[lang] for t in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def predict_batch(self, texts: "pa.Array | pa.ChunkedArray") -> pa.Array:
        """Vectorized ``predict`` over a whole column: one RE2 split, one
        ``is_in`` per language over the flattened tokens, segment sums by
        cumsum-at-offsets (robust to empty segments), argmax with the same
        first-max-in-sorted-lang-order tie rule as the serial fold.
        ``predict`` stays as the serial reference; parity is pinned by
        test_text_analysis."""
        texts = pc.cast(texts, pa.string())
        toks = pc.split_pattern_regex(texts, "[^a-zA-Z]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # .offsets are logical (slice-adjusted) indices into the FULL
        # .values child, so cumsum-over-values + offset differences are
        # correct for any array offset; edge empties ("" around a match)
        # never hit a marker set, matching findall semantics
        flat = pc.utf8_lower(toks.values)
        off = toks.offsets.to_numpy().astype(np.int64)
        langs = [lang for lang, _ in self._value_sets]
        hits = np.zeros((len(toks), len(langs)), dtype=np.int64)
        for j, (_, vs) in enumerate(self._value_sets):
            m = pc.fill_null(pc.is_in(flat, value_set=vs), False)
            c = np.concatenate((
                [0], np.cumsum(m.to_numpy(zero_copy_only=False)
                               .astype(np.int64))))
            hits[:, j] = c[off[1:]] - c[off[:-1]]
        preds = np.array(langs, dtype=object)[hits.argmax(axis=1)]
        preds[hits.max(axis=1) == 0] = "unknown"  # covers null text too
        return pa.array(preds, pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "pred_lang": self.predict_batch(batch["text"]),
        })


def lang_id_stage(docs: "ray.data.Dataset", concurrency=None
                  ) -> "ray.data.Dataset":
    from kg_gen_ray.stages.common import elastic_concurrency
    return docs.map_batches(LangId, batch_format="pyarrow",
                            concurrency=elastic_concurrency(concurrency))


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

    from kg_gen_ray.stages.common import coalesce

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks = _pc.split_pattern(_pc.cast(t["text"], pa.string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        import numpy as _np
        lengths = _np.nan_to_num(
            _pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            nan=0).astype(_np.int64)  # null text -> 0 tokens
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
        lengths = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)  # null text -> 0
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
        for b in stats.iter_batches(batch_format="pyarrow", batch_size=None):
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

    # bucket-hashed top-k: per-doc map_groups would pay ms-scale Python
    # overhead per DOCUMENT — the exact cardinality this join dual
    # exists to scale to; one bucket holds many docs and the per-doc
    # head(k) is a vectorized pandas cumcount mask
    from kg_gen_ray.stages.common import default_buckets, hash_bucket_array
    n_buckets = default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", hash_bucket_array(t["doc_id"], n_buckets))

    def topk(g: _pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True], kind="stable")
        g = g[g.groupby("doc_id", sort=False).cumcount() < k]
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype="int64"),
                               pa.int64()),
            "term": pa.array(g["term"].astype(str), pa.string()),
            "tfidf": pa.array(g["tfidf"].to_numpy(dtype="float64"),
                              pa.float64()),
        })

    return joined.map_batches(score, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(topk, batch_format="pandas") \
        .select_columns(["doc_id", "term", "tfidf"])
