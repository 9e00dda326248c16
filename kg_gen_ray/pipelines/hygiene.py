"""End-to-end training-data hygiene pipeline.

The composition a pretraining-data team actually runs over a crawl,
assembled from the engine's operator families in the canonical order —
each stage a streaming Ray Data transform, so the corpus flows through
with backpressure and nothing materializes except the tiny survivor-id
and benchmark intermediates:

0. **URL dedup** (optional, ``url_col=``): drop re-crawls of the same
   page by C4-normalized URL — the cheapest dedup signal, so it runs
   before anything touches the text,
1. **scrub** PII (vectorized RE2 redaction — rewrite before any hashing
   so fingerprints reflect the text that will actually ship),
2. **decontaminate** against the eval benchmark (k-gram flags; broadcast
   searchsorted or bloom+semi-join dual, size-selected),
3. **near-dup dedup** (MinHash-LSH -> components -> keep-lowest; the
   batch path — use :class:`kg_gen_ray.state.dedup_index.
   StreamingDedupIndex` instead for incremental ingest),
4. **stratified cap** per group (language/domain budget, deterministic
   smallest-md5 selection),
5. **pack** into token-budget training sequences (greedy whole-doc fold
   per shard).

Returns the packed assignment plus the per-stage row counts — the audit
trail that belongs next to every prepared dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data


@dataclass
class HygieneResult:
    packed: "ray.data.Dataset"      # (group, doc_id, seq_id, n_tokens)
    clean_docs: "ray.data.Dataset"  # scrubbed, decontaminated, deduped, capped
    counts: dict = field(default_factory=dict)   # stage -> rows surviving


# threshold key -> (signal column, keep-if comparison)
_GOPHER_QUALITY_RULES = {
    "min_mean_word_len": ("mean_word_len", "ge"),
    "max_mean_word_len": ("mean_word_len", "le"),
    "min_alpha_word_frac": ("alpha_word_frac", "ge"),
    "max_symbol_word_ratio": ("symbol_word_ratio", "le"),
    "min_stop_hits": ("stop_hits", "ge"),
    "max_bullet_line_frac": ("bullet_line_frac", "le"),
    "max_ellipsis_line_frac": ("ellipsis_line_frac", "le"),
}
_GOPHER_REPETITION_RULES = {
    "max_dup_line_frac": ("dup_line_frac", "le"),
    "max_dup_line_char_frac": ("dup_line_char_frac", "le"),
    "max_top_2gram_char_frac": ("top_2gram_char_frac", "le"),
    "max_top_3gram_char_frac": ("top_3gram_char_frac", "le"),
    "max_dup_5gram_char_frac": ("dup_5gram_char_frac", "le"),
}


def _gopher_filter(ds: "ray.data.Dataset", rules: dict,
                   text_col: str) -> "ray.data.Dataset":
    """Drop rows failing any of the Gopher quality/repetition thresholds
    — one streaming ``map_batches`` pass (the signal kernels are
    within-doc, so no shuffle and no state). Signals are computed on a
    positional view of the batch, so the caller's id column can be any
    name or type."""
    unknown = set(rules) - set(_GOPHER_QUALITY_RULES) \
        - set(_GOPHER_REPETITION_RULES)
    if unknown:
        raise ValueError(f"unknown gopher_rules keys: {sorted(unknown)}")
    from kg_gen_ray.functions.text_analysis import gopher_signals
    q_rules = {k: v for k, v in rules.items() if k in _GOPHER_QUALITY_RULES}
    r_rules = {k: v for k, v in rules.items()
               if k in _GOPHER_REPETITION_RULES}

    def keep(t, x=text_col, q_rules=q_rules, r_rules=r_rules):
        import numpy as np
        import pyarrow as pa

        view = pa.table({
            "doc_id": pa.array(np.arange(t.num_rows), pa.int64()),
            "text": t[x]})
        qt, rt = gopher_signals(view, quality=bool(q_rules),
                                repetition=bool(r_rules))
        ok = np.ones(t.num_rows, dtype=bool)
        for table, rule_map, sig in (
                (q_rules, _GOPHER_QUALITY_RULES, qt),
                (r_rules, _GOPHER_REPETITION_RULES, rt)):
            for key, thresh in table.items():
                col, cmp = rule_map[key]
                vals = sig[col].to_numpy(zero_copy_only=False)
                ok &= (vals >= thresh) if cmp == "ge" else (vals <= thresh)
        return t.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


def prepare_training_data(docs: "ray.data.Dataset",
                          benchmark: "ray.data.Dataset | None" = None,
                          k_contam: int = 8,
                          group_col: str = "lang",
                          per_group_cap: int | None = None,
                          max_tokens: int = 2048,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          url_col: str | None = None,
                          dedup_method: str = "fast",
                          c4_rules: bool = False,
                          gopher_rules: dict | None = None,
                          dedup_paragraphs: bool = False,
                          span_k: int | None = None,
                          min_lm_score_micro: int | None = None,
                          count_stages: bool = True) -> HygieneResult:
    """Run the hygiene flow. ``benchmark=None`` skips decontamination;
    ``per_group_cap=None`` skips the stratified cap; ``url_col`` (when
    set) prepends URL-normalized re-crawl dedup — the cheapest dedup
    pass, so it runs before any content hashing.
    ``c4_rules=True`` runs the C4 line filter first (terminal
    punctuation / min words / javascript lines; lorem-ipsum and
    curly-brace pages dropped) — the cheapest content cut, a pure
    streaming map. ``gopher_rules`` (when set) applies the Gopher
    quality cut (Rae et al. 2021 §A1.1) to the scrubbed text — a dict of
    thresholds over the ``gopher_quality`` / ``gopher_repetition``
    columns (``min_mean_word_len``, ``max_mean_word_len``,
    ``min_alpha_word_frac``, ``max_symbol_word_ratio``,
    ``min_stop_hits``, ``max_bullet_line_frac``,
    ``max_ellipsis_line_frac``, ``max_dup_line_frac``, ``max_dup_line_char_frac``,
    ``max_top_2gram_char_frac``, ``max_top_3gram_char_frac``,
    ``max_dup_5gram_char_frac``); rows failing any rule drop in the same
    streaming pass, before any content hashing.
    ``dedup_paragraphs=True`` inserts the CCNet
    boilerplate pass (corpus-wide paragraph-level dedup, documents
    rebuilt) between the scrub and document-level dedup. ``span_k``
    (when set) runs Lee et al. duplicated-span removal at that k after
    the paragraph pass — the finer-grained sibling that catches repeats
    embedded mid-document. ``min_lm_score_micro`` (when set)
    appends the CCNet perplexity filter: the bigram LM trains on the
    already-cleaned corpus and documents whose PER-BIGRAM average score
    in micro-nats falls below the threshold are dropped.
    ``count_stages=False`` skips the per-stage counts (each count
    executes the lineage prefix once — cheap at audit time, skippable
    when only the final dataset matters).

    Tables without an integer ``id_col`` (the input_hint's url-keyed
    Common-Crawl shape): mint one first with
    ``functions.ids.mint_doc_ids`` — the paragraph/span stages pack
    (doc_id, position) into int64 keys and need ids < 2^41."""
    from kg_gen_ray.functions.decontaminate import decontaminate
    from kg_gen_ray.functions.dedup import drop_ids, near_dup_losers
    from kg_gen_ray.functions.scrub import scrub_pii
    from kg_gen_ray.functions.sessions import (
        pack_sequences, stratified_sample)
    from kg_gen_ray.functions.web import url_dedup_losers

    counts: dict = {}

    def note(name, ds):
        if count_stages:
            counts[name] = ds.count()
        return ds

    cur = note("input", docs)
    # every text-REWRITING stage (C4, paragraph dedup, span removal)
    # replaces text in place and passes the other columns through, so
    # the flow needs no reattach joins

    if url_col is not None:
        url_losers = url_dedup_losers(cur, url_col, id_col)
        cur = note("url_deduped", drop_ids(cur, url_losers, id_col))

    if c4_rules:
        from kg_gen_ray.functions.line_filter import c4_clean

        # cheapest content cut first: pure per-batch line rules, no
        # shuffle; pages and lines failing the C4 rules never reach the
        # scrub/hash stages. c4_clean replaces text in place (other
        # columns pass through), so no reattach join and no materialize
        # is forced here — it stays a streaming map
        cur = note("c4_cleaned", c4_clean(cur, text_col, id_col))

    cur = note("scrubbed", scrub_pii(cur, text_col))

    if gopher_rules is not None:
        cur = note("gopher_filtered",
                   _gopher_filter(cur, gopher_rules, text_col))

    if dedup_paragraphs:
        from kg_gen_ray.functions.paragraphs import paragraph_dedup

        # the CCNet boilerplate pass REWRITES text, so it must run
        # before any content fingerprinting; it replaces text in place
        # and passes the other columns through, so no reattach join
        cur = note("paragraph_deduped",
                   paragraph_dedup(cur, text_col=text_col,
                                   id_col=id_col).materialize())

    if span_k is not None:
        from kg_gen_ray.functions.spans import dedup_spans

        # span removal REWRITES text too, so it also precedes content
        # fingerprinting; docs emptied by coverage stay (the near-dup
        # stage collapses them into one survivor). dedup_spans replaces
        # text in place and passes the other columns through, so no
        # reattach join is needed
        cur = note("span_deduped",
                   dedup_spans(cur, k=span_k, text_col=text_col,
                               id_col=id_col).materialize())

    if benchmark is not None:
        cur = note("decontaminated",
                   decontaminate(cur, benchmark, k_contam,
                                 id_col, text_col))

    # checkpoint the scrubbed/decontaminated corpus before the dedup
    # fan-out: from here the lineage is consumed 2-3x (loser mining +
    # the drop_ids pass, twice in its bloom dual) and the upstream RE2
    # scrub / contamination passes are the most expensive maps in the
    # flow — re-executing them per consumer would dominate the run. At
    # cluster scale the same checkpoint is a per-partition Parquet write
    # (pipelines/partitioned.py), which also buys resumability; in-process
    # the object store (with spill) is the cheaper equivalent.
    cur = cur.materialize()

    # filter by the LOSER side: losers are the small set on a healthy
    # corpus, so drop_ids broadcasts and the dedup filter is one
    # streaming pass — no shuffle (filtering by survivors would
    # materialize an O(corpus) id set and force the join dual)
    losers = near_dup_losers(
        cur.map_batches(lambda t, i=id_col, x=text_col:
                        t.select([i, x]).rename_columns(["doc_id", "text"]),
                        batch_format="pyarrow"),
        method=dedup_method)
    cur = note("deduped", drop_ids(cur, losers, id_col))

    if min_lm_score_micro is not None:
        from kg_gen_ray.functions.dedup import keep_ids
        from kg_gen_ray.functions.lm import lm_score

        # checkpoint before the LM stage: training (two count passes),
        # scoring, the keep_ids pass and the audit count would otherwise
        # each re-execute the whole scrub/dedup lineage
        cur = cur.materialize()

        # CCNet perplexity filter: train the bigram LM on the deduped
        # corpus, keep documents whose average per-bigram score clears
        # the threshold (0-bigram docs score 0 and always pass)
        scores = lm_score(
            cur.map_batches(lambda t, i=id_col, x=text_col:
                            t.select([i, x])
                             .rename_columns(["doc_id", "text"]),
                            batch_format="pyarrow"))

        def passing(t):
            import pyarrow as pa
            import pyarrow.compute as pc
            avg = pc.divide(
                pc.cast(t["lm_score_micro"], pa.float64()),
                pc.cast(pc.max_element_wise(t["n_bigrams"], 1),
                        pa.float64()))
            return pa.table({"doc_id": t.filter(
                pc.greater_equal(avg, min_lm_score_micro))["doc_id"]})

        keepers = scores.map_batches(passing, batch_format="pyarrow")
        cur = note("lm_filtered", keep_ids(cur, keepers, id_col))

    if per_group_cap is not None:
        cur = note("capped",
                   stratified_sample(cur, group_col, per_group_cap,
                                     id_col, text_col))

    packed = pack_sequences(cur, max_tokens, group_col, id_col, text_col)
    return HygieneResult(packed=packed, clean_docs=cur, counts=counts)
