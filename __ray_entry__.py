"""Driver contract: entry() smoke, queries() vs oracle_sql() correctness.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in kg_gen_ray) calls ray.init()/ray.shutdown().

Every queries() entry is an implemented operator/pipeline from SURVEY.md §2
or a training-data op; the oracle SQL mirrors the exact deterministic
semantics (single-space tokenization, md5 hashing, the normalize_label
suffix chain, float64 cosine) so DuckDB reproduces results bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# -- import robustness -------------------------------------------------------
# Ray workers inherit the DRIVER's sys.path as captured at ray.init() time.
# The driver inits Ray before importing this module, possibly from a cwd
# where `kg_gen_ray` is not importable; in that case every UDF pickled by
# reference fails to deserialize on workers. Defense: make the repo
# importable in this process, then probe one worker — if it cannot import
# the package, ship the package code by value inside each serialized UDF
# (on a real cluster the package would instead be installed / shipped via
# runtime_env py_modules at job submission).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def _ensure_workers_can_import() -> None:
    import ray
    if not ray.is_initialized():
        return

    def probe() -> bool:
        import importlib.util
        return importlib.util.find_spec("kg_gen_ray") is not None

    try:
        ok = ray.get(ray.remote(num_cpus=0)(probe).remote(), timeout=60)
    except Exception:
        ok = False
    if not ok:
        import kg_gen_ray
        from ray import cloudpickle
        cloudpickle.register_pickle_by_value(kg_gen_ray)


_ensure_workers_can_import()


# ---------------------------------------------------------------------------
# shared helpers (Ray side)
# ---------------------------------------------------------------------------

def _pages(sf_dir: str):
    from kg_gen_ray.sources.pages import pages_from_documents
    return pages_from_documents(sf_dir)


def _bigram_config():
    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    # chunk_size=0: no chunk splitting, so triples are derivable from the
    # full document text (what the SQL oracle sees)
    return PipelineConfig(chunk_size=0,
                          default_extractor=ExtractorConfig(backend="bigram"),
                          extractor_concurrency=2,
                          salt_buckets=8,
                          shuffle_partitions="auto")


def _read_blocks(path: str) -> int:
    """Size-aware read parallelism (shared engine helper; see
    kg_gen_ray.stages.common.size_aware_read_blocks)."""
    from kg_gen_ray.stages.common import size_aware_read_blocks
    return size_aware_read_blocks(path)


def _docs(sf_dir: str, columns=None):
    import ray.data
    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=_read_blocks(path))


def _embeddings(sf_dir: str):
    import ray.data
    path = f"{sf_dir}/embeddings.parquet"
    return ray.data.read_parquet(path,
                                 override_num_blocks=_read_blocks(path))


def _distinct_triples(sf_dir: str):
    from kg_gen_ray.pipelines.kg_pipeline import raw_triples
    from kg_gen_ray.stages.rewrite import distinct
    raw = raw_triples(_pages(sf_dir), _bigram_config())
    return distinct(raw, ["subj", "pred", "obj"])


def _build_kg(sf_dir: str):
    from kg_gen_ray.pipelines.kg_pipeline import build_kg
    return build_kg(_pages(sf_dir), _bigram_config())


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship KG pipeline on sf0.001: documents-as-pages -> extract_text
    -> chunk -> triple extraction -> dedup -> canonicalize -> rewrite.
    Returns the canonical triples Dataset."""
    return _build_kg("/root/testdata/sf0.001").triples


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    # 63 queries, 63 oracles. The round driver checks the FIRST 50
    # entries (its fixed correctness window), so ordering is a coverage
    # decision: the 11 entries the round-4 window missed come FIRST
    # (mix_sample and seeded_shuffle had never had a driver row; the
    # other nine were green in r3), the two round-5 additions
    # (decontaminate, kg_graph_json) sit in the head for their first
    # rows, and 13 round-4-green queries are rotated to the tail — each
    # tail family keeps an in-window representative (see COVERAGE.md
    # "driver-window rotation" for the mapping). Every tail query stays
    # fully oracled here and runs in the differential fuzz campaign.
    return {
        # --- round-4 window misses, rotated in first (never-checked pair
        #     leads)
        "mix_sample": q_mix_sample,   # per-source mixture reweighting
        "seeded_shuffle": q_seeded_shuffle,  # deterministic epoch shuffle
        "hash_sample": q_hash_sample,
        "grouped_topk": q_grouped_topk,
        "token_quantiles": q_token_quantiles,
        "media_frames": q_media_frames,                # frames ⋈ probe dims
        "pricing_summary": q_pricing_summary,
        "revenue_by_region": q_revenue_by_region,
        "events_windows": q_events_windows,            # tumbling + sliding
        "events_asof": q_events_asof,                  # backward + forward
        "events_session_assign": q_events_session_assign,  # sessionize + range join
        # --- KG pipeline chain (SURVEY.md §2: S1,M1,M2,X1/X2,A1,A2,A4,J1,T3,A6)
        "kg_pages": q_kg_pages,
        "mint_doc_ids": q_mint_doc_ids,    # url -> packed-key int64 ids
        "kg_extract_text": q_kg_extract_text,
        "kg_chunks": q_kg_chunks,
        "kg_triples": q_kg_triples,
        # (kg_nodes merged into kg_degrees: nodes_table's (entity, degree)
        # is exactly kg_degrees' first two columns, so the node-table
        # derivation stays oracle-checked there; nodes_table itself remains
        # implemented + pytest-covered)
        "kg_alias_map": q_kg_alias_map,
        "kg_canonical_triples": q_kg_canonical_triples,
        "kg_graph_json": q_kg_graph_json,  # S3+S4 file round-trip
        "kg_top": q_kg_top,   # top entities (A6/T3) + top relations (A2/T3)
        "kg_degrees": q_kg_degrees,            # + kg_nodes columns
        "kg_components": q_kg_components,
        "kg_pagerank": q_kg_pagerank,
        "kg_semantic_alias": q_kg_semantic_alias,     # value-oracled via the deterministic-judge reduction
        "kg_incremental": q_kg_incremental,
        "kg_triples_llm": q_kg_triples_llm,
        # --- training-data ops: text analysis
        "text_tokens": q_text_tokens,                  # whitespace + regex tokenizers
        "text_quality": q_text_quality,                # quality scores + lang-id
        "paragraph_dedup": q_paragraph_dedup,          # CCNet boilerplate pass
        "lm_score": q_lm_score,                        # CCNet perplexity filter
        "dsir_weights": q_dsir_weights,        # DSIR importance resampling
        # (top_bigrams rotated out for hygiene_counts: its groupby-count +
        # deterministic top-k ordering shape stays oracled via
        # kg_top and tfidf_top_terms; top_ngrams remains
        # implemented + pytest-covered)
        "hygiene_counts": q_hygiene_counts,            # e2e hygiene audit
        "crawl_delta": q_crawl_delta,          # snapshot diff (recrawl planner)
        "tfidf_top_terms": q_tfidf_top_terms,
        "approx_distinct_docs": q_approx_distinct,     # HLL estimate (oracle-exact)
        # --- dedup family
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,    # + shingle counts
        "minhash_band_pairs": q_minhash_band_pairs,
        "dedup_spans": q_dedup_spans,          # Lee et al. substring dedup
        # --- serving-surface ops run through the engine (M7, S2/M3, J3,
        #     S7+M6 wikiqa CSV round-trip + clean, X7+A7 MINE eval)
        "llm_filter": q_llm_filter,
        "messages_flatten": q_messages_flatten,
        "wikiqa_clean": q_wikiqa_clean,
        "mine_accuracy": q_mine_accuracy,
        "kg_neighborhood": q_kg_neighborhood,
        "near_dup_canonical": q_near_dup_canonical,
        # --- retrieval (SURVEY §2 X4 BM25 / T2 rank fusion)
        "rank_fusion_topk": q_rank_fusion_topk,
        # --- similarity search
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,       # probed-list ANN search (X5+T1)
        "near_dup_cosine": q_near_dup_cosine,
        "decontaminate": q_decontaminate,  # benchmark k-gram leak removal
        # ================= driver-window tail (entries 51-63) =============
        # Round-4-green queries rotated OUT of the 50-entry driver
        # window; each keeps an in-window representative of its family
        # (COVERAGE.md "driver-window rotation"). All stay oracled +
        # fuzz-covered; /tmp-style full-registry verify runs check them.
        "semdedup": q_semdedup,       # embedding-dedup family: near_dup_cosine in-window
        "bm25_scores": q_bm25_scores,  # X4: bm25 ranks are rank_fusion_topk's first leg
        "kg_triples_raw": q_kg_triples_raw,        # pre-dedup stage of kg_triples
        "kg_triples_routed": q_kg_triples_routed,  # routing variant of kg_triples
        "kg_graph_stats": q_kg_graph_stats,        # A6 family: degrees/components/pagerank in-window
        "ppl_buckets": q_ppl_buckets,              # bucket split over lm_score's scores
        "approx_distinct_by_lang": q_approx_distinct_by_lang,  # grouped HLL (global in-window)
        "minhash_sig_fast": q_minhash_sig_fast,    # fast variant of minhash_signatures
        "doc_winnow": q_doc_winnow,                # fingerprint variant (dedup family)
        "dedup_simhash": q_dedup_simhash,          # simhash variant (dedup family)
        "near_dup_jaccard": q_near_dup_jaccard,    # verify stage inside near_dup_canonical
        "ann_topk_multi": q_ann_topk_multi,        # batched variant of ann_topk
        "ivf_assign": q_ivf_assign,                # assignment stage inside ivf_topk
    }


def q_kg_pages(sf_dir: str):
    """S1 corpus reader projection + M5 filename sanitizer: ``fname``
    sanitizes a synthetic article title (text prefix + punctuation, so the
    strip/trim/collapse rules are all exercised) with the reference's
    regex chain (``_1_download_articles.py:59-63``) as Arrow RE2 kernels —
    the oracle replays the identical pattern strings in DuckDB."""
    from kg_gen_ray.functions.web import sanitize_filenames

    def project(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        title = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(text, 0, 24), "!?", "")
        return pa.table({
            "url": t["url"],
            "lang": t["lang"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "warc_ts": t["warc_ts"],
            "fname": sanitize_filenames(title),
        })
    return _pages(sf_dir).map_batches(project, batch_format="pyarrow")


def q_mint_doc_ids(sf_dir: str):
    """Deterministic int64 id minting for the url-keyed input_hint shape
    (a real Common-Crawl page table has NO integer key, but every
    packed-key operator — paragraph/span dedup, drop_ids — wants one):
    bucket = md5-u32(url) mod 2^20 (the oracle-parity token-hash
    family), rank = ascending url order within the bucket, minted_id =
    bucket * 2^21 + rank. Collision-free at any scale, a pure function
    of the url SET (partitioning-independent), ids < 2^41 — inside the
    packed (doc_id, pos) budget. The oracle replays bucket + rank with
    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY url)."""
    from kg_gen_ray.functions.ids import mint_doc_ids

    # derive urls directly from (doc_id, lang) — the full pages mapping
    # would scan + entity-escape every text column only to drop it
    def urls(t: pa.Table) -> pa.Table:
        # same null-lang -> 'unknown' normalization as pages_from_documents
        return pa.table({"url": pc.binary_join_element_wise(
            "https://example.org/",
            pc.coalesce(pc.cast(t["lang"], pa.string()),
                        pa.scalar("unknown")),
            "/doc-", pc.utf8_lpad(
                pc.cast(t["doc_id"], pa.string()), 6, "0"), "")})

    pages = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        urls, batch_format="pyarrow")
    return mint_doc_ids(pages, key_col="url", id_col="minted_id")


def q_kg_extract_text(sf_dir: str):
    """Byte-identity invariant: extract_text(html) must equal the source
    text column for every url."""
    from kg_gen_ray.stages.extract_text import extract_text_stage
    out = extract_text_stage(_pages(sf_dir))
    return out.map_batches(
        lambda t: pa.table({"url": t["url"],
                            "text": pc.cast(t["text"], pa.string())}),
        batch_format="pyarrow")


def q_kg_chunks(sf_dir: str):
    from kg_gen_ray.stages.chunker import chunk_stage
    from kg_gen_ray.stages.extract_text import extract_text_stage
    text = extract_text_stage(_pages(sf_dir))
    return chunk_stage(text, max_chunk_size=200)


def q_kg_triples_raw(sf_dir: str):
    from kg_gen_ray.pipelines.kg_pipeline import raw_triples
    raw = raw_triples(_pages(sf_dir), _bigram_config())
    return raw.select_columns(["subj", "pred", "obj", "url"])


def q_kg_triples(sf_dir: str):
    return _distinct_triples(sf_dir)


def q_kg_alias_map(sf_dir: str):
    return _build_kg(sf_dir).alias_map


def q_kg_canonical_triples(sf_dir: str):
    return _build_kg(sf_dir).triples


def q_kg_graph_json(sf_dir: str):
    """S3+S4 Graph JSON writer/reader round-trip as a driver-oracled
    query (ref ``kg_gen.py:247-266`` save / ``139-147`` from_file): the
    canonical triples are written to a real ``graph.json`` (sorted
    lists, the reference's serialized shape), read back through
    ``read_graph_json``, and the reconstructed relations are returned —
    so the oracle (the canonical-triples SQL) checks the FILE round
    trip, not just the in-memory pipeline. Graph JSON is the
    reference's small-graph interop format; the result is
    output-sized (canonical triples), not corpus-sized."""
    import shutil
    import tempfile

    from kg_gen_ray.sources.graph_json import (read_graph_json,
                                               write_graph_json)
    triples = _build_kg(sf_dir).triples
    rows = triples.take_all()              # canonical graph: output-sized
    ents = {r["subj"] for r in rows} | {r["obj"] for r in rows}
    rels = [(r["subj"], r["pred"], r["obj"]) for r in rows]
    edges = {r["pred"] for r in rows}
    d = tempfile.mkdtemp(prefix="kg_gjson_", dir="/tmp")
    try:
        path = write_graph_json(f"{d}/graph.json", ents, rels, edges)
        doc = read_graph_json(path)
        back = sorted(doc["relations"])
        return pa.table({
            "subj": pa.array([s for s, _, _ in back], pa.string()),
            "pred": pa.array([p for _, p, _ in back], pa.string()),
            "obj": pa.array([o for _, _, o in back], pa.string()),
        })
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_kg_top(sf_dir: str):
    """Merged top-k query: top-10 canonical entities by degree (A6/T1/T3)
    + top-10 relations by triple count (A2/T3), one (kind, name, n) table.
    Both inputs are LIMIT-10 Datasets, so the final assembly is k-sized by
    construction (driver-side concat of ≤20 rows — not a collect of
    anything corpus-scaled)."""
    from kg_gen_ray.stages.materialize import top_entities
    from kg_gen_ray.stages.viz import top_relations
    res = _build_kg(sf_dir)
    te = top_entities(res.triples, 10).to_pandas()
    tr = top_relations(_distinct_triples(sf_dir), 10).to_pandas()
    return pd.DataFrame({
        "kind": ["entity"] * len(te) + ["relation"] * len(tr),
        "name": pd.concat([te["entity"].astype(str),
                           tr["pred"].astype(str)], ignore_index=True),
        "n": pd.concat([te["degree"], tr["n_triples"]],
                       ignore_index=True).astype("int64"),
    })


def q_kg_graph_stats(sf_dir: str):
    res = _build_kg(sf_dir)
    s = res.stats()
    return pd.DataFrame({
        "n_entities": pd.Series([s["n_entities"]], dtype="int64"),
        "n_triples": pd.Series([s["n_triples"]], dtype="int64"),
        "n_edge_types": pd.Series([s["n_edge_types"]], dtype="int64"),
    })


def q_kg_degrees(sf_dir: str):
    from kg_gen_ray.stages.viz import degree_table
    return degree_table(_distinct_triples(sf_dir))


def q_kg_components(sf_dir: str):
    from kg_gen_ray.stages.viz import components_table
    return components_table(_distinct_triples(sf_dir))


def q_kg_triples_routed(sf_dir: str):
    """Language-aware extractor routing (north_star): 'en' routes to the
    bigram backend, every other language to the pattern backend — which
    emits nothing on this corpus — so the distinct triples come from the
    English pages only. Exercises the per-lang actor routing end to end."""
    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    from kg_gen_ray.pipelines.kg_pipeline import raw_triples
    from kg_gen_ray.stages.rewrite import distinct
    cfg = PipelineConfig(
        chunk_size=0,
        default_extractor=ExtractorConfig(backend="pattern"),
        lang_routes={"en": ExtractorConfig(backend="bigram")},
        extractor_concurrency=2, salt_buckets=8,
        shuffle_partitions="auto")
    return distinct(raw_triples(_pages(sf_dir), cfg),
                    ["subj", "pred", "obj"])


def q_kg_pagerank(sf_dir: str):
    """Deterministic integer PageRank over the distinct-triples graph —
    integer arithmetic makes the distributed sums order-independent, so
    the result is value-exact against the serial SQL oracle."""
    from kg_gen_ray.stages.viz import pagerank
    # limits=0 force the fully distributed recurrence: the per-iteration
    # rank-onto-edges shuffle join instead of the broadcast dict, and no
    # driver-side numpy shortcut — the crawl-scale path, same oracle
    return pagerank(_distinct_triples(sf_dir), n_iter=5,
                    broadcast_limit=0, driver_limit=0)


def q_kg_semantic_alias(sf_dir: str):
    """A5/X6 scale path: embed (actor pool) -> k-means partition ->
    per-cluster retrieve-and-judge dedup.

    Oracle-checkable at driver scale by a PROVABLE reduction: with the
    deterministic norm-equality judge, when a cluster's judged chunk is
    fully covered by retrieval (``retrieval_k`` >= chunk size - 1, forced
    here with a retrieval_k far above any driver corpus's distinct-label
    count — the fuzz corpora exceed 128, which a fixed 128 missed), the
    sequential loop takes members in (len, lex) order, merges exactly each
    member's whole normalization-key family, and elects the family's
    (len, lex)-min member as representative — i.e. the output equals the
    normalize_label alias map, which IS SQL (the same _NORM CTE as
    kg_alias_map). At sf scale the distinct entity labels (<128) form one
    k-means cell, so the whole judged pipeline (embed, rank fusion, judge
    loop, map_groups) executes and is hash-checked; the kmeans-partitioned
    multi-cell regime (where retrieval truncation makes output depend on
    embedding locality, the documented trade) stays pytest-covered in
    tests/test_semantic_dedup.py."""
    from kg_gen_ray.pipelines.kg_pipeline import entity_labels
    from kg_gen_ray.stages.semantic_dedup import semantic_canonicalize
    labels = entity_labels(_distinct_triples(sf_dir))
    # one k-means cell + full retrieval coverage at ANY driver-corpus
    # size (the fixed defaults only guaranteed the reduction below 128
    # labels); the multi-cell capacity-capped regime stays pytest-covered
    return semantic_canonicalize(labels, retrieval_k=100_000,
                                 cluster_capacity=1_000_000)


def q_kg_incremental(sf_dir: str):
    """Incremental add (S5/A3): build from the first half of the corpus,
    then add the second half — must equal the one-shot batch build (the
    oracle is the same SQL as kg_canonical_triples)."""
    from kg_gen_ray.pipelines.incremental import add_pages

    pages = _pages(sf_dir)

    def split(keep: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.is_in(pc.cast(t["lang"], pa.string()),
                            value_set=pa.array(["en", "de"]))
            return t.filter(mask if keep else pc.invert(mask))
        return fn

    half1 = pages.map_batches(split(True), batch_format="pyarrow")
    half2 = pages.map_batches(split(False), batch_format="pyarrow")
    # broadcast_alias_limit=0 forces the rewrite onto its shuffle-join
    # dual (rewrite_stage_join) — this driver row exercises the scale-side
    # sibling that the size test would otherwise never select at sf scale;
    # the oracle is unchanged (the duals are pinned equal)
    import dataclasses
    cfg = dataclasses.replace(_bigram_config(), broadcast_alias_limit=0)
    first = add_pages(None, half1, cfg)
    return add_pages(first.triples, half2, cfg).triples


def q_kg_triples_llm(sf_dir: str):
    """The actor-pool LLM extraction path (stateful stage: transport/client
    built once per actor in __init__) run hermetically with a deterministic
    adjacency transport — output is SQL-expressible, so the whole
    strict-ladder + entity-post-filter machinery is oracle-checked."""
    from kg_gen_ray.config import ExtractorConfig, PipelineConfig
    from kg_gen_ray.stages.chunker import chunk_stage
    from kg_gen_ray.stages.extract import AdjacencyFakeTransport, extract_stage
    from kg_gen_ray.stages.extract_text import extract_text_stage
    from kg_gen_ray.stages.rewrite import distinct

    cfg = PipelineConfig(chunk_size=0,
                         default_extractor=ExtractorConfig(backend="llm"),
                         extractor_concurrency=2,
                         shuffle_partitions="auto")
    text = extract_text_stage(_pages(sf_dir))
    chunks = chunk_stage(text, cfg.chunk_size)
    raw = extract_stage(chunks, cfg,
                        transports={"default": AdjacencyFakeTransport()})
    return distinct(raw, ["subj", "pred", "obj"])


def q_text_tokens(sf_dir: str):
    """Both tokenizer families in one pass: whitespace token stats AND the
    BPE-ish regex count (letter runs / digit runs / single non-space
    symbols) — merged so each stays driver-oracled inside the fixed-size
    window."""
    from kg_gen_ray.functions.text_analysis import (regex_token_stats,
                                                    token_stats)

    def both(t: pa.Table) -> pa.Table:
        ws = token_stats(t)
        return ws.append_column("n_re_tokens",
                                regex_token_stats(t)["n_re_tokens"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        both, batch_format="pyarrow")


def q_text_quality(sf_dir: str):
    """Quality scoring + language-ID + Gopher repetition rules in one
    pass (lang_id's per-doc predictions stay oracle-checked via the
    appended ``pred_lang``; the LangId marker tables build once per
    actor as usual). The Gopher signals (dup-line fractions, top-2/3-gram
    char coverage, duplicated-5-gram char coverage) ride the same batch:
    repetition is a within-doc property, so the merge costs no extra
    read or shuffle. Lines are derived with the same deterministic
    ' table ' -> newline trick as paragraph_dedup (the synthetic corpus
    carries no newlines); the oracle replays the identical replace().
    The non-repetition Gopher rules (mean word length, alpha-word
    fraction, symbol-to-word ratio, required-stopword hits, bullet /
    ellipsis line fractions) ride the same batch too."""
    from kg_gen_ray.functions.text_analysis import (
        LangId, gopher_signals, quality_score)

    class QualityLang:
        def __init__(self):
            self.lang = LangId()

        def __call__(self, t: pa.Table) -> pa.Table:
            q = quality_score(t)
            q = q.append_column("pred_lang", self.lang(t)["pred_lang"])
            tl = t.append_column("line_text", pc.replace_substring(
                pc.cast(t["text"], pa.string()), " table ", "\n"))
            # one shared tokenize/line-split for both gopher kernels
            gq, g = gopher_signals(tl, line_col="line_text")
            for name in ("dup_line_frac", "dup_line_char_frac",
                         "top_2gram_char_frac", "top_3gram_char_frac",
                         "dup_5gram_char_frac"):
                q = q.append_column(name, g[name])
            for name in ("mean_word_len", "alpha_word_frac",
                         "symbol_word_ratio", "stop_hits",
                         "bullet_line_frac", "ellipsis_line_frac"):
                q = q.append_column(name, gq[name])
            return q

    # autoscaling actor pool: only LangId's marker tables need actor
    # state; a fixed tiny pool would serialize the whole query
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityLang, batch_format="pyarrow", concurrency=(2, 16))


def q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph-level dedup: corpus-wide first-occurrence
    dedup of paragraphs, documents rebuilt from their survivors (docs
    left empty drop). The synthetic documents carry no blank-line
    structure, so paragraphs are derived deterministically by treating
    the frequent token ' table ' as the separator — the oracle derives
    them with the identical replace(). (Replaces the standalone
    doc_fingerprint query: its md5-fp map is already oracle-covered
    inside dedup_exact.)"""
    from kg_gen_ray.functions.paragraphs import paragraph_dedup

    def as_paras(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.replace_substring(
                pc.cast(t["text"], pa.string()), " table ", "\n\n"),
        })

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        as_paras, batch_format="pyarrow")
    return paragraph_dedup(docs)


def q_lm_score(sf_dir: str):
    """Corpus-trained bigram-LM quality score per document in integer
    micro-nats (the CCNet perplexity filter, self-trained). Replaces the
    lang_hist query: its one-column groupby-count shape is already
    oracle-covered by pricing_summary/revenue_by_region, and the
    language histogram itself is derivable from text_quality's
    oracle-checked pred_lang column."""
    from kg_gen_ray.functions.lm import lm_score
    return lm_score(_docs(sf_dir, ["doc_id", "text"]))


def q_ppl_buckets(sf_dir: str):
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3):
    per-language perplexity terciles over the bigram-LM score —
    ``functions/lm.py:perplexity_buckets`` (integer mean micro-nats,
    exact per-language quantile_disc thresholds broadcast once)."""
    from kg_gen_ray.functions.lm import perplexity_buckets
    return perplexity_buckets(_docs(sf_dir, ["doc_id", "text", "lang"]))


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): log-likelihood ratio of
    each document under a TARGET-corpus vs SOURCE-corpus add-one unigram
    model, in exact integer micro-nats — ``functions/lm.py:dsir_weights``.
    Target = the deterministic ``doc_id % 10 == 0`` slice of documents."""
    from kg_gen_ray.functions.lm import dsir_weights
    docs = _docs(sf_dir, ["doc_id", "text"])

    def tgt(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))

    return dsir_weights(docs, docs.map_batches(tgt,
                                               batch_format="pyarrow"))


def q_top_bigrams(sf_dir: str):
    """Deregistered (rotated out for hygiene_counts); kept callable —
    top_ngrams stays implemented + pytest-covered (test_text_analysis)."""
    from kg_gen_ray.functions.text_analysis import top_ngrams
    return top_ngrams(_docs(sf_dir, ["doc_id", "text"]), n=2, k=20)


def q_hygiene_counts(sf_dir: str):
    """The end-to-end training-data hygiene COMPOSITION as one driver-
    oracled row: scrub PII -> Gopher quality cut (required-stopword +
    mean-word-length rules, both with real cut signal on this corpus) ->
    near-dup dedup (fast MinHash family) ->
    per-language stratified cap -> greedy sequence packing, auditing the
    per-stage survivor counts plus the packed output (rows + number of
    packed sequences). Every member stage already carries its own oracle;
    this row pins the COMPOSITION (pipelines/hygiene.py) — stage order,
    column threading, loser-side filtering — end to end. Decontamination
    and the C4/paragraph/LM stages are exercised by their own queries and
    the hygiene pytest suite (decontamination's polars-hash k-gram family
    is deliberately not oracle-replayable; see functions/decontaminate.py)."""
    from ray.data.aggregate import Max

    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    res = prepare_training_data(docs, benchmark=None, group_col="lang",
                                per_group_cap=8, max_tokens=2048,
                                dedup_method="fast",
                                gopher_rules={"min_stop_hits": 1,
                                              "max_mean_word_len": 5.0})
    from kg_gen_ray.functions.sessions import _arrow_group_key

    packed = res.packed.materialize()
    n_packed = packed.count()
    n_sequences = 0
    # group on the null-free surrogate: a null lang group would crash
    # Ray's sort shuffle (None < str)
    gk = packed.map_batches(
        lambda t, _agk=_arrow_group_key: t.append_column(
            "__gk", _agk(t["lang"])), batch_format="pyarrow")
    for r in gk.groupby("__gk") \
               .aggregate(Max("seq_id", alias_name="mx")).take_all():
        n_sequences += int(r["mx"]) + 1
    c = res.counts
    return pd.DataFrame({
        "n_input": pd.Series([c["input"]], dtype="int64"),
        "n_scrubbed": pd.Series([c["scrubbed"]], dtype="int64"),
        "n_gopher": pd.Series([c["gopher_filtered"]], dtype="int64"),
        "n_deduped": pd.Series([c["deduped"]], dtype="int64"),
        "n_capped": pd.Series([c["capped"]], dtype="int64"),
        "n_packed": pd.Series([n_packed], dtype="int64"),
        "n_sequences": pd.Series([n_sequences], dtype="int64"),
    })


def q_tfidf_top_terms(sf_dir: str):
    """broadcast_limit=0 forces the distributed-df/idf join dual (the
    scale-side sibling for a vocabulary larger than any broadcast);
    oracle unchanged."""
    from kg_gen_ray.functions.text_analysis import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3,
                           broadcast_limit=0)


def q_approx_distinct(sf_dir: str):
    """HLL cardinality sketch. Oracle-checked to the full float estimate:
    the md5-u64 hash family and the integer register sum make the sketch
    deterministic, so DuckDB replays registers AND estimate bit-for-bit
    (the pytest suite separately asserts the error bound vs truth)."""
    from kg_gen_ray.functions.sketch import hll_estimate
    est = hll_estimate(_docs(sf_dir, ["text"]), "text")
    return pd.DataFrame({"approx_distinct_texts": pd.Series([est],
                                                            dtype="float64")})


def q_approx_distinct_by_lang(sf_dir: str):
    """Grouped HLL (``functions/sketch.py:hll_estimate_per_group``):
    approximate distinct texts PER LANGUAGE — one mergeable register
    blob per (group, batch) rides the single exchange. Same md5-u64
    family as ``approx_distinct_docs``, so DuckDB replays every group's
    registers AND float estimate bit-for-bit via the grouped CTE."""
    from kg_gen_ray.functions.sketch import hll_estimate_per_group
    return hll_estimate_per_group(
        _docs(sf_dir, ["text", "lang"]), "text", "lang")


def q_dedup_exact(sf_dir: str):
    from kg_gen_ray.functions.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_minhash_signatures(sf_dir: str):
    """md5-family MinHash signatures + the distinct-shingle count per doc
    (shingle_stats merged in so the shingling operator keeps its own
    oracle-checked column inside the fixed-size query window)."""
    from kg_gen_ray.functions.dedup import minhash_signatures, shingle_stats

    def both(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t)
        return sig.append_column("n_shingles",
                                 shingle_stats(t)["n_shingles"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        both, batch_format="pyarrow")


def q_minhash_band_pairs(sf_dir: str):
    from kg_gen_ray.functions.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]))


def q_dedup_simhash(sf_dir: str):
    from kg_gen_ray.functions.dedup import simhash_batch
    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "simhash_hex": pa.array([f"{int(h):016x}"
                                     for h in t["simhash"].to_pylist()],
                                    pa.string())}),
        batch_format="pyarrow")


_BM25_QUERY = "table scan fast"


def q_bm25_scores(sf_dir: str):
    from kg_gen_ray.functions.bm25 import bm25_scores
    return bm25_scores(_docs(sf_dir, ["doc_id", "text"]), _BM25_QUERY)


def q_rank_fusion_topk(sf_dir: str):
    from kg_gen_ray.functions.ann import get_query_vector
    from kg_gen_ray.functions.bm25 import rank_fusion_topk
    emb = _embeddings(sf_dir)
    q = get_query_vector(emb, 0)
    top = rank_fusion_topk(_docs(sf_dir, ["doc_id", "text"]), emb,
                           _BM25_QUERY, q, k=10)
    return top.select_columns(["doc_id"])


def q_near_dup_canonical(sf_dir: str):
    """End-to-end near-dup dedup: LSH pairs -> connected components ->
    lowest-doc_id survivor per cluster. Composes on the vectorized u64
    MinHash family (still DuckDB-reproducible — see the fast-family CTEs
    in oracle_sql); the md5 hex-string family stays oracle-covered via
    minhash_signatures / minhash_band_pairs."""
    from kg_gen_ray.functions.dedup import near_dup_canonical
    return near_dup_canonical(_docs(sf_dir, ["doc_id", "text"]))


def q_llm_filter(sf_dir: str):
    """M7 LLM row filter through the actor-pool stage with the
    deterministic keyword transport (YES iff the question substring occurs
    in the row) — the full Ray path, SQL-mirrorable."""
    from kg_gen_ray.stages.extract import KeywordFilterTransport, \
        llm_filter_stage
    docs = _docs(sf_dir, ["doc_id", "text"])
    kept = llm_filter_stage(docs, "table", KeywordFilterTransport())
    return kept.select_columns(["doc_id"])


def q_messages_flatten(sf_dir: str):
    """S2/M3 conversation flattener end-to-end: documents are wrapped into
    deterministic (user, system, assistant) message arrays, flattened with
    the reference's role rules (system dropped, 'role: content' lines)."""
    from kg_gen_ray.sources.messages import conversations_to_pages

    def to_convs(t: pa.Table) -> pa.Table:
        # null text -> empty content, null lang -> 'unknown' (the page
        # ingest normalization; a None would render as the literal
        # string 'None' in the flattened line)
        msgs = [
            [{"role": "user", "content": txt or ""},
             {"role": "system", "content": "ignored"},
             {"role": "assistant", "content": f"lang={lang or 'unknown'}"}]
            for txt, lang in zip(
                pc.cast(t["text"], pa.string()).to_pylist(),
                t["lang"].to_pylist())
        ]
        return pa.table({
            "conv_id": pc.cast(t["doc_id"], pa.int64()),
            "messages": pa.array(msgs),
        })

    convs = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        to_convs, batch_format="pyarrow")
    return conversations_to_pages(convs).select_columns(["url", "text"])


def q_wikiqa_clean(sf_dir: str):
    """S7 wikiqa CSV IO + M6 clean (reference
    ``experiments/wikiqa/_1_download_articles.py:18-56``): a deterministic
    WikiQA-shaped split derived from ``documents`` round-trips through a
    real per-block CSV write + read (types survive Arrow CSV inference on
    both ends), then the distributed clean — label==1 filter + keep-first
    per question_id. The result is one row per distinct question by
    construction, so returning pandas is output-sized, not corpus-sized."""
    import shutil
    import tempfile

    from kg_gen_ray.sources.wikiqa import (clean_split, read_split_csv,
                                           synth_wikiqa_split,
                                           write_split_csv)
    split = synth_wikiqa_split(_docs(sf_dir, ["doc_id", "text"]))
    d = tempfile.mkdtemp(prefix="kg_wikiqa_", dir="/tmp")
    try:
        write_split_csv(split, d)
        return clean_split(read_split_csv(d)).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q_mine_accuracy(sf_dir: str):
    """X7 MINE answer-judge + A7 accuracy (reference
    ``experiments/MINE/evaluation.py:18-76``): (answer, context) pairs from
    documents — even doc_id gets an answer guaranteed present (a text
    prefix), odd an absent token — judged on the real actor-pool path with
    the deterministic containment transport; A7's mean rides as an exact
    integer micro-unit column. Only (pair_id, evaluation) is materialized
    between the two consumers (the rows and the aggregate), never text."""
    from kg_gen_ray.stages.mine_eval import (ContainmentJudgeTransport,
                                             accuracy_micro,
                                             answer_judge_stage)

    def pairs(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        text = pc.cast(t["text"], pa.string())
        even = pc.equal(pc.bit_wise_and(did, 1), 0)
        return pa.table({
            "pair_id": did,
            "correct_answer": pc.if_else(
                even, pc.utf8_slice_codeunits(text, 0, 12),
                pc.binary_join_element_wise(
                    "zzq", pc.cast(did, pa.string()), "")),
            "context": text,
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow")
    judged = answer_judge_stage(ds, ContainmentJudgeTransport(),
                                concurrency=2) \
        .select_columns(["pair_id", "evaluation"]).materialize()
    _, _, mic = accuracy_micro(judged)

    def attach(t: pa.Table, mic=mic) -> pa.Table:
        return pa.table({
            "pair_id": t["pair_id"],
            "evaluation": t["evaluation"],
            "accuracy_micro": pa.array([mic] * t.num_rows, pa.int64()),
        })

    return judged.map_batches(attach, batch_format="pyarrow")


def q_kg_neighborhood(sf_dir: str):
    """J3 retrieval context: 2-hop neighborhood of the lexicographically
    smallest subject in the distinct-triples graph."""
    from ray.data.aggregate import Min

    from kg_gen_ray.pipelines.query import neighborhood
    triples = _distinct_triples(sf_dir).materialize()
    # distributed min: only one scalar reaches the driver (never the
    # whole subject column)
    seed = triples.select_columns(["subj"]).aggregate(Min("subj"))["min(subj)"]
    # broadcast_limit=0 forces the Bloom + left_semi join frontier dual
    # (the hub-entity scale path); oracle unchanged
    return neighborhood(triples, {seed}, depth=2, broadcast_limit=0)


def q_near_dup_jaccard(sf_dir: str):
    """LSH candidate pairs (md5 oracle-parity family) verified by exact
    n-gram Jaccard >= 0.8 — the classic two-stage near-dup filter."""
    from kg_gen_ray.functions.dedup import jaccard_verify, minhash_lsh_pairs
    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs)
    # broadcast_limit=0 forces the shingle-join verification dual (the
    # dup-heavy-corpus sibling); oracle unchanged
    return jaccard_verify(docs, pairs, threshold=0.8, broadcast_limit=0)


def q_dedup_spans(sf_dir: str):
    """Exact duplicated-span removal (Lee et al. 2021 substring dedup,
    token-8-gram variant, ``functions/spans.py``): every 8-token span
    occurring >= 2x corpus-wide keeps only its minimum-(doc_id, pos)
    occurrence; other occurrences' tokens drop and docs rebuild from the
    survivors. The oracle replays the same md5-u32 Horner k-gram hash
    family the fast-MinHash oracle uses (closed-form coefficients from
    ``span_hash_coeffs``)."""
    from kg_gen_ray.functions.spans import dedup_spans
    return dedup_spans(_docs(sf_dir, ["doc_id", "text"]), k=8)


def q_doc_winnow(sf_dir: str):
    """MOSS-style winnowing fingerprints (window-4 minima over the u64
    3-gram shingle hashes) — the rolling-hash document-fingerprint family
    from the training-data brief, exploded (doc_id, fp)."""
    from kg_gen_ray.functions.fast_text import winnow_fingerprints
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        winnow_fingerprints, batch_format="pyarrow")


def q_minhash_sig_fast(sf_dir: str):
    """Oracle-parity u64 MinHash signatures (md5-u32 token hashes + u64
    affine mixing, one md5 per unique token per batch)."""
    from kg_gen_ray.functions.fast_text import minhash_signatures_fast
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        minhash_signatures_fast, batch_format="pyarrow")



def q_ann_topk(sf_dir: str):
    from kg_gen_ray.functions.ann import brute_force_topk, get_query_vector
    emb = _embeddings(sf_dir)
    q = get_query_vector(emb, 0)
    top = brute_force_topk(emb, q, k=10)
    return top[["vec_id"]]


def q_ann_topk_multi(sf_dir: str):
    """Batched-query ANN (``functions/ann.py:brute_force_topk_multi``):
    one broadcast (Q, d) query matrix, one corpus scan, per-block
    per-query partial top-k. Queries = vectors 0/5/9, k=5."""
    from kg_gen_ray.functions.ann import brute_force_topk_multi
    from kg_gen_ray.stages.common import drop_null_rows
    emb = _embeddings(sf_dir)
    # a null query vector has no top-k: drop it from the query set (same
    # WHERE as the oracle's q CTE)
    qrows = drop_null_rows(emb, "embedding") \
        .filter(expr="vec_id == 0 or vec_id == 5 or vec_id == 9") \
        .sort("vec_id").take_all()
    qm = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                   for r in qrows])
    top = brute_force_topk_multi(
        emb, qm, k=5, query_ids=np.asarray([r["vec_id"] for r in qrows]))
    return top[["query_id", "vec_id"]]


def _seed_cents(emb) -> np.ndarray:
    """First-8-vectors centroid convention, null-safe: a NULL embedding
    cannot seed a centroid (np.stack would shape-error on the object
    row) — drop nulls first, same WHERE as the oracle CTEs."""
    from kg_gen_ray.stages.common import drop_null_rows
    rows = drop_null_rows(emb, "embedding") \
        .filter(expr="vec_id < 8").sort("vec_id").take_all()
    return np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in rows])


def q_ivf_assign(sf_dir: str):
    from kg_gen_ray.functions.ann import ivf_assign
    emb = _embeddings(sf_dir)
    return ivf_assign(emb, _seed_cents(emb))


def q_ivf_topk(sf_dir: str):
    """X5/T1 composed: probe the 3 centroids nearest the query, search
    only vectors ASSIGNED to those lists (assignment + filter fused in
    one broadcast map pass — ``functions/ann.py:ivf_topk``), exact
    cosine top-k over the survivors. The oracle replays probe ->
    assignment -> restricted top-k in SQL."""
    from kg_gen_ray.functions.ann import get_query_vector, ivf_topk
    emb = _embeddings(sf_dir)
    q = get_query_vector(emb, 0)
    return ivf_topk(emb, _seed_cents(emb), q, k=10, n_probe=3)[["vec_id"]]


def q_near_dup_cosine(sf_dir: str):
    from kg_gen_ray.functions.ann import cosine_near_dup_pairs
    return cosine_near_dup_pairs(_embeddings(sf_dir), threshold=0.3)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix C / Gopher A.5 style):
    surviving doc ids after dropping every doc that shares an 8-token
    k-gram with the benchmark set — here the deterministic
    ``doc_id % 41 == 0`` subset of the corpus itself, so the oracle can
    derive the identical benchmark. The engine matches on u64
    token-hash Horner k-grams (``functions/decontaminate.py`` — the
    broadcast-searchsorted fast path with the bloom/semi-join dual);
    hash equality of k-token tuples is string equality of the
    ' '-joined grams, which the oracle replays literally."""
    from kg_gen_ray.functions.decontaminate import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_sel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 41 == 0))

    bench = docs.map_batches(bench_sel, batch_format="pyarrow")
    return decontaminate(docs, bench).select_columns(["doc_id"])


def q_semdedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540) — cluster-pruned embedding dedup:
    broadcast-centroid assignment, then within-cluster-only cosine
    dominance (``functions/ann.py:semdedup``). Fixed centroids (the
    first 8 vectors, same convention as ``ivf_assign``) keep the whole
    composition SQL-replayable; ``keep`` is int64 0/1."""
    from kg_gen_ray.functions.ann import semdedup
    emb = _embeddings(sf_dir)
    return semdedup(emb, _seed_cents(emb), threshold=0.3)



def _media(sf_dir: str):
    """documents -> media rows (binary payload = UTF-8 text bytes)."""
    def to_media(t: pa.Table) -> pa.Table:
        # null text -> empty payload (a crashed per-row encode would put
        # the actor pool into a restart loop, not a clean failure)
        texts = [(s or "").encode("utf-8") for s in
                 pc.cast(t["text"], pa.string()).to_pylist()]
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.int64()),
            "media_type": pa.array(["image/png"] * t.num_rows, pa.string()),
            "content": pa.array(texts, pa.binary()),
        })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow")


def q_media_frames(sf_dir: str):
    """Both multimodal actor-pool stages in one result: the row-expanding
    frame sampler joined (on media_id) with the header probe's dims, so
    decode-probe AND frame-sample plumbing are driver-oracled in a single
    query. FakeCodec is SQL-reproducible: dims from md5(payload) digest
    bytes, frame payloads are md5 digests emitted hex-encoded so DuckDB
    checks the actual frame bytes, not just the row expansion."""
    import ray as _ray

    from kg_gen_ray.stages.multimodal import frame_sample_stage, probe_stage
    media = _media(sf_dir)
    frames = frame_sample_stage(media, n_frames=3).map_batches(
        lambda t: pa.table({
            "media_id": pc.cast(t["media_id"], pa.int64()),
            "frame_id": pc.cast(t["frame_id"], pa.int64()),
            "frame_md5": pa.array(
                [fr.hex() for fr in t["frame"].to_pylist()], pa.string()),
        }), batch_format="pyarrow")
    probe = probe_stage(media).map_batches(
        lambda t: pa.table({
            "media_id": pc.cast(t["media_id"], pa.int64()),
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
        }), batch_format="pyarrow")
    n_parts = max(2, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    return frames.repartition(n_parts) \
        .join(probe.repartition(n_parts), join_type="inner",
              on=("media_id",), num_partitions=n_parts)


def q_pricing_summary(sf_dir: str):
    from kg_gen_ray.pipelines.relational import pricing_summary
    return pricing_summary(sf_dir)


def q_revenue_by_region(sf_dir: str):
    from kg_gen_ray.pipelines.relational import revenue_by_region
    return revenue_by_region(sf_dir)



def q_token_quantiles(sf_dir: str):
    """Per-language token-count percentiles (exact discrete quantiles)."""
    from kg_gen_ray.functions.sessions import grouped_quantiles
    from kg_gen_ray.functions.text_analysis import token_stats

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def with_tokens(t: pa.Table) -> pa.Table:
        ts = token_stats(t)
        return pa.table({"lang": t["lang"], "n_tokens": ts["n_tokens"]})

    enriched = docs.map_batches(with_tokens, batch_format="pyarrow")
    return grouped_quantiles(enriched, "lang", "n_tokens")


def q_events_windows(sf_dir: str):
    """Tumbling 1-hour windows AND 1-hour windows sliding every 30 min, in
    one unioned result keyed by ``window_kind`` (both window families stay
    driver-oracled inside the fixed-size query window). value is converted to
    integer cents PER ROW before the distributed Sum (same as
    pricing_summary), so float summation order cannot flip the hash at any
    scale — a float64 sum rounded after the fact diverges from the oracle
    once a window's accumulated error crosses half a cent."""
    import ray.data
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"],
                               override_num_blocks=_read_blocks(path))

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "ts": t["ts"],
            # half AWAY from zero = DuckDB round(); the default
            # half-to-even diverges on exact .5 cent values
            "cents": pc.cast(pc.round(
                pc.multiply(t["value"], pa.scalar(100.0)),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    cents = ds.map_batches(to_cents, batch_format="pyarrow")

    # both window families from ONE shuffle (tumbling = sliding with
    # slide == window): the fused row-expansion + single groupby replaces
    # two independent exchanges AND the second pass over the input
    from kg_gen_ray.functions.windows import multi_window
    fused = multi_window(cents,
                         [("tumbling_1h", 3600, 3600),
                          ("sliding_1h_30m", 3600, 1800)],
                         value_col="cents")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_kind": t["window_kind"],
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_cents": pc.cast(t["sum_cents"], pa.int64()),
        })

    return fused.map_batches(project, batch_format="pyarrow")


def q_events_asof(sf_dir: str):
    """BOTH as-of directions in one unioned result keyed by ``direction``:
    backward (latest order by customer at or before the event) and forward
    (earliest order at or after) — the same bucketed merge_asof
    composition, each direction staying driver-oracled inside the fixed-size
    window. Right side pre-reduced to one row per (custkey, orderdate) so
    the match is unambiguous."""
    import ray.data

    from kg_gen_ray.functions.windows import asof_join
    epath = f"{sf_dir}/events.parquet"
    opath = f"{sf_dir}/orders.parquet"
    events = ray.data.read_parquet(epath, columns=["event_id", "user_id", "ts"],
                                   override_num_blocks=_read_blocks(epath))
    orders = ray.data.read_parquet(
        opath, columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_read_blocks(opath))

    def max_per_key_ts(refs):
        # disambiguate duplicate (custkey, orderdate) rows in-bucket —
        # replaces a whole Ray pre-aggregation pass over orders
        return refs.groupby(["__key", "__ts"], as_index=False).max()

    # both directions from ONE shuffle: the bucketed union/groupby runs
    # once and each direction is an extra merge_asof over the
    # already-sorted per-bucket frames (was: two full asof_join exchanges)
    joined = asof_join(events, orders, key_col="user_id", ts_col="ts",
                       right_ts_col="o_orderdate",
                       right_value_cols=["o_totalprice"],
                       right_key_col="o_custkey",
                       right_reduce=max_per_key_ts,
                       directions=("backward", "forward"))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["l_event_id"], pa.int64()),
            "direction": pc.cast(t["direction"], pa.string()),
            "totalprice": pc.cast(t["r_o_totalprice"], pa.float64()),
        })

    return joined.map_batches(project, batch_format="pyarrow")


def q_events_session_assign(sf_dir: str):
    """Sessionization + range join in one result: each event attached to
    the gap-based (30-min timeout) session interval containing its
    timestamp, carrying the session's bounds and size — so the sessionize
    aggregates AND the per-event range-join assignment are both
    driver-oracled in a single query."""
    import ray.data

    from kg_gen_ray.functions.sessions import sessionize
    from kg_gen_ray.functions.windows import range_join
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_id", "user_id", "ts"],
                               override_num_blocks=_read_blocks(path))
    sessions = sessionize(ds, gap_sec=1800)
    joined = range_join(ds, sessions, key_col="user_id", ts_col="ts",
                        start_col="session_start", end_col="session_end",
                        payload_cols=["session_id", "session_start",
                                      "session_end", "n_events"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["l_event_id"], pa.int64()),
            "session_id": pc.cast(t["p_session_id"], pa.int64()),
            "session_start": t["p_session_start"],
            "session_end": t["p_session_end"],
            "session_n_events": pc.cast(t["p_n_events"], pa.int64()),
        })

    return joined.map_batches(project, batch_format="pyarrow")


def q_mix_sample(sf_dir: str):
    """Data-mixture reweighting (``functions/sessions.py:mix_sample``):
    per-language keep rates en 0.9 / de 0.5 / fr 0.25 / zh 0.1, with es
    deliberately ABSENT from the mix (unseen-source drop path). Seeded
    md5-u32 thresholds, SQL-mirrored exactly."""
    from kg_gen_ray.functions.sessions import mix_sample
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    out = mix_sample(docs, "lang",
                     rates={"en": 0.9, "de": 0.5, "fr": 0.25, "zh": 0.1})

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "lang": pc.cast(t["lang"], pa.string()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


def q_hash_sample(sf_dir: str):
    """Deterministic sampling family, one result keyed by ``method``:
    50% content-hash sample (method='hash') UNION a per-language
    stratified cap of 8 docs chosen by smallest content hash
    (method='stratified') — both replayable, both SQL-mirrored."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kg_gen_ray.functions.sessions import hash_sample, stratified_sample

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def tag(method):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "method": pa.array([method] * t.num_rows, pa.string()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
            })
        return fn

    h = hash_sample(docs, keep_mod=5, mod=10) \
        .map_batches(tag("hash"), batch_format="pyarrow")
    s = stratified_sample(docs, "lang", cap=8) \
        .map_batches(tag("stratified"), batch_format="pyarrow")
    return h.union(s)


def q_crawl_delta(sf_dir: str):
    """Snapshot-to-snapshot crawl diff (``functions/web.py:crawl_delta``):
    two synthetic snapshots derived deterministically from the documents
    table — old = doc_id % 10 != 0, new = doc_id % 10 != 1 with text
    amended (' v2') when doc_id % 7 == 0 — so all three statuses appear:
    added (% 10 == 0), removed (% 10 == 1), changed (% 7 == 0 survivors).
    The oracle replays the same per-url min(md5(text)) FULL OUTER JOIN."""
    from kg_gen_ray.functions.web import crawl_delta

    docs = _docs(sf_dir, ["doc_id", "text"])

    def snapshot(drop_mod: int, amend: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np  # no Arrow mod kernel; numpy does the %
            ids = pc.cast(t["doc_id"], pa.int64())
            base = pa.table({"doc_id": ids, "text": t["text"]}) \
                     .filter(pc.is_valid(ids))
            idn = base["doc_id"].to_numpy(zero_copy_only=False)
            t2 = base.filter(pa.array(idn % 10 != drop_mod))
            ids2 = t2["doc_id"]
            url = pc.binary_join_element_wise(
                "https://ex.com/d/", pc.cast(ids2, pa.string()), "")
            text = pc.cast(t2["text"], pa.string())
            if amend:
                amended = pc.binary_join_element_wise(text, " v2", "")
                is_v2 = pa.array(
                    ids2.to_numpy(zero_copy_only=False) % 7 == 0)
                text = pc.if_else(is_v2, amended, text)
            return pa.table({"url": url, "text": text})
        return fn

    old = docs.map_batches(snapshot(0, False), batch_format="pyarrow")
    new = docs.map_batches(snapshot(1, True), batch_format="pyarrow")
    return crawl_delta(old, new)


def q_seeded_shuffle(sf_dir: str):
    """Deterministic epoch shuffle (``functions/sessions.py:
    seeded_shuffle``): 8-shard manifest over the document ids, seed
    'epoch0'. The ``pos`` column makes the ORDER itself hash-checked —
    the driver compare sorts rows, so an order-defining operator must
    emit its rank as data, like ``kg_top``. Shards are md5-u32 mod 8;
    within-shard order is (md5 hex, doc_id) — the oracle replays both
    with ``row_number() OVER (PARTITION BY shard ORDER BY ...)``."""
    from kg_gen_ray.functions.sessions import seeded_shuffle
    docs = _docs(sf_dir, ["doc_id"])
    return seeded_shuffle(docs, n_shards=8, seed="epoch0")


def q_grouped_topk(sf_dir: str):
    """Top-3 documents per language by token count (window-fn pattern)."""
    from kg_gen_ray.functions.sessions import grouped_topk
    from kg_gen_ray.functions.text_analysis import token_stats

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def with_tokens(t: pa.Table) -> pa.Table:
        ts = token_stats(t)
        return pa.table({
            "doc_id": ts["doc_id"],
            "lang": t["lang"],
            "n_tokens": ts["n_tokens"],
        })

    enriched = docs.map_batches(with_tokens, batch_format="pyarrow")
    return grouped_topk(enriched, "lang", "n_tokens", 3, "doc_id")


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — mirrors the deterministic semantics exactly
# ---------------------------------------------------------------------------

_URL = ("'https://example.org/' || coalesce(lang, 'unknown') || '/doc-' || "
        "lpad(CAST(doc_id AS VARCHAR), 6, '0')")

_DOCS = ("docs AS (SELECT doc_id, coalesce(lang, 'unknown') AS lang, "
         f"text, {_URL} AS url FROM documents)")

_TOKS = ("toks AS (SELECT url, lang, doc_id, "
         "unnest(string_split(text, ' ')) AS w, "
         "generate_subscripts(string_split(text, ' '), 1) AS pos FROM docs)")

# the chunk stage consumes text.strip() (reference chunk_text semantics;
# whitespace-only pages chunk to nothing), so the token stream the
# TRIPLE EXTRACTOR sees is over the STRIPPED text — replayed with the
# same python-str.strip character set: ALL code points where
# str.isspace() is true (ASCII 0x09-0x0D/0x20, the 0x1C-0x1F separators,
# NEL 0x85, NBSP 0xA0, OGHAM 0x1680, the U+2000-200A spaces, LS/PS
# U+2028/2029, NNBSP 0x202F, MMSP 0x205F, IDEOGRAPHIC 0x3000) — a
# doc padded with non-ASCII whitespace strips identically in both
# engines. Every other tokenizing operator (token counts, shingles,
# tf-idf, bm25) consumes the raw text (_TOKS).
_STRIP = "(' ' || " + " || ".join(
    f"chr({cp})" for cp in
    (9, 10, 11, 12, 13, 28, 29, 30, 31, 0x85, 0xA0, 0x1680,
     *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000)) + ")"
_TOKS_STRIPPED = (
    "toks AS (SELECT url, lang, doc_id, "
    f"unnest(string_split(trim(text, {_STRIP}), ' ')) AS w, "
    f"generate_subscripts(string_split(trim(text, {_STRIP}), ' '), 1)"
    " AS pos FROM docs "
    f"WHERE trim(text, {_STRIP}) <> '')")

_RAW_TRIPLES = (
    "raw AS ("
    "SELECT a.w AS subj, 'precedes' AS pred, b.w AS obj, a.url AS url "
    "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
    "UNION ALL "
    "SELECT w AS subj, 'written_in' AS pred, lang AS obj, url FROM toks)")

_TRIPLES = "triples AS (SELECT DISTINCT subj, pred, obj FROM raw)"

# the normalize_label chain (keep in sync with
# kg_gen_ray.stages.canonicalize.normalize_label)
_NORM = """
norm_{kind} AS (
  SELECT member,
    trim(CASE WHEN length(s3) > 3 AND s3 LIKE '%e' THEN substr(s3, 1, length(s3)-1) ELSE s3 END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)) AS nk
  FROM (
    SELECT member,
      CASE WHEN length(s2) > 5 AND s2 LIKE '%ing' THEN substr(s2, 1, length(s2)-3) ELSE s2 END AS s3
    FROM (
      SELECT member,
        CASE WHEN length(s1) > 3 AND s1 LIKE '%s' AND s1 NOT LIKE '%ss' THEN substr(s1, 1, length(s1)-1) ELSE s1 END AS s2
      FROM (SELECT member, lower(trim(member, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))) AS s1 FROM labels_{kind}) t1
    ) t2
  ) t3
),
rep_{kind} AS (
  SELECT nk, member AS representative
  FROM (SELECT nk, member, row_number() OVER
          (PARTITION BY nk ORDER BY length(member), member) AS rn FROM norm_{kind}) r
  WHERE rn = 1
),
alias_{kind} AS (
  SELECT '{kind}' AS kind, r.representative AS representative, n.member AS member
  FROM norm_{kind} n JOIN rep_{kind} r USING (nk)
)
"""

_LABELS = (
    "labels_entity AS (SELECT subj AS member FROM triples "
    "UNION SELECT obj FROM triples), "
    "labels_edge AS (SELECT DISTINCT pred AS member FROM triples)")

_ALIAS_FULL = (_LABELS + ", "
               + _NORM.format(kind="entity") + ", "
               + _NORM.format(kind="edge"))

_CANONICAL = (
    "canonical AS (SELECT DISTINCT ae_s.representative AS subj, "
    "ap.representative AS pred, ae_o.representative AS obj "
    "FROM triples t "
    "JOIN alias_entity ae_s ON ae_s.member = t.subj "
    "JOIN alias_entity ae_o ON ae_o.member = t.obj "
    "JOIN alias_edge ap ON ap.member = t.pred)")

_KG_PREFIX = f"WITH {_DOCS}, {_TOKS_STRIPPED}, {_RAW_TRIPLES}, {_TRIPLES}"
_KG_CANON_PREFIX = f"{_KG_PREFIX}, {_ALIAS_FULL}, {_CANONICAL}"

# shingles with the <3-token / empty-text fallback (mirrors shingle_set)
_SHINGLES = (
    "shraw AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s "
    "FROM toks a "
    "JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
    "JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2), "
    "sh AS (SELECT DISTINCT doc_id, s FROM shraw "
    "UNION SELECT doc_id, text AS s FROM docs "
    "WHERE len(string_split(text, ' ')) < 3 AND text <> '')")

_SIGS = (
    "sigs0 AS (SELECT doc_id, "
    "min(md5('0:' || s)) AS h0, min(md5('1:' || s)) AS h1, "
    "min(md5('2:' || s)) AS h2, min(md5('3:' || s)) AS h3 "
    "FROM sh GROUP BY doc_id), "
    "sigs AS (SELECT d.doc_id, coalesce(h0, '') AS h0, coalesce(h1, '') AS h1, "
    "coalesce(h2, '') AS h2, coalesce(h3, '') AS h3 "
    "FROM docs d LEFT JOIN sigs0 USING (doc_id))")

# --- fast u64 MinHash family (kg_gen_ray.functions.fast_text, oracle-parity
# constants _OC1/_OC2/_OA/_OB). numpy computes uint64 wraparound; DuckDB
# replays it as HUGEINT % 2^64 — the multipliers are sized so no
# intermediate exceeds INT128 (token hashes are md5-prefix uint32; the
# affine/band multipliers are 32-bit).
_P64 = "18446744073709551616"
_FC1 = 0x9E3779B97F4A7C15
_FC2 = 0xC2B2AE3D27D4EB4F
_FA = [0x9E3779B9, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F]
_FB = [0x165667B1, 0xD3A2646D, 0xFD7046C5, 0xB55A4F09]


def _hu32(x: str) -> str:
    return f"('0x'||substr(md5({x}),1,8))::BIGINT"


_FSH = (
    "fts AS (SELECT doc_id, string_split(text, ' ') AS ts FROM docs), "
    "fsh AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN "
    "list_transform(range(1, len(ts)-1), i -> "
    f"({_hu32('ts[i]')}::HUGEINT * {_FC1} + {_hu32('ts[i+1]')}::HUGEINT * {_FC2}"
    f" + {_hu32('ts[i+2]')}) % {_P64}) "
    f"WHEN len(ts) = 2 THEN [({_hu32('ts[1]')}::HUGEINT * {_FC1}"
    f" + {_hu32('ts[2]')}) % {_P64}] "
    f"ELSE [{_hu32('ts[1]')}::HUGEINT] END AS shs FROM fts)")

# null text -> the engine's empty-set sentinel (u64 max), not NULL
_FSIGS = ("fsigs AS (SELECT doc_id, " + ", ".join(
    f"coalesce(list_min(list_transform(shs, s -> ((s::HUGEINT * {_FA[k]}"
    f" + {_FB[k]}) % {_P64})))::UBIGINT, 18446744073709551615) AS m{k}"
    for k in range(4)) + " FROM fsh)")

_FBANDS = (
    "fbands AS ("
    f"SELECT doc_id, ((m0::HUGEINT * {_FA[0]} + m1 + {_FB[0]}) % {_P64})::UBIGINT"
    " AS band_key FROM fsigs UNION ALL "
    f"SELECT doc_id, ((m2::HUGEINT * {_FA[1]} + m3 + {_FB[1]}) % {_P64})::UBIGINT"
    " FROM fsigs)")


def oracle_sql() -> dict[str, str]:
    from kg_gen_ray.functions.text_analysis import _LANG_MARKERS
    sql = {}

    # fname: the M5 sanitizer chain replayed with the identical RE2
    # pattern strings (DuckDB regexp_replace is RE2, same as the Arrow
    # kernels); two-arg trim gets the same explicit ASCII-whitespace set
    # the engine's utf8_trim uses
    _ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    sql["kg_pages"] = f"""
        SELECT {_URL} AS url, coalesce(lang, 'unknown') AS lang,
               length(text)::BIGINT AS n_chars,
               TIMESTAMP '2026-01-01'
                   + (doc_id % 1000000000) * INTERVAL '1 second' AS warc_ts,
               regexp_replace(regexp_replace(
                   trim(regexp_replace(substr(text, 1, 24) || '!?',
                                       '[^\\w\\s-]', '', 'g'), {_ws}),
                   '[-\\s]+', '_', 'g'), '_+', '_', 'g') AS fname
        FROM documents"""

    sql["mint_doc_ids"] = f"""
        WITH pages AS (SELECT {_URL} AS url FROM documents),
        b AS (SELECT url,
            ('0x'||substr(md5(url),1,8))::BIGINT % 1048576 AS bucket
            FROM pages),
        r AS (SELECT url, bucket,
            ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY url) - 1
                AS rnk FROM b)
        SELECT url, (bucket * 2097152 + rnk)::BIGINT AS minted_id FROM r"""

    sql["kg_extract_text"] = f"""
        SELECT {_URL} AS url, coalesce(text, '') AS text FROM documents"""

    # Sequential chunk packing as a recursive CTE over word positions.
    # The synthetic corpus contains no sentence terminators ([.!?]), so
    # split_sentences(text) == [text] for every doc and chunk_text
    # (reference src/kg_gen/utils/chunk_text.py:29-66) reduces to:
    # length(text) <= max (200) -> ONE chunk (the sentence joins current,
    # or — at exactly len==200 — becomes current whole); length > 200 ->
    # the greedy word-split fallback, i.e. a running-length fold
    # acc + len(word) + 1 <= 200 over the word sequence. The fold is the
    # recursive CTE below (one row per (doc, word position), state =
    # (chunk_id, acc)); recursion depth = max words per doc. Sentence-
    # SPLITTING behavior (terminator/abbreviation rules) is pinned by the
    # golden-hash corpora in tests/test_chunker.py — this oracle checks the
    # packing arithmetic end-to-end on the driver corpus.
    sql["kg_chunks"] = f"""
        WITH RECURSIVE {_DOCS},
        longdocs AS (SELECT doc_id FROM docs
                     WHERE trim(text, {_STRIP}) <> ''
                       AND length(text) > 200),
        w0 AS (SELECT doc_id,
                      unnest(string_split(trim(text, {_STRIP}), ' ')) AS word,
                      generate_subscripts(
                          string_split(trim(text, {_STRIP}), ' '), 1) AS pos0
               FROM docs WHERE doc_id IN (SELECT doc_id FROM longdocs)),
        w AS (SELECT doc_id, word,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY pos0) AS pos
              FROM w0 WHERE word <> ''),
        st(doc_id, pos, chunk_id, acc) AS (
          SELECT doc_id, 1::BIGINT, 0, length(word) + 1
          FROM w WHERE pos = 1
          UNION ALL
          SELECT s.doc_id, s.pos + 1,
                 CASE WHEN s.acc + length(n.word) + 1 <= 200
                      THEN s.chunk_id ELSE s.chunk_id + 1 END,
                 CASE WHEN s.acc + length(n.word) + 1 <= 200
                      THEN s.acc + length(n.word) + 1
                      ELSE length(n.word) + 1 END
          FROM st s JOIN w n ON n.doc_id = s.doc_id AND n.pos = s.pos + 1),
        packed AS (
          SELECT s.doc_id, s.chunk_id,
                 string_agg(w.word, ' ' ORDER BY s.pos) AS text
          FROM st s JOIN w ON w.doc_id = s.doc_id AND w.pos = s.pos
          GROUP BY s.doc_id, s.chunk_id),
        chunks AS (
          SELECT doc_id, chunk_id, text FROM packed
          UNION ALL
          SELECT doc_id, 0, trim(text, {_STRIP}) FROM docs
          WHERE trim(text, {_STRIP}) <> '' AND length(text) <= 200)
        SELECT d.url, c.chunk_id, c.text, d.lang
        FROM chunks c JOIN docs d USING (doc_id)"""

    sql["kg_triples_raw"] = f"""
        {_KG_PREFIX} SELECT subj, pred, obj, url FROM raw"""

    sql["kg_triples"] = f"""
        {_KG_PREFIX} SELECT subj, pred, obj FROM triples"""

    sql["kg_alias_map"] = f"""
        {_KG_PREFIX}, {_ALIAS_FULL}
        SELECT kind, representative, member FROM alias_entity
        UNION ALL SELECT kind, representative, member FROM alias_edge"""

    sql["kg_canonical_triples"] = f"""
        {_KG_CANON_PREFIX} SELECT subj, pred, obj FROM canonical"""

    # the graph.json round-trip reconstructs exactly the canonical
    # triples (writer sorts, reader rebuilds tuples) — same oracle
    sql["kg_graph_json"] = sql["kg_canonical_triples"]

    # the semantic judged loop reduces to the normalize-key alias map
    # under full retrieval + the deterministic judge + one k-means cell
    # (provable; see q_kg_semantic_alias) — so the SQL is the entity half
    # of the alias-map oracle
    sql["kg_semantic_alias"] = f"""
        {_KG_PREFIX}, {_LABELS}, {_NORM.format(kind="entity")}
        SELECT 'entity' AS kind, representative, member FROM alias_entity"""

    # merged top-k: canonical-entity degrees (A6/T3) + raw-triple relation
    # counts (A2/T3) — _KG_CANON_PREFIX carries both `canonical` and
    # `triples` CTEs
    sql["kg_top"] = f"""
        {_KG_CANON_PREFIX},
        endpoints AS (SELECT subj AS entity FROM canonical
                      UNION ALL SELECT obj FROM canonical),
        degrees AS (SELECT entity, count(*)::BIGINT AS n
                    FROM endpoints GROUP BY entity),
        tops_e AS (SELECT 'entity' AS kind, entity AS name, n FROM degrees
                   ORDER BY n DESC, entity LIMIT 10),
        tops_r AS (SELECT 'relation' AS kind, pred AS name,
                          count(*)::BIGINT AS n FROM triples
                   GROUP BY pred ORDER BY n DESC, pred LIMIT 10)
        SELECT kind, name, n FROM tops_e
        UNION ALL SELECT kind, name, n FROM tops_r"""

    sql["kg_graph_stats"] = f"""
        {_KG_CANON_PREFIX}
        SELECT (SELECT count(*) FROM (SELECT subj FROM canonical
                 UNION SELECT obj FROM canonical))::BIGINT AS n_entities,
               (SELECT count(*) FROM canonical)::BIGINT AS n_triples,
               (SELECT count(DISTINCT pred) FROM canonical)::BIGINT AS n_edge_types"""

    # incremental(half1)+add(half2) must equal the batch build
    sql["kg_incremental"] = sql["kg_canonical_triples"]

    sql["kg_triples_llm"] = f"""
        {_KG_PREFIX}
        SELECT DISTINCT subj, pred, obj FROM raw WHERE pred = 'precedes'"""

    sql["kg_degrees"] = f"""
        {_KG_PREFIX},
        deg AS (
          SELECT subj AS entity, 1 AS outdeg, 0 AS indeg FROM triples
          UNION ALL SELECT obj, 0, 1 FROM triples)
        SELECT entity, count(*)::BIGINT AS degree,
               sum(indeg)::BIGINT AS indegree,
               sum(outdeg)::BIGINT AS outdegree
        FROM deg GROUP BY entity"""

    # S7+M6: the wikiqa clean rule replayed over the same deterministic
    # split derivation (the engine side additionally round-trips the split
    # through a real CSV write+read, which SQL has no business modeling —
    # identity by construction, pinned by the type-surviving schema)
    sql["wikiqa_clean"] = """
        WITH wq AS (
          SELECT 'Q' || (doc_id % 97) AS question_id,
                 'what is in document ' || doc_id AS question,
                 'Doc ' || doc_id AS document_title,
                 coalesce(substr(text, 1, 24), '') AS answer,
                 (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS label,
                 doc_id AS row_idx
          FROM documents),
        c AS (SELECT *, row_number() OVER (PARTITION BY question_id
                                           ORDER BY row_idx) AS rn
              FROM wq WHERE label = 1)
        SELECT question_id, question, document_title, answer, label,
               row_idx
        FROM c WHERE rn = 1"""

    # X7+A7: containment judge (the deterministic transport's decision
    # rule) + exact integer micro-unit accuracy
    sql["mine_accuracy"] = """
        WITH pairs AS (
          SELECT doc_id AS pair_id,
                 CASE WHEN doc_id % 2 = 0 THEN substr(text, 1, 12)
                      ELSE 'zzq' || doc_id END AS answer,
                 text AS context
          FROM documents),
        ev AS (SELECT pair_id,
                      (CASE WHEN answer <> ''
                                 AND strpos(context, answer) > 0
                            THEN 1 ELSE 0 END)::BIGINT AS evaluation
               FROM pairs)
        SELECT pair_id, evaluation,
               ((1000000 * SUM(evaluation) OVER ()) // (COUNT(*) OVER ())
                   )::BIGINT AS accuracy_micro
        FROM ev"""

    # weakly-connected components: recursive closure; component label =
    # min by (length, lex) — mirrored via the same rank encoding
    # canonicalize._encode_rank uses
    sql["kg_components"] = f"""
        {_KG_PREFIX.replace("WITH ", "WITH RECURSIVE ", 1)},
        edges0 AS (SELECT DISTINCT subj AS a, obj AS b FROM triples),
        nodes AS (SELECT subj AS node FROM triples
                  UNION SELECT obj FROM triples),
        edges AS (SELECT a AS u, b AS v FROM edges0
                  UNION ALL SELECT b, a FROM edges0),
        reach(node, lab) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.node),
        comp AS (SELECT node,
                        min(lpad(length(lab)::VARCHAR, 6, '0') || '|' || lab)
                          AS enc
                 FROM reach GROUP BY node)
        SELECT node, substr(enc, 8) AS component FROM comp"""

    sql["text_tokens"] = f"""
        WITH {_DOCS}, {_TOKS},
        ws AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                      count(DISTINCT w)::BIGINT AS n_unique_tokens
               FROM toks GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(ws.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(ws.n_unique_tokens, 0)::BIGINT AS n_unique_tokens,
               len(regexp_extract_all(d.text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
                 AS n_re_tokens
        FROM documents d LEFT JOIN ws USING (doc_id)"""

    sql["paragraph_dedup"] = """
        WITH d AS (
            SELECT doc_id,
                   replace(text, ' table ', chr(10)||chr(10)) AS text
            FROM documents
        ), split AS (
            SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
            FROM d
        ), paras AS (
            SELECT doc_id, unnest(ps) AS para,
                   generate_subscripts(ps, 1) AS i FROM split
        ), ranked AS (
            SELECT doc_id, para, i,
                   ROW_NUMBER() OVER (PARTITION BY md5(para)
                                      ORDER BY doc_id, i) AS rn
            FROM paras
        )
        SELECT doc_id,
               string_agg(para, chr(10)||chr(10) ORDER BY i) AS text
        FROM ranked WHERE rn = 1 GROUP BY doc_id"""

    # HLL replay: md5-u64 value hash, register = (idx = h >> 52,
    # rank = leading zeros of the 12-bit-padded remainder + 1 via bin()),
    # harmonic sum as the EXACT integer sum(2^(64-rank)) (HUGEINT), then
    # the single-expression alpha*M^2*2^64/T estimate with the standard
    # small-range linear-counting branch — every float op is one
    # deterministic expression, identical to sketch._estimate
    sql["approx_distinct_docs"] = """
        WITH h AS (SELECT DISTINCT
                          ('0x'||substr(md5(text),1,16))::UBIGINT AS h
                   FROM documents WHERE text IS NOT NULL),
        r AS (SELECT h >> 52 AS idx,
                     (((h::HUGEINT * 4096) % 18446744073709551616)::UBIGINT
                      | 4095) AS rest
              FROM h),
        regs AS (SELECT idx, max(65 - length(bin(rest))) AS rank
                 FROM r GROUP BY idx),
        t AS (SELECT (4096 - count(*))::HUGEINT
                       * 18446744073709551616::HUGEINT
                       + coalesce(sum((1::HUGEINT << (64 - rank))), 0) AS T,
                     (4096 - count(*)) AS zeros
              FROM regs)
        SELECT CASE WHEN (0.7213/(1 + 1.079/4096)) * 4096 * 4096
                         * 18446744073709551616.0 / T::DOUBLE <= 2.5*4096
                         AND zeros > 0
                    THEN 4096 * ln(4096.0 / zeros)
                    ELSE (0.7213/(1 + 1.079/4096)) * 4096 * 4096
                         * 18446744073709551616.0 / T::DOUBLE
               END AS approx_distinct_texts
        FROM t"""

    # grouped HLL: the same register replay with GROUP BY lang at every
    # level — one sketch per language, estimate bit-identical per group
    sql["approx_distinct_by_lang"] = """
        WITH h AS (SELECT DISTINCT lang,
                          ('0x'||substr(md5(text),1,16))::UBIGINT AS h
                   FROM documents WHERE text IS NOT NULL),
        r AS (SELECT lang, h >> 52 AS idx,
                     (((h::HUGEINT * 4096) % 18446744073709551616)::UBIGINT
                      | 4095) AS rest
              FROM h),
        regs AS (SELECT lang, idx, max(65 - length(bin(rest))) AS rank
                 FROM r GROUP BY lang, idx),
        t AS (SELECT lang,
                     (4096 - count(*))::HUGEINT
                       * 18446744073709551616::HUGEINT
                       + coalesce(sum((1::HUGEINT << (64 - rank))), 0) AS T,
                     (4096 - count(*)) AS zeros
              FROM regs GROUP BY lang)
        SELECT lang,
               CASE WHEN (0.7213/(1 + 1.079/4096)) * 4096 * 4096
                         * 18446744073709551616.0 / T::DOUBLE <= 2.5*4096
                         AND zeros > 0
                    THEN 4096 * ln(4096.0 / zeros)
                    ELSE (0.7213/(1 + 1.079/4096)) * 4096 * 4096
                         * 18446744073709551616.0 / T::DOUBLE
               END AS approx_distinct
        FROM t"""

    sql["lm_score"] = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), t AS (
            SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
            FROM toks
        ), bi AS (
            SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), c2 AS (
            SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2
        ), c1 AS (
            SELECT w AS w1, count(*) AS c1 FROM t GROUP BY 1
        ), v AS (
            SELECT count(DISTINCT w) AS v FROM t
        ), s AS (
            SELECT bi.doc_id,
                   CAST(floor(ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 1000000)
                        AS BIGINT) AS s
            FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        )
        SELECT d.doc_id,
               COALESCE(sum(s.s), 0)::BIGINT AS lm_score_micro,
               count(s.s)::BIGINT AS n_bigrams
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        GROUP BY d.doc_id"""

    # DSIR: per-token delta = floor-quantized target log-prob minus
    # floor-quantized source log-prob (add-one unigram models, shared
    # V = source vocab here since target ⊂ source), summed per doc as
    # integers. string_split(NULL) unnests to nothing -> (0, 0) rows.
    sql["dsir_weights"] = """
        WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ), tt AS (
            SELECT w FROM t WHERE doc_id % 10 = 0
        ), cs AS (
            SELECT w, count(*) AS c FROM t GROUP BY 1
        ), ct AS (
            SELECT w, count(*) AS c FROM tt GROUP BY 1
        ), ns AS (SELECT count(*) AS n FROM t),
        nt AS (SELECT count(*) AS n FROM tt),
        v AS (SELECT count(DISTINCT w) AS v FROM t),
        d AS (
            SELECT t.doc_id,
                   CAST(floor(ln((COALESCE(ct.c, 0) + 1.0) / (nt.n + v.v))
                              * 1000000) AS BIGINT)
                 - CAST(floor(ln((cs.c + 1.0) / (ns.n + v.v))
                              * 1000000) AS BIGINT) AS s
            FROM t JOIN cs USING (w) LEFT JOIN ct USING (w)
            CROSS JOIN ns CROSS JOIN nt CROSS JOIN v
        )
        SELECT d0.doc_id, COALESCE(sum(d.s), 0)::BIGINT AS dsir_micro,
               count(d.s)::BIGINT AS n_tokens
        FROM documents d0 LEFT JOIN d ON d0.doc_id = d.doc_id
        GROUP BY d0.doc_id"""

    # CCNet head/middle/tail: the lm_score CTEs + integer per-bigram mean
    # (floor of the double quotient is exact at document scale — see
    # functions/lm.py:perplexity_buckets) + per-language quantile_disc
    # terciles + ascending CASE. Self-trained like lm_score, so every
    # bigram is in-model and no backoff branch is needed here.
    sql["ppl_buckets"] = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), t AS (
            SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
            FROM toks
        ), bi AS (
            SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ), c2 AS (
            SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2
        ), c1 AS (
            SELECT w AS w1, count(*) AS c1 FROM t GROUP BY 1
        ), v AS (
            SELECT count(DISTINCT w) AS v FROM t
        ), s AS (
            SELECT bi.doc_id,
                   CAST(floor(ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 1000000)
                        AS BIGINT) AS s
            FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        ), score AS (
            SELECT d.doc_id, d.lang,
                   COALESCE(sum(s.s), 0)::BIGINT AS total,
                   count(s.s)::BIGINT AS nb
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
            GROUP BY d.doc_id, d.lang
        ), m AS (
            SELECT doc_id, lang,
                   CASE WHEN nb > 0 THEN
                        CAST(floor(total / (nb * 1.0)) AS BIGINT)
                   END AS mean_micro
            FROM score
        ), th AS (
            SELECT lang,
                   quantile_disc(mean_micro, 1.0/3.0) AS t33,
                   quantile_disc(mean_micro, 2.0/3.0) AS t66
            FROM m WHERE mean_micro IS NOT NULL GROUP BY lang
        )
        SELECT m.doc_id, m.lang, m.mean_micro,
               CASE WHEN m.mean_micro IS NULL THEN NULL
                    WHEN m.mean_micro <= th.t33 THEN 'tail'
                    WHEN m.mean_micro <= th.t66 THEN 'middle'
                    ELSE 'head' END AS ppl_bucket
        FROM m LEFT JOIN th ON m.lang IS NOT DISTINCT FROM th.lang"""

    # text_quality carries the merged lang-id column: marker-word voting
    # with the LangId actor's exact tiebreak (strictly more hits wins, ties
    # go to the alphabetically-first language, zero hits -> 'unknown')
    _markers = ", ".join(
        f"('{lang}','{w}')"
        for lang in sorted(_LANG_MARKERS)
        for w in sorted(_LANG_MARKERS[lang]))
    sql["text_quality"] = f"""
        WITH {_DOCS}, {_TOKS},
        agg AS (SELECT doc_id, count(*) AS n_tokens,
                       sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS stops,
                       count(DISTINCT w) AS n_uniq,
                       sum(length(w)) AS tot_chars,
                       sum(CASE WHEN regexp_matches(w, '[a-zA-Z]')
                           THEN 1 ELSE 0 END) AS alpha_words,
                       count(DISTINCT CASE WHEN lower(w) IN
                           ('the','be','to','of','and','that','have','with')
                           THEN lower(w) END) AS stop_hits
                FROM toks GROUP BY doc_id),
        bgc AS (SELECT a.doc_id, a.w AS w1, b.w AS w2,
                       min(length(a.w) + length(b.w)) AS chars,
                       count(*) AS c
                FROM toks a JOIN toks b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                GROUP BY a.doc_id, a.w, b.w),
        topbg AS (SELECT doc_id, max(c) AS topc FROM bgc GROUP BY doc_id),
        -- Gopher repetition: top-2-gram char coverage (count ties broken
        -- toward the longer n-gram, the fraction-maximizing choice)
        b2 AS (SELECT g.doc_id, t.topc AS c, max(g.chars) AS bch
               FROM bgc g JOIN topbg t
                 ON g.doc_id = t.doc_id AND g.c = t.topc
               GROUP BY g.doc_id, t.topc),
        g3 AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, c.w AS w3,
                      min(length(a.w) + length(b.w) + length(c.w)) AS chars,
                      count(*) AS c
               FROM toks a
               JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
               JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
               GROUP BY a.doc_id, a.w, b.w, c.w),
        t3 AS (SELECT doc_id, max(c) AS maxc FROM g3 GROUP BY doc_id),
        b3 AS (SELECT g.doc_id, t.maxc AS c, max(g.chars) AS bch
               FROM g3 g JOIN t3 t
                 ON g.doc_id = t.doc_id AND g.c = t.maxc
               GROUP BY g.doc_id, t.maxc),
        -- duplicated-5-gram char coverage: tokens under ANY >=2x 5-gram
        -- occurrence, overlaps counted once (DISTINCT positions)
        g5 AS (SELECT a.doc_id, a.pos, a.w AS w1, b.w AS w2, c.w AS w3,
                      d.w AS w4, e.w AS w5
               FROM toks a
               JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
               JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
               JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
               JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4),
        dstarts AS (SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY doc_id, w1, w2, w3, w4, w5)
                     AS c
            FROM g5) WHERE c >= 2),
        covered AS (SELECT DISTINCT t.doc_id, t.pos
                    FROM toks t JOIN dstarts s
                      ON t.doc_id = s.doc_id
                     AND t.pos BETWEEN s.pos AND s.pos + 4),
        cov5 AS (SELECT cv.doc_id, sum(length(t.w)) AS chars
                 FROM covered cv JOIN toks t
                   ON cv.doc_id = t.doc_id AND cv.pos = t.pos
                 GROUP BY cv.doc_id),
        -- duplicate lines over the same ' table ' -> newline derivation
        -- the Ray query applies
        lines AS (SELECT doc_id,
                         unnest(string_split(
                             replace(text, ' table ', chr(10)), chr(10)))
                           AS l
                  FROM documents),
        lcnt AS (SELECT doc_id, l, length(l) AS ll, count(*) AS c
                 FROM lines GROUP BY doc_id, l),
        lstat AS (SELECT doc_id, sum(c) AS n_lines,
                         count(*) AS n_distinct,
                         sum((c - 1) * ll) AS dupchars,
                         sum(c * ll) AS totchars
                  FROM lcnt GROUP BY doc_id),
        lq AS (SELECT doc_id,
                      sum(CASE WHEN l LIKE '- %' OR l LIKE '• %'
                          THEN 1 ELSE 0 END) AS nb,
                      sum(CASE WHEN l LIKE '%...' THEN 1 ELSE 0 END) AS ne
               FROM lines GROUP BY doc_id),
        markers(mlang, w) AS (VALUES {_markers}),
        words AS (SELECT doc_id,
                         lower(unnest(regexp_extract_all(text, '[a-zA-Z]+')))
                           AS w
                  FROM documents),
        hits AS (SELECT doc_id, mlang, count(*) AS n
                 FROM words JOIN markers USING (w) GROUP BY doc_id, mlang),
        best AS (SELECT doc_id, mlang, n,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY n DESC, mlang ASC) AS rn
                 FROM hits)
        SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
               agg.n_tokens::BIGINT AS n_tokens,
               agg.stops::DOUBLE / greatest(agg.n_tokens, 1) AS stop_ratio,
               agg.n_uniq::DOUBLE / greatest(agg.n_tokens, 1)
                 AS distinct_ratio,
               coalesce(t.topc, 0)::DOUBLE / greatest(agg.n_tokens - 1, 1)
                 AS top_bigram_frac,
               coalesce(b.mlang, 'unknown') AS pred_lang,
               (ls.n_lines - ls.n_distinct)::DOUBLE
                 / greatest(ls.n_lines, 1) AS dup_line_frac,
               ls.dupchars::DOUBLE / greatest(ls.totchars, 1)
                 AS dup_line_char_frac,
               coalesce(b2.c * b2.bch, 0)::DOUBLE
                 / greatest(agg.tot_chars, 1) AS top_2gram_char_frac,
               coalesce(b3.c * b3.bch, 0)::DOUBLE
                 / greatest(agg.tot_chars, 1) AS top_3gram_char_frac,
               coalesce(c5.chars, 0)::DOUBLE
                 / greatest(agg.tot_chars, 1) AS dup_5gram_char_frac,
               agg.tot_chars::DOUBLE / greatest(agg.n_tokens, 1)
                 AS mean_word_len,
               agg.alpha_words::DOUBLE / greatest(agg.n_tokens, 1)
                 AS alpha_word_frac,
               ((length(d.text) - length(replace(d.text, '#', '')))
                + (length(d.text) - length(replace(d.text, '...', ''))) / 3
               )::DOUBLE / greatest(agg.n_tokens, 1) AS symbol_word_ratio,
               agg.stop_hits::BIGINT AS stop_hits,
               lq.nb::DOUBLE / greatest(ls.n_lines, 1) AS bullet_line_frac,
               lq.ne::DOUBLE / greatest(ls.n_lines, 1) AS ellipsis_line_frac
        FROM documents d
        JOIN agg USING (doc_id)
        JOIN lstat ls USING (doc_id)
        JOIN lq USING (doc_id)
        LEFT JOIN topbg t USING (doc_id)
        LEFT JOIN b2 USING (doc_id)
        LEFT JOIN b3 USING (doc_id)
        LEFT JOIN cov5 c5 USING (doc_id)
        LEFT JOIN (SELECT doc_id, mlang FROM best WHERE rn = 1 AND n > 0) b
          USING (doc_id)
        UNION ALL
        -- null text -> the engine's all-zero signal row ('unknown' lang):
        -- the token CTE has no rows for a NULL split, so these docs
        -- never reach the joins above
        SELECT doc_id, 0::BIGINT, 0::BIGINT, 0.0, 0.0, 0.0, 'unknown',
               0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0::BIGINT, 0.0, 0.0
        FROM documents WHERE text IS NULL"""

    # SimHash: md5-prefix uint64 token hashes, ±1 per bit per occurrence,
    # sign-threshold packing — bit ops DuckDB replays exactly
    sql["dedup_simhash"] = """
        WITH stoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                       FROM documents WHERE text <> ''),
        sh AS (SELECT doc_id, ('0x'||substr(md5(w),1,16))::UBIGINT AS h
               FROM stoks),
        bits AS (SELECT doc_id, j,
                        sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)
                          AS acc
                 FROM sh CROSS JOIN (SELECT unnest(range(64)) AS j) js
                 GROUP BY doc_id, j),
        packed AS (SELECT doc_id,
                          sum(CASE WHEN acc > 0 THEN (1::HUGEINT << j)
                                   ELSE 0::HUGEINT END) AS v
                   FROM bits GROUP BY doc_id)
        SELECT d.doc_id,
               lower(lpad(hex(coalesce(p.v, 0)::UBIGINT), 16, '0'))
                 AS simhash_hex
        FROM documents d LEFT JOIN packed p USING (doc_id)"""

    sql["tfidf_top_terms"] = """
        WITH t1 AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents),
        toksf AS (SELECT doc_id, w FROM t1 WHERE w <> ''),
        tf AS (SELECT doc_id, w, count(*) AS tf
               FROM toksf GROUP BY doc_id, w),
        df AS (SELECT w, count(DISTINCT doc_id) AS df
               FROM toksf GROUP BY w),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.w AS term,
                 tf.tf * ln(n.n::DOUBLE / df.df) AS tfidf
          FROM tf JOIN df USING (w), n),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rn
          FROM scored)
        SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3"""

    # hygiene composition: scrubbed text feeds the fast MinHash near-dup
    # family (the near_dup_canonical CTEs reused verbatim over the
    # scrubbed docs), survivors capped per language by smallest md5, the
    # cap packed by the recursive greedy fold (same CTE as the pack
    # pytest oracle). Scrub chain mirrors functions/scrub.PII_PATTERNS
    # in order (DuckDB's regex engine is RE2, same as the Arrow kernel).
    from kg_gen_ray.functions.scrub import PII_PATTERNS
    _scrub = "text"
    for _name, _pat, _repl in PII_PATTERNS:
        _scrub = (f"regexp_replace({_scrub}, "
                  f"'{_pat.replace(chr(39), chr(39) * 2)}', '{_repl}', 'g')")
    sql["hygiene_counts"] = f"""
        WITH RECURSIVE
        sdocs AS (SELECT doc_id, lang, {_scrub} AS text FROM documents),
        -- Gopher quality cut on the scrubbed text (same thresholds the
        -- Ray pipeline applies: stop_hits >= 1, mean word length <= 5)
        gt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM sdocs),
        gagg AS (SELECT doc_id, count(*) AS n, sum(length(w)) AS tot,
                        count(DISTINCT CASE WHEN lower(w) IN
                            ('the','be','to','of','and','that','have',
                             'with') THEN lower(w) END) AS stop_hits
                 FROM gt GROUP BY doc_id),
        docs AS (SELECT s.* FROM sdocs s JOIN gagg USING (doc_id)
                 WHERE gagg.stop_hits >= 1
                   AND gagg.tot::DOUBLE / greatest(gagg.n, 1) <= 5.0),
        {_FSH}, {_FSIGS}, {_FBANDS},
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM fbands a JOIN fbands b
            ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(doc, lab) AS (
          SELECT doc_id, doc_id FROM docs
          UNION
          SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.doc),
        comp AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc),
        survivors AS (SELECT doc AS doc_id FROM comp WHERE doc = root),
        capped AS (
          SELECT doc_id, lang, text FROM (
            SELECT d.doc_id, d.lang, d.text,
                   row_number() OVER (PARTITION BY d.lang
                                      ORDER BY md5(d.text), d.doc_id) AS rn
            FROM docs d JOIN survivors USING (doc_id)) t
          WHERE rn <= 8),
        ctoks AS (SELECT lang, doc_id,
                         len(string_split(text, ' '))::BIGINT AS n
                  FROM capped),
        ord AS (SELECT *, row_number() OVER (PARTITION BY lang
                                             ORDER BY doc_id) AS rn
                FROM ctoks),
        fold AS (
          SELECT lang, rn, doc_id, n, 0::BIGINT AS seq_id, n AS run
          FROM ord WHERE rn = 1
          UNION ALL
          SELECT o.lang, o.rn, o.doc_id, o.n,
                 CASE WHEN f.run + o.n <= 2048
                      THEN f.seq_id ELSE f.seq_id + 1 END,
                 CASE WHEN f.run + o.n <= 2048
                      THEN f.run + o.n ELSE o.n END
          FROM fold f JOIN ord o
            ON o.lang IS NOT DISTINCT FROM f.lang AND o.rn = f.rn + 1)
        SELECT
          (SELECT count(*) FROM documents)::BIGINT AS n_input,
          (SELECT count(*) FROM sdocs)::BIGINT AS n_scrubbed,
          (SELECT count(*) FROM docs)::BIGINT AS n_gopher,
          (SELECT count(*) FROM survivors)::BIGINT AS n_deduped,
          (SELECT count(*) FROM capped)::BIGINT AS n_capped,
          (SELECT count(*) FROM fold)::BIGINT AS n_packed,
          (SELECT count(*) FROM (SELECT DISTINCT lang, seq_id FROM fold) q
          )::BIGINT AS n_sequences"""

    sql["dedup_exact"] = """
        SELECT min(doc_id)::BIGINT AS doc_id, md5(text) AS fp
        FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
        UNION ALL
        -- NULL text is not *equal* to anything (NULL = NULL is NULL):
        -- every null-text row survives dedup with a NULL fingerprint
        SELECT doc_id::BIGINT AS doc_id, NULL AS fp
        FROM documents WHERE text IS NULL"""

    # Lee et al. duplicated-span removal: md5-u32 Horner k-gram hashes
    # (closed-form coefficients — same family as _FSH), global min-enc
    # winner per hash, diff-union coverage, docs rebuilt from survivors
    from kg_gen_ray.functions.spans import span_hash_coeffs
    _SPK = 8
    _spterms = " + ".join(
        f"{_hu32(f'ts[i+{j}]')}::HUGEINT * {c}"
        for j, c in enumerate(span_hash_coeffs(_SPK)))
    _SPM = 1 << 21          # spans._POS_BITS packing
    sql["dedup_spans"] = f"""
        WITH fts AS (SELECT doc_id, string_split(text, ' ') AS ts
                     FROM documents),
        spsh AS (SELECT doc_id, CASE WHEN len(ts) >= {_SPK} THEN
                 list_transform(range(1, len(ts) - {_SPK - 2}),
                                i -> ({_spterms}) % {_P64})
                 ELSE [] END AS shs FROM fts),
        spocc AS (SELECT doc_id, unnest(shs) AS h,
                         generate_subscripts(shs, 1) - 1 AS pos FROM spsh),
        spwin AS (SELECT h, min(doc_id * {_SPM} + pos) AS menc,
                         count(*) AS c
                  FROM spocc GROUP BY h),
        splose AS (SELECT o.doc_id, o.pos FROM spocc o
                   JOIN spwin w ON o.h = w.h
                   WHERE w.c >= 2 AND o.doc_id * {_SPM} + o.pos <> w.menc),
        sptoks AS (SELECT doc_id, unnest(ts) AS w,
                          generate_subscripts(ts, 1) - 1 AS pos FROM fts),
        spcov AS (SELECT DISTINCT t.doc_id, t.pos
                  FROM sptoks t JOIN splose l
                    ON t.doc_id = l.doc_id
                   AND t.pos BETWEEN l.pos AND l.pos + {_SPK - 1}),
        spkeep AS (SELECT t.doc_id, t.pos, t.w FROM sptoks t
                   LEFT JOIN spcov c
                     ON t.doc_id = c.doc_id AND t.pos = c.pos
                   WHERE c.doc_id IS NULL),
        sprebuilt AS (SELECT doc_id,
                             string_agg(w, ' ' ORDER BY pos) AS text
                      FROM spkeep GROUP BY doc_id)
        SELECT d.doc_id, coalesce(r.text, '') AS text
        FROM documents d LEFT JOIN sprebuilt r USING (doc_id)"""

    sql["minhash_signatures"] = f"""
        WITH {_DOCS}, {_TOKS}, {_SHINGLES}, {_SIGS},
        cnt AS (SELECT doc_id, count(*)::BIGINT AS n_shingles
                FROM sh GROUP BY doc_id)
        SELECT s.doc_id, s.h0, s.h1, s.h2, s.h3,
               coalesce(cnt.n_shingles,
                        CASE WHEN d.text = '' OR d.text IS NULL
                             THEN 0 ELSE 1 END)::BIGINT
                 AS n_shingles
        FROM sigs s JOIN documents d USING (doc_id)
        LEFT JOIN cnt USING (doc_id)"""

    sql["minhash_band_pairs"] = f"""
        WITH {_DOCS}, {_TOKS}, {_SHINGLES}, {_SIGS},
        bands AS (
          SELECT doc_id, 0 AS band, md5('0:' || h0 || ':' || h1) AS band_key FROM sigs
          UNION ALL
          SELECT doc_id, 1, md5('1:' || h2 || ':' || h3) FROM sigs)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""

    # BM25Okapi semantics (see kg_gen_ray.functions.bm25): whitespace-split
    # lowercase tokens, Okapi idf with the epsilon * average_idf floor
    _BM25 = """
        btoks AS (SELECT doc_id,
                         unnest(string_split_regex(lower(text), '\\s+')) AS w
                  FROM documents),
        btoksf AS (SELECT doc_id, w FROM btoks WHERE w <> ''),
        bdl AS (SELECT doc_id, count(*) AS dl FROM btoksf GROUP BY doc_id),
        bconsts AS (SELECT (SELECT count(*) FROM documents) AS n,
                           (SELECT coalesce(sum(dl), 0) FROM bdl)::DOUBLE
                           / (SELECT count(*) FROM documents) AS avgdl),
        bdf AS (SELECT w, count(DISTINCT doc_id) AS df FROM btoksf GROUP BY w),
        bidf0 AS (SELECT w, ln((n - df + 0.5) / (df + 0.5)) AS idf
                  FROM bdf, bconsts),
        bavgidf AS (SELECT avg(idf) AS ai FROM bidf0),
        bidf AS (SELECT w, CASE WHEN idf >= 0 THEN idf
                                ELSE 0.25 * ai END AS idf
                 FROM bidf0, bavgidf),
        bq AS (SELECT unnest(['table', 'scan', 'fast']) AS w),
        btf AS (SELECT t.doc_id, t.w, count(*) AS tf
                FROM btoksf t JOIN bq USING (w) GROUP BY t.doc_id, t.w),
        bscores0 AS (
          SELECT btf.doc_id,
                 sum(bidf.idf * btf.tf * (1.5 + 1)
                     / (btf.tf + 1.5 * (1 - 0.75 + 0.75 * bdl.dl / bconsts.avgdl))
                 ) AS score
          FROM btf JOIN bidf USING (w) JOIN bdl USING (doc_id), bconsts
          GROUP BY btf.doc_id),
        bscores AS (SELECT d.doc_id, coalesce(s.score, 0.0) AS score
                    FROM documents d LEFT JOIN bscores0 s USING (doc_id))"""

    sql["bm25_scores"] = f"""
        WITH {_BM25}
        SELECT doc_id, score FROM bscores"""

    sql["rank_fusion_topk"] = f"""
        WITH {_BM25},
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = 0),
        fused AS (
          SELECT b.doc_id,
                 0.5 * b.score + 0.5 * (list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qv, q.qv)), 1e-300)) AS fs
          FROM bscores b JOIN embeddings e ON e.vec_id = b.doc_id, q)
        SELECT doc_id FROM fused ORDER BY fs DESC, doc_id LIMIT 10"""

    # per-lang routing: only English pages flow through the triple-
    # emitting backend, so the oracle is the triples CTE over lang='en'
    sql["kg_triples_routed"] = f"""
        {_KG_PREFIX.replace("FROM documents)",
                            "FROM documents WHERE lang = 'en')")}
        SELECT subj, pred, obj FROM triples"""

    # deterministic integer PageRank, 5 unrolled iterations (integer
    # floor-division damping keeps every sum order-independent)
    _S = 10 ** 12
    _pr_iters = ""
    for _k in range(5):
        _pr_iters += f"""
        , pr{_k + 1} AS (
          SELECT n.n, ((({_S} * 15 // 100) // cnt.nn)
            + coalesce(sum((p.pr * 85 // 100) // d.od), 0))::BIGINT AS pr
          FROM prnodes n CROSS JOIN cnt
          LEFT JOIN dedges e ON e.v = n.n
          LEFT JOIN pr{_k} p ON p.n = e.u
          LEFT JOIN prdeg d ON d.u = e.u
          GROUP BY n.n, cnt.nn)"""
    sql["kg_pagerank"] = f"""
        {_KG_PREFIX},
        dedges AS (SELECT DISTINCT subj AS u, obj AS v FROM triples),
        prnodes AS (SELECT u AS n FROM dedges UNION SELECT v FROM dedges),
        cnt AS (SELECT count(*) AS nn FROM prnodes),
        prdeg AS (SELECT u, count(*) AS od FROM dedges GROUP BY u),
        pr0 AS (SELECT n, ({_S} // nn)::BIGINT AS pr FROM prnodes, cnt)
        {_pr_iters}
        SELECT n AS entity, pr FROM pr5"""

    sql["minhash_sig_fast"] = f"""
        WITH {_DOCS}, {_FSH}, {_FSIGS}
        SELECT doc_id, m0, m1, m2, m3 FROM fsigs"""

    sql["llm_filter"] = """
        SELECT doc_id FROM documents
        WHERE position('table' IN text) > 0"""

    sql["messages_flatten"] = f"""
        SELECT 'conv://' || doc_id AS url,
               'user: ' || coalesce(text, '') || chr(10)
                 || 'assistant: lang=' || coalesce(lang, 'unknown')
                 AS text
        FROM documents"""

    # 2-hop bidirectional neighborhood of the min subject
    sql["kg_neighborhood"] = f"""
        {_KG_PREFIX},
        f0 AS (SELECT min(subj) AS e FROM triples),
        hop1 AS (SELECT t.subj, t.pred, t.obj FROM triples t, f0
                 WHERE t.subj = f0.e OR t.obj = f0.e),
        f1 AS (SELECT subj AS e FROM hop1 UNION SELECT obj FROM hop1
               UNION SELECT e FROM f0)
        SELECT DISTINCT t.subj, t.pred, t.obj
        FROM triples t JOIN f1 ON t.subj = f1.e OR t.obj = f1.e"""

    # winnowing: per-position window-4 minima over the u64 shingle lists,
    # full windows only; short docs contribute their single overall min
    sql["doc_winnow"] = f"""
        WITH {_DOCS}, {_FSH},
        fw AS (SELECT f.doc_id, f.shs, len(f.shs) AS ns
               FROM fsh f JOIN fts t ON t.doc_id = f.doc_id
               WHERE len(t.ts) >= 3 AND len(f.shs) > 0),
        pos AS (SELECT doc_id, unnest(shs) AS h,
                       generate_subscripts(shs, 1) AS i, ns FROM fw),
        winmin AS (SELECT doc_id, i, ns,
                          min(h) OVER (PARTITION BY doc_id ORDER BY i
                                       ROWS BETWEEN CURRENT ROW
                                       AND 3 FOLLOWING) AS m
                   FROM pos),
        kept AS (
          SELECT doc_id, m FROM winmin WHERE ns >= 4 AND i <= ns - 3
          UNION ALL
          SELECT doc_id, list_min(shs) FROM fw WHERE ns < 4)
        SELECT DISTINCT doc_id, m::UBIGINT AS fp FROM kept"""

    # exact shingle-join Jaccard over the md5-family LSH candidates
    sql["near_dup_jaccard"] = f"""
        WITH {_DOCS}, {_TOKS}, {_SHINGLES}, {_SIGS},
        bands AS (
          SELECT doc_id, 0 AS band, md5('0:' || h0 || ':' || h1) AS band_key FROM sigs
          UNION ALL
          SELECT doc_id, 1, md5('1:' || h2 || ':' || h3) FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT p.doc_a, p.doc_b, count(*) AS i
          FROM pairs p
          JOIN sh a ON a.doc_id = p.doc_a
          JOIN sh b ON b.doc_id = p.doc_b AND b.s = a.s
          GROUP BY p.doc_a, p.doc_b),
        j AS (
          SELECT p.doc_a, p.doc_b,
                 coalesce(i.i, 0)::DOUBLE
                   / (sa.n + sb.n - coalesce(i.i, 0)) AS jaccard
          FROM pairs p
          JOIN sizes sa ON sa.doc_id = p.doc_a
          JOIN sizes sb ON sb.doc_id = p.doc_b
          LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8"""

    # transitive closure of the LSH candidate-pair graph via recursive CTE,
    # keep the min doc of each component. Candidate pairs come from the
    # fast u64 band keys (what near_dup_canonical actually runs on).
    sql["near_dup_canonical"] = f"""
        WITH RECURSIVE {_DOCS}, {_FSH}, {_FSIGS}, {_FBANDS},
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM fbands a JOIN fbands b
            ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(doc, lab) AS (
          SELECT doc_id, doc_id FROM docs
          UNION
          SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.doc),
        comp AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc)
        SELECT doc AS doc_id FROM comp WHERE doc = root"""

    sql["ann_topk"] = """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0)
        SELECT vec_id FROM (
          SELECT e.vec_id,
                 (list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qv, q.qv)), 1e-300)) AS s
          FROM embeddings e, q WHERE e.embedding IS NOT NULL)
        ORDER BY s DESC, vec_id LIMIT 10"""

    sql["ann_topk_multi"] = """
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id IN (0, 5, 9)
                     AND embedding IS NOT NULL)
        SELECT query_id, vec_id FROM (
          SELECT q.query_id, e.vec_id,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   (list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qv, q.qv)), 1e-300)) DESC, e.vec_id) AS rn
          FROM embeddings e CROSS JOIN q WHERE e.embedding IS NOT NULL)
        WHERE rn <= 5"""

    sql["ivf_assign"] = """
        WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                            AS centroid_id,
                          CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL)
        SELECT vec_id, centroid_id FROM (
          SELECT e.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   (list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(c.cv, c.cv)), 1e-300))
                   DESC, c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c WHERE e.embedding IS NOT NULL)
        WHERE rn = 1"""

    sql["ivf_topk"] = """
        WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                            AS centroid_id,
                          CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
             q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id = 0),
             probe AS (SELECT centroid_id FROM c, q
                       ORDER BY (list_dot_product(cv, qv) / greatest(sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)), 1e-300)) DESC,
                                centroid_id LIMIT 3),
             assign AS (SELECT vec_id, centroid_id FROM (
               SELECT e.vec_id, c.centroid_id,
                      row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        (list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(c.cv, c.cv)), 1e-300))
                        DESC, c.centroid_id) AS rn
               FROM embeddings e CROSS JOIN c
               WHERE e.embedding IS NOT NULL) WHERE rn = 1)
        SELECT e.vec_id FROM embeddings e
        JOIN assign a ON e.vec_id = a.vec_id
        JOIN probe p ON a.centroid_id = p.centroid_id
        CROSS JOIN q
        ORDER BY (list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(q.qv, q.qv)), 1e-300)) DESC, e.vec_id
        LIMIT 10"""

    sql["near_dup_cosine"] = """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
          AND (list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / greatest(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 1e-300)) >= 0.3"""

    # decontaminate: the benchmark is the corpus's own doc_id % 41 == 0
    # subset, so the oracle derives it identically; k-gram equality over
    # 8-token windows replays as equality of the ' '-joined gram strings
    # (split on ' ' in both engines; a token never contains ' ', so the
    # join is bijective). NULL text has no grams and always survives.
    sql["decontaminate"] = """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                      FROM documents WHERE text IS NOT NULL),
             grams AS (
               SELECT doc_id, array_to_string(ts[i : i + 7], ' ') AS gram
               FROM toks,
                    UNNEST(generate_series(1, len(ts) - 7)) AS t(i)),
             bgrams AS (SELECT DISTINCT gram FROM grams
                        WHERE doc_id % 41 = 0),
             bad AS (SELECT DISTINCT g.doc_id
                     FROM grams g JOIN bgrams b USING (gram))
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM bad)"""

    # SemDeDup: assignment replayed exactly like ivf_assign; keep = no
    # LOWER-id same-cluster vector at cosine >= 0.3 (NOT EXISTS dominance,
    # matching the engine's order-free per-cluster mask)
    sql["semdedup"] = """
        WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                            AS centroid_id,
                          CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL),
             assign AS (SELECT vec_id, centroid_id FROM (
               SELECT e.vec_id, c.centroid_id,
                      row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        (list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) / greatest(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) * sqrt(list_dot_product(c.cv, c.cv)), 1e-300))
                        DESC, c.centroid_id) AS rn
               FROM embeddings e CROSS JOIN c
               WHERE e.embedding IS NOT NULL) WHERE rn = 1)
        SELECT a.vec_id, a.centroid_id,
               CAST(NOT EXISTS (
                 SELECT 1 FROM assign a2
                 JOIN embeddings e2 ON e2.vec_id = a2.vec_id
                 WHERE a2.centroid_id = a.centroid_id
                   AND a2.vec_id < a.vec_id
                   AND (list_dot_product(CAST(e2.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) / greatest(sqrt(list_dot_product(CAST(e2.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))), 1e-300)) >= 0.3
               ) AS BIGINT) AS keep
        FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id"""

    # frames ⋈ probe dims. FakeCodec.probe: md5(payload) digest bytes 0 and
    # 1 -> dims; frame payload = md5(b"frame{i}:" + utf8(text)) — string
    # concat + md5 reproduces the digest hex exactly
    _HEXB = ("(16 * (strpos('0123456789abcdef', "
             "substr(md5(coalesce(text, '')), {a}, 1)) - 1)"
             " + strpos('0123456789abcdef', "
             "substr(md5(coalesce(text, '')), {b}, 1)) - 1)")
    sql["media_frames"] = f"""
        SELECT d.doc_id AS media_id, j AS frame_id,
               md5('frame' || j || ':' || coalesce(d.text, ''))
                 AS frame_md5,
               (16 + {_HEXB.format(a=1, b=2)} % 240)::BIGINT AS width,
               (16 + {_HEXB.format(a=3, b=4)} % 240)::BIGINT AS height
        FROM documents d CROSS JOIN (SELECT unnest(range(3)) AS j) f"""

    # per-row integer conversion before summing (exact; see relational.py)
    sql["token_quantiles"] = """
        WITH toks AS (
          SELECT lang,
                 coalesce(len(string_split(text, ' ')), 0)::BIGINT
                   AS n_tokens
          FROM documents)
        SELECT lang,
               quantile_disc(n_tokens, 0.5)::BIGINT AS p50,
               quantile_disc(n_tokens, 0.9)::BIGINT AS p90,
               quantile_disc(n_tokens, 0.99)::BIGINT AS p99
        FROM toks GROUP BY lang"""

    # sessionize (gap-based, 30-min timeout) + range join in one result:
    # each event with its containing session's id, bounds, and size
    sql["events_session_assign"] = """
        WITH ordered AS (
          SELECT user_id, ts, event_id,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN prev_ts IS NULL
                           OR date_diff('microseconds', prev_ts, ts)
                              > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM ordered),
        numbered AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) - 1
                   AS session_id
          FROM flagged),
        sess AS (
          SELECT user_id, session_id::BIGINT AS session_id,
                 min(ts) AS session_start, max(ts) AS session_end,
                 count(*)::BIGINT AS n_events
          FROM numbered GROUP BY user_id, session_id)
        SELECT e.event_id, s.session_id, s.session_start, s.session_end,
               s.n_events AS session_n_events
        FROM events e LEFT JOIN sess s
          ON e.user_id = s.user_id
         AND e.ts BETWEEN s.session_start AND s.session_end"""

    sql["hash_sample"] = """
        SELECT 'hash' AS method, doc_id FROM documents
        WHERE strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1
              >= 0
          AND (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1)
              % 10 < 5
        UNION ALL
        SELECT 'stratified' AS method, doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(text), doc_id) AS rn
          FROM documents)
        WHERE rn <= 8"""

    # crawl_delta: per-url min(md5(text)) per snapshot, FULL OUTER JOIN,
    # unchanged urls filtered out — the O(delta) recrawl planner
    sql["crawl_delta"] = """
        WITH old_snap AS (
          SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                 min(md5(text)) AS fp
          FROM documents
          WHERE doc_id % 10 <> 0 AND text IS NOT NULL
          GROUP BY 1),
        new_snap AS (
          SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS url,
                 min(md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                              ELSE text END)) AS fp
          FROM documents
          WHERE doc_id % 10 <> 1 AND text IS NOT NULL
          GROUP BY 1)
        SELECT coalesce(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    ELSE 'changed' END AS status,
               o.fp AS old_fp, n.fp AS new_fp
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.url = n.url
        WHERE o.url IS NULL OR n.url IS NULL OR o.fp <> n.fp"""

    # seeded_shuffle: shard = md5-u32 of 'epoch0:'||id mod 8; pos = the
    # within-shard rank by (md5 hex, id) — row_number replays the
    # engine's sort+arange exactly, so the permutation itself is hashed
    sql["seeded_shuffle"] = """
        WITH keyed AS (
          SELECT doc_id,
                 md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS k
          FROM documents WHERE doc_id IS NOT NULL)
        SELECT doc_id,
               CAST(('0x' || substr(k, 1, 8))::UBIGINT % 8 AS BIGINT)
                 AS shard,
               CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(k, 1, 8))::UBIGINT % 8
                    ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
        FROM keyed"""

    # mixture sampling: u32 of the first 8 md5 hex chars vs per-language
    # thresholds floor(rate * 2^32); es absent from the mix -> ELSE 0
    sql["mix_sample"] = """
        SELECT doc_id, lang FROM documents
        WHERE text IS NOT NULL
          AND ('0x' || substr(md5('mix:' || text), 1, 8))::UBIGINT
              < CASE lang
                  WHEN 'en' THEN 3865470566
                  WHEN 'de' THEN 2147483648
                  WHEN 'fr' THEN 1073741824
                  WHEN 'zh' THEN 429496729
                  ELSE 0 END"""

    sql["grouped_topk"] = """
        WITH toks AS (
          SELECT doc_id, lang,
                 len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents),
        ranked AS (
          SELECT doc_id, lang, n_tokens,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_tokens DESC, doc_id) AS rn
          FROM toks)
        SELECT doc_id, lang, n_tokens FROM ranked WHERE rn <= 3"""

    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               sum(round(l_quantity * 100)::BIGINT)::BIGINT AS sum_qty_cents,
               sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
               sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)::BIGINT
                 AS sum_disc_e4,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""

    sql["revenue_by_region"] = """
        SELECT r.r_name,
               sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS revenue_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name"""

    # tumbling 1h + (1h sliding 30min: every event belongs to exactly 2
    # windows), unioned and keyed by window_kind
    sql["events_windows"] = """
        WITH w AS (
          SELECT event_type, value,
                 make_timestamp((floor(epoch(ts) / 1800) * 1800 * 1000000)::BIGINT)
                   AS s1
          FROM events WHERE ts IS NOT NULL),
        exploded AS (
          SELECT event_type, value, s1 AS window_start FROM w
          UNION ALL
          SELECT event_type, value, s1 - INTERVAL '1800 seconds' FROM w)
        SELECT 'tumbling_1h' AS window_kind, event_type,
               date_trunc('hour', ts) AS window_start,
               count(*)::BIGINT AS n_events,
               sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
        FROM events WHERE ts IS NOT NULL
        GROUP BY event_type, date_trunc('hour', ts)
        UNION ALL
        SELECT 'sliding_1h_30m', event_type, window_start,
               count(*)::BIGINT,
               sum(round(value * 100)::BIGINT)::BIGINT
        FROM exploded GROUP BY event_type, window_start"""

    # null-ts events are listed explicitly with a NULL payload: the
    # engine's convention is "unknown time -> no match", while DuckDB's
    # ASOF JOIN will happily match a NULL probe timestamp
    sql["events_asof"] = """
        WITH o1 AS (
          SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
          FROM orders GROUP BY o_custkey, o_orderdate),
        ev AS (SELECT event_id, user_id, ts FROM events
               WHERE ts IS NOT NULL),
        nullev AS (SELECT event_id FROM events WHERE ts IS NULL)
        SELECT e.event_id, 'backward' AS direction,
               o1.o_totalprice AS totalprice
        FROM ev e
        ASOF LEFT JOIN o1
          ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
        UNION ALL
        SELECT event_id, 'backward', NULL::DOUBLE FROM nullev
        UNION ALL
        SELECT e.event_id, 'forward' AS direction,
               o1.o_totalprice AS totalprice
        FROM ev e
        ASOF LEFT JOIN o1
          ON e.user_id = o1.o_custkey AND e.ts <= o1.o_orderdate
        UNION ALL
        SELECT event_id, 'forward', NULL::DOUBLE FROM nullev"""

    return sql
