"""Randomized-corpus differential harness: run driver queries() against
their oracle_sql() on a FUZZED documents table — nulls, unicode, empty
strings, heavy duplication, CJK, emoji — not just the fixed sf fixtures.
The oracles define the semantics; if engine and DuckDB agree on a corpus
the fixtures never exercised, the agreement is about the operators, not
the data. Doc-only queries only (the fuzz dir carries documents.parquet);
the time/vector families have their own randomized serial replays."""

import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FUZZ_QUERIES = [
    "dedup_exact", "hash_sample", "mix_sample", "seeded_shuffle",
    "crawl_delta", "paragraph_dedup", "dedup_simhash", "text_tokens",
    "approx_distinct_by_lang", "grouped_topk", "minhash_signatures",
    "dedup_spans", "token_quantiles",
    # the KG-construction chain itself (null lang -> 'unknown' pages,
    # null text -> no chunks, stripped-token triple stream)
    "kg_pages", "kg_extract_text", "kg_chunks", "kg_triples",
    "kg_canonical_triples", "kg_alias_map", "kg_components",
    "kg_pagerank", "kg_degrees", "kg_top", "kg_graph_stats",
    "kg_triples_raw", "kg_triples_routed", "kg_triples_llm",
    "kg_incremental", "kg_semantic_alias", "kg_neighborhood",
    "kg_graph_json",
    # LM / retrieval / dedup / composition families
    "mint_doc_ids", "lm_score", "ppl_buckets", "dsir_weights",
    "tfidf_top_terms", "bm25_scores", "doc_winnow",
    "minhash_band_pairs", "minhash_sig_fast", "near_dup_canonical",
    "near_dup_jaccard", "text_quality", "llm_filter", "hygiene_counts",
    "approx_distinct_docs", "messages_flatten", "wikiqa_clean",
    "mine_accuracy", "decontaminate",
    # media_frames once deadlocked here (two FIXED concurrency=2 actor
    # pools under the 4-CPU test session); elastic (1, n) pool sizing
    # made it schedulable at any session width — regression-pinned by
    # keeping it in this 4-CPU campaign
    "media_frames",
]

_TEMPLATES = [
    "the cat sat on the mat. the dog ate the bone. fin",
    "der hund und die katze. das ist ein test. ende",
    "café naïve — déjà vu. le chat est dans la maison. voilà",
    "北京 is a city. 東京 is another. the end",
    "boilerplate footer text appears on every page. contact us today",
    "the data table layout. every table has rows. a table ends here",
    "emoji soup 🦊🦊 and more 🎉. short",
    "   ",
    "",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
]


def _fuzz_corpus(tmpdir: str, seed: int = 4117, n: int = 300,
                 rng=None, in_place: bool = False) -> str:
    if rng is None:
        rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(1, n + 1))
    langs = np.array(["en", "de", "fr", "es", "zh", None], dtype=object)
    texts, lang_col = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            texts.append(None)
        elif r < 0.45:                       # heavy duplication
            texts.append(_TEMPLATES[int(rng.integers(len(_TEMPLATES)))])
        else:                                # unique-ish compositions
            k = int(rng.integers(1, 4))
            # whitespace-only parts stay whole-doc rows (above): a
            # multi-space INTER-SENTENCE run inside a composition is the
            # one family the chunk oracle cannot replay (the engine, like
            # the reference chunker, joins sentences with single spaces)
            parts = [t for t in
                     (_TEMPLATES[int(rng.integers(len(_TEMPLATES)))]
                      for _ in range(k)) if t.strip()]
            texts.append(f"u{i} " + ". ".join(parts))
        lang_col.append(langs[int(rng.integers(len(langs)))])
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(
            [f"s{int(rng.integers(3))}" for _ in range(n)], pa.string()),
        "n_chars": pa.array(
            [len(t) if t is not None else None for t in texts], pa.int64()),
    })
    path = tmpdir if in_place else os.path.join(tmpdir, "fuzz_sf")
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return path


def _value_hash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).values.tolist())
    return hashlib.md5(
        "\n".join(",".join(r) for r in rows).encode()).hexdigest()


@pytest.fixture(scope="module", params=[4117, 90210])
def fuzz_dir(tmp_path_factory, request):
    """Two seeds: different null layouts, duplicate collisions, and
    md5-bucket placements per corpus."""
    return _fuzz_corpus(str(tmp_path_factory.mktemp("fuzz")),
                        seed=request.param)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_query_matches_oracle_on_fuzzed_corpus(ray_session, fuzz_dir, name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](fuzz_dir)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fuzz_dir}/documents.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)


# --- unicode-whitespace padding (chunk-chain strip parity) -------------------
# The general fuzz corpus stays inside the shared ASCII-space alphabet:
# RAW tokenizers intentionally differ on exotic whitespace (engine
# utf8_split_whitespace vs oracle RE2 '\s+' in tfidf), and that family is
# documented, not hidden. The chunk chain, though, consumes Python
# str.strip() text (reference chunk_text semantics), and the oracle's
# _STRIP now mirrors the FULL str.isspace() set — pinned here with docs
# padded by NBSP / NEL / LS / ideographic-space edges.

CHUNK_CHAIN_QUERIES = ["kg_pages", "kg_extract_text", "kg_chunks",
                       "kg_triples", "kg_canonical_triples", "text_tokens"]

_PADS = ["", " ", "\u00a0 ", "\u0085", "\u2028\u2009",
         "\u3000\u3000", "\x1c\x1d\x1e\x1f", "\u202f\u205f", "\t\u200a"]


@pytest.fixture(scope="module")
def fuzz_dir_uws(tmp_path_factory):
    rng = np.random.default_rng(7343)
    n = 120
    texts, langs = [], []
    for i in range(n):
        pad_l = _PADS[int(rng.integers(len(_PADS)))]
        pad_r = _PADS[int(rng.integers(len(_PADS)))]
        if rng.random() < 0.08:
            texts.append(pad_l + pad_r)     # whitespace-only -> no chunks
        else:
            base = _TEMPLATES[int(rng.integers(len(_TEMPLATES) - 3))]
            texts.append(pad_l + base + pad_r)
        langs.append(["en", "de", None][int(rng.integers(3))])
    path = os.path.join(str(tmp_path_factory.mktemp("fuzz_uws")), "sf")
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s0"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(path, "documents.parquet"))
    return path


@pytest.mark.parametrize("name", CHUNK_CHAIN_QUERIES)
def test_chunk_chain_on_unicode_whitespace_padding(ray_session,
                                                   fuzz_dir_uws, name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](fuzz_dir_uws)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fuzz_dir_uws}/documents.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)


# --- events + embeddings fuzz (time/vector families) ------------------------

EVENT_QUERIES = ["events_windows", "events_asof", "events_session_assign"]
VECTOR_QUERIES = ["ann_topk", "ann_topk_multi", "ivf_assign", "ivf_topk",
                  "near_dup_cosine", "semdedup",
                  # fuses bm25 over the fuzz documents with ann over the
                  # fuzz embeddings — needs both tables, so it lives in
                  # the tv fixture (closes the last fuzz-coverage gap)
                  "rank_fusion_topk"]


def _fuzz_events(path: str, rng) -> None:
    n = 600
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = [None if rng.random() < 0.04 else
          base + np.timedelta64(int(rng.integers(0, 72 * 3600)), "s")
          for _ in range(n)]
    tbl = pa.table({
        "event_id": pa.array(rng.permutation(np.arange(1, n + 1)),
                             pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(
            [None if rng.random() < 0.05 else int(rng.integers(0, 25))
             for _ in range(n)], pa.int64()),
        "event_type": pa.array(
            [str(rng.choice(["click", "view", "buy", "💳pay", ""]))
             if rng.random() > 0.03 else None for _ in range(n)],
            pa.string()),
        "value": pa.array(
            [None if rng.random() < 0.05
             else round(float(rng.normal(0, 50)), 4)  # incl. negatives
             for _ in range(n)], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, os.path.join(path, "events.parquet"))


def _fuzz_embeddings(path: str, rng) -> None:
    n, dim = 250, 8
    vecs = []
    for i in range(n):
        r = rng.random()
        if r < 0.04:
            vecs.append(None)                      # null vector
        elif r < 0.08:
            vecs.append([0.0] * dim)               # zero vector (norm edge)
        elif r < 0.4 and vecs:
            prev = next((v for v in reversed(vecs) if v), None)
            vecs.append(list(prev) if prev else
                        [float(x) for x in rng.normal(0, 1, dim)])
        else:
            vecs.append([round(float(x), 4)
                         for x in rng.normal(0, 1, dim)])
    ids = rng.permutation(np.arange(n))        # fixture ids start at 0
    # vec_id 0 is the conventional query vector (get_query_vector(emb, 0));
    # a null QUERY is degenerate input, not a fuzz target — pin it dense
    zero_at = int(np.flatnonzero(ids == 0)[0])
    if vecs[zero_at] is None:
        vecs[zero_at] = [round(float(x), 4) for x in rng.normal(0, 1, dim)]
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(
            [int(rng.integers(0, 5)) for _ in range(n)], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))


def _fuzz_orders(path: str, rng) -> None:
    """Fuzzed as-of dimension: null custkeys/orderdates, duplicate
    (custkey, date) rows (the oracle pre-aggregates with max)."""
    n = 150
    base = np.datetime64("2024-02-25T00:00:00", "us")
    tbl = pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array(
            [None if rng.random() < 0.06 else int(rng.integers(0, 25))
             for _ in range(n)], pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array(
            [round(float(rng.uniform(10, 1000)), 2) for _ in range(n)],
            pa.float64()),
        "o_orderdate": pa.array(
            [None if rng.random() < 0.05 else
             base + np.timedelta64(int(rng.integers(0, 96 * 3600)), "s")
             for _ in range(n)], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    })
    pq.write_table(tbl, os.path.join(path, "orders.parquet"))


@pytest.fixture(scope="module", params=[9241, 1337])
def fuzz_dir_tv(tmp_path_factory, request):
    path = os.path.join(str(tmp_path_factory.mktemp("fuzz_tv")), "sf")
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(request.param)
    _fuzz_events(path, rng)
    _fuzz_embeddings(path, rng)
    _fuzz_orders(path, rng)
    _fuzz_corpus(path, rng=rng, in_place=True)  # docs for rank_fusion_topk
    return path


@pytest.mark.parametrize("name", EVENT_QUERIES + VECTOR_QUERIES)
def test_time_vector_queries_match_oracle_on_fuzz(ray_session, fuzz_dir_tv,
                                                  name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](fuzz_dir_tv)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    for t in ("events", "embeddings", "orders", "lineitem", "customer",
              "nation", "region", "supplier", "part", "documents"):
        if os.path.exists(f"{fuzz_dir_tv}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{fuzz_dir_tv}/{t}.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)


# --- adversarial corpus: one giant duplicate class ---------------------------

DUP_QUERIES = ["near_dup_canonical", "paragraph_dedup", "dedup_spans",
               "minhash_band_pairs", "dedup_exact", "crawl_delta",
               "seeded_shuffle"]


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """Every document carries the SAME text — the hot-bucket /
    single-duplicate-class extreme that stresses pair prefilters,
    chain pairing, and loser-side exchanges."""
    path = os.path.join(str(tmp_path_factory.mktemp("fuzz_dup")), "sf")
    os.makedirs(path, exist_ok=True)
    n = 200
    text = ("the cat sat on the mat. the dog ate the bone. "
            "boilerplate footer appears on every page")
    tbl = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array([text] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s0"] * n, pa.string()),
        "n_chars": pa.array([len(text)] * n, pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return path


@pytest.mark.parametrize("name", DUP_QUERIES)
def test_all_duplicates_corpus_matches_oracle(ray_session, dup_dir, name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](dup_dir)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dup_dir}/documents.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)


@pytest.mark.parametrize("name", ["minhash_band_pairs",
                                  "near_dup_canonical",
                                  "near_dup_jaccard"])
def test_all_duplicates_corpus_forced_duals(ray_session, dup_dir, name):
    """The one-giant-duplicate-class corpus through the FORCED scale-side
    duals (KG_FORCE_JOIN_DUALS=1): the hot-bucket semi-join — whose
    motivating case IS the dup-heavy crawl — plus the pair/CC/survivor
    join duals, all against the same oracle as the broadcast path."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    os.environ["KG_FORCE_JOIN_DUALS"] = "1"
    try:
        res = mod.queries()[name](dup_dir)
        rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    finally:
        os.environ.pop("KG_FORCE_JOIN_DUALS")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dup_dir}/documents.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)


# --- relational fuzz (TPC-H-shaped tables with nulls) ------------------------

RELATIONAL_QUERIES = ["pricing_summary", "revenue_by_region"]


def _fuzz_relational(path: str, rng) -> None:
    n = 400
    base = np.datetime64("1995-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "l_partkey": pa.array(
            [int(rng.integers(1, 50)) for _ in range(n)], pa.int64()),
        "l_suppkey": pa.array(
            [int(rng.integers(1, 20)) for _ in range(n)], pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array(
            [None if rng.random() < 0.05
             else round(float(rng.uniform(1, 50)), 2)
             for _ in range(n)], pa.float64()),
        "l_extendedprice": pa.array(
            [None if rng.random() < 0.05
             else round(float(rng.uniform(100, 10000)), 2)
             for _ in range(n)], pa.float64()),
        "l_discount": pa.array(
            [None if rng.random() < 0.05
             else round(float(rng.uniform(0, 0.1)), 2) for _ in range(n)],
            pa.float64()),
        "l_tax": pa.array(
            [round(float(rng.uniform(0, 0.08)), 2) for _ in range(n)],
            pa.float64()),
        "l_returnflag": pa.array(
            [None if rng.random() < 0.05
             else str(rng.choice(["A", "N", "R"])) for _ in range(n)],
            pa.string()),
        "l_linestatus": pa.array(
            [str(rng.choice(["O", "F"])) for _ in range(n)], pa.string()),
        "l_shipdate": pa.array(
            [None if rng.random() < 0.04
             else base + np.timedelta64(int(rng.integers(0, 2000)), "D")
             for _ in range(n)], pa.timestamp("us")),
    }), os.path.join(path, "lineitem.parquet"))
    nc = 60
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, nc + 1), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(nc)], pa.string()),
        "c_nationkey": pa.array(
            [None if rng.random() < 0.05 else int(rng.integers(0, 5))
             for _ in range(nc)], pa.int32()),
        "c_acctbal": pa.array([0.0] * nc, pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * nc, pa.string()),
    }), os.path.join(path, "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(5), pa.int32()),
        "n_name": pa.array([f"N{i}" for i in range(5)], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1, 2], pa.int32()),
    }), os.path.join(path, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(3), pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA", "EUROPE"], pa.string()),
    }), os.path.join(path, "region.parquet"))


@pytest.fixture(scope="module")
def fuzz_dir_rel(tmp_path_factory):
    path = os.path.join(str(tmp_path_factory.mktemp("fuzz_rel")), "sf")
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(2025)
    _fuzz_relational(path, rng)
    _fuzz_events(path, rng)   # revenue's orders side: reuse events dir?
    _fuzz_orders(path, rng)
    return path


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_queries_match_oracle_on_fuzz(ray_session, fuzz_dir_rel,
                                                 name):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    res = mod.queries()[name](fuzz_dir_rel)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    for t in ("lineitem", "customer", "nation", "region", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{fuzz_dir_rel}/{t}.parquet')")
    odf = con.execute(mod.oracle_sql()[name]).df()
    assert sorted(map(str, rdf.columns)) == sorted(map(str, odf.columns))
    assert len(rdf) == len(odf), (len(rdf), len(odf))
    assert _value_hash(rdf) == _value_hash(odf)
