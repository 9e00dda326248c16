"""Benchmark harness.

Default: ONE JSON line with
  * headline: the full KG pipeline over ``$GRAFT_SF_DIR`` documents-as-pages
    (the driver-comparable workload), plus representative operator queries,
  * synth: a compute-heavy composite over a deterministic synthetic pages
    corpus (KG construction + MinHash signatures + SimHash + token stats) —
    the workload whose per-chunk cost profile resembles a real extractor.

``--scaling``: run the synth composite twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same corpus and report both throughputs
plus scaling efficiency (the sandbox stand-in for BASELINE.json's N vs 4N
node criterion).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default
32), KG_BENCH_PAGES (default 400000), KG_BENCH_DIR (corpus cache dir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("KG_BENCH_PAGES", "400000"))
# "rich" profile: 25-50 fact sentences per page (~2-3 KB of text, a
# realistic web-page payload) so stage compute, not barrier overhead,
# dominates the scaling measurement
FACTS_RANGE = (25, 50)
BENCH_DIR = os.environ.get(
    "KG_BENCH_DIR", f"/tmp/kg_bench_corpus_v3_{BENCH_PAGES}")
SHARD = 12_500

# Registry names as of round 3's fixed-window consolidation (52 queries as
# of round 4). Renames vs the
# round-2 bench (for cross-round ratio reading): events_hourly +
# events_sliding -> events_windows (one unioned query); events_sessions ->
# events_session_assign (sessionize + range join merged); fused_text_fast
# (deregistered) -> minhash_sig_fast, the oracled fast-family stand-in.
QUERY_NAMES = [
    "kg_triples", "kg_canonical_triples", "kg_triples_llm", "text_tokens",
    "minhash_sig_fast", "dedup_exact", "minhash_band_pairs",
    "near_dup_canonical", "paragraph_dedup", "lm_score", "ann_topk",
    "near_dup_cosine", "crawl_delta", "seeded_shuffle",
    "events_windows", "events_asof", "events_session_assign",
    "pricing_summary", "revenue_by_region", "token_quantiles",
]


def consume(result) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    return 0


def ensure_corpus(out_dir: str | None = None, **synth_kwargs) -> str:
    """Generate (once, cached) a synthetic pages corpus: one Ray task per
    shard, each deterministic via seed = 42 + shard index. ``synth_kwargs``
    pass through to the generator (e.g. the skew probe's hot_entity)."""
    import ray
    out_dir = out_dir or BENCH_DIR
    n_shards = (BENCH_PAGES + SHARD - 1) // SHARD
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            cached = f.read().strip()
        if cached == str(BENCH_PAGES):
            return out_dir
        # stale cache from a different KG_BENCH_PAGES: reusing it would
        # silently report throughput against the wrong page count
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen(shard: int) -> str:
        import pyarrow.parquet as pq
        from kg_gen_ray.sources.pages import synthetic_pages_table
        n = min(SHARD, BENCH_PAGES - shard * SHARD)
        t = synthetic_pages_table(n, seed=42 + shard,
                                  facts_range=FACTS_RANGE, **synth_kwargs)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        pq.write_table(t, path)
        return path

    ray.get([gen.remote(i) for i in range(n_shards)])
    with open(marker, "w") as f:
        f.write(str(BENCH_PAGES))
    return out_dir


def warm_cluster(corpus: str) -> None:
    """Steady-state prep, outside the timed window: prime the OS page cache
    for the corpus files and pre-spawn the full worker pool with the heavy
    imports done (a real cluster-throughput measurement excludes cold
    start; fresh-process children would otherwise pay worker spawn +
    module import inside the timing — and pay MORE of it at higher
    parallelism, corrupting the efficiency ratio)."""
    import glob

    import ray

    @ray.remote(num_cpus=1)
    def touch(path: str) -> int:
        # heavy imports once per worker process + file bytes into page cache
        import numpy  # noqa: F401
        import polars  # noqa: F401
        import pyarrow.compute  # noqa: F401
        import kg_gen_ray.functions.dedup  # noqa: F401
        import kg_gen_ray.functions.fast_text  # noqa: F401
        import kg_gen_ray.pipelines.kg_pipeline  # noqa: F401
        n = 0
        with open(path, "rb") as f:
            while chunk := f.read(1 << 22):
                n += len(chunk)
        return n

    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    # at least one task per CPU so the whole pool spawns and imports
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    work = files * max(1, -(-2 * ncpu // max(1, len(files))))
    ray.get([touch.remote(p) for p in work])


def run_synth() -> dict:
    """The composite workload over the synthetic corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from kg_gen_ray.config import PipelineConfig
    from kg_gen_ray.functions.fast_text import fused_text_analysis
    from kg_gen_ray.pipelines.kg_pipeline import build_kg

    corpus = ensure_corpus()
    warm_cluster(corpus)
    sections = {}

    t0 = time.time()
    cfg = PipelineConfig(chunk_size=300, salt_buckets=16,
                         shuffle_partitions="auto")
    pages = rd.read_parquet(corpus)
    res = build_kg(pages, cfg)
    n_triples = res.triples.count()
    sections["kg_pipeline"] = round(time.time() - t0, 3)

    def as_docs(t: pa.Table) -> pa.Table:
        # url ".../doc-<n>" -> doc_id, fully in Arrow kernels
        tail = pc.struct_field(
            pc.extract_regex(pc.cast(t["url"], pa.string()),
                             pattern=r"-(?P<id>\d+)$"), "id")
        return pa.table({
            "doc_id": pc.cast(tail, pa.int64()),
            "text": pc.cast(t["text"], pa.string()),
        })

    # fused single-pass text analysis (one tokenization -> token stats +
    # SimHash + MinHash, fully vectorized) — the scale-path operator
    analysis = fused_text_analysis

    t0 = time.time()
    docs = rd.read_parquet(corpus, columns=["url", "text"]) \
             .map_batches(as_docs, batch_format="pyarrow")
    n_docs = docs.map_batches(analysis, batch_format="pyarrow").count()
    sections["text_analysis"] = round(time.time() - t0, 3)

    total = sum(sections.values())
    return {
        "n_pages": BENCH_PAGES,
        "n_canonical_triples": n_triples,
        "sections": sections,
        "total_sec": round(total, 3),
        "pages_per_sec": round(BENCH_PAGES * 2 / total, 1),
    }


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as mod

    # warm the OS page cache so we measure compute + shuffle, not cold
    # disk — EVERY table a timed query reads (lineitem is the largest;
    # leaving it cold skewed the relational queries' first-run numbers)
    import pyarrow.parquet as pq
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "nation", "region"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    t0 = time.time()
    res = mod._build_kg(SF_DIR)
    n_triples = res.triples.count()
    headline = time.time() - t0

    queries = {}
    qs = mod.queries()
    for name in QUERY_NAMES:
        t0 = time.time()
        consume(qs[name](SF_DIR))
        queries[name] = round(time.time() - t0, 3)

    synth = run_synth()

    out = {
        "metric": "kg_pipeline_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_canonical_triples": n_triples,
        "synth": synth,
    }
    ray.shutdown()
    return out


def run_skew() -> dict:
    """Hot-entity skew probe: same composite KG pipeline over a corpus
    where one entity appears in 40% of all pages (FIXTURES.md §6 shape),
    vs the uniform corpus — evidence that the salted canonicalization
    groupby keeps throughput flat under a hot key."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data as rd

    from kg_gen_ray.config import PipelineConfig
    from kg_gen_ray.pipelines.kg_pipeline import build_kg

    skew_dir = ensure_corpus(BENCH_DIR.rstrip("/") + "_skew",
                             hot_entity="machine learning",
                             hot_fraction=0.4)
    uniform = ensure_corpus()
    warm_cluster(uniform)
    warm_cluster(skew_dir)
    cfg = PipelineConfig(chunk_size=300, salt_buckets=16,
                         shuffle_partitions="auto")
    timings = {}
    for name, corpus in (("uniform", uniform), ("skewed", skew_dir)):
        t0 = time.time()
        res = build_kg(rd.read_parquet(corpus), cfg)
        n = res.triples.count()
        timings[name] = {"sec": round(time.time() - t0, 3), "triples": n}
    ratio = timings["skewed"]["sec"] / timings["uniform"]["sec"]
    out = {
        "metric": "skew_slowdown_ratio",
        "value": round(ratio, 3),
        "unit": "ratio",
        "n_pages": BENCH_PAGES,
        "hot_fraction": 0.4,
        "num_cpus": NUM_CPUS,
        "timings": timings,
    }
    ray.shutdown()
    return out


def run_skew_judge() -> dict:
    """Judge-path hot-key probe: time the JUDGED canonicalization (the
    two-level salted flow) over a label table where 40% of all labels
    normalize to ONE key, vs a uniform table of the same size. The hot
    members are case-mask variants of one long word (distinct strings,
    identical norm_key), so before the salting fix the whole hot group
    landed on a single reducer and the ratio blew up; with the two-level
    salted flow the gate is ratio <= ~1. (Values well BELOW 1 are
    expected: the hot table has 40% fewer distinct keys, and per-key
    judge dispatch — not row volume — dominates this probe.)"""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow as pa

    import ray.data as rd
    from kg_gen_ray.stages.canonicalize import canonicalize_label_table

    n_labels = 400_000
    hot_word = "machinelearningsystem"          # 21 alpha chars -> 2^21 variants

    def case_variant(i: int) -> str:
        return "".join(c.upper() if (i >> k) & 1 else c
                       for k, c in enumerate(hot_word))

    def labels_table(hot_fraction: float) -> "rd.Dataset":
        n_hot = int(n_labels * hot_fraction)
        members = [case_variant(i) for i in range(n_hot)]
        members += [f"item-{i:07d}" for i in range(n_labels - n_hot)]
        t = pa.table({"kind": pa.array(["entity"] * n_labels),
                      "member": pa.array(members, pa.string())})
        return rd.from_arrow(t).repartition(NUM_CPUS)

    def merge_all(chunk):
        return [list(chunk)]

    timings = {}
    for name, frac in (("uniform", 0.0), ("hot40", 0.4)):
        ds = labels_table(frac).materialize()
        t0 = time.time()
        n = canonicalize_label_table(ds, salt_buckets=16,
                                     judge=merge_all).count()
        timings[name] = {"sec": round(time.time() - t0, 3), "rows": n}
    ratio = timings["hot40"]["sec"] / timings["uniform"]["sec"]
    out = {
        "metric": "judge_skew_slowdown_ratio",
        "value": round(ratio, 3),
        "unit": "ratio",
        "n_labels": n_labels,
        "hot_fraction": 0.4,
        "num_cpus": NUM_CPUS,
        "timings": timings,
    }
    ray.shutdown()
    return out


def run_memory_probe(store_mb: int = 256) -> dict:
    """Backpressure/memory-stability probe (north_star: 'streaming
    execution with bounded object-store backpressure keeps the run
    memory-stable'): run the composite KG pipeline under an object store
    far smaller than the data flowing through it. Completion (with
    spilling) is the pass criterion; the slowdown vs an unconstrained
    store is the price of the bound, not a failure."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             object_store_memory=store_mb * 1024 * 1024,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data as rd

    from kg_gen_ray.config import PipelineConfig
    from kg_gen_ray.pipelines.kg_pipeline import build_kg

    corpus = ensure_corpus()
    warm_cluster(corpus)
    t0 = time.time()
    res = build_kg(rd.read_parquet(corpus),
                   PipelineConfig(chunk_size=300, salt_buckets=16,
                                  shuffle_partitions="auto"))
    n = res.triples.count()
    out = {
        "metric": "memory_probe_seconds",
        "value": round(time.time() - t0, 3),
        "unit": "sec",
        "object_store_mb": store_mb,
        "n_pages": BENCH_PAGES,
        "n_canonical_triples": n,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_hygiene() -> dict:
    """Training-data hygiene throughput probe (NOT part of the default
    headline, so round-over-round bench comparisons stay apples-to-
    apples): per-stage wall + pages/sec over the cached synthetic corpus
    for scrub_pii, decontaminate (planted leaks), stratified_sample,
    pack_sequences, and the streaming dedup index."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    corpus = ensure_corpus()
    warm_cluster(corpus)

    # the corpus repeats each url once per shard (url-dedup ops need the
    # duplicates), so url-HASH ids would repeat across shards and every
    # id-keyed stage (drop_ids, decontaminate, the dedup index) would
    # alias drops across 32 unrelated rows. Derive UNIQUE (shard,
    # url-tail) ids from the file path instead — shared by docs_ds and
    # para_docs below.
    def _unique_ids(t: pa.Table) -> pa.Array:
        n = pc.cast(pc.struct_field(pc.extract_regex(
            pc.cast(t["url"], pa.string()), r"-(?P<n>\d+)$"), "n"),
            pa.int64())
        shard = pc.cast(pc.struct_field(pc.extract_regex(
            pc.cast(t["path"], pa.string()),
            r"-(?P<s>\d+)\.parquet$"), "s"), pa.int64())
        return pc.add(pc.multiply(shard, pa.scalar(1 << 22, pa.int64())), n)

    def docs_ds():
        pages = rd.read_parquet(corpus, columns=["url", "text", "lang"],
                                include_paths=True)

        def to_docs(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": _unique_ids(t),
                "text": t["text"], "lang": t["lang"]})

        return pages.map_batches(to_docs, batch_format="pyarrow")

    # benchmark corpus for decontamination: real phrases from the corpus
    # itself (guaranteed hits) — 50 docs' texts
    sample_texts = [r["text"] for r in docs_ds().take(50)]
    bench_tbl = rd.from_arrow(pa.table({
        "text": pa.array(sample_texts, pa.string())}))

    timings: dict = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        sec = round(time.time() - t0, 3)
        # rows_out = rows the stage RETURNS (survivors for the filters
        # — the templated synthetic corpus makes near-everything collide,
        # which is exactly what stresses the drop paths)
        timings[name] = {"sec": sec, "rows_out": int(n),
                         "pages_per_sec": round(BENCH_PAGES / sec, 1)}

    from kg_gen_ray.functions.decontaminate import decontaminate
    from kg_gen_ray.functions.scrub import scrub_pii
    from kg_gen_ray.functions.sessions import (
        pack_sequences, stratified_sample)
    from kg_gen_ray.state.dedup_index import StreamingDedupIndex

    timed("scrub_pii", lambda: scrub_pii(docs_ds()).count())

    # CCNet paragraph pass over the fact sentences as paragraphs — facts
    # repeat across templated pages, so this measures the boilerplate-
    # heavy case (the per-worker md5 memo's target)
    from kg_gen_ray.functions.paragraphs import paragraph_dedup

    def para_docs():
        pages = rd.read_parquet(corpus, columns=["url", "text"],
                                include_paths=True)

        def to_paras(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": _unique_ids(t),
                "text": pc.replace_substring(
                    pc.cast(t["text"], pa.string()), ". ", "\n\n"),
            })
        return pages.map_batches(to_paras, batch_format="pyarrow")

    timed("paragraph_dedup", lambda: paragraph_dedup(para_docs()).count())

    # Lee et al. span removal over the templated corpus: boilerplate-
    # extreme, so the loser set is corpus-sized and this exercises the
    # posblob join dual at full volume
    from kg_gen_ray.functions.spans import dedup_spans
    timed("dedup_spans", lambda: dedup_spans(para_docs()).count())

    # Gopher rule kernels at full volume (thresholds chosen to keep every
    # page so the probe measures compute, not corpus-specific cut rates;
    # one rule from each kernel family so both signal passes run)
    from kg_gen_ray.pipelines.hygiene import _gopher_filter
    timed("gopher_filter", lambda: _gopher_filter(
        docs_ds(), {"min_alpha_word_frac": 0.0,
                    "max_top_2gram_char_frac": 1e9}, "text").count())
    timed("decontaminate",
          lambda: decontaminate(docs_ds(), bench_tbl, k=8).count())
    timed("stratified_sample",
          lambda: stratified_sample(docs_ds(), "lang", cap=1000).count())
    timed("pack_sequences",
          lambda: pack_sequences(docs_ds(), max_tokens=2048).count())
    idx = StreamingDedupIndex(n_shards=max(2, NUM_CPUS // 4))
    timed("streaming_dedup_index",
          lambda: idx.filter_new(docs_ds()).count())
    from kg_gen_ray.functions.fast_text import minhash_signatures_ahash
    idx2 = StreamingDedupIndex(n_shards=max(2, NUM_CPUS // 4),
                               signatures=minhash_signatures_ahash)
    timed("streaming_dedup_index_ahash",
          lambda: idx2.filter_new(docs_ds()).count())

    # e2e composition WITHOUT the benchmark stage: the templated
    # synthetic corpus shares k-grams with any sample of itself, so a
    # contamination pass would empty the pipeline and make the
    # dedup/cap/pack stages trivial — decontaminate's own row above
    # already measures that stage at full volume
    from kg_gen_ray.pipelines.hygiene import prepare_training_data
    timed("hygiene_pipeline_e2e",
          lambda: prepare_training_data(
              docs_ds(), benchmark=None, per_group_cap=50_000,
              max_tokens=2048, count_stages=False).packed.count())
    out = {
        "metric": "hygiene_pages_per_sec",
        "value": min(v["pages_per_sec"] for v in timings.values()),
        "unit": "pages/sec",
        "n_pages": BENCH_PAGES,
        "num_cpus": NUM_CPUS,
        "stages": timings,
    }
    ray.shutdown()
    return out


def run_scaling_child() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    out = run_synth()
    out["num_cpus"] = NUM_CPUS
    ray.shutdown()
    return out


def _burn(seconds: float) -> int:
    """One process-worth of pure-Python compute (no syscalls, no shared
    state) — the calibration workload for _hw_capacity."""
    import time as _t
    t0 = _t.time()
    x = 0
    while _t.time() - t0 < seconds:
        x += 1
    return x


def _hw_capacity(procs: int, seconds: float = 2.0) -> float:
    """Aggregate iterations/sec of ``procs`` independent burn processes.
    Embarrassingly parallel with zero coordination, so any shortfall vs
    procs x single-proc rate is the HOST's (SMT siblings, hypervisor
    oversubscription, thermal limits) — the ceiling no software can beat."""
    import multiprocessing as mp
    with mp.get_context("spawn").Pool(procs) as p:
        total = sum(p.map(_burn, [seconds] * procs))
    return total / seconds


def run_scaling() -> dict:
    """Same job at two parallelism widths in fresh processes (the sandbox
    stand-in for BASELINE.json's N vs 4N node criterion), PLUS a
    hardware-capacity calibration at the same two widths. On a VM whose
    vCPUs outnumber effective cores (SMT pairs / host oversubscription),
    raw 8->32 efficiency is bounded by the hardware well below 1.0 even
    for coordination-free work; normalized_efficiency divides that ceiling
    out and is the number that transfers to real N vs 4N NODES (where 4N
    nodes have 4N physical cores and no SMT boundary is crossed).
    Override legs with KG_SCALE_LO / KG_SCALE_HI."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("KG_SCALE_LO", "8"))
    hi = int(os.environ.get("KG_SCALE_HI", "32"))
    # generate/cache the corpus once (children warm themselves via
    # warm_cluster, so no full warm run is needed)
    env = dict(os.environ, RAY_GRAFT_CPUS=str(hi))
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--gen-corpus"], env=env, capture_output=True,
                   text=True, check=True)
    cap_lo = _hw_capacity(lo)
    r_lo = one(lo)
    r_hi = one(hi)
    cap_hi = _hw_capacity(hi)
    eff = (r_lo["total_sec"] / r_hi["total_sec"]) / (hi / lo)
    hw_ceiling = (cap_hi / cap_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "normalized_efficiency": round(eff / hw_ceiling, 3),
        "hw_ceiling": round(hw_ceiling, 3),
        "cpus_lo": lo,
        "cpus_hi": hi,
        "n_pages": BENCH_PAGES,
        "sec_lo": r_lo["total_sec"],
        "sec_hi": r_hi["total_sec"],
        "sections_lo": r_lo["sections"],
        "sections_hi": r_hi["sections"],
        "pages_per_sec_lo": r_lo["pages_per_sec"],
        "pages_per_sec_hi": r_hi["pages_per_sec"],
    }


if __name__ == "__main__":
    if "--gen-corpus" in sys.argv:
        import ray
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        print(ensure_corpus())
        ray.shutdown()
    elif "--scaling-child" in sys.argv:
        print(json.dumps(run_scaling_child()))
    elif "--skew-judge" in sys.argv:
        print(json.dumps(run_skew_judge()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--memory-probe" in sys.argv:
        print(json.dumps(run_memory_probe()))
    elif "--hygiene" in sys.argv:
        print(json.dumps(run_hygiene()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
