"""Benchmark harness.

Default: run the headline KG pipeline + representative operator queries over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
print ONE JSON line.

``--scaling``: run the headline pipeline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs
plus scaling efficiency (the sandbox stand-in for the N vs 4N node
criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_NAMES = [
    "kg_triples", "kg_canonical_triples", "text_tokens", "dedup_exact",
    "minhash_band_pairs", "ann_topk", "near_dup_cosine", "events_hourly",
]


def consume(result) -> int:
    """Drive a lazy result to completion; return its row count."""
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


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as mod

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq
    for t in ("documents", "embeddings", "events"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # headline: full KG pipeline (extract -> distinct -> canonicalize ->
    # rewrite -> distinct), consumed via count
    t0 = time.time()
    res = mod._build_kg(SF_DIR)
    n_triples = res.triples.count()
    headline = time.time() - t0

    n_raw = None
    queries = {}
    qs = mod.queries()
    for name in QUERY_NAMES:
        t0 = time.time()
        n = consume(qs[name](SF_DIR))
        queries[name] = round(time.time() - t0, 3)
        if name == "kg_triples":
            n_raw = n

    out = {
        "metric": "kg_pipeline_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_canonical_triples": n_triples,
        "n_distinct_triples": n_raw,
        "triples_per_sec": round(n_triples / headline, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "throughput_8": r_lo["triples_per_sec"],
        "throughput_32": r_hi["triples_per_sec"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
