"""Resumable, partitioned execution of the KG pipeline.

Phase 1 (embarrassingly parallel, checkpointed): each input-shard partition
runs pages -> extract_text -> chunk -> extract -> local distinct and writes
its raw-triples Parquet directory atomically with a lineage manifest.
A rerun (crash, preemption, new shards) skips completed partitions.

Phase 2 (the wide stages, cheap relative to extraction): read all partition
outputs, global distinct, canonicalize, rewrite, materialize. Phase 2 is
idempotent and simply re-runs; its input is the phase-1 checkpoint, so no
extraction work is ever repeated — the property the reference gets from its
per-article output-file skip (``_2_generate_kgs.py:127-129``), generalized.
"""

from __future__ import annotations

import os

import ray.data

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.pipelines.kg_pipeline import raw_triples
from kg_gen_ray.state import lineage


def partition_inputs(input_files: list, n_partitions: int) -> list:
    """Deterministic round-robin file sharding (sorted for stability)."""
    files = sorted(input_files)
    if not files:
        # fail here with the actual problem; an empty partition would
        # crash later inside ray.data.read_parquet([]) with an opaque
        # internal error (wrong/empty input glob is a common mistake)
        raise ValueError("no input files to partition")
    n_partitions = min(n_partitions, len(files)) or 1
    parts = [[] for _ in range(n_partitions)]
    for i, f in enumerate(files):
        parts[i % n_partitions].append(f)
    return parts


def run_partition(pid: int, files: list, out_dir: str,
                  config: PipelineConfig) -> lineage.PartitionManifest:
    """Extract one partition to ``{out_dir}/triples_raw/part-{pid}`` with a
    manifest. No-op if already complete for this config."""
    manifest_dir = os.path.join(out_dir, "manifests")
    cfg_hash = config.config_hash()
    if lineage.is_complete(manifest_dir, pid, cfg_hash, input_files=files):
        return lineage.read_manifest(manifest_dir, pid)

    t0 = lineage.now()
    pages = ray.data.read_parquet(files)
    n_pages = pages.count()
    raw = raw_triples(pages, config)
    # local (partition-level) distinct shrinks the phase-2 shuffle input;
    # global dedup happens in phase 2
    from kg_gen_ray.stages.rewrite import distinct
    part = distinct(raw, ["subj", "pred", "obj"])

    final = os.path.join(out_dir, "triples_raw", f"part-{pid:05d}")
    with lineage.atomic_output_dir(final) as tmp:
        part.write_parquet(tmp)
    n_triples = ray.data.read_parquet(final).count()

    m = lineage.PartitionManifest(
        partition_id=pid,
        input_files=sorted(files),
        config_hash=cfg_hash,
        row_counts={"pages": n_pages, "triples_raw_distinct": n_triples},
        metrics={"extract_seconds": round(lineage.now() - t0, 3)},
        finished_at=lineage.now(),
    )
    m.write(manifest_dir)
    return m


def _prewarm_fsspec_http() -> None:
    """Ray's HTTP-filesystem probe (``ray.data.datasource.path_util.
    _is_http_filesystem``) re-imports ``fsspec.implementations.http`` on
    EVERY path resolution and catches only ModuleNotFoundError; with
    aiohttp absent (this container), two concurrent ``run_partition``
    threads race that always-failing import into a partially-initialized
    module and a bare ImportError that escapes the probe. Pre-seed a
    minimal module whose ``HTTPFileSystem`` matches nothing, so the
    probe's import always succeeds and it correctly answers False — the
    exact aiohttp-absent semantics, minus the race."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    except Exception:
        # unexpected breakage in a PRESENT http stack: leave module state
        # alone rather than masking it with a method-less stub
        return
    try:
        import aiohttp  # noqa: F401
        # http deps exist, so the import failure above is a real problem,
        # not the aiohttp-absent case this stub exists for — don't mask it
        return
    except ImportError:
        pass
    import importlib.machinery
    import sys
    import types
    try:
        import fsspec.implementations
    except Exception:
        return

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:
        """Stub: never instantiated, so isinstance() is always False."""

    mod.HTTPFileSystem = HTTPFileSystem
    # a real spec + parent-package binding so find_spec() and attribute
    # access behave like a normal import, not a sys.modules ghost
    mod.__spec__ = importlib.machinery.ModuleSpec(
        "fsspec.implementations.http", loader=None)
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


def run_partitioned(input_files: list, out_dir: str,
                    config: PipelineConfig | None = None,
                    n_partitions: int = 8,
                    stop_after_partitions: int | None = None,
                    phase1_overlap: int = 2) -> dict:
    """Full resumable run. ``stop_after_partitions`` simulates a crash for
    the resume tests (FIXTURES.md §5). Returns a summary dict; graph tables
    land in ``{out_dir}/graph``.

    ``phase1_overlap`` phase-1 partitions execute CONCURRENTLY (driver
    threads, each running its own streaming Dataset): one partition
    internally saturates the cluster in its middle, but its read head and
    write/count tail do not — a strictly sequential loop idles the
    cluster on every partition boundary. A small window (default 2)
    overlaps one partition's tail with the next one's head; large windows
    would only make the partitions contend. Manifests stay per-partition
    atomic, so resume semantics are unchanged."""
    config = config or PipelineConfig()
    config.validate()
    parts = partition_inputs(input_files, n_partitions)

    allowed = parts if stop_after_partitions is None \
        else parts[:stop_after_partitions]
    window = max(1, min(phase1_overlap, max(1, len(allowed))))
    if window == 1:
        manifests = [run_partition(pid, files, out_dir, config)
                     for pid, files in enumerate(allowed)]
    else:
        from concurrent.futures import ThreadPoolExecutor
        _prewarm_fsspec_http()
        with ThreadPoolExecutor(max_workers=window) as ex:
            futs = [ex.submit(run_partition, pid, files, out_dir, config)
                    for pid, files in enumerate(allowed)]
            try:
                manifests = [f.result() for f in futs]
            except BaseException:
                # fail fast: the sequential loop stopped at the first
                # failure; don't let queued partitions run to completion
                # before the error surfaces (finished manifests stay on
                # disk, so resume picks them up)
                for f in futs:
                    f.cancel()
                raise
    if stop_after_partitions is not None \
            and stop_after_partitions < len(parts):
        return {"completed_partitions": len(manifests),
                "total_partitions": len(parts), "interrupted": True}

    # phase 2: wide stages over the checkpointed raw triples, via the SAME
    # shared tail as build_kg (fused (kind, norm_key) canonicalization,
    # adaptive broadcast/join rewrite, identity alias map for
    # cluster=False, shuffle-width overrides) — no divergent re-implementation
    from kg_gen_ray.pipelines.kg_pipeline import canonicalize_triples

    # read ONLY the part dirs belonging to the CURRENT input partitioning:
    # a resumed run whose input set shrank leaves stale part-{pid} dirs
    # (pid >= len(parts)) on disk from the earlier, wider run — reading the
    # whole triples_raw/ directory would silently merge triples from inputs
    # that are no longer in the run
    import glob as _glob
    part_files = sorted(f for pid in range(len(parts))
                        for f in _glob.glob(os.path.join(
                            out_dir, "triples_raw", f"part-{pid:05d}", "*")))
    raw = ray.data.read_parquet(part_files)
    res = canonicalize_triples(raw, config)
    # phase 2 is idempotent-by-rerun: KGResult.write is atomic (temp dir
    # + rename), so a re-run replaces the graph instead of appending
    counts = res.write(os.path.join(out_dir, "graph"))
    summary = {
        "completed_partitions": len(manifests),
        "total_partitions": len(parts),
        "interrupted": False,
        "graph_counts": counts,
        "partition_rows": {m.partition_id: m.row_counts for m in manifests},
    }
    lineage.PartitionManifest(
        partition_id=-1, input_files=sorted(input_files),
        config_hash=config.config_hash(),
        row_counts=counts, metrics={}, finished_at=lineage.now(),
    ).write(os.path.join(out_dir, "manifests_global"))
    return summary
