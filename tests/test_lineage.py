"""Resume/checkpoint fixture (FIXTURES.md §5): a run killed after K of M
partitions must resume, skip completed work, and produce output identical
to an uninterrupted run."""

import glob
import json
import os

import pytest
import ray.data as rd

from kg_gen_ray.config import PipelineConfig
from kg_gen_ray.pipelines.partitioned import (
    partition_inputs, run_partition, run_partitioned)
from kg_gen_ray.sources.pages import write_synthetic_pages
from kg_gen_ray.state import lineage


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_synthetic_pages(d, n_pages=48, seed=5, rows_per_file=12)  # 4 files
    return d


def cfg():
    return PipelineConfig(chunk_size=300, extractor_concurrency=2,
                          salt_buckets=4)


def triples_set(graph_dir):
    rows = rd.read_parquet(os.path.join(graph_dir, "triples")).take_all()
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


def test_partition_inputs_deterministic():
    files = [f"f{i}" for i in range(7)]
    p1 = partition_inputs(files, 3)
    p2 = partition_inputs(list(reversed(files)), 3)
    assert p1 == p2
    assert sum(len(p) for p in p1) == 7


def test_interrupted_then_resumed_equals_uninterrupted(
        corpus_dir, tmp_path, ray_session):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out_a = str(tmp_path / "run_a")     # uninterrupted
    out_b = str(tmp_path / "run_b")     # killed after 2 of 4 partitions

    full = run_partitioned(files, out_a, cfg(), n_partitions=4)
    assert not full["interrupted"]
    assert full["completed_partitions"] == 4

    half = run_partitioned(files, out_b, cfg(), n_partitions=4,
                           stop_after_partitions=2)
    assert half["interrupted"]
    assert half["completed_partitions"] == 2
    # crash state: 2 manifests, 2 partition outputs, no graph
    assert len(glob.glob(f"{out_b}/manifests/*.json")) == 2
    assert not os.path.exists(f"{out_b}/graph")

    # resume: skips the 2 finished partitions (their manifests must be
    # byte-identical afterwards -> not recomputed)
    before = {p: open(p).read()
              for p in glob.glob(f"{out_b}/manifests/*.json")}
    resumed = run_partitioned(files, out_b, cfg(), n_partitions=4)
    assert not resumed["interrupted"]
    for p, content in before.items():
        assert open(p).read() == content, f"partition recomputed: {p}"

    assert triples_set(f"{out_a}/graph") == triples_set(f"{out_b}/graph")


def test_rerun_of_completed_run_is_idempotent(corpus_dir, tmp_path,
                                              ray_session):
    # regression: phase-2 write_parquet into the existing graph dir used to
    # APPEND part files, doubling every table on re-run
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_idem")
    first = run_partitioned(files, out, cfg(), n_partitions=2)
    second = run_partitioned(files, out, cfg(), n_partitions=2)
    assert first["graph_counts"] == second["graph_counts"]
    assert len(triples_set(f"{out}/graph")) == first["graph_counts"]["triples"]


def test_config_change_invalidates(corpus_dir, tmp_path, ray_session):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_c")
    run_partitioned(files, out, cfg(), n_partitions=2)
    m0 = lineage.read_manifest(f"{out}/manifests", 0)
    other = PipelineConfig(chunk_size=150, extractor_concurrency=2,
                           salt_buckets=4)
    assert not lineage.is_complete(f"{out}/manifests", 0, other.config_hash())
    assert lineage.is_complete(f"{out}/manifests", 0, m0.config_hash)


def test_manifest_contents(corpus_dir, tmp_path, ray_session):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_d")
    m = run_partition(0, files[:1], out, cfg())
    assert m.partition_id == 0
    assert m.input_files == files[:1]
    assert m.row_counts["pages"] == 12
    assert m.row_counts["triples_raw_distinct"] > 0
    assert m.metrics["extract_seconds"] >= 0
    # manifest is valid JSON on disk
    with open(f"{out}/manifests/part-00000.json") as f:
        doc = json.load(f)
    assert doc["config_hash"] == cfg().config_hash()


def test_corrupt_manifest_recomputes(corpus_dir, tmp_path, ray_session):
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_e")
    run_partition(0, files[:1], out, cfg())
    path = f"{out}/manifests/part-00000.json"
    with open(path, "w") as f:
        f.write("{not json")
    assert lineage.read_manifest(f"{out}/manifests", 0) is None
    m = run_partition(0, files[:1], out, cfg())   # recomputes cleanly
    assert m.row_counts["pages"] == 12


def test_new_shard_invalidates_partitions(corpus_dir, tmp_path, ray_session):
    # regression: resume used to key on (pid, config) only — adding a shard
    # re-shuffles the round-robin file assignment, and stale manifests
    # silently skipped re-extraction, losing the new shard's triples
    import pyarrow.parquet as pq

    from kg_gen_ray.sources.pages import synthetic_pages_table

    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_newshard")
    r1 = run_partitioned(files, out, cfg(), n_partitions=2)

    extra = str(tmp_path / "extra.parquet")
    pq.write_table(synthetic_pages_table(12, seed=777), extra)
    r2 = run_partitioned(sorted(files + [extra]), out, cfg(), n_partitions=2)
    assert r2["graph_counts"]["triples"] > r1["graph_counts"]["triples"]


def test_shrunk_input_drops_stale_partitions(corpus_dir, tmp_path,
                                             ray_session):
    # regression: a resumed run over FEWER inputs used to read the whole
    # triples_raw/ directory, so checkpoint dirs with pid >= the new
    # partition count leaked triples from inputs no longer in the run
    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    out = str(tmp_path / "run_shrunk")
    run_partitioned(files, out, cfg(), n_partitions=4)        # 4 part dirs

    # rerun over only 2 of the 4 original files -> 2 partitions; stale
    # part-00002/part-00003 dirs remain on disk and must NOT be read
    shrunk = run_partitioned(files[:2], out, cfg(), n_partitions=4)
    assert shrunk["total_partitions"] == 2

    fresh_out = str(tmp_path / "run_fresh")
    fresh = run_partitioned(files[:2], fresh_out, cfg(), n_partitions=4)
    assert triples_set(f"{out}/graph") == triples_set(f"{fresh_out}/graph")
    assert shrunk["graph_counts"] == fresh["graph_counts"]
