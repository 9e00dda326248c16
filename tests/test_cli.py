"""CLI integration: build -> stats -> export-json -> visualize -> add,
driven through main() in-process (the ray_session fixture owns Ray; the
CLI's guarded init is a no-op under it)."""

import json
import os

import pytest

from kg_gen_ray.__main__ import main
from kg_gen_ray.sources.pages import write_synthetic_pages


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_pages"))
    write_synthetic_pages(d, n_pages=32, seed=9, rows_per_file=16)
    return d


def test_cli_full_surface(pages_dir, tmp_path, capsys, ray_session):
    graph = str(tmp_path / "graph")
    assert main(["build", "--input", pages_dir, "--out", graph]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["counts"]["triples"] > 0
    assert os.path.isdir(os.path.join(graph, "triples"))

    assert main(["stats", "--graph", graph]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["entities"] > 0

    gjson = str(tmp_path / "graph.json")
    assert main(["export-json", "--graph", graph, "--out", gjson]) == 0
    capsys.readouterr()
    doc = json.load(open(gjson))
    assert doc["relations"] and doc["entities"]

    html = str(tmp_path / "graph.html")
    assert main(["visualize", "--graph", graph, "--out", html]) == 0
    capsys.readouterr()
    content = open(html, encoding="utf-8").read()
    assert "viz-data" in content and "<svg" in content

    out2 = str(tmp_path / "graph2")
    assert main(["add", "--input", pages_dir, "--graph", graph,
                 "--out", out2]) == 0
    added = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # adding the same pages is idempotent on the triple set
    assert added["counts"]["triples"] == built["counts"]["triples"]


def test_cli_resumable_build(pages_dir, tmp_path, capsys, ray_session):
    graph = str(tmp_path / "graph_resumable")
    assert main(["build", "--input", pages_dir, "--out", graph,
                 "--resumable", "--partitions", "2"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["summary"]["completed_partitions"] == 2
    assert not summary["summary"]["interrupted"]


def test_cli_prepare(tmp_path, capsys, ray_session):
    """prepare: documents parquet -> clean_docs + packed + audit counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import random

    rng = random.Random(3)
    vocab = [f"w{j}" for j in range(150)]
    footer = "shared legal footer words"
    d = str(tmp_path / "docs")
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([" ".join(rng.sample(vocab, 15)) + "\n\n" + footer
                          for _ in range(20)]),
        "lang": pa.array(["en"] * 20),
    }), os.path.join(d, "part-0.parquet"))

    out = str(tmp_path / "prep")
    assert main(["prepare", "--input", d, "--out", out,
                 "--dedup-paragraphs", "--per-group-cap", "10"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["counts"]["input"] == 20
    assert res["counts"]["paragraph_deduped"] == 20
    assert res["counts"]["capped"] == 10
    import ray.data as rd
    clean = rd.read_parquet(os.path.join(out, "clean_docs"))
    texts = [r["text"] for r in clean.take_all()]
    # the shared footer survives in exactly one document
    assert sum(footer in t for t in texts) <= 1
    assert os.path.isdir(os.path.join(out, "packed"))


def test_cli_prepare_rerun_replaces_output(tmp_path, capsys, ray_session):
    """Re-running prepare onto the same --out must REPLACE the corpus,
    not append part files that silently double every row."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = str(tmp_path / "docs")
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([f"alpha beta w{i} gamma delta" for i in range(8)]),
        "lang": pa.array(["en"] * 8),
    }), os.path.join(d, "part-0.parquet"))
    out = str(tmp_path / "prep")
    for _ in range(2):
        assert main(["prepare", "--input", d, "--out", out]) == 0
        capsys.readouterr()
    import ray.data as rd
    assert rd.read_parquet(os.path.join(out, "clean_docs")).count() == 8
