"""HTML->text extraction: byte-identity per url (the input_hint per-row
invariant) and robustness to boilerplate blocks."""

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.sources.pages import (
    _wrap_html, pages_from_documents, synthetic_pages_table)
from kg_gen_ray.stages.extract_text import extract_text, extract_text_stage

SF = "/root/testdata/sf0.001"


def test_wrap_extract_inverse():
    for text in ["hello world", "a. b. c.", "", "multi\nline"]:
        assert extract_text(_wrap_html(7, text)) == text


def test_drops_script_style_nav():
    html = (b"<html><head><title>T</title></head><body>"
            b"<script>var x = 'evil';</script>"
            b"<nav><p>menu</p></nav>"
            b"<p>keep me</p><style>p {}</style>"
            b"<p>and me</p></body></html>")
    assert extract_text(html) == "keep me\nand me"


def test_byte_identity_on_synthetic_corpus(ray_session):
    tab = synthetic_pages_table(32, 7)
    ds = rd.from_arrow(tab)
    out = extract_text_stage(ds).take_all()
    expected = {u: t for u, t in zip(tab["url"].to_pylist(),
                                     tab["text"].to_pylist())}
    assert len(out) == 32
    for row in out:
        assert row["text"] == expected[row["url"]], row["url"]


def test_byte_identity_on_documents(ray_session):
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet")
    expected = {i: t for i, t in zip(docs["doc_id"].to_pylist(),
                                     docs["text"].to_pylist())}
    pages = pages_from_documents(SF)
    out = extract_text_stage(pages).take_all()
    assert len(out) == docs.num_rows
    for row in out:
        doc_id = int(row["url"].rsplit("-", 1)[1])
        assert row["text"] == expected[doc_id]


def test_html_column_dropped(ray_session):
    ds = rd.from_arrow(synthetic_pages_table(4, 1))
    out = extract_text_stage(ds)
    assert "html" not in out.schema().names
    assert set(out.schema().names) == {"url", "warc_ts", "lang", "text"}


MESSY_HTML = b"""<!DOCTYPE html><html><head><title>T</title>
<style>p { color: red }</style></head><body>
<!-- a comment with <p>fake</p> inside -->
<script>var x = "<p>not text</p>";</script>
<nav><ul><li>Home</li><li>About</li></ul></nav>
<h1>Big   Title</h1>
<p>First &amp; foremost, caf&eacute;s.</p>
<div>Second <b>bold</b> bit.</div>
<p>Unclosed paragraph
<table><tr><td>cell a</td><td>cell b</td></tr></table>
</body></html>"""


def test_general_mode_real_world_html():
    from kg_gen_ray.stages.extract_text import extract_text_general
    out = extract_text_general(MESSY_HTML)
    lines = out.split("\n")
    assert "Big Title" in lines                      # whitespace collapsed
    assert "First & foremost, cafés." in lines       # entities decoded
    assert "Second bold bit." in lines               # inline tags flattened
    assert not any("not text" in ln for ln in out.split("\n"))   # script dropped
    assert not any("color" in ln for ln in lines)    # style dropped
    assert not any("Home" in ln for ln in lines)     # nav dropped
    assert "cell a cell b" in out                    # table text kept
    assert "fake" not in out                         # comments dropped


def test_general_mode_malformed_and_empty():
    from kg_gen_ray.stages.extract_text import extract_text_general
    assert extract_text_general(b"") == ""
    assert extract_text_general(b"<p>ok") == "ok"            # unclosed
    # invalid bytes survive as U+FFFD replacement chars, parse continues
    assert extract_text_general(b"\xff\xfe<p>x</p>").endswith("x")


def test_general_stage_and_mode_validation(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from kg_gen_ray.stages.extract_text import extract_text_stage

    pages = rd.from_arrow(pa.table({
        "url": ["u1"], "lang": ["en"],
        "html": pa.array([MESSY_HTML], pa.binary())}))
    out = extract_text_stage(pages, mode="general").take_all()
    assert "Big Title" in out[0]["text"]
    with pytest.raises(ValueError, match="unknown extract mode"):
        extract_text_stage(pages, mode="nope")
