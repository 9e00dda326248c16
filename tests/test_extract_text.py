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
