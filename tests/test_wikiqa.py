"""WikiQA CSV split IO + clean (SURVEY §2 S7 + M6): CSV round-trip type
fidelity, keep-first semantics vs pandas drop_duplicates (the reference's
rule), and broadcast-vs-join dual equality."""

import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.sources.wikiqa import (clean_split, read_split_csv,
                                       synth_wikiqa_split, write_split_csv)


def _split_table() -> pa.Table:
    # duplicate question_ids across out-of-order row_idx, label noise,
    # and a question whose FIRST row has label 0 (so keep-first applies
    # AFTER the label filter, like the reference: filter THEN dedup)
    return pa.table({
        "question_id": pa.array(["Q1", "Q2", "Q1", "Q3", "Q2", "Q3", "Q4"],
                                pa.string()),
        "question": pa.array([f"q{i}" for i in range(7)], pa.string()),
        "document_title": pa.array([f"t{i}" for i in range(7)], pa.string()),
        "answer": pa.array([f"a{i}" for i in range(7)], pa.string()),
        "label": pa.array([0, 1, 1, 1, 1, 1, 0], pa.int64()),
        "row_idx": pa.array([10, 4, 7, 2, 9, 1, 3], pa.int64()),
    })


def _ref_clean(df: pd.DataFrame) -> pd.DataFrame:
    """The reference rule verbatim (_1_download_articles.py:49-52):
    label==1 filter then drop_duplicates keeping first in row order."""
    clean = df.sort_values("row_idx")
    clean = clean[clean["label"] == 1]
    return clean.drop_duplicates(subset=["question_id"]) \
                .sort_values("row_idx").reset_index(drop=True)


def test_clean_split_matches_pandas_reference(ray_session):
    t = _split_table()
    got = clean_split(rd.from_arrow(t)).to_pandas() \
        .sort_values("row_idx").reset_index(drop=True)
    want = _ref_clean(t.to_pandas())
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)


def test_clean_split_join_dual_equality(ray_session):
    t = _split_table()
    base = clean_split(rd.from_arrow(t)).to_pandas() \
        .sort_values("row_idx").reset_index(drop=True)
    os.environ["KG_FORCE_JOIN_DUALS"] = "1"
    try:
        dual = clean_split(rd.from_arrow(t)).to_pandas() \
            .sort_values("row_idx").reset_index(drop=True)
    finally:
        os.environ.pop("KG_FORCE_JOIN_DUALS")
    pd.testing.assert_frame_equal(
        base, dual[base.columns.tolist()], check_dtype=False)


def test_csv_round_trip_preserves_types_and_rows(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array([f"alpha beta gamma delta {i} tail words here"
                          for i in range(30)], pa.string()),
    }))
    split = synth_wikiqa_split(docs, n_questions=5)
    d = tempfile.mkdtemp(prefix="wikiqa_rt_")
    try:
        write_split_csv(split, d)
        back = read_split_csv(d)
        schema = back.schema()
        types = dict(zip(schema.names, [str(t) for t in schema.types]))
        assert types["label"] == "int64"
        assert types["row_idx"] == "int64"
        assert types["question_id"] == "string"
        a = split.to_pandas().sort_values("row_idx").reset_index(drop=True)
        b = back.to_pandas().sort_values("row_idx").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns.tolist()])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_synth_split_deterministic(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 96, 97], pa.int64()),
        "text": pa.array(["aaa bbb"] * 6, pa.string()),
    }))
    rows = {r["row_idx"]: r for r in
            synth_wikiqa_split(docs, n_questions=97).take_all()}
    assert rows[0]["question_id"] == "Q0"
    assert rows[97]["question_id"] == "Q0"       # wraps mod 97
    assert rows[96]["question_id"] == "Q96"
    assert rows[0]["label"] == 1 and rows[1]["label"] == 0
    assert rows[3]["label"] == 1
    assert rows[2]["answer"] == "aaa bbb"        # <24 chars: whole text


def test_csv_read_pins_types_against_numeric_looking_strings(ray_session):
    """'007'-style answers must survive the round-trip as strings —
    inference would corrupt them to int 7 (and could produce conflicting
    per-file schemas); read_split_csv pins the WikiQA column types."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["007", "12345", "42"], pa.string()),
    }))
    split = synth_wikiqa_split(docs, n_questions=3)
    d = tempfile.mkdtemp(prefix="wikiqa_num_")
    try:
        write_split_csv(split, d)
        back = read_split_csv(d).to_pandas() \
            .sort_values("row_idx").reset_index(drop=True)
        assert back["answer"].tolist() == ["007", "12345", "42"]
        assert str(back["answer"].dtype) == "object"
    finally:
        shutil.rmtree(d, ignore_errors=True)
