"""WikiQA-style CSV split IO and split cleaning (SURVEY.md §2 S7 + M6).

The reference's dataset-prep flow (``experiments/wikiqa/
_1_download_articles.py:18-56``) downloads each split as parquet, saves it
as CSV, re-reads the CSV, keeps ``label == 1`` rows and drops duplicate
``question_id`` rows keeping the FIRST occurrence in file order
(``:49-52``). This module is the Ray-Data-native counterpart: CSV
write/read are per-block-parallel Dataset IO (one CSV file per block — the
resumable-output layout), and the clean step is distributed.

Keep-FIRST semantics distributed: pandas ``drop_duplicates`` keeps the
first row in file order; order is not a property of a distributed dataset,
so the caller names an ``order_col`` (a globally-unique monotone row id —
the natural one is the source row index / doc id) and "first" = min
``order_col`` per ``question_id``. The winner set is one row per distinct
question: per-batch partial min (combiner) -> global groupby min, then a
size-selected dual picks the winning ROWS — broadcast the winner order-id
set under ``broadcast_limit`` (order ids are globally unique, so the set
alone identifies rows; one streaming ``is_in`` filter, zero shuffle of row
payloads), else an inner join on ``order_col`` (O(winners) exchange; row
text never rides the winner-mining exchange either way).

100 TB story: CSV blocks stream through ``ray.data.read_csv`` /
``Dataset.write_csv`` with normal backpressure; the clean exchange carries
(question_id, order) pairs only — one per (batch, question) after the
combiner — never document text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def write_split_csv(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    """Save a split as a directory of CSV files (one per block — the
    reference writes one ``{split}.csv``; a directory is the resumable
    distributed equivalent and ``read_split_csv`` reads either)."""
    ds.write_csv(path, **kwargs)


# WikiQA split column types, pinned for the CSV read: Arrow CSV type
# INFERENCE would corrupt string columns whose values happen to parse as
# numbers ('007' -> int 7) and can even infer conflicting per-file schemas
# across blocks of one split. microsoft/wiki_qa column layout + the
# order column.
WIKIQA_COLUMN_TYPES = {
    "question_id": pa.string(),
    "question": pa.string(),
    "document_title": pa.string(),
    "answer": pa.string(),
    "label": pa.int64(),
    "row_idx": pa.int64(),
}


def read_split_csv(path: str, column_types: dict | None = None,
                   **kwargs) -> "ray.data.Dataset":
    """Read a CSV split directory/file back as a Dataset with EXPLICIT
    column types (default: the WikiQA split schema) — never inference,
    so the write/read round-trip is identity for any cell content.
    Pass ``column_types={}`` to opt back into inference for non-WikiQA
    CSVs, or a dict for another schema."""
    import pyarrow.csv as pacsv

    if column_types is None:
        column_types = WIKIQA_COLUMN_TYPES
    if column_types:
        kwargs.setdefault(
            "convert_options",
            pacsv.ConvertOptions(column_types=column_types))
    return ray.data.read_csv(path, **kwargs)


def clean_split(ds: "ray.data.Dataset", question_col: str = "question_id",
                label_col: str = "label", order_col: str = "row_idx",
                broadcast_limit: int = 64 * 1024 * 1024,
                shuffle_partitions=None) -> "ray.data.Dataset":
    """``label == 1`` filter + keep the first (min ``order_col``) row per
    ``question_col`` — the reference's clean-split rule, reference
    ``_1_download_articles.py:49-52``. Returns full surviving rows."""
    from ray.data.aggregate import Min

    from kg_gen_ray.stages.common import (
        coalesce, compact_if_small, dual_limit, in_set_mask)

    pos = ds.filter(expr=f"{label_col} == 1")

    def local_min(t: pa.Table) -> pa.Table:
        part = pa.table({
            question_col: pc.cast(t[question_col], pa.string()),
            order_col: pc.cast(t[order_col], pa.int64()),
        })
        return part.group_by([question_col]) \
                   .aggregate([(order_col, "min")]) \
                   .rename_columns([question_col, order_col])

    partial = coalesce(pos.map_batches(local_min, batch_format="pyarrow"),
                       shuffle_partitions)
    winners = compact_if_small(
        partial.groupby(question_col)
               .aggregate(Min(order_col, alias_name=order_col))
               .materialize())

    if (winners.size_bytes() or 0) <= dual_limit(broadcast_limit):
        ids: list = []
        for b in winners.iter_batches(batch_format="pyarrow", batch_size=None):
            ids.extend(b[order_col].to_pylist())
        ref = ray.put(set(int(i) for i in ids))

        def keep(t: pa.Table, ref=ref) -> pa.Table:
            mask = in_set_mask(pc.cast(t[order_col], pa.int64()), ref)
            return t.filter(mask)

        return pos.map_batches(keep, batch_format="pyarrow")

    # scale side: inner join on the globally-unique order id. Join inputs
    # with aggregate lineage need schema-stamped partitions (see the
    # verify-skill gotcha), hence the select_columns + repartition.
    n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)))
    win_ids = winners.select_columns([order_col]).repartition(n_parts)
    cols = [c for c in ds.schema().names]
    return pos.select_columns(list(cols)).repartition(n_parts) \
              .join(win_ids, join_type="inner", on=(order_col,),
                    num_partitions=n_parts)


def synth_wikiqa_split(docs: "ray.data.Dataset",
                       n_questions: int = 97) -> "ray.data.Dataset":
    """Deterministic WikiQA-shaped split derived from a documents table
    (sandbox stand-in for the HF download — no external data; same column
    layout as ``microsoft/wiki_qa``: question_id, question, document_title,
    answer, label, plus the ``row_idx`` order column)."""

    def shape(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        qnum = pc.cast(pc.subtract(did, pc.multiply(
            pc.divide(did, n_questions), n_questions)), pa.int64())
        qid = pc.binary_join_element_wise(
            "Q", pc.cast(qnum, pa.string()), "")
        text = pc.cast(t["text"], pa.string())
        return pa.table({
            "question_id": qid,
            "question": pc.binary_join_element_wise(
                "what is in document ", pc.cast(did, pa.string()), ""),
            "document_title": pc.binary_join_element_wise(
                "Doc ", pc.cast(did, pa.string()), ""),
            "answer": pc.utf8_slice_codeunits(text, 0, 24),
            "label": pc.cast(pc.equal(pc.subtract(did, pc.multiply(
                pc.divide(did, 3), 3)), 0), pa.int64()),
            "row_idx": did,
        })

    return docs.map_batches(shape, batch_format="pyarrow")
