"""C4-style line-level cleaning — the rule filter every crawl pipeline
runs before anything statistical.

The C4 rules (Raffel et al., "Exploring the Limits of Transfer Learning
with a Unified Text-to-Text Transformer", JMLR 2020, §2.2), re-expressed
as one vectorized streaming ``map_batches`` (line decisions are per-doc,
so the stage needs NO shuffle at any corpus size):

* keep only lines that end in terminal punctuation (``. ! ? "``),
* keep only lines with at least ``min_words`` words (C4: 3),
* drop any line containing the word ``javascript`` (case-insensitive),
* drop the whole page if it contains ``lorem ipsum`` or a curly brace
  (template/code debris), or if fewer than ``min_lines`` lines survive
  (C4 uses 5 sentences; the default here mirrors that as 3 lines —
  tune per corpus).

Everything is Arrow kernels (split, RE2 match, list reassembly via
offsets + ``binary_join``) — no Python touches a row — and DuckDB
replays the exact same predicates, so the pytest oracle pins engine ==
SQL on every column (same contract as ``functions/scrub.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# RE2-compatible, shared verbatim with the DuckDB oracle in tests
TERMINAL_RE = r'[.!?"]$'
JS_RE = r"(?i)javascript"
PAGE_DROP_RE = r"(?i)lorem ipsum|[{}]"


def c4_clean(docs: "ray.data.Dataset", text_col: str = "text",
             id_col: str = "doc_id", min_words: int = 3,
             min_lines: int = 3) -> "ray.data.Dataset":
    """The input dataset with C4 line rules applied to ``text_col``
    (replaced in place — every other column passes through, so the
    operator composes without a reattach join); pages failing the page
    rules (or left with fewer than ``min_lines`` lines) are dropped."""

    def clean(t: pa.Table) -> pa.Table:
        text = pc.cast(t[text_col], pa.string())
        n_docs = t.num_rows
        page_bad = pc.fill_null(
            pc.match_substring_regex(text, PAGE_DROP_RE), True) \
            .to_numpy(zero_copy_only=False)

        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        flat = lines.flatten()
        doc_pos = np.repeat(np.arange(n_docs), lens)

        terminal = pc.match_substring_regex(flat, TERMINAL_RE) \
            .to_numpy(zero_copy_only=False)
        js = pc.match_substring_regex(flat, JS_RE) \
            .to_numpy(zero_copy_only=False)
        # word count per line: split on single spaces, count non-empty
        words = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(flat), r"\s+")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(pc.utf8_trim_whitespace(flat), "") \
            .to_numpy(zero_copy_only=False)
        keep_line = (terminal & ~js & nonempty & (words >= min_words)
                     & ~page_bad[doc_pos])

        pos = doc_pos[keep_line]
        counts = np.bincount(pos, minlength=n_docs)
        # loud int32 construction: pa.array raises on overflow where
        # astype would silently wrap past 2^31 entries
        offsets = np.concatenate([[0], np.cumsum(counts)])
        kept = flat.filter(pa.array(keep_line))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept), "\n")
        keep_doc = pa.array((~page_bad) & (counts >= min_lines))
        # in-place text replace + row filter: other columns pass through
        return t.set_column(t.schema.get_field_index(text_col), text_col,
                            joined).filter(keep_doc)

    return docs.map_batches(clean, batch_format="pyarrow")
