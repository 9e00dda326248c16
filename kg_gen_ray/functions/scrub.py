"""PII scrubbing — vectorized regex redaction for training corpora.

Every pattern runs as an Arrow C++ RE2 kernel
(``pyarrow.compute.replace_substring_regex``) over the whole batch — no
Python loop touches a row, and the stage streams like any other
``map_batches``. DuckDB's regex engine is RE2 too, so the exact same
pattern strings replay in SQL (``regexp_replace(..., 'g')``) — the tests
pin scrubbed text AND per-pattern match counts against a DuckDB oracle.

Pattern order is part of the contract: identifiers that are substrings of
looser patterns (SSN inside a phone-like digit run) scrub FIRST.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (name, RE2 pattern, replacement) — order matters, see module note
PII_PATTERNS: list = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # NANP-shaped (optional 1-2 digit country code, 3-3-4 grouping) — a
    # loose digit-run pattern redacts legitimate numeric text (year
    # lists, score tables), which for a TRAINING corpus is worse than
    # missing an exotic international format
    ("phone",
     r"(?:\+?\d{1,2}[\s.-]?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}\b",
     "<PHONE>"),
]


def scrub_pii(ds: "ray.data.Dataset", text_col: str = "text",
              patterns: list | None = None) -> "ray.data.Dataset":
    """Redact every pattern match in ``text_col``, in pattern order."""
    pats = PII_PATTERNS if patterns is None else patterns

    def fn(t: pa.Table) -> pa.Table:
        col = pc.cast(t[text_col], pa.string())
        for _name, pat, repl in pats:
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        return t.set_column(t.column_names.index(text_col),
                            text_col, col)

    return ds.map_batches(fn, batch_format="pyarrow")


def scrub_report(ds: "ray.data.Dataset", text_col: str = "text",
                 patterns: list | None = None) -> dict:
    """Per-pattern total match counts — the audit artifact a scrub run
    ships with. Counts are measured on the SAME sequentially-scrubbed
    text each pattern actually saw (so overlapping patterns never
    double-count), via per-batch vectorized counts merged by addition —
    a constant-size combiner like the sketches."""
    pats = PII_PATTERNS if patterns is None else patterns
    names = [p[0] for p in pats]

    def partial(t: pa.Table) -> pa.Table:
        col = pc.cast(t[text_col], pa.string())
        counts = []
        for _name, pat, repl in pats:
            counts.append(int(pc.sum(
                pc.count_substring_regex(col, pattern=pat)).as_py() or 0))
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        return pa.table({"name": pa.array(names, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    totals = dict.fromkeys(names, 0)
    for b in ds.map_batches(partial,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow", batch_size=None):
        for name, n in zip(b["name"].to_pylist(), b["n"].to_pylist()):
            totals[name] += n
    return totals
