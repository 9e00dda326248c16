"""C4 line-filter: DuckDB-oracle parity, page rules, layout invariance."""

import duckdb
import pyarrow as pa

import ray.data as rd

from kg_gen_ray.functions.line_filter import c4_clean

DOCS = pa.table({
    "doc_id": pa.array(range(7), pa.int64()),
    "text": pa.array([
        # 0: clean page, all lines survive
        "The first sentence is fine.\nAnother good line here!\n"
        "Is this a question?\nShe said \"yes indeed\" and left.\"",
        # 1: short lines and a no-punctuation line get cut -> below min
        "too short.\nno terminal punctuation at all\nok line here.",
        # 2: javascript line removed, rest survives
        "Please enable javascript now.\nA perfectly good line stays.\n"
        "Another good line stays too.\nAnd one more to clear the bar.",
        # 3: lorem ipsum -> whole page dropped
        "Lorem Ipsum dolor sit amet.\nGood line but page is gone.\n"
        "Third line also gone.",
        # 4: curly brace -> whole page dropped
        "function f() { return 1; }\nGood line one here.\n"
        "Good line two here.\nGood line three here.",
        # 5: null
        None,
        # 6: exactly min_lines survive
        "First surviving line right here.\nSecond surviving line here.\n"
        "Third surviving line is present.\nbad line",
    ]),
})

ORACLE = """
WITH pages AS (
    SELECT doc_id, text FROM documents
    WHERE text IS NOT NULL
      AND NOT regexp_matches(text, '(?i)lorem ipsum|[{}]')
), lines AS (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
           generate_subscripts(string_split(text, chr(10)), 1) AS i
    FROM pages
), kept AS (
    SELECT doc_id, line, i FROM lines
    WHERE regexp_matches(line, '[.!?"]$')
      AND NOT regexp_matches(line, '(?i)javascript')
      AND trim(line) <> ''
      AND len(regexp_split_to_array(trim(line), '\\s+')) >= 3
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
FROM kept GROUP BY doc_id HAVING count(*) >= 3
"""


def oracle():
    con = duckdb.connect()
    con.register("documents", DOCS)
    return dict(con.execute(ORACLE).fetchall())


def test_matches_duckdb_any_layout(ray_session):
    want = oracle()
    for parts in (1, 4):
        got = {r["doc_id"]: r["text"]
               for r in c4_clean(rd.from_arrow(DOCS)
                                 .repartition(parts)).take_all()}
        assert got == want, parts


def test_rule_semantics(ray_session):
    got = {r["doc_id"]: r["text"]
           for r in c4_clean(rd.from_arrow(DOCS)).take_all()}
    assert set(got) == {0, 2, 6}
    assert len(got[0].split("\n")) == 4          # everything kept
    assert "javascript" not in got[2]
    assert len(got[2].split("\n")) == 3
    assert len(got[6].split("\n")) == 3          # exactly at min_lines


def test_string_ids_and_metadata_pass_through(ray_session):
    """c4_clean never touches the id column: string ids (a url column,
    the input_hint's natural key) and metadata flow through in place."""
    docs = pa.table({
        "url": pa.array([f"https://ex.org/{i}" for i in range(DOCS.num_rows)]),
        "lang": pa.array(["en"] * DOCS.num_rows),
        "text": DOCS["text"],
    })
    out = c4_clean(rd.from_arrow(docs).repartition(2), id_col="url")
    assert out.schema().names == ["url", "lang", "text"]
    want = oracle()
    got = {r["url"]: r["text"] for r in out.take_all()}
    assert got == {f"https://ex.org/{k}": v for k, v in want.items()}
