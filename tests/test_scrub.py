"""PII scrubbing: redaction behavior, pattern-order contract, and exact
agreement with a DuckDB RE2 oracle (same engine, same pattern strings)."""

import duckdb
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.scrub import PII_PATTERNS, scrub_pii, scrub_report


TEXTS = [
    "contact jane.doe+x@example.co.uk or call +1 (415) 555-0199 now",
    "ssn 123-45-6789 appeared next to ip 192.168.0.1 in the log",
    "no pii in this perfectly ordinary sentence at all",
    "two emails a@b.io c@d.org and server 10.0.0.255 port open",
]


def docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))


def test_scrub_matches_duckdb_re2(ray_session):
    got = {r["doc_id"]: r["text"] for r in scrub_pii(docs()).take_all()}

    con = duckdb.connect()
    con.register("docs", pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    expr = "text"
    for _name, pat, repl in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    oracle = dict(con.execute(
        f"SELECT doc_id, {expr} FROM docs").fetchall())
    assert got == oracle

    # the obvious behavioral pins, independent of the oracle
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert "<ID>" in got[1] and "<IP>" in got[1]
    assert "jane" not in got[0] and "6789" not in got[1]
    assert got[2] == TEXTS[2]


def test_ssn_scrubs_before_phone(ray_session):
    """Order contract: the SSN inside a phone-like digit run becomes
    <ID>, not part of a <PHONE> swallow."""
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["id 123-45-6789 ok"], pa.string())}))
    out = scrub_pii(ds).take_all()[0]["text"]
    assert out == "id <ID> ok"


def test_scrub_report_counts(ray_session):
    rep = scrub_report(docs().repartition(3))
    assert rep["email"] == 3
    assert rep["ssn"] == 1
    assert rep["ipv4"] == 2
    assert rep["phone"] == 1


def test_phone_pattern_leaves_numeric_prose_alone(ray_session):
    """Regression: a loose digit-run pattern redacted year lists and
    score tables; the NANP-shaped pattern must not."""
    texts = ["scores were 2020 2021 2022 in the three seasons",
             "pi is 3.14159 26535 okay",
             "en 1984 y 2001 hubo elecciones"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = [r["text"] for r in scrub_pii(ds).take_all()]
    assert sorted(out) == sorted(texts)


def test_empty_pattern_list_means_no_scrub(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["mail a@b.com now"], pa.string())}))
    out = scrub_pii(ds, patterns=[]).take_all()[0]["text"]
    assert out == "mail a@b.com now"
