"""Paragraph-level dedup (the CCNet pass): oracle agreement, dual
agreement, layout invariance, edge cases."""

import duckdb
import pyarrow as pa

import ray.data as rd

from kg_gen_ray.functions.paragraphs import paragraph_dedup, paragraph_losers

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    "text": pa.array([
        "intro A\n\nfooter X\n\nbody A",
        "intro B\n\nfooter X",            # loses footer X to doc 0
        "footer X",                       # loses everything -> dropped
        None,                             # null text -> dropped
        "",                               # one empty paragraph (kept: first "")
        "solo\n\n\n\nsolo",               # in-doc dup + one empty paragraph
    ]),
})


def oracle(docs: pa.Table):
    con = duckdb.connect()
    con.register("documents", docs)
    return dict(con.execute("""
        WITH split AS (
            SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps
            FROM documents
        ), paras AS (
            SELECT doc_id, unnest(ps) AS para,
                   generate_subscripts(ps, 1) AS i FROM split
        ), ranked AS (
            SELECT doc_id, para, i,
                   ROW_NUMBER() OVER (PARTITION BY md5(para)
                                      ORDER BY doc_id, i) AS rn
            FROM paras
        )
        SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY i)
        FROM ranked WHERE rn = 1 GROUP BY doc_id
    """).fetchall())


def test_matches_oracle_both_duals_any_layout(ray_session):
    want = oracle(DOCS)
    for parts in (1, 4):
        ds = rd.from_arrow(DOCS).repartition(parts)
        for kw in ({}, {"broadcast_limit": 0}):
            got = {r["doc_id"]: r["text"]
                   for r in paragraph_dedup(ds, **kw).take_all()}
            assert got == want, (parts, kw)


def test_edge_semantics(ray_session):
    got = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(rd.from_arrow(DOCS)).take_all()}
    assert got[0] == "intro A\n\nfooter X\n\nbody A"   # first occurrence
    assert got[1] == "intro B"                         # footer removed
    assert 2 not in got                                # fully-duplicate doc
    assert 3 not in got                                # null text
    assert got[4] == ""                                # first empty paragraph
    # doc 5: 'solo' kept once; its empty paragraphs lost to doc 4's
    assert got[5] == "solo"


def test_losers_complement(ray_session):
    """every paragraph occurrence is either a winner or a loser."""
    ds = rd.from_arrow(DOCS).repartition(3)
    losers = {r["enc"] for r in paragraph_losers(ds).take_all()}
    # doc1 footer X (idx 1), doc2 footer X (idx 0); doc5 splits to
    # ['solo', '', 'solo'] -> idx 1 ('' loses to doc4) and idx 2 lose
    k = 1 << 20
    assert losers == {1 * k + 1, 2 * k + 0, 5 * k + 1, 5 * k + 2}


def test_doc_id_bounds_guard(ray_session):
    import pytest

    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([1 << 50], pa.int64()),
        "text": pa.array(["x"], pa.string()),
    }))
    with pytest.raises(Exception, match="pack"):
        paragraph_dedup(bad).take_all()


def test_paragraph_dedup_winner_broadcast_path(ray_session):
    """Boilerplate-extreme corpus: the loser set is corpus-sized but the
    winner set is vocabulary-sized — a broadcast_limit between the two
    sizes must select the winner-broadcast path and produce exactly the
    anti-path result."""
    import numpy as np

    paras = ["alpha block", "beta block", "gamma block"]
    texts = ["\n\n".join(paras[(i + j) % 3] for j in range(3))
             for i in range(2000)]
    t = pa.table({"doc_id": pa.array(range(2000), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(4).materialize()

    want = sorted((r["doc_id"], r["text"]) for r in
                  paragraph_dedup(ds).take_all())
    # ~6000 loser encs (~48KB) vs 3 winner encs: 16KB sits between
    got = sorted((r["doc_id"], r["text"]) for r in
                 paragraph_dedup(ds, broadcast_limit=16 * 1024).take_all())
    assert got == want
    # first-occurrence semantics: only doc 0 survives with all three
    # paragraphs... (docs 1,2 keep their unseen rotations' heads)
    survivors = dict(want)
    assert 0 in survivors and survivors[0] == texts[0]


def test_passthrough_schema_identical_across_duals(ray_session):
    """The join dual (broadcast_limit=0) must emit the SAME schema as the
    broadcast duals' in-place pass-through: caller's id dtype (int32
    here), caller's column order, metadata columns intact."""
    docs = pa.table({
        "lang": pa.array(["en", "de", "fr", "en", "it", "pt"]),
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int32()),
        "text": DOCS["text"],
    })
    ds = rd.from_arrow(docs).repartition(3)
    ref = None
    for kw in ({}, {"broadcast_limit": 0}):
        out = paragraph_dedup(ds, **kw)
        tbl = pa.Table.from_pylist(
            sorted(out.take_all(), key=lambda r: r["doc_id"]),
            schema=pa.schema([(n, docs.schema.field(n).type)
                              for n in out.schema().names]))
        assert out.schema().names == ["lang", "doc_id", "text"], kw
        assert [str(t) for t in out.schema().types] == \
            ["string", "int32", "string"], kw
        if ref is None:
            ref = tbl
        else:
            assert tbl.equals(ref), kw
    langs = {r["doc_id"]: r["lang"] for r in ref.to_pylist()}
    assert langs == {0: "en", 1: "de", 4: "it", 5: "pt"}


def test_paragraph_dedup_randomized_serial_replay(ray_session):
    """Random pool-heavy corpora vs a plain-Python first-occurrence
    replay: pins the loser-mining exchange, the in-batch local-min path,
    the rebuild offsets, and the pass-through of non-text columns — on
    shapes no hand-planted case enumerates. Runs both the broadcast and
    the forced exploded-join dual."""
    import numpy as np

    rng = np.random.RandomState(5)
    pool = [f"shared paragraph {i}" for i in range(12)]
    texts = []
    for d in range(120):
        paras = [pool[rng.randint(len(pool))] if rng.rand() < 0.6
                 else f"unique {d} {j}" for j in range(rng.randint(1, 6))]
        texts.append("\n\n".join(paras))

    seen: set = set()
    expected = {}
    for d, tx in enumerate(texts):  # doc_id order == (doc_id, idx) order
        kept = [p for p in tx.split("\n\n")
                if p not in seen and not seen.add(p)]
        if kept:
            expected[d] = "\n\n".join(kept)

    t = pa.table({
        "doc_id": pa.array(range(120), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([["en", "de"][d % 2] for d in range(120)],
                         pa.string()),
    })
    for kw in ({}, {"broadcast_limit": 0}):
        out = paragraph_dedup(rd.from_arrow(t).repartition(7), **kw) \
            .take_all()
        got = {r["doc_id"]: r["text"] for r in out}
        assert got == expected, kw
        # non-text columns pass through on every dual
        assert all(r["lang"] == ["en", "de"][r["doc_id"] % 2]
                   for r in out), kw
