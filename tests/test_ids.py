"""mint_doc_ids: oracle agreement, dual agreement, determinism, guards,
and composition with the packed-key operators it exists to feed."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from kg_gen_ray.functions.ids import mint_doc_ids

URLS = [f"https://example.org/{l}/doc-{i:06d}"
        for i, l in zip(range(40), ["en", "de"] * 20)]
TBL = pa.table({
    "url": pa.array(URLS),
    "text": pa.array([f"tok{i} tok{i} shared shared" for i in range(40)]),
    "lang": pa.array((["en", "de"] * 20)),
})


def oracle(tbl: pa.Table, bucket_bits=20, rank_bits=21):
    con = duckdb.connect()
    con.register("pages", tbl)
    return dict(con.execute(f"""
        WITH b AS (SELECT url,
            ('0x'||substr(md5(url),1,8))::BIGINT % {1 << bucket_bits}
                AS bucket FROM pages),
        r AS (SELECT url, bucket,
            ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY url) - 1
                AS rnk FROM b)
        SELECT url, bucket * {1 << rank_bits} + rnk FROM r""").fetchall())


def test_matches_oracle_both_duals_any_layout(ray_session):
    want = oracle(TBL)
    for parts in (1, 5):
        ds = rd.from_arrow(TBL).repartition(parts)
        for kw in ({}, {"broadcast_limit": 0}):
            out = mint_doc_ids(ds, **kw)
            assert out.schema().names == ["url", "text", "lang", "doc_id"]
            got = {r["url"]: r["doc_id"] for r in out.take_all()}
            assert got == want, (parts, kw)


def test_ids_unique_and_inside_packed_budget(ray_session):
    ids = [r["doc_id"]
           for r in mint_doc_ids(rd.from_arrow(TBL)).take_all()]
    assert len(set(ids)) == len(URLS)
    assert 0 <= min(ids) and max(ids) < 1 << 41


def test_small_bucket_space_forces_ranks(ray_session):
    # 1 bucket bit -> every key collides into <=2 buckets, ranks do the
    # separating; ids still unique and oracle-exact
    want = oracle(TBL, bucket_bits=1, rank_bits=21)
    got = {r["url"]: r["doc_id"]
           for r in mint_doc_ids(rd.from_arrow(TBL),
                                 bucket_bits=1).take_all()}
    assert got == want
    assert len(set(got.values())) == len(URLS)


def test_rank_overflow_raises(ray_session):
    with pytest.raises(Exception, match="raise bucket_bits"):
        mint_doc_ids(rd.from_arrow(TBL), bucket_bits=1,
                     rank_bits=4).materialize()


def test_duplicate_key_raises(ray_session):
    dup = pa.table({"url": pa.array(["a", "b", "a"]),
                    "text": pa.array(["x", "y", "z"])})
    with pytest.raises(Exception, match="unique keys"):
        mint_doc_ids(rd.from_arrow(dup)).materialize()


def test_existing_id_col_raises(ray_session):
    with pytest.raises(ValueError, match="already exists"):
        mint_doc_ids(rd.from_arrow(TBL), id_col="lang")


def test_feeds_span_dedup_end_to_end(ray_session):
    # the operator's purpose: url-keyed corpus -> packed-key span dedup
    from kg_gen_ray.functions.spans import dedup_spans
    out = dedup_spans(mint_doc_ids(rd.from_arrow(TBL).repartition(3)),
                      k=2)
    rows = {r["url"]: r["text"] for r in out.take_all()}
    assert len(rows) == len(URLS)
    # "shared shared" is a corpus-wide duplicated 2-gram: exactly one
    # occurrence survives
    survivors = sum("shared shared" in t for t in rows.values())
    assert survivors == 1


def test_tiebreak_mints_recrawls(ray_session):
    """Duplicate urls with distinct warc_ts mint via the composite key;
    the earliest crawl of each url gets that url's smallest id."""
    import datetime as dt
    ts = [dt.datetime(2026, 1, 1, 0, 0, s) for s in (5, 2, 9)]
    tbl = pa.table({
        "url": pa.array(["https://a.org/x", "https://a.org/x",
                         "https://b.org/y"]),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "text": pa.array(["v2", "v1", "solo"]),
    })
    ref = None
    for kw in ({}, {"broadcast_limit": 0}):
        out = mint_doc_ids(rd.from_arrow(tbl).repartition(2),
                           tiebreak_col="warc_ts", **kw)
        rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
        ids = [r["doc_id"] for r in rows]
        assert len(set(ids)) == 3, kw
        a = sorted((r for r in rows if r["url"] == "https://a.org/x"),
                   key=lambda r: r["warc_ts"])
        assert a[0]["doc_id"] < a[1]["doc_id"], kw  # earlier crawl -> smaller
        assert a[0]["text"] == "v1", kw
        key = {(r["url"], str(r["warc_ts"])): r["doc_id"] for r in rows}
        if ref is None:
            ref = key
        else:
            assert key == ref, kw


def test_tiebreak_duplicate_pair_still_raises(ray_session):
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    dup = pa.table({"url": pa.array(["a", "a"]),
                    "warc_ts": pa.array([t0, t0], pa.timestamp("us"))})
    with pytest.raises(Exception, match="unique keys"):
        mint_doc_ids(rd.from_arrow(dup),
                     tiebreak_col="warc_ts").materialize()


def test_minted_ids_feed_url_dedup(ray_session):
    """The re-crawl flow the tiebreak exists for: mint over (url,
    warc_ts), then url_dedup keeps the min id — the earliest crawl."""
    import datetime as dt
    from kg_gen_ray.functions.dedup import drop_ids
    from kg_gen_ray.functions.web import url_dedup_losers
    ts = [dt.datetime(2026, 1, 1, 0, 0, s) for s in (5, 2, 9)]
    tbl = pa.table({
        "url": pa.array(["https://a.org/x", "https://a.org/x",
                         "https://b.org/y"]),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "text": pa.array(["v2", "v1", "solo"]),
    })
    minted = mint_doc_ids(rd.from_arrow(tbl), tiebreak_col="warc_ts")
    losers = url_dedup_losers(minted, "url", "doc_id")
    kept = drop_ids(minted, losers, "doc_id")
    texts = sorted(r["text"] for r in kept.take_all())
    assert texts == ["solo", "v1"]     # the earliest crawl of a.org/x


def test_integer_tiebreak_orders_numerically(ray_session):
    """Epoch-integer tiebreaks must order numerically, not as raw digit
    strings ('999' vs '1000'): the zero-padded rendering guarantees the
    earliest capture still gets the smallest id."""
    tbl = pa.table({
        "url": pa.array(["u", "u", "u"]),
        "crawl_s": pa.array([999, 1000, 5], pa.int64()),
        "text": pa.array(["mid", "late", "first"]),
    })
    out = sorted(mint_doc_ids(rd.from_arrow(tbl),
                              tiebreak_col="crawl_s").take_all(),
                 key=lambda r: r["doc_id"])
    assert [r["text"] for r in out] == ["first", "mid", "late"]


def test_float_tiebreak_rejected(ray_session):
    tbl = pa.table({"url": pa.array(["a"]),
                    "w": pa.array([1.5], pa.float64())})
    with pytest.raises(ValueError, match="order-preserve"):
        mint_doc_ids(rd.from_arrow(tbl), tiebreak_col="w")


def test_randomized_serial_parity(ray_session):
    """Random key sets (unicode, spaces, empty string) against a plain
    serial replay of bucket+rank, on both duals and layouts."""
    import hashlib
    import random

    rng = random.Random(7)
    alphabet = "abπ☃ /:%.-_0ётxyz"
    for trial in range(3):
        n = rng.randrange(1, 60)
        keys = set()
        while len(keys) < n:
            keys.add("".join(rng.choice(alphabet)
                             for _ in range(rng.randrange(0, 24))))
        keys = sorted(keys)
        bb, rb = rng.choice([(20, 21), (3, 30), (1, 40)])

        def serial(keys, bb=bb, rb=rb):
            buckets = {}
            for u in keys:
                b = int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8],
                        16) % (1 << bb)
                buckets.setdefault(b, []).append(u)
            out = {}
            for b, us in buckets.items():
                for rank, u in enumerate(sorted(us)):
                    out[u] = b * (1 << rb) + rank
            return out

        want = serial(keys)
        tbl = pa.table({"url": pa.array(keys),
                        "x": pa.array(list(range(len(keys))), pa.int64())})
        for parts in (1, 4):
            ds = rd.from_arrow(tbl).repartition(parts)
            for kw in ({}, {"broadcast_limit": 0}):
                got = {r["url"]: r["doc_id"]
                       for r in mint_doc_ids(ds, bucket_bits=bb,
                                             rank_bits=rb, **kw).take_all()}
                assert got == want, (trial, parts, kw)
