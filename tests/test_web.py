"""URL/host operators: parse + normalize semantics, DuckDB RE2 oracle
agreement, dedup/cap determinism and skew-safe shapes."""

import duckdb
import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.web import (URL_PATTERN, host_stats, per_host_cap,
                                      url_dedup, url_parts, with_norm_url)

URLS = [
    "https://www.Example.org:443/a/b?q=1#frag",
    "https://example.org/a/b",
    "http://sub.site.co.uk/path/",
    "http://sub.site.co.uk/path",
    "https://example.org/a/b/",
    "ftp://files.example.com/x",
    "not a url",
    "https://host",
    "https://example.org:8080/a/b",
]


def pages():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(URLS)), pa.int64()),
        "url": pa.array(URLS, pa.string()),
        "text": pa.array([f"text {i % 3}" for i in range(len(URLS))],
                         pa.string()),
    }))


def test_url_parts_matches_duckdb(ray_session):
    got = {r["doc_id"]: (r["scheme"], r["host"], r["path"], r["tld"])
           for r in url_parts(pages()).take_all()}

    con = duckdb.connect()
    con.register("pages", pa.table({
        "doc_id": pa.array(range(len(URLS)), pa.int64()),
        "url": pa.array(URLS, pa.string())}))
    pat = URL_PATTERN.replace("(?P<scheme>", "(").replace(
        "(?P<hostport>", "(").replace("(?P<path>", "(").replace("'", "''")
    oracle = {}
    for doc_id, scheme, hostport, path in con.execute(f"""
            SELECT doc_id, regexp_extract(url, '{pat}', 1),
                   regexp_extract(url, '{pat}', 2),
                   regexp_extract(url, '{pat}', 3) FROM pages""").fetchall():
        host = con.execute(
            "SELECT regexp_replace(lower(?), ':\\d+$', '')",
            [hostport]).fetchone()[0]
        tld = con.execute(
            "SELECT regexp_extract(?, '\\.([^.]+)$', 1)",
            [host]).fetchone()[0]
        oracle[doc_id] = (scheme, host, path, tld)
    assert got == oracle

    # behavioral pins independent of the oracle
    assert got[0] == ("https", "www.example.org", "/a/b", "org")
    assert got[6] == ("", "", "", "")
    assert got[7] == ("https", "host", "", "")


def test_norm_url_collisions(ray_session):
    got = {r["doc_id"]: r["norm_url"]
           for r in with_norm_url(pages()).take_all()}
    # www + :443 + query/fragment stripped == plain form
    assert got[0] == got[1] == "https://example.org/a/b"
    # trailing slash trimmed
    assert got[2] == got[3] == "http://sub.site.co.uk/path"
    assert got[4] == "https://example.org/a/b"
    # non-default port is NOT stripped — a different origin
    assert got[8] == "https://example.org:8080/a/b"
    assert got[6] == ""


def test_url_dedup_keeps_min_id(ray_session):
    rows = {r["norm_url"]: r["doc_id"]
            for r in url_dedup(pages().repartition(3)).take_all()}
    assert rows["https://example.org/a/b"] == 0   # ids 0,1,4 collide
    assert rows["http://sub.site.co.uk/path"] == 2
    assert rows["https://example.org:8080/a/b"] == 8
    # one survivor per distinct normalized url
    assert len(rows) == 6


def test_host_stats(ray_session):
    rows = {r["host"]: (r["n_pages"], r["n_chars"])
            for r in host_stats(pages().repartition(4)).take_all()}
    assert rows["example.org"] == (3, 18)
    assert rows["www.example.org"][0] == 1
    assert rows["sub.site.co.uk"] == (2, 12)
    assert rows[""][0] == 1                       # the non-url row


def test_per_host_cap_and_determinism(ray_session):
    capped = per_host_cap(pages(), cap=1)
    ids1 = sorted(r["doc_id"] for r in capped.take_all())
    ids2 = sorted(r["doc_id"]
                  for r in per_host_cap(pages().repartition(5),
                                        cap=1).take_all())
    assert ids1 == ids2                           # layout can't matter
    # one row per distinct host (6 hosts incl. "")
    assert len(ids1) == 6
    # schema round-trips: helper columns dropped
    assert set(capped.schema().names) == {"doc_id", "url", "text"}


def test_url_dedup_losers_complement(ray_session):
    """losers == all ids minus url_dedup survivors, on any layout."""
    from kg_gen_ray.functions.web import url_dedup_losers

    for parts in (1, 4):
        ds = pages().repartition(parts)
        survivors = {r["doc_id"] for r in url_dedup(ds).take_all()}
        losers = {r["doc_id"] for r in url_dedup_losers(ds).take_all()}
        assert survivors | losers == set(range(len(URLS)))
        assert survivors & losers == set()


def test_hygiene_url_dedup_stage(ray_session):
    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    res = prepare_training_data(pages(), url_col="url",
                                group_col="doc_id", dedup_method="fast")
    assert res.counts["url_deduped"] == 6      # 9 rows, 3 re-crawls
    # the re-crawl losers (1, 3, 4) are gone before content dedup
    ids = {r["doc_id"] for r in res.clean_docs.take_all()}
    assert ids <= {0, 2, 5, 6, 7, 8}


def test_unparseable_urls_never_dedup_each_other(ray_session):
    """A shard of relative/malformed URLs is NOT a set of re-crawls: no
    row with norm_url '' may lose URL dedup (the '' collision would
    otherwise silently drop all-but-one of them)."""
    from kg_gen_ray.functions.web import url_dedup_losers

    bad = ["not a url", "/relative/path", "", "example.org/no-scheme",
           "also not a url"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(bad) + 2), pa.int64()),
        "url": pa.array(bad + ["https://a.org/x", "https://a.org/x"],
                        pa.string()),
        "text": pa.array(["t"] * (len(bad) + 2), pa.string()),
    }))
    for parts in (1, 3):
        losers = {r["doc_id"]
                  for r in url_dedup_losers(ds.repartition(parts)).take_all()}
        assert losers == {6}          # only the real re-crawl loses
        survivors = {r["doc_id"]
                     for r in url_dedup(ds.repartition(parts)).take_all()}
        assert survivors == {0, 1, 2, 3, 4, 5}


def test_hygiene_url_dedup_custom_id_col(ray_session):
    """The loser table's drop_ids contract (doc_id column) must hold for
    any caller id_col."""
    from kg_gen_ray.pipelines.hygiene import prepare_training_data

    t = pages().map_batches(
        lambda b: b.rename_columns(["page_id", "url", "text"]),
        batch_format="pyarrow")
    res = prepare_training_data(t, url_col="url", id_col="page_id",
                                group_col="page_id", dedup_method="fast")
    assert res.counts["url_deduped"] == 6
    ids = {r["page_id"] for r in res.clean_docs.take_all()}
    assert ids <= {0, 2, 5, 6, 7, 8}


# ---------------------------------------------------------------------------
# M5 filename sanitizer
# ---------------------------------------------------------------------------

def _ref_sanitize(title: str) -> str:
    """The reference chain verbatim (CPython re —
    experiments/wikiqa/_1_download_articles.py:59-63)."""
    import re
    s = re.sub(r"[^\w\s-]", "", title).strip()
    s = re.sub(r"[-\s]+", "_", s)
    return re.sub(r"_+", "_", s)


def test_sanitize_filename_reference_parity():
    """Arrow-RE2 kernel == CPython-re reference on ASCII titles (the
    documented scope pin), across every rule family: strip, trim, run
    collapse, pre-existing underscores, empties."""
    from kg_gen_ray.functions.web import sanitize_filename
    cases = [
        "Hello, World!", "  a - b  ", "a_ b", "Mixed-Case #42 (draft)!",
        "", "___", "a\tb\nc", "no.dots.here", "-lead", "trail-",
        "x", "A (1999) film — ASCII only?!".replace("—", "-"),
        "tab\tand\nnewline \r mix", "many   spaces", "a--b- -c",
    ]
    for c in cases:
        assert sanitize_filename(c) == _ref_sanitize(c), c


def test_sanitize_filename_ascii_fuzz():
    """Deterministic ASCII fuzz against the CPython-re reference, over the
    pinned parity scope: everything ASCII except \\x0b (vertical tab),
    which CPython \\s matches but RE2 \\s does not — the one documented
    divergence family (see the kernel docstring)."""
    import random

    from kg_gen_ray.functions.web import sanitize_filename
    rng = random.Random(42)
    alphabet = ("abcXYZ012 _-\t\n\r\x0c" "!@#$%^&*()[]{};:'\",.<>/?\\|")
    for _ in range(300):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 40)))
        assert sanitize_filename(s) == _ref_sanitize(s), repr(s)


def test_sanitize_filename_vtab_divergence_pinned():
    """\\x0b mid-string: CPython \\s collapses it to '_', RE2 strips it.
    Pinning the ENGINE behavior so any silent change surfaces."""
    from kg_gen_ray.functions.web import sanitize_filename
    assert sanitize_filename("a\x0bb") == "ab"
    assert _ref_sanitize("a\x0bb") == "a_b"


def test_sanitize_filenames_matches_duckdb(ray_session):
    """The driver oracle's SQL chain (DuckDB regexp_replace, RE2) replays
    the kernel bit-for-bit — the kg_pages fname contract."""
    from kg_gen_ray.functions.web import sanitize_filenames
    titles = ["Hello, World!", "  a - b  ", "a_ b", "#42 (draft)!", "",
              "tab\there", "-x-", "a  b--c"]
    got = sanitize_filenames(pa.array(titles, pa.string())).to_pylist()
    con = duckdb.connect()
    t = pa.table({"title": pa.array(titles, pa.string())})
    con.register("t", t)
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    want = [r[0] for r in con.execute(f"""
        SELECT regexp_replace(regexp_replace(
                 trim(regexp_replace(title, '[^\\w\\s-]', '', 'g'), {ws}),
                 '[-\\s]+', '_', 'g'), '_+', '_', 'g')
        FROM t""").fetchall()]
    con.close()
    assert got == want


def test_norm_url_strips_only_scheme_default_port(ray_session):
    from kg_gen_ray.functions.web import _norm_url_kernel
    import pyarrow as pa
    got = _norm_url_kernel(pa.array([
        "http://example.org:80/a",     # default -> stripped
        "https://example.org:443/a",   # default -> stripped
        "http://example.org:443/a",    # NOT http's default -> kept
        "https://example.org:80/a",    # NOT https' default -> kept
    ])).to_pylist()
    assert got == [
        "http://example.org/a",
        "https://example.org/a",
        "http://example.org:443/a",
        "https://example.org:80/a",
    ]


def test_crawl_delta_statuses_and_min_fp(ray_session):
    """added/removed/changed classification; re-crawl duplicates collapse
    to min(md5); null url / null text rows drop; unchanged not emitted."""
    import hashlib

    import pandas as pd

    from kg_gen_ray.functions.web import crawl_delta

    old = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3", "u3", "u4", None, "u6"],
        "text": ["a", "b", "c", "c2", "d", "x", None]}))
    new = rd.from_arrow(pa.table({
        "url": ["u2", "u3", "u4", "u5"],
        "text": ["b", "cc", "d", "e"]}))
    df = crawl_delta(old, new, n_buckets=3).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == ["u1", "u3", "u5"]
    assert list(df["status"]) == ["removed", "changed", "added"]
    assert pd.isna(df.loc[0, "new_fp"]) and pd.isna(df.loc[2, "old_fp"])
    assert df.loc[1, "old_fp"] == min(hashlib.md5(b"c").hexdigest(),
                                      hashlib.md5(b"c2").hexdigest())
    assert df.loc[1, "new_fp"] == hashlib.md5(b"cc").hexdigest()


def test_crawl_delta_randomized_serial_replay(ray_session):
    """Seeded multi-block snapshots vs a plain-dict serial replay."""
    import hashlib

    import numpy as np

    from kg_gen_ray.functions.web import crawl_delta

    rng = np.random.default_rng(1311)

    def snap():
        n = int(rng.integers(80, 140))
        urls = [f"u{int(rng.integers(0, 60))}" for _ in range(n)]
        texts = [chr(97 + int(rng.integers(0, 4))) * int(rng.integers(1, 3))
                 for _ in range(n)]
        return urls, texts

    ou, ot = snap()
    nu, nt = snap()
    old = rd.from_arrow(pa.table({"url": ou, "text": ot})).repartition(5)
    new = rd.from_arrow(pa.table({"url": nu, "text": nt})).repartition(3)
    got = crawl_delta(old, new, n_buckets=4).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    def fold(urls, texts):
        m = {}
        for u, t in zip(urls, texts):
            h = hashlib.md5(t.encode()).hexdigest()
            m[u] = min(m.get(u, h), h)
        return m

    om, nm = fold(ou, ot), fold(nu, nt)
    want = []
    for u in sorted(om.keys() | nm.keys()):
        if u not in nm:
            want.append((u, "removed", om[u], None))
        elif u not in om:
            want.append((u, "added", None, nm[u]))
        elif om[u] != nm[u]:
            want.append((u, "changed", om[u], nm[u]))
    got_rows = [(r.url, r.status,
                 None if r.old_fp is None or r.old_fp != r.old_fp else r.old_fp,
                 None if r.new_fp is None or r.new_fp != r.new_fp else r.new_fp)
                for r in got.itertuples(index=False)]
    assert got_rows == want


def test_crawl_delta_identical_snapshots_empty(ray_session):
    from kg_gen_ray.functions.web import crawl_delta

    same = rd.from_arrow(pa.table({"url": ["u1", "u2"], "text": ["a", "b"]}))
    assert crawl_delta(same, same, n_buckets=2).count() == 0
