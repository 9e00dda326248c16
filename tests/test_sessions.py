"""Sessionization / hash sampling / grouped top-k tests."""
import datetime as dt

import pyarrow as pa
import ray.data as rd

from kg_gen_ray.functions.sessions import grouped_topk, hash_sample, sessionize

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    # rows: (event_id, user_id, seconds_offset)
    return rd.from_arrow(pa.table({
        "event_id": pa.array([e for e, _, _ in rows], pa.int64()),
        "user_id": pa.array([u for _, u, _ in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=s) for _, _, s in rows],
                       pa.timestamp("us")),
    }))


def test_sessionize_gap_splits(ray_session):
    ev = _events([
        (0, 1, 0), (1, 1, 100), (2, 1, 5000),       # user 1: 2 sessions
        (3, 2, 0),                                   # user 2: 1 session
    ])
    out = {(r["user_id"], r["session_id"]): (r["n_events"],
                                             r["session_start"].second
                                             + r["session_start"].minute * 60)
           for r in sessionize(ev, gap_sec=1800).take_all()}
    assert out[(1, 0)] == (2, 0)
    assert out[(1, 1)][0] == 1
    assert out[(2, 0)] == (1, 0)
    assert len(out) == 3


def test_sessionize_boundary_gap_not_split(ray_session):
    # gap exactly == timeout stays in the same session (strict >)
    ev = _events([(0, 1, 0), (1, 1, 1800)])
    out = sessionize(ev, gap_sec=1800).take_all()
    assert len(out) == 1
    assert out[0]["n_events"] == 2


def test_sessionize_many_users_one_bucket(ray_session):
    # users colliding in one hash bucket stay independent
    ev = _events([(i, u, i * 10) for u in (5, 5 + 64, 5 + 128)
                  for i in range(3)])
    out = sessionize(ev, gap_sec=1800).take_all()
    assert len(out) == 3                       # one session per user
    assert all(r["n_events"] == 3 for r in out)


def test_hash_sample_deterministic_partition(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(50)),
        "text": [f"document number {i}" for i in range(50)]}))
    a = {r["doc_id"] for r in hash_sample(docs, keep_mod=5).take_all()}
    b = {r["doc_id"] for r in hash_sample(docs, keep_mod=5).take_all()}
    full = {r["doc_id"] for r in hash_sample(docs, keep_mod=10).take_all()}
    none = {r["doc_id"] for r in hash_sample(docs, keep_mod=0).take_all()}
    assert a == b                  # replayable
    assert full == set(range(50))  # keep_mod == mod keeps everything
    assert none == set()
    assert 0 < len(a) < 50


def test_grouped_topk(ray_session):
    ds = rd.from_arrow(pa.table({
        "grp": ["a", "a", "a", "b", "b"],
        "score": [3, 1, 2, 9, 9],
        "id": [10, 11, 12, 13, 14],
    }))
    out = grouped_topk(ds, "grp", "score", 2, "id").take_all()
    got = {(r["grp"], r["id"]) for r in out}
    # a: scores 3,2 -> ids 10,12 ; b: tie on 9 -> lower ids first (13,14)
    assert got == {("a", 10), ("a", 12), ("b", 13), ("b", 14)}


def test_quantile_sketch_within_rank_tolerance(ray_session):
    """Sketch vs exact on a skewed (zipf-like) distribution: each sketch
    quantile must land within ~1% of its requested rank."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kg_gen_ray.functions.sessions import (
        grouped_quantiles, grouped_quantiles_sketch)

    rng = np.random.RandomState(11)
    groups, vals = [], []
    for gname, size in [("a", 5000), ("b", 3000)]:
        v = np.floor(rng.pareto(1.3, size) * 10).astype(np.int64)  # heavy tail
        groups.extend([gname] * size)
        vals.extend(v.tolist())
    ds = rd.from_arrow(pa.table({"g": groups, "v": vals})).repartition(8)

    exact = {r["g"]: r for r in grouped_quantiles(ds, "g", "v").take_all()}
    sk = {r["g"]: r for r in grouped_quantiles_sketch(ds, "g", "v").take_all()}

    by_group = {"a": np.sort(np.array(vals[:5000])),
                "b": np.sort(np.array(vals[5000:]))}
    for gname, sorted_vals in by_group.items():
        n = len(sorted_vals)
        for q in (0.5, 0.9, 0.99):
            approx = sk[gname][f"p{int(q*100)}"]
            # the answer's rank INTERVAL (ties span a range); the target
            # rank must fall within it modulo the sketch tolerance
            lo = np.searchsorted(sorted_vals, approx, side="left")
            hi = np.searchsorted(sorted_vals, approx, side="right")
            tol = 0.01 * n + 1
            assert lo - tol <= q * n <= hi + tol, (gname, q, approx, lo, hi)
        # exact path still matches duckdb-style quantile_disc by definition
        assert exact[gname]["p50"] in sorted_vals


def test_top_parts_by_quantity_matches_duckdb(ray_session):
    """Partial-sum -> groupby -> deterministic top-k -> part-name enrich,
    vs the DuckDB aggregate (integer cents, so value-exact)."""
    import duckdb

    from kg_gen_ray.pipelines.relational import top_parts_by_quantity

    sf = "/root/testdata/sf0.001"
    got = [(r["l_partkey"], r["qty_cents"], r["p_name"])
           for r in top_parts_by_quantity(sf, 10).take_all()]
    want = duckdb.sql(f"""
        WITH q AS (
          SELECT l_partkey,
                 round(sum(l_quantity) * 100)::BIGINT AS qty_cents
          FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_partkey)
        SELECT q.l_partkey, q.qty_cents, p.p_name
        FROM q JOIN read_parquet('{sf}/part.parquet') p
          ON p.p_partkey = q.l_partkey
        ORDER BY q.qty_cents DESC, q.l_partkey LIMIT 10""").fetchall()
    assert got == want


def test_stratified_sample_cap_and_determinism(ray_session):
    """Per-group cap holds, selection is the smallest-md5 rows (replayable
    — two runs agree), and the many-block plan (combiner prune + groupby)
    matches a single-partition run exactly."""
    import hashlib

    from kg_gen_ray.functions.sessions import stratified_sample

    rows = [(i, f"text number {i}", ["en", "de", "fr"][i % 3])
            for i in range(90)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "lang": pa.array([r[2] for r in rows], pa.string())})

    def expected(cap):
        out = {}
        for lang in ("en", "de", "fr"):
            grp = [(hashlib.md5(txt.encode()).hexdigest(), i)
                   for i, txt, lg in rows if lg == lang]
            out[lang] = sorted(i for _, i in sorted(grp)[:cap])
        return out

    for n_blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(n_blocks)
        got = {}
        for r in stratified_sample(ds, "lang", cap=5).take_all():
            got.setdefault(r["lang"], []).append(r["doc_id"])
        assert {k: sorted(v) for k, v in got.items()} == expected(5)


def test_grouped_topk_combiner_exact_across_blocks(ray_session):
    """The per-block prune must never change the global per-group top-k:
    1-block and 13-block plans agree row-for-row."""
    n = 300
    t = pa.table({
        "g": pa.array([f"g{i % 5}" for i in range(n)], pa.string()),
        "v": pa.array([(i * 37) % 101 for i in range(n)], pa.int64()),
        "id": pa.array(range(n), pa.int64()),
    })

    def canon(ds):
        return sorted((r["g"], r["v"], r["id"])
                      for r in grouped_topk(ds, "g", "v", 4, "id")
                      .take_all())

    one = canon(rd.from_arrow(t))
    many = canon(rd.from_arrow(t).repartition(13))
    assert one == many and len(one) == 20


def test_pack_sequences_matches_duckdb_recursive_fold(ray_session):
    """Greedy packing fold vs a DuckDB recursive CTE replaying the same
    rule (join while run + n <= max, oversize doc alone) — the kg_chunks
    oracle technique at document granularity. Also checks the packing
    invariants: per-sequence totals never exceed max unless the sequence
    is a single oversize doc, and seq_ids are contiguous from 0."""
    import duckdb

    from kg_gen_ray.functions.sessions import pack_sequences

    texts = []
    for i in range(60):
        n_words = [3, 7, 2, 25, 1, 9][i % 6]          # 25 > max_tokens=16
        texts.append((i, " ".join(f"w{j}" for j in range(n_words)),
                      ["en", "de"][i % 2]))
    t = pa.table({"doc_id": pa.array([r[0] for r in texts], pa.int64()),
                  "text": pa.array([r[1] for r in texts], pa.string()),
                  "lang": pa.array([r[2] for r in texts], pa.string())})
    max_tokens = 16

    got = sorted(
        (r["lang"], r["doc_id"], r["seq_id"], r["n_tokens"])
        for r in pack_sequences(rd.from_arrow(t).repartition(5),
                                max_tokens).take_all())

    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    oracle = con.execute(f"""
        WITH RECURSIVE toks AS (
          SELECT lang, doc_id,
                 len(string_split(text, ' '))::BIGINT AS n
          FROM documents),
        ord AS (
          SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY doc_id) AS rn
          FROM toks),
        fold AS (
          SELECT lang, rn, doc_id, n, 0::BIGINT AS seq_id, n AS run
          FROM ord WHERE rn = 1
          UNION ALL
          SELECT o.lang, o.rn, o.doc_id, o.n,
                 CASE WHEN f.run + o.n <= {max_tokens}
                      THEN f.seq_id ELSE f.seq_id + 1 END,
                 CASE WHEN f.run + o.n <= {max_tokens}
                      THEN f.run + o.n ELSE o.n END
          FROM fold f JOIN ord o
            ON o.lang = f.lang AND o.rn = f.rn + 1)
        SELECT lang, doc_id, seq_id, n AS n_tokens FROM fold
        ORDER BY lang, doc_id""").fetchall()
    assert got == [tuple(r) for r in oracle]

    # invariants
    totals = {}
    for lang, _doc, seq, n in got:
        totals.setdefault((lang, seq), []).append(n)
    for (lang, seq), ns in totals.items():
        assert sum(ns) <= max_tokens or len(ns) == 1
    for lang in ("en", "de"):
        seqs = sorted({s for lg, _d, s, _n in got if lg == lang})
        assert seqs == list(range(len(seqs)))


def test_grouped_topk_keeps_null_group(ray_session):
    """Ray's groupby (and SQL PARTITION BY) treat a null key as its own
    group; the pandas combiner must not silently delete those rows."""
    from kg_gen_ray.functions.sessions import grouped_topk

    t = pa.table({
        "lang": pa.array(["en", None, "en", None, None, "de"]),
        "score": pa.array([5, 4, 3, 2, 6, 1], pa.int64()),
        "doc_id": pa.array(range(6), pa.int64()),
    })
    out = grouped_topk(rd.from_arrow(t).repartition(3), "lang", "score",
                       k=2, tiebreak_col="doc_id").take_all()
    by_group = {}
    for r in out:
        by_group.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by_group[None] == {1, 4}          # top-2 of the null group
    assert by_group["en"] == {0, 2}
    assert by_group["de"] == {5}


def test_stratified_sample_null_text_and_null_group(ray_session):
    """md5(NULL) is NULL and ranks last (DuckDB ORDER BY ... NULLS LAST);
    a null group key caps like any other group."""
    from kg_gen_ray.functions.sessions import stratified_sample

    t = pa.table({
        "lang": pa.array(["en", "en", "en", None, None]),
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["aaa", None, "zzz", "mmm", None]),
    })
    out = stratified_sample(rd.from_arrow(t).repartition(2), "lang",
                            cap=2, id_col="doc_id").take_all()
    got = {r["lang"] if r["lang"] is not None else None for r in out}
    assert got == {"en", None}
    ids = sorted(r["doc_id"] for r in out)
    # en keeps the two hashed rows — the null-text row ranks last
    # regardless of md5 order — and the null group keeps both its rows
    # (under cap)
    assert ids == sorted([0, 2] + [3, 4])


def test_quantile_sketch_null_group(ray_session):
    from kg_gen_ray.functions.sessions import grouped_quantiles_sketch

    t = pa.table({
        "g": pa.array(["a"] * 10 + [None] * 10),
        "v": pa.array(list(range(10)) + list(range(100, 110)), pa.int64()),
    })
    rows = {r["g"]: r["p50"]
            for r in grouped_quantiles_sketch(
                rd.from_arrow(t).repartition(3), "g", "v").take_all()}
    assert set(rows) == {"a", None}
    assert 100 <= rows[None] <= 109


def test_grouped_ops_int64_keys_partial_nulls(ray_session):
    """Regression (ADVICE r3): the group-key surrogate must render an
    int64 key identically whether or not its batch contains a null —
    pandas promotes int64-with-null to float64, so a pandas-side str()
    once split key 10 into 'v:10' and 'v:10.0' across partitions."""
    from kg_gen_ray.functions.sessions import (grouped_quantiles,
                                               grouped_quantiles_sketch,
                                               grouped_topk)

    # partition 1: key 10 with a null neighbor; partition 2: key 10 only
    t1 = pa.table({
        "g": pa.array([10, None, 10], pa.int64()),
        "v": pa.array([1, 50, 2], pa.int64()),
        "doc_id": pa.array([0, 1, 2], pa.int64()),
    })
    t2 = pa.table({
        "g": pa.array([10, 10, 7], pa.int64()),
        "v": pa.array([9, 8, 3], pa.int64()),
        "doc_id": pa.array([3, 4, 5], pa.int64()),
    })
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))

    top = grouped_topk(ds, "g", "v", k=2, tiebreak_col="doc_id").take_all()
    by_group = {}
    for r in top:
        by_group.setdefault(r["g"], set()).add(r["doc_id"])
    # ONE group for key 10 spanning both partitions -> global top-2
    assert by_group[10] == {3, 4}
    assert by_group[7] == {5}
    assert by_group[None] == {1}

    q = grouped_quantiles(ds, "g", "v").take_all()
    assert sorted((r["g"] is None, r["g"]) for r in q) == \
        [(False, 7), (False, 10), (True, None)]
    p50 = {r["g"]: r["p50"] for r in q}
    assert p50[10] == 2      # ceil(0.5*4)-1 = index 1 of [1,2,8,9]

    qs = grouped_quantiles_sketch(ds, "g", "v").take_all()
    assert sorted((r["g"] is None, r["g"]) for r in qs) == \
        [(False, 7), (False, 10), (True, None)]


def test_grouped_topk_nul_string_key_not_null(ray_session):
    """A genuine '\\x00' string key must stay distinct from the null
    group (disjoint surrogate prefixes)."""
    from kg_gen_ray.functions.sessions import grouped_topk

    t = pa.table({
        "g": pa.array(["\x00", None, "\x00", None], pa.string()),
        "v": pa.array([4, 3, 2, 1], pa.int64()),
        "doc_id": pa.array(range(4), pa.int64()),
    })
    out = grouped_topk(rd.from_arrow(t).repartition(2), "g", "v",
                       k=1, tiebreak_col="doc_id").take_all()
    by_group = {r["g"]: r["doc_id"] for r in out}
    assert by_group == {"\x00": 0, None: 1}


def _mix_docs():
    rows = [(i, f"text number {i}", ["en", "de", "es"][i % 3])
            for i in range(300)]
    rows.append((300, None, "en"))       # null text -> dropped
    rows.append((301, "orphan", None))   # null group -> dropped
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }))


def test_mix_sample_serial_replay(ray_session):
    """Engine output == a plain-Python replay of the md5-u32 rule."""
    import hashlib

    from kg_gen_ray.functions.sessions import mix_sample

    rates = {"en": 0.9, "de": 0.25}
    got = sorted(r["doc_id"] for r in
                 mix_sample(_mix_docs(), "lang", rates).take_all())
    thr = {g: int(r * 4294967296) for g, r in rates.items()}
    expected = [
        i for i in range(300)
        if int(hashlib.md5(f"mix:text number {i}".encode()).hexdigest()[:8],
               16) < thr.get(["en", "de", "es"][i % 3], 0)]
    assert got == expected
    # es (absent), null text, null group never survive
    langs = {["en", "de", "es"][i % 3] for i in got}
    assert "es" not in langs and 300 not in got and 301 not in got


def test_mix_sample_rate_and_seed(ray_session):
    from kg_gen_ray.functions.sessions import mix_sample

    ds = _mix_docs()
    kept = mix_sample(ds, "lang", {"en": 0.9}).count()
    # 100 en docs at rate 0.9: binomial-ish, just pin the ballpark
    assert 75 <= kept <= 100
    a = {r["doc_id"] for r in
         mix_sample(ds, "lang", {"en": 0.5}, seed="a").take_all()}
    b = {r["doc_id"] for r in
         mix_sample(ds, "lang", {"en": 0.5}, seed="b").take_all()}
    assert a != b  # a new seed redraws the sample
    # rate 1.0 keeps every non-null en row, rate 0 keeps none
    assert mix_sample(ds, "lang", {"en": 1.0}).count() == 100
    assert mix_sample(ds, "lang", {"en": 0.0}).count() == 0


def test_seeded_shuffle_serial_replay(ray_session):
    """The (shard, pos) manifest equals a serial md5 sort-and-rank over
    the same ids — seeded multi-block input with null ids dropped."""
    import hashlib

    import numpy as np

    from kg_gen_ray.functions.sessions import seeded_shuffle

    rng = np.random.default_rng(411)
    ids = rng.permutation(np.arange(1, 301)).tolist()
    ids[7] = None
    ids[211] = None
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())})) \
           .repartition(7)
    got = seeded_shuffle(ds, n_shards=4, seed="epoch0").to_pandas() \
        .sort_values(["shard", "pos"]).reset_index(drop=True)

    expect = {}
    for i in ids:
        if i is None:
            continue
        h = hashlib.md5(f"epoch0:{i}".encode()).hexdigest()
        expect.setdefault(int(h[:8], 16) % 4, []).append((h, i))
    rows = []
    for shard in expect:
        for pos, (_, i) in enumerate(sorted(expect[shard])):
            rows.append((i, shard, pos))
    want = sorted(rows, key=lambda r: (r[1], r[2]))
    assert list(map(tuple, got[["doc_id", "shard", "pos"]]
                    .itertuples(index=False))) == want
    # 298 non-null ids all placed, each shard's pos is 0..len-1 dense
    assert len(got) == 298
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_seeded_shuffle_epoch_seed_redraws(ray_session):
    """Same seed is bit-stable across runs; a new seed permutes."""
    from kg_gen_ray.functions.sessions import seeded_shuffle

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(64), pa.int64())}))
    a = seeded_shuffle(ds, 2, seed="epoch0").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = seeded_shuffle(ds, 2, seed="epoch0").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    c = seeded_shuffle(ds, 2, seed="epoch1").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert not a.equals(c)           # fresh epoch order
    assert sorted(c["doc_id"]) == list(range(64))  # still a permutation


def test_seeded_shuffle_zero_rows(ray_session):
    from kg_gen_ray.functions.sessions import seeded_shuffle

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert seeded_shuffle(empty, 4).count() == 0
