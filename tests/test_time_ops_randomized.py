"""Randomized parity for the time operators against independent serial
replays — seeded (not hypothesis: each example pays a Ray pipeline), with
duplicate timestamps, unmatched keys, nulls, and multi-block inputs, so
block boundaries and bucket hashing are exercised beyond the fixed
fixtures and the driver oracle's one configuration."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kg_gen_ray.functions.sessions import sessionize
from kg_gen_ray.functions.windows import asof_join


def _random_events(rng, n, n_users, null_frac=0.05):
    ts = rng.integers(0, 5_000_000, size=n).astype("datetime64[us]")
    ts = ts.astype(object)
    for i in rng.choice(n, max(1, int(n * null_frac)), replace=False):
        ts[i] = None
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "value": pa.array(rng.random(n), pa.float64()),
    })


def test_asof_join_matches_pandas_merge_asof(ray_session):
    rng = np.random.default_rng(7)
    for trial, direction in ((0, "backward"), (1, "forward"),
                             (2, "backward")):
        n_l, n_r = 400, 150
        left = _random_events(rng, n_l, n_users=12)
        right = _random_events(rng, n_r, n_users=12) \
            .rename_columns(["ref_id", "user_id", "rts", "price"])
        out = asof_join(rd.from_arrow(left).repartition(7),
                        rd.from_arrow(right).repartition(5),
                        key_col="user_id", ts_col="ts",
                        right_ts_col="rts", right_value_cols=["price"],
                        direction=direction).take_all()
        got = {r["l_event_id"]: r["r_price"] for r in out}
        assert len(out) == n_l          # LEFT join: every left row once

        # serial replay: pandas merge_asof needs sorted, null-free keys;
        # null-ts/null-key left rows must come back with null payload
        ldf = left.to_pandas()
        rdf = right.to_pandas().dropna(subset=["user_id", "rts"]) \
                   .sort_values("rts", kind="stable")
        matchable = ldf.dropna(subset=["user_id", "ts"]) \
                       .sort_values("ts", kind="stable")
        merged = pd.merge_asof(matchable, rdf, left_on="ts",
                               right_on="rts", by="user_id",
                               direction=direction)
        want = dict.fromkeys(ldf["event_id"], None)
        want.update(dict(zip(merged["event_id"], merged["price"])))
        for eid, price in want.items():
            g = got[eid]
            if price is None or pd.isna(price):
                assert pd.isna(g), (trial, eid, g)
            else:
                assert g == price, (trial, eid, g, price)


def test_range_join_matches_serial_replay(ray_session):
    rng = np.random.default_rng(23)
    n_l, n_keys = 400, 10
    left = _random_events(rng, n_l, n_users=n_keys)
    # non-overlapping intervals per key (the documented partitioning
    # assumption), some with null bounds (must match nothing)
    ks, ss, es, sids = [], [], [], []
    for k in range(n_keys):
        edges = np.sort(rng.choice(5_000_000, size=8, replace=False))
        for i in range(0, 8, 2):
            ks.append(k)
            ss.append(int(edges[i]))
            es.append(int(edges[i + 1]))
            sids.append(k * 100 + i)
    ss[3] = None                      # a null start bound
    es[7] = None                      # a null end bound
    ivs = pa.table({
        "user_id": pa.array(ks, pa.int64()),
        "s": pa.array(ss, pa.timestamp("us")),
        "e": pa.array(es, pa.timestamp("us")),
        "session_id": pa.array(sids, pa.int64())})

    from kg_gen_ray.functions.windows import range_join
    out = range_join(rd.from_arrow(left).repartition(7),
                     rd.from_arrow(ivs).repartition(3),
                     "user_id", "ts", "s", "e",
                     ["session_id"]).take_all()
    got = {r["l_event_id"]: r["p_session_id"] for r in out}
    assert len(out) == n_l            # left-outer: every row once

    ldf = left.to_pandas()
    idf = ivs.to_pandas().dropna(subset=["s", "e"])
    for _, row in ldf.iterrows():
        hits = idf[(idf["user_id"] == row["user_id"]) &
                   (idf["s"] <= row["ts"]) & (row["ts"] <= idf["e"])]
        g = got[row["event_id"]]
        if pd.isna(row["ts"]) or hits.empty:
            assert pd.isna(g), row["event_id"]
        else:
            assert g == hits.iloc[0]["session_id"], row["event_id"]


def test_sessionize_matches_serial_replay(ray_session):
    rng = np.random.default_rng(11)
    gap_sec = 600
    events = _random_events(rng, 500, n_users=9)
    got = {(r["user_id"], r["session_id"]):
           (r["session_start"], r["session_end"], r["n_events"])
           for r in sessionize(rd.from_arrow(events).repartition(6),
                               gap_sec).take_all()}

    df = events.to_pandas().dropna(subset=["ts"]) \
               .sort_values(["user_id", "ts", "event_id"], kind="stable")
    want = {}
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].to_numpy()
        sid = 0
        start = end = ts[0]
        n = 1
        for t in ts[1:]:
            if (t - end) > np.timedelta64(gap_sec, "s"):
                want[(uid, sid)] = (start, end, n)
                sid += 1
                start, n = t, 0
            end = t
            n += 1
        want[(uid, sid)] = (start, end, n)

    assert set(got) == set(want)
    for k, (s, e, n) in want.items():
        gs, ge, gn = got[k]
        assert (np.datetime64(gs, "us"), np.datetime64(ge, "us"), gn) == \
            (np.datetime64(s, "us"), np.datetime64(e, "us"), n), k
