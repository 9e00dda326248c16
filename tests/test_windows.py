"""Windowed aggregate + as-of join tests (custom operators beyond the
reference; see kg_gen_ray/functions/windows.py)."""
import datetime as dt

import pyarrow as pa
import pytest
import ray.data as rd

from kg_gen_ray.functions.windows import asof_join, sliding_window, tumbling_window

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    # rows: (seconds_offset, key, value)
    return rd.from_arrow(pa.table({
        "ts": pa.array([T0 + dt.timedelta(seconds=s) for s, _, _ in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([k for _, k, _ in rows], pa.string()),
        "value": pa.array([v for _, _, v in rows], pa.float64()),
    }))


def test_tumbling_window(ray_session):
    ev = _events([(0, "a", 1.0), (59, "a", 2.0), (60, "a", 4.0),
                  (0, "b", 8.0)])
    out = {(r["event_type"],
            int((r["window_start"] - T0).total_seconds()) // 60):
           (r["n_events"], r["sum_value"])
           for r in tumbling_window(ev, 60).take_all()}
    assert out[("a", 0)] == (2, 3.0)
    assert out[("a", 1)] == (1, 4.0)
    assert out[("b", 0)] == (1, 8.0)


def test_sliding_window_membership(ray_session):
    # window 60s sliding 30s: event at t=45 belongs to starts 30 and 0
    ev = _events([(45, "a", 1.0)])
    starts = sorted(r["window_start"].strftime("%M:%S")
                    for r in sliding_window(ev, 60, 30).take_all())
    assert starts == ["00:00", "00:30"]


def test_sliding_window_counts(ray_session):
    ev = _events([(0, "a", 1.0), (29, "a", 1.0), (31, "a", 1.0),
                  (61, "a", 1.0)])
    out = {r["window_start"].strftime("%M:%S"): r["n_events"]
           for r in sliding_window(ev, 60, 30).take_all()}
    # window [0,60): events at 0,29,31; window [30,90): 31,61;
    # window [60,120): 61 ... plus the "start=-30" window [ -30,30): 0,29
    assert out["00:00"] == 3
    assert out["00:30"] == 2
    assert out["01:00"] == 1


def test_sliding_window_validates_slide(ray_session):
    with pytest.raises(ValueError):
        sliding_window(_events([(0, "a", 1.0)]), 60, 45)


def test_multi_window_matches_singles(ray_session):
    """One-shuffle multi_window == the per-family tumbling/sliding ops."""
    from kg_gen_ray.functions.windows import multi_window

    ev = _events([(0, "a", 1.0), (29, "a", 2.0), (31, "b", 4.0),
                  (61, "a", 8.0), (95, "b", 16.0)])
    fused = {(r["window_kind"], r["event_type"],
              r["window_start"].strftime("%M:%S")):
             (r["n_events"], r["sum_value"])
             for r in multi_window(
                 ev, [("tumble", 60, 60), ("slide", 60, 30)]).take_all()}
    tumble = {("tumble", r["event_type"],
               r["window_start"].strftime("%M:%S")):
              (r["n_events"], r["sum_value"])
              for r in tumbling_window(ev, 60).take_all()}
    slide = {("slide", r["event_type"],
              r["window_start"].strftime("%M:%S")):
             (r["n_events"], r["sum_value"])
             for r in sliding_window(ev, 60, 30).take_all()}
    assert fused == {**tumble, **slide}
    with pytest.raises(ValueError, match="multiple"):
        multi_window(ev, [("bad", 60, 45)])


def _asof_fixture():
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(days=d) for d in (5, 1, 5, 5)],
                       pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "rts": pa.array([T0, T0 + dt.timedelta(days=3), T0 + dt.timedelta(days=9)],
                        pa.timestamp("us")),
        "price": pa.array([100.0, 300.0, 900.0], pa.float64()),
    }))
    return left, right


def test_asof_join_backward(ray_session):
    left, right = _asof_fixture()
    out = {r["l_event_id"]: r["r_price"]
           for r in asof_join(left, right, key_col="user_id", ts_col="ts",
                              right_ts_col="rts",
                              right_value_cols=["price"]).take_all()}
    import pandas as pd
    assert out[10] == 300.0   # day 5: latest ref at day 3
    assert out[11] == 100.0   # day 1: latest ref at day 0
    assert pd.isna(out[12])   # user 2: only future ref (day 9)
    assert pd.isna(out[13])   # user 3: no refs at all
    assert len(out) == 4      # every left row survives


def test_asof_join_exact_timestamp_inclusive(ray_session):
    left = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([T0], pa.timestamp("us")),
        "id": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([T0], pa.timestamp("us")),
        "v": pa.array([7.0], pa.float64())}))
    out = asof_join(left, right, key_col="k", ts_col="ts",
                    right_ts_col="rts", right_value_cols=["v"]).take_all()
    assert out[0]["r_v"] == 7.0   # ts == rts matches (backward inclusive)


def test_asof_join_forward(ray_session):
    left, right = _asof_fixture()
    out = {r["l_event_id"]: r["r_price"]
           for r in asof_join(left, right, key_col="user_id", ts_col="ts",
                              right_ts_col="rts",
                              right_value_cols=["price"],
                              direction="forward").take_all()}
    import pandas as pd
    assert pd.isna(out[10])   # day 5: no later ref for user 1
    assert out[11] == 300.0   # day 1: earliest ref at/after is day 3
    assert out[12] == 900.0   # user 2: future ref at day 9 now matches
    assert pd.isna(out[13])   # user 3: no refs at all


def test_asof_join_bad_direction():
    import pytest
    with pytest.raises(ValueError, match="direction"):
        asof_join(None, None, key_col="k", ts_col="t", right_ts_col="rt",
                  right_value_cols=[], direction="nearest")
    with pytest.raises(ValueError, match="direction"):
        asof_join(None, None, key_col="k", ts_col="t", right_ts_col="rt",
                  right_value_cols=[], directions=("backward", "nearest"))


def test_asof_join_multi_direction_single_shuffle(ray_session):
    """directions=(...) computes every direction from one shuffle; the
    tagged output must equal the union of the single-direction calls."""
    import pandas as pd
    left, right = _asof_fixture()

    def canon(rows, d=None):
        return sorted((r["l_event_id"],
                       d if d is not None else r["direction"],
                       None if pd.isna(r["r_price"]) else r["r_price"])
                      for r in rows)

    both = canon(asof_join(left, right, key_col="user_id", ts_col="ts",
                           right_ts_col="rts", right_value_cols=["price"],
                           directions=("backward", "forward")).take_all())
    singles = sorted(
        canon(asof_join(left, right, key_col="user_id", ts_col="ts",
                        right_ts_col="rts", right_value_cols=["price"],
                        direction=d).take_all(), d)
        for d in ("backward", "forward"))
    assert both == sorted(x for s in singles for x in s)
    assert len(both) == 8   # 4 left rows x 2 directions


def test_range_join_containment(ray_session):
    from datetime import datetime

    from kg_gen_ray.functions.windows import range_join

    def T(d):
        return datetime(2026, 1, d)

    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([T(2), T(5), T(9), T(4), T(1)], pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "s": pa.array([T(1), T(6), T(3)], pa.timestamp("us")),
        "e": pa.array([T(3), T(8), T(4)], pa.timestamp("us")),
        "session_id": pa.array([0, 1, 0], pa.int64())}))
    out = {int(r["l_event_id"]): r["p_session_id"] for r in
           range_join(left, ivs, "user_id", "ts", "s", "e",
                      ["session_id"]).take_all()}
    import pandas as pd
    assert out[10] == 0            # day 2 in [1, 3]
    assert pd.isna(out[11])        # day 5 falls in the gap
    assert pd.isna(out[12])        # day 9 after the last interval
    assert out[13] == 0            # inclusive end: day 4 == e
    assert pd.isna(out[14])        # user 3 has no intervals
    assert len(out) == 5           # left-outer: every row survives


def test_asof_join_null_keys_and_ts(ray_session):
    """Null left ts/key -> null payload (missing-match semantics), never
    a pandas merge crash; null right rows match nothing."""
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([10, None, 10, 99], pa.int64()),
        "ts": pa.array([1000000, 2000000, None, 5000000],
                       pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([10, 10, None], pa.int64()),
        "rts": pa.array([500000, None, 700000], pa.timestamp("us")),
        "payload": pa.array([7.5, 8.5, 9.5], pa.float64()),
    }))
    rows = {r["l_event_id"]: r["r_payload"]
            for r in asof_join(left, right, "user_id", "ts", "rts",
                               ["payload"]).take_all()}
    import pandas as pd
    assert rows[1] == 7.5            # normal backward match
    assert pd.isna(rows[2])          # null key -> no match
    assert pd.isna(rows[3])          # null ts -> no match
    assert pd.isna(rows[4])          # no ref for key 99


def test_window_ops_custom_value_col_naming(ray_session):
    """All three window operators name the sum column sum_<value_col> —
    drop-in equivalence must hold off the default column name too."""
    from kg_gen_ray.functions.windows import multi_window

    ev = _events([(0, "a", 1.0), (29, "a", 2.0), (61, "b", 4.0)]) \
        .map_batches(lambda t: t.rename_columns(
            ["ts", "event_type", "tokens"]), batch_format="pyarrow")
    for op_rows in (
            tumbling_window(ev, 60, value_col="tokens").take_all(),
            sliding_window(ev, 60, 30, value_col="tokens").take_all(),
            multi_window(ev, [("tumble", 60, 60)],
                         value_col="tokens").take_all()):
        assert all("sum_tokens" in r for r in op_rows)
    got = {(r["event_type"], r["window_start"].strftime("%M:%S")):
           r["sum_tokens"]
           for r in tumbling_window(ev, 60, value_col="tokens").take_all()}
    assert got[("a", "00:00")] == 3.0 and got[("b", "01:00")] == 4.0
