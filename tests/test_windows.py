"""Session-window and tumbling-window operator tests."""

import datetime

import pyarrow as pa


def _events(rows):
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })


def test_sessionize_gap_breaks(ray_session):
    import ray
    from html_parser_ray.functions.windows import sessionize
    t0 = datetime.datetime(2024, 1, 1)
    m = datetime.timedelta(minutes=1)
    rows = [
        (t0, 1, 10.0), (t0 + 5 * m, 1, 20.0),        # session 0 of user 1
        (t0 + 60 * m, 1, 30.0),                      # gap 55min -> session 1
        (t0 + 2 * m, 2, 5.0),                        # user 2 single session
    ]
    out = sorted(sessionize(ray.data.from_arrow(_events(rows)),
                            gap_s=1800).take_all(),
                 key=lambda r: (r["user_id"], r["session_idx"]))
    assert [(r["user_id"], r["session_idx"], r["n_events"],
             r["value_sum_cents"]) for r in out] == [
        (1, 0, 2, 3000), (1, 1, 1, 3000), (2, 0, 1, 500)]
    assert out[0]["session_start"] == t0
    assert out[0]["session_end"] == t0 + 5 * m


def test_sessionize_boundary_not_greater(ray_session):
    import ray
    from html_parser_ray.functions.windows import sessionize
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0, 1, 1.0), (t0 + datetime.timedelta(seconds=1800), 1, 1.0)]
    out = sessionize(ray.data.from_arrow(_events(rows)), gap_s=1800).take_all()
    assert len(out) == 1 and out[0]["n_events"] == 2  # gap == limit: same


def test_tumbling_window(ray_session):
    import ray
    from html_parser_ray.functions.windows import tumbling_window_agg
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0 + datetime.timedelta(minutes=mn), 1, 1.0)
            for mn in (0, 30, 59, 60, 61, 125)]
    out = sorted(tumbling_window_agg(
        ray.data.from_arrow(_events(rows)), window_s=3600).take_all(),
        key=lambda r: r["window_start"])
    assert [(r["window_start"], r["n_events"]) for r in out] == [
        (t0, 3), (t0 + datetime.timedelta(hours=1), 2),
        (t0 + datetime.timedelta(hours=2), 1)]


def test_hopping_window_overlap(ray_session):
    import datetime
    import ray
    from html_parser_ray.functions.windows import hopping_window_agg
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # one event at 10:00:00 and one at 10:50:00 — 1h windows hopping 15min
    tbl = pa.table({
        "ts": pa.array([base, base + datetime.timedelta(minutes=50)],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0], pa.float64()),
    })
    out = {r["window_start"]: (r["n_events"], r["value_sum_cents"])
           for r in hopping_window_agg(ray.data.from_arrow(tbl),
                                       window_s=3600,
                                       hop_s=900).take_all()}
    # event 1 (10:00) lands in windows starting 09:15, 09:30, 09:45, 10:00
    # event 2 (10:50) in 10:00, 10:15, 10:30, 10:45 — 10:00 holds both
    assert len(out) == 7
    both = base
    assert out[both] == (2, 300)
    assert out[base - datetime.timedelta(minutes=45)] == (1, 100)
    assert out[base + datetime.timedelta(minutes=45)] == (1, 200)


def test_hopping_window_rejects_uneven_hop(ray_session):
    import ray
    import pytest as _pytest
    from html_parser_ray.functions.windows import hopping_window_agg
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64())}))
    with _pytest.raises(ValueError):
        hopping_window_agg(ds, window_s=3600, hop_s=1000)
