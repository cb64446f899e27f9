"""Windowed / sessionized aggregation over event streams.

Ray Data has no native session-window operator; per SURVEY.md §2 "custom
operators" guidance this is expressed as groupby(key).map_groups with an
in-group sort — the partitioning assumption is that ONE key's events fit in
a worker's heap (true for per-user web events; a pathological key would be
salted by (user_id, ts_day)). Only (key, ts, value) columns shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_S = 1800  # 30 min


def sessionize(ds, *, gap_s: int = SESSION_GAP_S):
    """events → one row per (user_id, session): start/end ts, n_events,
    value sum. A session breaks when the gap to the previous event of the
    same user exceeds ``gap_s`` seconds."""

    def sessions_for_user(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                  ("event_id", "ascending")])
        g = group.take(order)
        ts = g.column("ts").cast(pa.int64()).to_numpy()  # µs
        values = g.column("value").to_numpy()
        user = g.column("user_id")[0].as_py()
        gaps = np.diff(ts) > gap_s * 1_000_000
        # session id per event = count of gap-breaks before it
        session_of = np.concatenate([[0], np.cumsum(gaps)])
        n_sessions = int(session_of[-1]) + 1 if len(ts) else 0
        starts, ends, counts, sums = [], [], [], []
        for s in range(n_sessions):
            mask = session_of == s
            starts.append(int(ts[mask].min()))
            ends.append(int(ts[mask].max()))
            counts.append(int(mask.sum()))
            sums.append(float(values[mask].sum()))
        return pa.table({
            "user_id": pa.array([user] * n_sessions, pa.int64()),
            "session_idx": pa.array(range(n_sessions), pa.int64()),
            "session_start": pa.array(starts, pa.int64()).cast(
                pa.timestamp("us")),
            "session_end": pa.array(ends, pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "value_sum_cents": pa.array(
                [int(round(v * 100)) for v in sums], pa.int64()),
        })

    pruned = ds.map_batches(
        lambda b: b.select(["user_id", "event_id", "ts", "value"]),
        batch_format="pyarrow")
    return pruned.groupby("user_id").map_groups(
        sessions_for_user, batch_format="pyarrow")


def tumbling_window_agg(ds, *, window_s: int = 3600):
    """events → (window_start, n_events, value_sum) fixed tumbling windows.

    Pre-aggregates inside map_batches (one partial row per window per
    batch), so the groupby shuffles only tiny partials — the combiner
    pattern SURVEY.md §2.5 prescribes."""
    from ray.data.aggregate import Sum

    win_us = window_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        win = (ts // win_us) * win_us
        values = batch.column("value").to_numpy()
        uniq, inverse = np.unique(win, return_inverse=True)
        counts = np.bincount(inverse)
        sums = np.bincount(inverse, weights=values)
        return pa.table({
            "window_start_us": pa.array(uniq, pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "value_sum": pa.array(sums, pa.float64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("window_start_us")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("value_sum", alias_name="value_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": batch.column("window_start_us").cast(
                pa.timestamp("us")),
            "n_events": batch.column("n_events"),
            "value_sum_cents": pc.cast(
                pc.round(pc.multiply(batch.column("value_sum"), 100.0)),
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(ds, *, window_s: int = 3600, hop_s: int = 900):
    """events → (window_start, n_events, value_sum_cents) HOPPING (sliding)
    windows: length ``window_s``, advancing every ``hop_s``; each event
    lands in window_s / hop_s overlapping windows (must divide evenly).

    Same combiner shape as the tumbling variant: the per-batch partial
    explodes each event onto its window grid VECTORIZED (one np.unique +
    two bincounts over n_events × n_windows rows) and emits one partial
    row per (window) per batch, so the groupby shuffles only tiny
    partials regardless of corpus size."""
    from ray.data.aggregate import Sum

    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    hop_us = hop_s * 1_000_000
    n_k = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        values = batch.column("value").to_numpy()
        base = (ts // hop_us) * hop_us
        # windows containing ts: base, base - hop, …, base - (n_k-1)*hop
        wins = np.concatenate([base - k * hop_us for k in range(n_k)])
        vals = np.tile(values, n_k)
        uniq, inverse = np.unique(wins, return_inverse=True)
        return pa.table({
            "window_start_us": pa.array(uniq, pa.int64()),
            "n_events": pa.array(np.bincount(inverse), pa.int64()),
            "value_sum": pa.array(np.bincount(inverse, weights=vals),
                                  pa.float64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("window_start_us")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("value_sum", alias_name="value_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": batch.column("window_start_us").cast(
                pa.timestamp("us")),
            "n_events": batch.column("n_events"),
            "value_sum_cents": pc.cast(
                pc.round(pc.multiply(batch.column("value_sum"), 100.0)),
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
