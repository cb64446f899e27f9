"""Distributed column profiling: the DESCRIBE/summary pass a data
engineer runs before trusting a 100-TB table — per column: row count,
null count, min, max, exact distinct count.

Scale shape: one pass emits ONE partial row per (batch, column) with
native-typed min/max ORDER-PRESERVINGLY ENCODED as strings (int64 is
offset by 2⁶³ and zero-padded to 20 digits, so lexicographic order ==
numeric order; strings are used raw — UTF-8 byte order equals code-point
order, so Python ``min``/DuckDB binary collation agree on any valid
Unicode). The combine is ``groupby(column).map_groups`` — one vectorized
call per COLUMN (cardinality = the handful of profiled columns).
Distinct counts ride the exact pair machinery
(sketches.distinct_count_by_group with the column NAME as the group):
only (column, 32-byte md5) pairs shuffle. The two small results (one row
per column each) join on the driver; nothing unbounded leaves the
cluster.

No counterpart in the reference (per-document only); this is table-level
corpus tooling the Ray engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OFFSET = 1 << 63


def _enc_int(v: int) -> str:
    return f"{v + _OFFSET:020d}"


def _dec_int(s: str) -> int:
    return int(s) - _OFFSET


def profile_columns(ds, *, int_cols: list[str], str_cols: list[str]):
    """Dataset → pa.Table(column, n_rows, n_nulls, min_v, max_v,
    n_distinct). ``min_v``/``max_v`` are rendered as plain value strings
    (ints via str(), matching SQL ``CAST(min(c) AS VARCHAR)``); NULLs
    are excluded from min/max/distinct, SQL-style. An all-NULL column
    reports empty-string min/max ('' — SQL NULL is avoided so the
    comparison frame keeps one dtype)."""
    from .sketches import distinct_count_by_group

    cols = [(c, True) for c in int_cols] + [(c, False) for c in str_cols]

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for name, is_int in cols:
            col = batch.column(name)
            valid = col.drop_null()
            names.append(name)
            ns.append(batch.num_rows)
            nulls.append(batch.num_rows - len(valid))
            if len(valid) == 0:
                mins.append("")
                maxs.append("")
            elif is_int:
                v = valid.to_numpy(zero_copy_only=False)
                mins.append(_enc_int(int(v.min())))
                maxs.append(_enc_int(int(v.max())))
            else:
                v = valid.to_pylist()
                mins.append(min(v))
                maxs.append(max(v))
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "nulls": pa.array(nulls, pa.int64()),
            "mn": pa.array(mins, pa.string()),
            "mx": pa.array(maxs, pa.string()),
        })

    def finish(group: pa.Table) -> pa.Table:
        name = group.column("column").to_pylist()[0]
        mn = [s for s in group.column("mn").to_pylist() if s != ""]
        mx = [s for s in group.column("mx").to_pylist() if s != ""]
        is_int = name in set(int_cols)
        mn_v = min(mn) if mn else ""
        mx_v = max(mx) if mx else ""
        if is_int and mn:
            mn_v, mx_v = str(_dec_int(mn_v)), str(_dec_int(mx_v))
        return pa.table({
            "column": pa.array([name], pa.string()),
            "n_rows": pa.array(
                [int(np.sum(group.column("n").to_numpy(
                    zero_copy_only=False)))], pa.int64()),
            "n_nulls": pa.array(
                [int(np.sum(group.column("nulls").to_numpy(
                    zero_copy_only=False)))], pa.int64()),
            "min_v": pa.array([mn_v], pa.string()),
            "max_v": pa.array([mx_v], pa.string()),
        })

    stats = {r["column"]: r for r in
             (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("column")
              .map_groups(finish, batch_format="pyarrow")
              .take_all())}

    def explode(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for name, _ in cols:
            col = batch.column(name)
            for v in col.to_pylist():
                if v is None:
                    continue
                names.append(name)
                vals.append(str(v))
        return pa.table({"column": pa.array(names, pa.string()),
                         "val": pa.array(vals, pa.string())})

    distinct = {r["column"]: r["n_distinct"] for r in
                distinct_count_by_group(
                    ds.map_batches(explode, batch_format="pyarrow"),
                    group_col="column", col="val").take_all()}

    names = [c for c, _ in cols]
    return pa.table({
        "column": pa.array(names, pa.string()),
        "n_rows": pa.array([stats[c]["n_rows"] for c in names], pa.int64()),
        "n_nulls": pa.array([stats[c]["n_nulls"] for c in names],
                            pa.int64()),
        "min_v": pa.array([stats[c]["min_v"] for c in names], pa.string()),
        "max_v": pa.array([stats[c]["max_v"] for c in names], pa.string()),
        "n_distinct": pa.array([distinct.get(c, 0) for c in names],
                               pa.int64()),
    })
