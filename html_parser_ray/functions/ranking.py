"""Distributed global ranking: each row's exact 0-based position in the
corpus-wide (value, id) order — without a global sort materializing or a
single-node window function.

The curation uses: "take the N highest-quality documents", percentile
bucketing, rank-based mixing curves. A naive approach is
``ds.sort(col)`` + a driver-side enumerate — an all-to-all sort shuffle
PLUS a full driver materialization. This operator instead computes ranks
with a two-level scheme (same shape as packing.pack_spans' distributed
prefix scan):

1. value histogram: an in-batch ``np.unique`` combiner emits (value,
   partial count) rows — at most one per distinct value per batch — and
   one tiny ``groupby(col).sum`` produces the exact global histogram.
   The histogram goes to the driver and its prefix sum gives each
   VALUE's starting rank. Documented assumption: the value column has
   BOUNDED CARDINALITY relative to the corpus (integer scores in basis
   points, document lengths, bucketed floats) — the histogram is one row
   per distinct value, not per row.
2. intra-value positions: rows shuffle ONCE keyed by a value BUCKET
   (``searchsorted(distinct_values, v) // values_per_bucket`` — many
   values per group, so one Python call per BUCKET, not per value, and
   certainly not per row), and one vectorized lexsort segment reduction
   per bucket assigns rank = value_offset + position-among-equal-values
   (ordered by id — total, deterministic).

Only (id, value) pairs ever shuffle; payload columns never move. At
100 TB: histogram ≤ distinct-value count (e.g. 10001 bp scores), bucket
shuffle ships two int64 columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# per-process SINGLE-SLOT cache [key, offsets] (same idiom as
# packing._OFFSET_CACHE; a keyed dict would leak past broadcasts)
_OFFSET_CACHE: list = [None, None]


def global_rank(ds, *, col: str, id_col: str = "doc_id",
                values_per_bucket: int = 256):
    """Dataset[..., col:int, id] → Dataset(id, col, rank) with ``rank``
    the exact 0-based global position in ascending (col, id) order."""
    import ray
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({col: pa.array(uniq.astype(np.int64), pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    from .common import bounded_take_all
    hist = bounded_take_all(
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(col).aggregate(Sum("n", alias_name="n")),
        what=f"global_rank value histogram over '{col}'")
    if not hist:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))
    values = np.array([r[col] for r in hist], dtype=np.int64)
    counts = np.array([r["n"] for r in hist], dtype=np.int64)
    order = np.argsort(values)
    values, counts = values[order], counts[order]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ref = ray.put((values, offsets))
    key = ref.hex()

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             col: pa.array([], pa.int64()),
                             "vb": pa.array([], pa.int64())})
        if _OFFSET_CACHE[0] != key:
            _OFFSET_CACHE[0] = key
            _OFFSET_CACHE[1] = ray.get(ref)
        cached = _OFFSET_CACHE[1]
        vals, _ = cached
        v = batch.column(col).to_numpy(zero_copy_only=False)
        vb = (np.searchsorted(vals, v) // values_per_bucket).astype(np.int64)
        return pa.table({id_col: batch.column(id_col).cast(pa.int64()),
                         col: batch.column(col).cast(pa.int64()),
                         "vb": pa.array(vb, pa.int64())})

    def rank_bucket(group: pa.Table) -> pa.Table:
        if _OFFSET_CACHE[0] != key:
            _OFFSET_CACHE[0] = key
            _OFFSET_CACHE[1] = ray.get(ref)
        cached = _OFFSET_CACHE[1]
        vals, offs = cached
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        v = group.column(col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        v_s = v[order]
        # position within each equal-value segment
        new_seg = np.ones(len(order), dtype=bool)
        new_seg[1:] = v_s[1:] != v_s[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        pos = np.arange(len(order)) - seg_start[seg_id]
        rank_sorted = offs[np.searchsorted(vals, v_s)] + pos
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = rank_sorted
        return pa.table({id_col: group.column(id_col),
                         col: group.column(col),
                         "rank": pa.array(rank, pa.int64())})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("vb")
            .map_groups(rank_bucket, batch_format="pyarrow"))
