"""Grouped top-k: the best k rows per group by a value column.

The per-host / per-language "keep the k highest-quality documents"
step of corpus curation. Same two-level shape as stratified sampling
(sampling.py) but ranked by a VALUE instead of a hash:

1. per-batch PARTIAL top-k per group inside ``map_batches`` — each batch
   forwards at most k rows per group it contains, so the shuffle input
   is bounded by groups-in-batch × k regardless of batch size;
2. one final ``groupby(group).map_groups`` top-k over the per-batch
   survivors (≤ k × n_batches rows per group reach it, not the corpus).

Tie rule: ascending ``(−value, id)`` — i.e. highest value first, then
smallest id — pinned so the result is deterministic and expressible as
``row_number() OVER (PARTITION BY g ORDER BY v DESC, id ASC)`` in SQL.

The per-group Python call in the final stage is fine for the moderate
group cardinalities this is meant for (hosts, languages); for
high-cardinality keys use the hash-partition + segment-reduction
pattern (dedup.py's star operations) instead.

Reference analog: none (beyond-reference LLM-data-pipeline operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _topk_in_batch(batch: pa.Table, group_col: str, value_col: str,
                   id_col: str, k: int) -> pa.Table:
    """Keep the k best (value desc, id asc) rows per group — vectorized:
    one lexsort + segment mask, no per-group Python."""
    if batch.num_rows == 0:
        return batch
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    vals = batch.column(value_col).to_numpy(zero_copy_only=False)
    groups = np.array(batch.column(group_col).to_pylist(), dtype=object)
    # dense-rank descending instead of numpy negation: -vals silently
    # WRAPS for unsigned dtypes (uint64 hash keys) and is a no-op for
    # INT64_MIN — either gives a wrong top-k with no error
    _u, inv = np.unique(vals, return_inverse=True)
    desc_rank = (len(_u) - 1) - inv
    order = np.lexsort((ids, desc_rank, groups))
    g_sorted = groups[order]
    new_seg = np.ones(len(order), dtype=bool)
    new_seg[1:] = g_sorted[1:] != g_sorted[:-1]
    seg_id = np.cumsum(new_seg) - 1
    seg_start = np.flatnonzero(new_seg)
    pos_in_seg = np.arange(len(order)) - seg_start[seg_id]
    keep = order[pos_in_seg < k]
    keep.sort()                          # preserve input row order
    return batch.take(pa.array(keep, pa.int64()))


def grouped_topk(ds, *, group_col: str, value_col: str,
                 id_col: str = "doc_id", k: int):
    """Dataset → the deterministic k-highest-value rows per group (all
    input columns pass through)."""
    partial = ds.map_batches(
        lambda b: _topk_in_batch(b, group_col, value_col, id_col, k),
        batch_format="pyarrow")
    return partial.groupby(group_col).map_groups(
        lambda g: _topk_in_batch(g, group_col, value_col, id_col, k),
        batch_format="pyarrow")
