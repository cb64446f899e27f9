"""Join operators: partitioned hash join (large × large) and broadcast
lookup join (large × small).

Scale policy (ray_guide "Joins and lookups"):
- **Both sides large** → ``Dataset.join`` — Ray Data's hash-partitioned
  join; both sides shuffle once on the key across ``num_partitions``
  aggregators. Size num_partitions to the cluster (roughly total CPUs)
  and salt hot keys upstream if one key dominates.
- **Small side** (dimension table, vocab, blocklist) → ``ray.put`` it
  once and map the lookup inside ``map_batches`` with a vectorized
  searchsorted — no shuffle at all, the small side never moves again.

The reference has no join operator (single-document parser); these back
the generic columnar path of the driver surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash_join(left, right, *, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int = 32):
    """Hash-partitioned equi-join of two Datasets on int/string keys."""
    return left.join(right, join_type, num_partitions,
                     on=(on,), right_on=(right_on or on,))


def broadcast_lookup(ds, lookup_table: pa.Table, *, key: str,
                     lookup_key: str, value_cols: list[str]):
    """Append ``value_cols`` from a SMALL Arrow table to every row of
    ``ds`` by key (inner semantics: rows with no match are dropped).

    The lookup side is ray.put once (sorted key + value arrays) and read
    per actor/task from the local object store; each batch does one
    vectorized searchsorted. Use for dimension tables that fit in
    memory — at 100 TB this is the side that must NOT shuffle."""
    import ray

    order = np.argsort(lookup_table.column(lookup_key).to_numpy(
        zero_copy_only=False))
    keys = lookup_table.column(lookup_key).to_numpy(
        zero_copy_only=False)[order]
    values = {c: lookup_table.column(c).take(pa.array(order))
              for c in value_cols}
    ref = ray.put((keys, values))

    def lookup(batch: pa.Table) -> pa.Table:
        lkeys, lvalues = ray.get(ref)
        ids = batch.column(key).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(lkeys, ids), len(lkeys) - 1)
        hit = lkeys[pos] == ids
        batch = batch.filter(pa.array(hit))
        pos = pos[hit]
        for c in value_cols:
            batch = batch.append_column(c, lvalues[c].take(pa.array(pos)))
        return batch

    return ds.map_batches(lookup, batch_format="pyarrow")
