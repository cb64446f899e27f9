"""Sequence packing: map each document onto its token span in the
packed training stream.

Training pipelines concatenate the token streams of all documents (in a
deterministic order) and cut the concatenation into fixed-length
examples (Brown et al. 2020 pack sequences to 2048; the operator is
tokenizer-agnostic and uses the whitespace token count here). The hard
part at scale is the GLOBAL EXCLUSIVE PREFIX SUM of per-document token
counts — this module implements it as a two-level distributed scan:

1. range partial sums — one streaming ``map_batches`` pass over
   (doc_id, n_tokens) groups documents into coarse doc_id ranges
   (``range_size`` docs per range) and a small ``groupby(range).sum``
   produces ONE row per range (the only thing that ever reaches the
   driver: ~n_docs/range_size ints — at 10^11 docs with the default
   1M-doc ranges that is 10^5 rows ≈ 1.6 MB);
2. driver prefix-sums the range sums and broadcasts the range-offset
   table via ``ray.put``;
3. a per-range ``groupby(range).map_groups`` computes intra-range
   offsets with one vectorized argsort + cumsum per range (coarse
   granularity: one Python call per ~range_size documents, each fully
   vectorized inside).

Partitioning assumption (documented per the custom-operator rule): the
order key is ``doc_id`` ascending and ranges are ``doc_id //
range_size`` — a monotone id space. Sparse/skewed id spaces still give
correct results (empty ranges simply contribute 0); an ADVERSARIALLY
skewed id space only affects range granularity, not correctness. For
arbitrary sort keys, sort-assign a dense rank first.

Reference analog: none (beyond-reference LLM-data-pipeline operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import ws_token_count

# per-process SINGLE-SLOT cache [key, offsets] (a keyed dict would pin
# every past broadcast for the worker lifetime)
_OFFSET_CACHE: list = [None, None]


def pack_spans(ds, *, example_len: int = 512, range_size: int = 4096,
               id_col: str = "doc_id"):
    """Dataset[(doc_id, text, ...)] → Dataset[(doc_id, n_tokens,
    tok_start, example_first, example_last)].

    tok_start is the exclusive prefix sum of n_tokens in doc_id order;
    example_first/last are the fixed-length example indices the
    document's tokens land in (a zero-token document reports the example
    it *would* start in, first == last)."""
    import ray

    def count(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = np.array([ws_token_count(t)
                      for t in batch.column("text").to_pylist()],
                     dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "rg": pa.array(ids // range_size, pa.int64()),
        })

    counts = ds.map_batches(count, batch_format="pyarrow")

    # level 1: one tiny row per range to the driver
    range_sums = counts.groupby("rg").sum("n_tokens")
    rows = range_sums.take_all()
    rgs = np.array([r["rg"] for r in rows], dtype=np.int64)
    sums = np.array([r["sum(n_tokens)"] for r in rows], dtype=np.int64)
    order = np.argsort(rgs)
    rgs, sums = rgs[order], sums[order]
    range_start = np.concatenate(([0], np.cumsum(sums)[:-1]))
    ref = ray.put((rgs, range_start))
    key = ref.hex()

    # level 3: vectorized intra-range scan, one call per range
    def scan_range(group: pa.Table) -> pa.Table:
        if _OFFSET_CACHE[0] != key:
            _OFFSET_CACHE[0] = key
            _OFFSET_CACHE[1] = ray.get(ref)
        cached = _OFFSET_CACHE[1]
        g_rgs, g_start = cached
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        base = g_start[np.searchsorted(g_rgs, ids[order[0]] // range_size)]
        intra = np.concatenate(([0], np.cumsum(n[order])[:-1]))
        start = np.empty(len(ids), dtype=np.int64)
        start[order] = base + intra
        last_tok = start + np.maximum(n - 1, 0)
        return pa.table({
            id_col: group.column(id_col),
            "n_tokens": group.column("n_tokens"),
            "tok_start": pa.array(start, pa.int64()),
            "example_first": pa.array(start // example_len, pa.int64()),
            "example_last": pa.array(last_tok // example_len, pa.int64()),
        })

    return counts.groupby("rg").map_groups(scan_range,
                                           batch_format="pyarrow")
