"""Distributed inverted-index construction: term → (df, posting list).

The classic web-corpus retrieval structure (and the shape behind BM25 /
TF-IDF serving): for every term, the count of documents containing it
and the sorted list of those document ids.

Scale shape (100 TB): one pass over the payload emits DISTINCT
(term, doc_id) pairs per document — each pair is globally unique because
a document is exactly one row, so no combiner is needed and ``df`` is a
plain count of pairs. Pairs carry an explicit hash-partition column and
one ``groupby(part).map_groups`` call per PARTITION (not per term) does
a vectorized sorted-segment reduction: terms are grouped with
``np.unique``, df comes from segment offsets, and postings are joined
per segment. Posting lists are CAPPED at ``postings_cap`` ids (smallest
doc_ids, deterministic) so a stop-word's row stays bounded — ``df``
remains exact. Only (term, doc_id) pairs ever shuffle; payload text
never leaves the first stage.

No counterpart in the reference (per-document only); this is the
corpus-level retrieval layer a training-data pipeline adds on top.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

# one shared tokenizer: must stay in lockstep with the SQL oracles'
# explicit [ \t\n\r\f]+ class across every token-level query
from .sketches import _tokens_of


def inverted_index(ds, *, postings_cap: int = 64,
                   num_partitions: int = 64):
    """Dataset[doc_id, text, ...] → Dataset(term, df, postings).

    ``df`` is the exact document frequency; ``postings`` is the
    ascending comma-joined list of the ``postings_cap`` smallest doc_ids
    containing the term (a string column — cross-engine stable, and the
    bounded-row guarantee a hot term needs at corpus scale).
    """

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t: list[str] = []
        out_id: list[int] = []
        for doc_id, text in zip(ids, texts):
            for tok in set(_tokens_of(text)):
                out_t.append(tok)
                out_id.append(doc_id)
        # crc32 is deterministic across processes (unlike hash()); the
        # partition id is internal — never compared against the oracle
        part = np.array([zlib.crc32(t.encode("utf-8")) % num_partitions
                         for t in out_t], dtype=np.int64)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_id, pa.int64()),
                         "part": pa.array(part)})

    def reduce_part(group: pa.Table) -> pa.Table:
        """ONE vectorized segment reduction per partition: sort by
        (term, doc_id), find term segments, emit df + capped postings."""
        order = pa.compute.sort_indices(
            group, sort_keys=[("term", "ascending"),
                              ("doc_id", "ascending")])
        g = group.take(order)
        terms = np.array(g.column("term").to_pylist(), dtype=object)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, starts = np.unique(terms, return_index=True)
        ends = np.append(starts[1:], len(terms))
        postings = [
            ",".join(str(i) for i in ids[s:min(e, s + postings_cap)])
            for s, e in zip(starts, ends)
        ]
        return pa.table({
            "term": pa.array(list(uniq), pa.string()),
            "df": pa.array((ends - starts).astype(np.int64)),
            "postings": pa.array(postings, pa.string()),
        })

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("part")
            .map_groups(reduce_part, batch_format="pyarrow"))
