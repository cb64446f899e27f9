"""Duplicate-span removal: corpus-global exact dedup of repeated
word-windows (the substring-dedup step of Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", simplified to fixed
non-overlapping windows so the semantics stay SQL-oracle-checkable).

Semantics: normalize each document to the single-space word stream, cut
it into consecutive ``window``-word blocks (last block may be short).
A block whose text occurs anywhere else in the corpus keeps only its
FIRST occurrence in (doc_id, block_idx) order; every other occurrence is
removed. Documents are reassembled from their kept blocks.

Scale shape (100 TB):
  1. key pass — only (bkey: blake2b-64 of block text, packed
     doc_id·2^20+block_idx) rows leave the scan; payload never shuffles.
  2. duplicate detection — hash-partition by bkey, ONE vectorized numpy
     segment reduction per partition (same idiom as
     dedup.connected_components' star blocks): sort by (bkey, packed),
     everything after a segment's first row is a drop. No per-key Python.
  3. drop application — the drop set is bounded by the DUPLICATE subset.
     ≤ broadcast_limit: sorted packed array via ray.put, one searchsorted
     mask per batch. Beyond: hash-partitioned marker anti-join (payload
     moves once), mirroring dedup._apply_drop's fallback.

Grouping is by 64-bit blake2b of the block text (not the text itself),
so a hash collision could merge two distinct blocks — at 2^-64 per pair
this is the same accepted trade as the minhash path's band keys.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from .dedup import _hash_part, hash_bytes
from .textstats import normalize_text

logger = logging.getLogger(__name__)

BLOCK_LIMIT = 1 << 20   # max blocks per doc (2^20 blocks = ~21M words)


def _blocks_of(text: str, window: int, unit: str = "words") -> list[str]:
    if unit == "lines":
        # line-granular blocks (C4/RefinedWeb repeated-line removal):
        # lines kept verbatim, newline is the delimiter
        return text.split("\n") if text else []
    norm = normalize_text(text)
    if not norm:
        return []
    words = norm.split(" ")
    return [" ".join(words[i:i + window])
            for i in range(0, len(words), window)]


_JOINER = {"words": " ", "lines": "\n"}


def _pack(doc_id: int, block_idx: int) -> int:
    if block_idx >= BLOCK_LIMIT:
        # a real error, not an assert: under python -O an overflow would
        # silently alias into the NEXT doc's packed range and drop the
        # wrong documents' blocks.
        raise ValueError(f"block_idx {block_idx} >= BLOCK_LIMIT")
    return doc_id * BLOCK_LIMIT + block_idx


def _dup_drops_block(group: pa.Table) -> pa.Table:
    """All (bkey, packed) rows of a hash partition → the packed ids that
    LOSE their duplicate group (everything but the minimum packed per
    bkey segment). Vectorized segment reduction, one call per partition."""
    bkey = group.column("bkey").to_numpy(zero_copy_only=False)
    packed = group.column("packed").to_numpy(zero_copy_only=False)
    if len(bkey) == 0:
        return pa.table({"packed": pa.array([], pa.int64())})
    order = np.lexsort((packed, bkey))
    bkey, packed = bkey[order], packed[order]
    first = np.ones(len(bkey), dtype=bool)
    first[1:] = bkey[1:] != bkey[:-1]
    return pa.table({"packed": pa.array(packed[~first], pa.int64())})


def remove_duplicate_spans(ds, *, window: int = 20,
                           broadcast_limit: int = 20_000_000,
                           num_partitions: int = 512,
                           unit: str = "words"):
    """Dataset[doc_id, text, ...] → Dataset[doc_id, text, n_blocks,
    n_dropped] with corpus-duplicate word-windows removed (first
    occurrence kept). Extra input columns are passed through.
    ``unit="lines"`` switches to line-granular blocks (the C4/RefinedWeb
    repeated-line removal; ``window`` is ignored there)."""
    import ray

    if unit not in _JOINER:
        raise ValueError(f"unit must be one of {sorted(_JOINER)}")

    def explode_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        bkeys, packeds = [], []
        for i, t in zip(ids, texts):
            blocks = _blocks_of(t, window, unit)
            if len(blocks) > BLOCK_LIMIT:
                # pathological giant doc (~21M+ words at window=20):
                # blocks past the packing limit stay out of the dedup
                # (always kept) instead of crashing the task.
                logger.warning("doc %d: %d blocks > BLOCK_LIMIT; tail "
                               "excluded from span dedup", i, len(blocks))
                blocks = blocks[:BLOCK_LIMIT]
            for bidx, btext in enumerate(blocks):
                # mask to 63 bits: int64-representable (hash_bytes is u64)
                bkeys.append(hash_bytes(btext.encode("utf-8"))
                             & ((1 << 63) - 1))
                packeds.append(_pack(i, bidx))
        out = pa.table({"bkey": pa.array(bkeys, pa.int64()),
                        "packed": pa.array(packeds, pa.int64())})
        k = out.column("bkey").to_numpy(zero_copy_only=False)
        return out.append_column(
            "part", pa.array(_hash_part(k, num_partitions), pa.int64()))

    # materialize: count + the collect/union below would otherwise each
    # re-execute the whole explode+shuffle lineage (same guard as
    # dedup.dedup_keep_canonical's drop set).
    drops_ds = (ds.map_batches(explode_keys, batch_format="pyarrow")
                .groupby("part")
                .map_groups(_dup_drops_block, batch_format="pyarrow")
                .materialize())

    n_drop = drops_ds.count()
    if n_drop > broadcast_limit:
        # Partitioned fallback: markers and docs co-shuffle on
        # hash(doc_id); one rebuild pass per partition. Payload moves
        # once — engaged only past ~160 MB of drop ids.
        logger.warning(
            "remove_duplicate_spans: %d drop ids (> %d); using "
            "partitioned marker anti-join", n_drop, broadcast_limit)
        return _partitioned_rebuild(ds, drops_ds, window, num_partitions,
                                    unit)

    drop_packed = np.sort(np.concatenate(
        [b.column("packed").to_numpy(zero_copy_only=False)
         for b in drops_ds.iter_batches(batch_format="pyarrow")]
        or [np.array([], dtype=np.int64)]))
    drop_ref = ray.put(drop_packed)

    def rebuild(batch: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        return _rebuild_batch(batch, drops, window, unit)

    return ds.map_batches(rebuild, batch_format="pyarrow")


def _rebuild_batch(batch: pa.Table, drop_packed: np.ndarray,
                   window: int, unit: str = "words") -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    new_texts, n_blocks, n_dropped = [], [], []
    for i, t in zip(ids, texts):
        blocks = _blocks_of(t, window, unit)
        # mirror explode_keys' truncation: blocks past BLOCK_LIMIT never
        # got keys, so they are never drop candidates (and their packed
        # ids would alias into the next doc's range).
        nb = min(len(blocks), BLOCK_LIMIT)
        hit = np.zeros(len(blocks), dtype=bool)
        if nb and len(drop_packed):
            packed = i * BLOCK_LIMIT + np.arange(nb, dtype=np.int64)
            pos = np.minimum(np.searchsorted(drop_packed, packed),
                             len(drop_packed) - 1)
            hit[:nb] = drop_packed[pos] == packed
        kept = [b for b, h in zip(blocks, hit) if not h]
        new_texts.append(_JOINER[unit].join(kept))
        n_blocks.append(len(blocks))
        n_dropped.append(int(hit.sum()))
    out = {name: batch.column(name)
           for name in batch.column_names if name != "text"}
    out["text"] = pa.array(new_texts, pa.string())
    out["n_blocks"] = pa.array(n_blocks, pa.int64())
    out["n_dropped"] = pa.array(n_dropped, pa.int64())
    return pa.table(out)


def _partitioned_rebuild(ds, drops_ds, window: int, num_partitions: int,
                         unit: str = "words"):
    """Fallback for drop sets too large to broadcast: co-shuffle docs and
    drop markers on hash(doc_id), rebuild per partition with the same
    vectorized membership mask."""
    doc_cols = ds.schema().names

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out = {n: batch.column(n) for n in batch.column_names}
        out["packed"] = pa.nulls(batch.num_rows, pa.int64())
        out["part"] = pa.array(_hash_part(ids.astype(np.int64),
                                          num_partitions), pa.int64())
        return pa.table(out)

    def tag_markers(batch: pa.Table) -> pa.Table:
        packed = batch.column("packed").to_numpy(zero_copy_only=False)
        ids = (packed // BLOCK_LIMIT).astype(np.int64)
        cols = {n: pa.nulls(batch.num_rows,
                            tag_schema.field(n).type)
                for n in doc_cols}
        cols["doc_id"] = pa.array(ids, pa.int64())
        cols["packed"] = batch.column("packed")
        cols["part"] = pa.array(_hash_part(ids, num_partitions), pa.int64())
        return pa.table(cols)

    tag_schema = ds.schema().base_schema

    def rebuild_part(group: pa.Table) -> pa.Table:
        is_marker = group.column("packed").is_valid().to_numpy(
            zero_copy_only=False)
        markers = group.filter(pa.array(is_marker))
        docs = group.filter(pa.array(~is_marker))
        drops = np.sort(markers.column("packed").to_numpy(
            zero_copy_only=False))
        docs = docs.drop_columns(["packed", "part"])
        return _rebuild_batch(docs, drops, window, unit)

    tagged = ds.map_batches(tag_docs, batch_format="pyarrow")
    markers = drops_ds.map_batches(tag_markers, batch_format="pyarrow")
    return tagged.union(markers).groupby("part").map_groups(
        rebuild_part, batch_format="pyarrow")


def remove_duplicate_lines(ds, *, broadcast_limit: int = 20_000_000,
                           num_partitions: int = 512):
    """Corpus-global repeated-LINE removal (C4 / RefinedWeb: a line that
    occurs anywhere else in the corpus keeps only its first occurrence
    in (doc_id, line_idx) order). Same key/shuffle/rebuild machinery as
    the word-window path, line-granular blocks."""
    return remove_duplicate_spans(ds, window=1,
                                  broadcast_limit=broadcast_limit,
                                  num_partitions=num_partitions,
                                  unit="lines")
