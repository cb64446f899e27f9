"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data-first shapes:
- exact: hash inside map_batches → groupby(hash) → min doc_id per group
  (the groupby only shuffles (hash, doc_id) pairs, never the text).
- MinHash/LSH: shingle→minhash inside map_batches → explode LSH band keys →
  groupby(band_key) collects candidate buckets → verify candidate pairs with
  n-gram Jaccard. At 100 TB only band keys + ids shuffle.
- SimHash: 64-bit signature per doc, Hamming-adjacent bucket grouping.
- embedding cosine: normalized vectors, bucketed by coarse LSH sign-bits,
  exact cosine verify within buckets.
"""

from __future__ import annotations

import hashlib
import logging
import re
import struct
import sys

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

_WS = re.compile(r"\s+")

# Per-bucket verify is O(k²); real web corpora have mega-buckets (identical
# boilerplate → identical band keys), so every verify stage caps bucket
# membership and LOGS the truncation (no-silent-caps rule). 1,000 members
# bounds a bucket's verify at ~500k comparisons.
DEFAULT_BUCKET_CAP = 1_000


def _cap_bucket(rows: list, cap: int, bucket_key: str) -> list:
    """Deterministically truncate an oversized verify bucket (rows must be
    sorted) and log what was dropped. A bucket this large is near-certain
    mass-duplication; pairs among the retained prefix still link the
    bucket into one dedup component."""
    if cap is None or len(rows) <= cap:
        return rows
    logger.warning(
        "dedup verify bucket %r has %d members; capping at %d "
        "(%d members dropped from pair enumeration)",
        bucket_key, len(rows), cap, len(rows) - cap)
    return rows[:cap]

# 64-bit multiply-shift hash seeds (deterministic, no RNG at run time)
_MASK64 = (1 << 64) - 1
_MINHASH_SEEDS = [((0x9E3779B97F4A7C15 + 0x6C62272E07BB0142 * i) & _MASK64) | 1
                  for i in range(64)]


_SHINGLE_MIX = tuple(np.uint64(((0xC2B2AE3D27D4EB4F * (i + 1)) & _MASK64) | 1)
                     for i in range(8))


def hash_bytes(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def _shingle_array(text: str, n: int = 3) -> np.ndarray:
    """word-n-gram shingle hashes, vectorized: one blake2b per WORD, then
    the n-window combined with odd-constant multiplies + xor in numpy
    (deterministic; Python's builtin hash() is salted per process so it
    cannot be used)."""
    words = _WS.split(text.strip().lower())
    if not words or words == [""]:
        return np.array([], dtype=np.uint64)
    wh = np.fromiter((hash_bytes(w.encode()) for w in words),
                     dtype=np.uint64, count=len(words))
    if len(wh) < n:
        acc = wh[0] * _SHINGLE_MIX[0]
        for i in range(1, len(wh)):
            acc = acc ^ (wh[i] * _SHINGLE_MIX[i % 8])
        return np.array([acc], dtype=np.uint64)
    acc = wh[:len(wh) - n + 1] * _SHINGLE_MIX[0]
    for i in range(1, n):
        acc = acc ^ (wh[i:len(wh) - n + 1 + i] * _SHINGLE_MIX[i % 8])
    return np.unique(acc)


def _shingles(text: str, n: int = 3) -> set[int]:
    return set(_shingle_array(text, n).tolist())


_SEED_ARR = np.array(_MINHASH_SEEDS, dtype=np.uint64)


def minhash_signature(text: str, num_perm: int = 64, shingle_n: int = 3) -> list[int]:
    sh = _shingle_array(text, shingle_n)
    if len(sh) == 0:
        return [0] * num_perm
    # one broadcasted multiply: (num_perm, n_shingles) -> row minima
    hashed = _SEED_ARR[:num_perm, None] * sh[None, :]
    return hashed.min(axis=1).tolist()


def lsh_band_keys(sig: list[int], bands: int = 16) -> list[str]:
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows]
        digest = hashlib.blake2b(
            b"".join(struct.pack("<Q", v) for v in chunk),
            digest_size=8).hexdigest()
        keys.append(f"{b}:{digest}")
    return keys


def simhash64(text: str) -> int:
    tokens = _WS.split(text.strip().lower())
    if not tokens or tokens == [""]:
        return 0
    hs = np.fromiter((hash_bytes(t.encode()) for t in tokens),
                     dtype=np.uint64, count=len(tokens))
    # one vectorized unpack+sum over all tokens (bit layout identical to
    # the per-token struct.pack('<Q') + unpackbits formulation)
    le_bytes = hs.view(np.uint8).reshape(-1, 8)
    if sys.byteorder == "big":             # keep '<Q' byte order everywhere
        le_bytes = le_bytes[:, ::-1]
    ones = np.unpackbits(le_bytes, axis=1).sum(axis=0, dtype=np.int64)
    acc = 2 * ones - len(tokens)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out & ((1 << 63) - 1)


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = _shingles(a, n), _shingles(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# Dataset-level operators

def exact_dedup(ds):
    """documents → one row per distinct normalized text (min doc_id wins).

    Shuffle ships only (text_hash, doc_id) — never the payload.
    """
    from ray.data.aggregate import Min

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "text_hash": pa.array(
                [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    return (ds.map_batches(hash_batch, batch_format="pyarrow")
            .groupby("text_hash")
            .aggregate(Min("doc_id", alias_name="doc_id")))


def minhash_lsh_candidates(ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_n: int = 3):
    """documents → Dataset[(band_key, doc_id)] exploded LSH index.

    groupby(band_key) downstream yields candidate buckets; pairs sharing ≥1
    band are near-dup candidates.
    """
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_keys: list[str] = []
        out_ids: list[int] = []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text, num_perm, shingle_n)
            for key in lsh_band_keys(sig, bands):
                out_keys.append(key)
                out_ids.append(doc_id)
        return pa.table({"band_key": pa.array(out_keys, pa.string()),
                         "doc_id": pa.array(out_ids, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def minhash_dedup_pairs(ds, *, num_perm: int = 64, bands: int = 16,
                        shingle_n: int = 3, jaccard_threshold: float = 0.8,
                        bucket_cap: int = DEFAULT_BUCKET_CAP):
    """documents → Dataset[(doc_a, doc_b, jaccard_bp)] near-dup pairs.

    Fully distributed, no driver-side loops and no text reshuffle: the
    explode stage computes each doc's minhash ONCE and ships
    (band_key, doc_id, packed 512-byte signature); bucket groups verify
    candidates with the standard MinHash Jaccard estimator (fraction of
    agreeing signature slots — unbiased, stderr ≈ 1/sqrt(num_perm)); a
    final groupby dedups pairs that collide in several bands. At 100 TB
    the shuffle carries bands × 512 B per doc instead of the document
    text, and the verify step needs no second pass over the corpus.
    """
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_keys: list[str] = []
        out_ids: list[int] = []
        out_sigs: list[bytes] = []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text, num_perm, shingle_n)
            packed = struct.pack(f"<{num_perm}Q", *sig)
            for key in lsh_band_keys(sig, bands):
                out_keys.append(key)
                out_ids.append(doc_id)
                out_sigs.append(packed)
        return pa.table({"band_key": pa.array(out_keys, pa.string()),
                         "doc_id": pa.array(out_ids, pa.int64()),
                         "sig": pa.array(out_sigs, pa.binary())})

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = sorted({(i, s) for i, s in
                       zip(group.column("doc_id").to_pylist(),
                           group.column("sig").to_pylist())})
        rows = _cap_bucket(rows, bucket_cap,
                           group.column("band_key")[0].as_py())
        sigs = [np.frombuffer(s, dtype=np.uint64) for _i, s in rows]
        out_a, out_b, out_j = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= jaccard_threshold:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
                    out_j.append(int(round(est * 10_000)))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard_bp": pa.array(out_j, pa.int64())})

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("band_key")
             .map_groups(pairs_in_bucket, batch_format="pyarrow"))
    # the same pair can surface from several bands — keep one copy
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array([simhash64(t) for t in texts], pa.int64()),
    })


def simhash_neardup_pairs(ds, *, hamming_k: int = 3, bands: int = 4,
                          bucket_cap: int = DEFAULT_BUCKET_CAP):
    """documents → Dataset[(doc_a, doc_b, hamming)] pairs within Hamming
    distance ``hamming_k`` of each other's 64-bit simhash.

    Scale shape: by pigeonhole, two signatures within Hamming k of each
    other agree exactly on at least one of ``bands`` (> k) disjoint bit
    bands — so explode (band_id, band_bits) keys, groupby, and verify the
    full Hamming distance only within buckets. Only (key, doc_id, sig)
    triples shuffle, never text.
    """
    band_width = 64 // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_key: list[str] = []
        out_id: list[int] = []
        out_sig: list[int] = []
        for doc_id, text in zip(ids, texts):
            sig = simhash64(text)
            for b in range(bands):
                bits = (sig >> (b * band_width)) & ((1 << band_width) - 1)
                out_key.append(f"{b}:{bits:x}")
                out_id.append(doc_id)
                out_sig.append(sig)
        return pa.table({"band_key": pa.array(out_key, pa.string()),
                         "doc_id": pa.array(out_id, pa.int64()),
                         "sig": pa.array(out_sig, pa.int64())})

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group.column("doc_id").to_pylist(),
                              group.column("sig").to_pylist())))
        rows = _cap_bucket(rows, bucket_cap,
                           group.column("band_key")[0].as_py())
        out_a, out_b, out_h = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                h = bin(rows[i][1] ^ rows[j][1]).count("1")
                if h <= hamming_k:
                    out_a.append(rows[i][0])
                    out_b.append(rows[j][0])
                    out_h.append(h)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_h, pa.int64())})

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("band_key")
             .map_groups(pairs_in_bucket, batch_format="pyarrow"))
    # a pair can collide in several bands — keep one copy
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def hyperplane_keys(unit_vecs: np.ndarray, *, sign_bits: int = 16,
                    n_tables: int = 4, seed: int = 4242) -> list[list[str]]:
    """Random-hyperplane sign-LSH keys: ``n_tables`` independent seeded
    Gaussian projection matrices of ``sign_bits`` hyperplanes each.

    Bucket count scales as min(2^sign_bits, corpus/table) — unlike a
    fixed-component sign scheme, expected bucket OCCUPANCY stays ~n/2^bits
    per table, so within-bucket O(k²) verify stays bounded as the corpus
    grows; multiple tables restore recall (P[all tables miss] =
    (1-cos_collision^bits)^tables). Returns per-table key lists."""
    dim = unit_vecs.shape[1]
    out: list[list[str]] = []
    for t in range(n_tables):
        rng = np.random.default_rng(seed * 1_000 + t)
        planes = rng.standard_normal((sign_bits, dim)).astype(np.float32)
        bits = (unit_vecs @ planes.T) >= 0.0          # (n, sign_bits)
        packed = np.packbits(bits, axis=1)            # (n, ceil(bits/8))
        out.append([f"{t}:" + row.tobytes().hex() for row in packed])
    return out


def _unit_rows(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vecs / norms


def embedding_neardup_pairs(ds, *, threshold: float = 0.95,
                            sign_bits: int = 16, n_tables: int = 4,
                            bucket_cap: int = DEFAULT_BUCKET_CAP,
                            seed: int = 4242):
    """embeddings → Dataset[(vec_a, vec_b, cosine_bp)] near-dup pairs.

    Scale path: seeded random-hyperplane sign-LSH (``n_tables`` tables ×
    ``sign_bits`` bits — bucket cardinality grows with the corpus, unlike
    a fixed low-bit scheme), exact cosine verify within buckets only,
    bucket membership capped + logged, pair dedup across tables. The
    shuffle ships (bucket, vec_id, embedding) per table — n_tables × the
    vector payload, never all-pairs."""

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(batch.column("embedding").to_pylist(),
                          dtype=np.float32)
        unit = _unit_rows(vecs)
        per_table = hyperplane_keys(unit, sign_bits=sign_bits,
                                    n_tables=n_tables, seed=seed)
        keys: list[str] = []
        for table_keys in per_table:
            keys.extend(table_keys)
        rep = np.tile(np.arange(len(ids)), n_tables)
        return pa.table({
            "bucket": pa.array(keys, pa.string()),
            "vec_id": pa.array(ids[rep], pa.int64()),
            "embedding": batch.column("embedding").take(pa.array(rep)),
        })

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = sorted(
            {(i, tuple(v)) for i, v in
             zip(group.column("vec_id").to_pylist(),
                 group.column("embedding").to_pylist())})
        rows = _cap_bucket(rows, bucket_cap,
                           group.column("bucket")[0].as_py())
        ids = [r[0] for r in rows]
        vecs = np.asarray([r[1] for r in rows], dtype=np.float32)
        unit = _unit_rows(vecs)
        sims = unit @ unit.T
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        hit = sims[iu, ju] >= threshold
        out_a, out_b, out_s = [], [], []
        for i, j in zip(iu[hit], ju[hit]):
            a, b = sorted((ids[int(i)], ids[int(j)]))
            out_a.append(a)
            out_b.append(b)
            out_s.append(int(round(float(sims[i, j]) * 10_000)))
        return pa.table({"vec_a": pa.array(out_a, pa.int64()),
                         "vec_b": pa.array(out_b, pa.int64()),
                         "cosine_bp": pa.array(out_s, pa.int64())})

    pairs = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(pairs_in_bucket, batch_format="pyarrow"))
    # a pair can collide in several tables — keep one copy
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
