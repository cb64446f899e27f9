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
import re
import struct

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")

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
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = hash_bytes(tok.encode())
        bits = np.unpackbits(
            np.frombuffer(struct.pack("<Q", h), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
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
                        shingle_n: int = 3, jaccard_threshold: float = 0.8):
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


def simhash_neardup_pairs(ds, *, hamming_k: int = 3, bands: int = 4):
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


def embedding_neardup_pairs(ds, *, threshold: float = 0.95, sign_bits: int = 4):
    """embeddings → Dataset[(vec_a, vec_b, cosine_bp)] near-dup pairs.

    Scale path: bucket by the sign pattern of the first ``sign_bits``
    normalized components (cheap LSH); exact cosine within buckets only.
    """
    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_pylist()
        vecs = batch.column("embedding").to_pylist()
        keys = []
        for v in vecs:
            arr = np.asarray(v, dtype=np.float32)
            norm = np.linalg.norm(arr)
            unit = arr / norm if norm else arr
            key = "".join("1" if x >= 0 else "0" for x in unit[:sign_bits])
            keys.append(key)
        return pa.table({"bucket": pa.array(keys, pa.string()),
                         "vec_id": pa.array(ids, pa.int64()),
                         "embedding": batch.column("embedding")})

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        vecs = np.asarray(group.column("embedding").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        out_a, out_b, out_s = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                s = float(sims[i, j])
                if s >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_s.append(int(round(s * 10_000)))
        return pa.table({"vec_a": pa.array(out_a, pa.int64()),
                         "vec_b": pa.array(out_b, pa.int64()),
                         "cosine_bp": pa.array(out_s, pa.int64())})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pyarrow"))
