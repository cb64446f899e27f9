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


def _shingles(text: str, n: int = 3) -> set[int]:
    """word-n-gram shingle hashes."""
    words = _WS.split(text.strip().lower())
    if len(words) < n:
        return {hash_bytes(" ".join(words).encode())} if words else set()
    out = set()
    for i in range(len(words) - n + 1):
        out.add(hash_bytes(" ".join(words[i:i + n]).encode()))
    return out


def hash_bytes(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def minhash_signature(text: str, num_perm: int = 64, shingle_n: int = 3) -> list[int]:
    sh = _shingles(text, shingle_n)
    if not sh:
        return [0] * num_perm
    arr = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    sig = []
    for seed in _MINHASH_SEEDS[:num_perm]:
        hashed = (arr * np.uint64(seed)) & np.uint64(_MASK64)
        sig.append(int(hashed.min()))
    return sig


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
    """documents → Dataset[(doc_a, doc_b, jaccard_bp)] verified near-dup pairs.

    Candidate generation via LSH buckets; verification joins text back by
    broadcasting the per-bucket texts (buckets are tiny by construction).
    """
    cands = minhash_lsh_candidates(ds, num_perm=num_perm, bands=bands,
                                   shingle_n=shingle_n)

    def collect_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        pairs_a, pairs_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs_a.append(ids[i])
                pairs_b.append(ids[j])
        return pa.table({"doc_a": pa.array(pairs_a, pa.int64()),
                         "doc_b": pa.array(pairs_b, pa.int64())})

    pairs = cands.groupby("band_key").map_groups(
        collect_pairs, batch_format="pyarrow")
    if pairs.count() == 0:
        return pairs

    pairs_unique = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")

    # verification: broadcast doc texts (id → text) via ray.put; candidate
    # sets are small relative to the corpus, so a lookup map is the
    # broadcast-small-side pattern, not a shuffle join
    import ray
    needed_ids = set()
    for row in pairs_unique.iter_rows():
        needed_ids.add(row["doc_a"])
        needed_ids.add(row["doc_b"])
    texts_ds = ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "text": b.column("text")}),
        batch_format="pyarrow")
    text_map = {}
    for row in texts_ds.iter_rows():
        if row["doc_id"] in needed_ids:
            text_map[row["doc_id"]] = row["text"]
    text_ref = ray.put(text_map)

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(text_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist()):
            score = jaccard(texts[a], texts[b], shingle_n)
            if score >= jaccard_threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(int(round(score * 10_000)))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard_bp": pa.array(out_j, pa.int64())})

    return pairs_unique.map_batches(verify, batch_format="pyarrow")


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
